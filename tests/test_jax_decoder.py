"""Device (JAX) decoder: bit-exact decode of model-, device-, and
reference-produced streams; deterministic rejection of malformed input."""

import numpy as np
import pytest

from snappytpu import api
from snappytpu.bench import corpus
from snappytpu.format import constants as C
from snappytpu.kernels.decode_jax import decode_blocks
from snappytpu.model import compress as model_compress
from snappytpu.model.decode import CorruptError
from snappytpu.stream import framing

CASES = corpus.edge_case_corpus()


def _device_decode_stream(stream: bytes) -> bytes:
    return api.decompress(stream)


@pytest.mark.parametrize("name", sorted(CASES))
def test_decode_model_streams(name):
    data = CASES[name]
    assert _device_decode_stream(model_compress(data)) == data


@pytest.mark.parametrize("name", sorted(CASES))
def test_device_roundtrip_full(name):
    data = CASES[name]
    assert api.decompress(api.compress(data)) == data


def test_device_compress_roundtrips_and_is_dense():
    # the v2 device encoder is a different (sort/scan-native) algorithm
    # than the numpy model, so bytes differ; the contract is format
    # validity (model decodes it) and at-least-model density
    data = corpus.mixed(300_000, seed=5)
    comp = api.compress(data)
    from snappytpu.model import decompress as model_decompress
    assert model_decompress(comp) == data
    # density vs the reference C compressor is asserted in test_encode_v2;
    # here only sanity-check that the stream actually compresses
    assert len(comp) < len(data)


@pytest.mark.parametrize("flag", ["-c", "-b"])
def test_decode_reference_streams_on_device(reference_cli, flag):
    import os
    import subprocess
    import tempfile

    data = corpus.mixed(200_000, seed=11)
    with tempfile.TemporaryDirectory() as d:
        src, comp = os.path.join(d, "in"), os.path.join(d, "out")
        with open(src, "wb") as f:
            f.write(data)
        subprocess.run(
            [reference_cli, flag, src, comp],
            capture_output=True,
            timeout=300,
            cwd=os.path.dirname(reference_cli),
            check=True,
        )
        with open(comp, "rb") as f:
            ref_stream = f.read()
    assert _device_decode_stream(ref_stream) == data


def test_malformed_flip_never_silent_match():
    # Raw Snappy has no checksum: a flip inside a literal payload is invisible
    # to any decoder.  The contract is: structural corruption raises, payload
    # corruption yields different bytes — never a crash, never silent equality.
    data = corpus.text(100_000)
    base = api.compress(data)
    for at in [len(base) // 3, len(base) // 2, 2 * len(base) // 3]:
        stream = bytearray(base)
        stream[at] ^= 0xFF
        try:
            out = api.decompress(bytes(stream))
        except (CorruptError, ValueError):
            continue
        assert out != data


def test_truncated_rejected():
    data = corpus.text(50_000)
    stream = api.compress(data)
    with pytest.raises((CorruptError, ValueError)):
        api.decompress(stream[: len(stream) - 10])


def test_ok_flag_false_on_bad_offset():
    # literal 'A', then copy2 len 4 offset 9999 (beyond output written)
    ops = bytes([0 << 2, ord("A"), (3 << 2) | C.TAG_COPY2, 0x0F, 0x27])
    padded, comp_lens = framing.pad_chunks([np.frombuffer(ops, dtype=np.uint8)])
    out, ok = decode_blocks(padded, comp_lens, np.array([5], dtype=np.int32))
    assert not bool(np.asarray(ok)[0])


def test_overlapping_copy_exactness_device():
    # period-3 data: offset-3 copies with length >> offset
    data = b"xyz" * 20000
    assert api.decompress(api.compress(data)) == data
