"""Native C++ host runtime: round trips, cross-validation against the Python
model codec and the reference C binary, scanner and compaction correctness."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from snappytpu import cpu
from snappytpu.bench import corpus
from snappytpu.format import constants as C
from snappytpu.format.varint import decode_varint
from snappytpu.model import compress as model_compress, decompress as model_decompress
from snappytpu.stream import framing

pytestmark = pytest.mark.skipif(not cpu.available, reason="native lib unavailable")

CASES = corpus.edge_case_corpus()


@pytest.mark.parametrize("name", sorted(CASES))
def test_native_roundtrip(name):
    data = CASES[name]
    comp = cpu.compress(data)
    assert cpu.decompress(comp) == data


@pytest.mark.parametrize("name", sorted(CASES))
def test_model_decodes_native_streams(name):
    data = CASES[name]
    assert model_decompress(cpu.compress(data)) == data


@pytest.mark.parametrize("name", sorted(CASES))
def test_native_decodes_model_streams(name):
    data = CASES[name]
    assert cpu.decompress(model_compress(data)) == data


def test_native_decodes_reference_streams(reference_cli):
    data = corpus.mixed(150_000, seed=21)
    with tempfile.TemporaryDirectory() as d:
        src, comp = os.path.join(d, "in"), os.path.join(d, "out")
        with open(src, "wb") as f:
            f.write(data)
        subprocess.run(
            [reference_cli, "-c", src, comp],
            capture_output=True, timeout=300, cwd=os.path.dirname(reference_cli), check=True,
        )
        with open(comp, "rb") as f:
            ref = f.read()
    assert cpu.decompress(ref) == data


def test_reference_decodes_native_streams(reference_cli):
    data = corpus.mixed(150_000, seed=22)
    ours = cpu.compress(data)
    with tempfile.TemporaryDirectory() as d:
        comp, out = os.path.join(d, "comp"), os.path.join(d, "dec")
        with open(comp, "wb") as f:
            f.write(ours)
        subprocess.run(
            [reference_cli, "-d", comp, out],
            capture_output=True, timeout=300, cwd=os.path.dirname(reference_cli), check=True,
        )
        with open(out, "rb") as f:
            decoded = f.read()
    assert decoded == data


def test_native_corruption_rejected():
    data = corpus.text(50_000)
    comp = bytearray(cpu.compress(data))
    with pytest.raises(cpu.NativeError):
        cpu.decompress(bytes(comp[: len(comp) // 2]))
    bad = bytes([4, 0 << 2, ord("A"), (3 << 2) | C.TAG_COPY2, 0, 0])
    with pytest.raises(cpu.NativeError):
        cpu.decompress(bad)


def test_scan_matches_python_splitter():
    data = corpus.mixed(400_000, seed=23)
    stream = np.frombuffer(model_compress(data), dtype=np.uint8)
    total, start = decode_varint(stream)
    ops = stream[start:]
    offs, lens = cpu.scan_ops(ops, total)
    chunks_py, lens_py = framing.split_ops_stream(ops, total)
    assert list(lens) == lens_py
    pos = 0
    for i, ch in enumerate(chunks_py):
        assert offs[i] == pos
        pos += ch.shape[0]


def test_compact_and_split_roundtrip():
    rng = np.random.default_rng(0)
    rows = np.zeros((5, 64), dtype=np.uint8)
    lens = np.array([10, 0, 64, 3, 17], dtype=np.int32)
    for i, l in enumerate(lens):
        rows[i, :l] = rng.integers(0, 256, l, dtype=np.uint8)
    stream = cpu.compact(rows, lens)
    assert len(stream) == lens.sum()
    cuts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    rows2, lens2 = cpu.split_rows(np.frombuffer(stream, dtype=np.uint8), cuts, 64)
    assert (lens2 == lens).all()
    for i, l in enumerate(lens):
        assert rows2[i, :l].tobytes() == rows[i, :l].tobytes()


def test_native_ratio_reasonable():
    data = corpus.text(500_000)
    ratio = len(data) / len(cpu.compress(data))
    assert ratio > 1.5  # reference floor for text (BASELINE.md)
