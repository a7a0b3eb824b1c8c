"""Staged pipeline vs the model and fused kernels: bit-exact equality."""

import numpy as np
import pytest

from snappytpu.bench import corpus
from snappytpu.format import constants as C
from snappytpu.kernels.encode_jax import encode_blocks
from snappytpu.kernels.pipeline import decode_pipeline, encode_pipeline
from snappytpu.model import encode_block
from snappytpu.stream import framing

CASES = {k: v[: C.MAX_BLOCK_SIZE] for k, v in corpus.edge_case_corpus().items()}


def _pad(data: bytes):
    arr = np.frombuffer(data, dtype=np.uint8)
    p = np.zeros(C.MAX_BLOCK_SIZE, dtype=np.uint8)
    p[: arr.size] = arr
    return p, arr.size


@pytest.mark.parametrize("name", sorted(CASES))
def test_pipeline_encode_matches_model(name):
    data = CASES[name]
    padded, n = _pad(data)
    comp, total = encode_pipeline(padded[None], np.array([n], np.int32))
    got = np.asarray(comp)[0, : int(total[0])].tobytes()
    assert got == encode_block(np.frombuffer(data, dtype=np.uint8))


def test_pipeline_matches_fused_batch():
    datas = [corpus.text(30000), corpus.constant(65536), corpus.mixed(65536, seed=3)]
    blocks = np.stack([_pad(d)[0] for d in datas])
    lens = np.array([len(d) for d in datas], np.int32)
    c1, t1 = encode_pipeline(blocks, lens)
    c2, t2 = encode_blocks(blocks, lens)
    c1, t1, c2, t2 = map(np.asarray, (c1, t1, c2, t2))
    assert (t1 == t2).all()
    for i in range(len(datas)):
        assert c1[i, : t1[i]].tobytes() == c2[i, : t2[i]].tobytes()


def test_pipeline_roundtrip():
    data = corpus.mixed(3 * C.MAX_BLOCK_SIZE + 999, seed=17)
    blocks, lens = framing.pack_blocks(np.frombuffer(data, np.uint8))
    comp, totals = encode_pipeline(blocks, lens)
    comp, totals = np.asarray(comp), np.asarray(totals)
    padded, comp_lens = framing.pad_chunks(
        [comp[i, : totals[i]] for i in range(comp.shape[0])]
    )
    out, ok = decode_pipeline(padded, comp_lens, lens)
    out, ok = np.asarray(out), np.asarray(ok)
    assert ok.all()
    rec = b"".join(out[i, : lens[i]].tobytes() for i in range(out.shape[0]))
    assert rec == data


def test_pipeline_decode_rejects_bad_offset():
    ops = bytes([0 << 2, ord("A"), (3 << 2) | C.TAG_COPY2, 0x0F, 0x27])
    padded, comp_lens = framing.pad_chunks([np.frombuffer(ops, dtype=np.uint8)])
    out, ok = decode_pipeline(padded, comp_lens, np.array([5], np.int32))
    assert not bool(np.asarray(ok)[0])


def test_fast_profile_matches_model_and_roundtrips():
    from snappytpu.config import PROFILES
    from snappytpu.model.decode import decode_ops

    data = corpus.mixed(C.MAX_BLOCK_SIZE, seed=77)
    padded, n = _pad(data)
    comp, total = encode_pipeline(padded[None], np.array([n], np.int32), profile="fast")
    got = np.asarray(comp)[0, : int(total[0])].tobytes()
    expect = encode_block(np.frombuffer(data, np.uint8), tiers_spec=PROFILES["fast"])
    assert got == expect
    out = decode_ops(np.frombuffer(got, np.uint8), len(data))
    assert out.tobytes() == data
