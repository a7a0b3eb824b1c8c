"""Host-tape movement-only decoder (kernels/decode_tape.py): the C tape
builder + movement kernel must be contract-identical to the parsing VM —
same bytes on valid streams (ours AND the native hash compressor's), same
accept set on malformed ones, VM fallback on tape overflow.  Runs in
Pallas interpret mode on the CPU test mesh.
"""

import numpy as np
import pytest

from snappytpu import cpu
from snappytpu.bench import corpus
from snappytpu.format import constants as C
from snappytpu.format.varint import decode_varint
from snappytpu.kernels.decode_tape import TAPE_MAX, build_tapes, decode_blocks_tape
from snappytpu.kernels.decode_vm import decode_blocks_vm
from snappytpu.kernels.encode_v2 import encode_blocks_v2
from snappytpu.stream import framing

pytestmark = pytest.mark.skipif(not cpu.available, reason="native runtime required")

CASES = dict(corpus.edge_case_corpus())
CASES["mixed100k"] = corpus.mixed(100_000, seed=7)


def _encode(data: bytes):
    arr = np.frombuffer(data, np.uint8)
    blocks, lens = framing.pack_blocks(arr)
    comp, totals = map(np.asarray, encode_blocks_v2(blocks, lens))
    return comp, totals, np.asarray(lens, np.int32)


@pytest.mark.parametrize("name", ["alice_like_text", "low_entropy_runs",
                                  "32k_random", "mixed100k", "block_boundary_64k_plus_1"])
def test_tape_roundtrip_own_streams(name):
    data = CASES[name]
    comp, totals, lens = _encode(data)
    out, ok = decode_blocks_tape(comp, totals, lens)
    assert ok.all()
    assert b"".join(out[i, : lens[i]].tobytes() for i in range(len(lens))) == data


def test_tape_decodes_native_compressor_streams():
    data = corpus.mixed(3 * C.MAX_BLOCK_SIZE + 99, seed=21)
    stream = np.frombuffer(cpu.compress(data), np.uint8)
    out_len, start = decode_varint(stream)
    offs, out_lens = cpu.scan_ops(stream[start:], out_len)
    rows, comp_lens = cpu.split_rows(stream[start:], offs, C.MAX_COMPRESSED_BLOCK_SIZE)
    out, ok = decode_blocks_tape(rows, comp_lens, out_lens.astype(np.int32))
    assert ok.all()
    rec = b"".join(out[i, : out_lens[i]].tobytes() for i in range(len(out_lens)))
    assert rec == data


def test_tape_accept_set_matches_vm_on_flips():
    data = corpus.mixed(2 * C.MAX_BLOCK_SIZE, seed=5)
    comp, totals, lens = _encode(data)
    rng = np.random.default_rng(0)
    rejected = 0
    for _ in range(12):
        cc = comp.copy()
        i = int(rng.integers(0, comp.shape[0]))
        j = int(rng.integers(0, max(int(totals[i]), 1)))
        cc[i, j] ^= int(rng.integers(1, 256))
        o1, k1 = decode_blocks_tape(cc, totals, lens)
        o2, k2 = map(np.asarray, decode_blocks_vm(cc, totals, lens))
        np.testing.assert_array_equal(k1, k2, err_msg="accept set diverged")
        if k1.all():
            np.testing.assert_array_equal(o1, o2, err_msg="bytes diverged")
        else:
            rejected += 1
    assert rejected > 0  # the flip set must actually exercise rejection


def test_tape_overflow_falls_back_to_vm():
    # all-1-byte-literal block: 2 comp bytes/output byte -> 32k records for
    # 64 KiB, far over TAPE_MAX; and small enough output (PAD_OUT/2) to fit
    # the padded row.  The wrapper must fall back to the parsing VM.
    n = 24_000
    raw = corpus.mixed(n, seed=33)
    ops = bytearray()
    for b in raw:
        ops += bytes([0x00, b])
    rows = np.zeros((1, C.MAX_COMPRESSED_BLOCK_SIZE), np.uint8)
    rows[0, : len(ops)] = np.frombuffer(bytes(ops), np.uint8)
    comp_lens = np.array([len(ops)], np.int32)
    out_lens = np.array([n], np.int32)
    tapes, nrecs = build_tapes(rows, comp_lens, out_lens)
    assert nrecs[0] == -9 and n > TAPE_MAX  # really overflowed
    out, ok = decode_blocks_tape(rows, comp_lens, out_lens)
    assert ok.all()
    assert out[0, :n].tobytes() == raw


def test_tape_k_interleaved_matches_flat():
    """The K-interleaved movement kernel (closed experiment: measured flat
    vs K=1, PROFILE.md r5 — the serial resource is the dynamic-row VMEM
    access, not cross-chain dependence) must stay byte-identical."""
    from snappytpu.kernels.decode_tape import _run_tape, _run_tape_k

    data = corpus.mixed(4 * C.MAX_BLOCK_SIZE, seed=13)
    comp, totals, lens = _encode(data)
    tapes, nrecs = build_tapes(comp, totals, lens)
    assert (nrecs >= 0).all()
    o1, k1 = map(np.asarray, _run_tape(tapes, nrecs, comp))
    o2, k2 = map(np.asarray, _run_tape_k(tapes, nrecs, comp, K=2))
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(o1, o2)


def test_tape_zero_length_pad_blocks_ok():
    comp = np.zeros((2, C.MAX_COMPRESSED_BLOCK_SIZE), np.uint8)
    out, ok = decode_blocks_tape(comp, np.zeros(2, np.int32), np.zeros(2, np.int32))
    assert ok.all()
