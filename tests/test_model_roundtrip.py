"""Round-trip tests for the numpy model codec over the edge-case corpus and
size sweep — the reference's integration-test shape (snappy_test.c:66-104)
with a stronger oracle: byte equality *and* length equality (the reference's
compare_files stops at the first EOF, result.c:53, so a truncated prefix
passes there; here it cannot)."""

import numpy as np
import pytest

from snappytpu.bench import corpus
from snappytpu.format import constants as C
from snappytpu.model import compress, decompress, encode_block
from snappytpu.model.decode import CorruptError

CASES = corpus.edge_case_corpus()


@pytest.mark.parametrize("name", sorted(CASES))
def test_roundtrip_edge_corpus(name):
    data = CASES[name]
    comp = compress(data)
    out = decompress(comp)
    assert len(out) == len(data)
    assert out == data


@pytest.mark.parametrize("size", [500, 1000, 10000, 100000])
def test_roundtrip_size_sweep(size):
    data = corpus.mixed(size, seed=size)
    out = decompress(compress(data))
    assert out == data


def test_constant_input_compresses_hard():
    data = corpus.constant(32 * 1024)
    comp = compress(data)
    # 32 KiB of 0xFF: expect a tiny stream (preamble + literal + run of copies)
    assert len(comp) < 32 * 1024 / 15


def test_text_ratio_beats_reference_floor():
    # reference gets 1.60-1.70x on 500 B text-ish inputs (BASELINE.md);
    # our collision-free matcher must be no worse on real text.
    data = corpus.text(100000)
    comp = compress(data)
    assert len(data) / len(comp) > 1.5


def test_incompressible_expands_sublinearly():
    data = corpus.random_bytes(50000)
    comp = compress(data)
    # worst case: per-64KiB-block literal header + preamble
    assert len(comp) <= len(data) + 3 + C.MAX_PREAMBLE_LEN


def test_overlapping_copy_semantics():
    # 'abcabcabc...' forces offset-3 copies with length > offset
    data = b"abc" * 5000
    assert decompress(compress(data)) == data


def test_empty_stream():
    comp = compress(b"")
    assert comp == b"\x00"
    assert decompress(comp) == b""


def test_encode_block_rejects_oversize():
    with pytest.raises(ValueError):
        encode_block(np.zeros(C.MAX_BLOCK_SIZE + 1, dtype=np.uint8))


def test_corrupt_streams_rejected():
    data = corpus.text(5000)
    comp = bytearray(compress(data))
    # truncate
    with pytest.raises(CorruptError):
        decompress(bytes(comp[: len(comp) // 2]))
    # declared length longer than ops produce
    with pytest.raises((CorruptError, ValueError)):
        decompress(b"\xFF\xFF\x7F" + bytes(comp[1:]))


def test_copy_offset_zero_rejected():
    # preamble=4, literal len1 'A', then copy2 len4 offset0
    bad = bytes([4, 0 << 2, ord("A"), (3 << 2) | C.TAG_COPY2, 0, 0])
    with pytest.raises(CorruptError):
        decompress(bad)
