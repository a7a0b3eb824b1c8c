"""Golden-byte varint tests, mirroring the reference's unit-test strategy
(test_varint.c:27-35: exact encoded bytes + encode/decode round trips)."""

import numpy as np
import pytest

from snappytpu.format.varint import (
    decode_varint,
    encode_varint,
    varint_len,
)


GOLDEN = [
    (0, bytes([0x00])),
    (1, bytes([0x01])),
    (127, bytes([0x7F])),
    (128, bytes([0x80, 0x01])),
    (227, bytes([0xE3, 0x01])),
    (16384, bytes([0x80, 0x80, 0x01])),
    (65536, bytes([0x80, 0x80, 0x04])),
    (2**32 - 1, bytes([0xFF, 0xFF, 0xFF, 0xFF, 0x0F])),
]


@pytest.mark.parametrize("value,expected", GOLDEN)
def test_golden_bytes(value, expected):
    assert encode_varint(value) == expected
    assert varint_len(value) == len(expected)


@pytest.mark.parametrize("value", [v for v, _ in GOLDEN] + [2**40, 2**62])
def test_roundtrip(value):
    buf = encode_varint(value) + b"\xAA\xBB"
    decoded, pos = decode_varint(buf)
    assert decoded == value
    assert pos == varint_len(value)


def test_large_values_beyond_reference_2gib_ceiling():
    # the reference decoder silently overflows past 2 GiB (varint.c:32-38);
    # ours must not.
    for value in [2**31, 2**31 + 12345, 5 * 2**30]:
        decoded, _ = decode_varint(encode_varint(value))
        assert decoded == value


def test_truncated_raises():
    with pytest.raises(ValueError):
        decode_varint(bytes([0x80, 0x80]))
    with pytest.raises(ValueError):
        decode_varint(b"")


def test_length_table_matches_encoding():
    values = np.array([0, 1, 127, 128, 227, 16384, 2**20, 2**33], dtype=np.int64)
    for v in values:
        assert varint_len(int(v)) == len(encode_varint(int(v)))
