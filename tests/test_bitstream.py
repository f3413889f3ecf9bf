"""Bitstream codec unit tests, including equivalence with the reference's
string-based layout (format(byte,'08b') = MSB-first big-endian)."""

import numpy as np
import pytest

from stegotpu.bitstream import (
    bits_to_bytes,
    bits_to_int,
    bits_to_string,
    bytes_to_bits,
    int_to_bits,
    pad_bits,
    string_to_bits,
)


def ref_bytes_to_bitstring(data: bytes) -> str:
    return "".join(format(b, "08b") for b in data)


def test_bytes_roundtrip(rng):
    data = rng.integers(0, 256, 257, dtype=np.uint8).tobytes()
    bits = bytes_to_bits(data)
    assert bits.dtype == np.uint8
    assert bits.size == len(data) * 8
    assert bits_to_bytes(bits) == data


def test_matches_reference_string_layout(rng):
    data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    assert bits_to_string(bytes_to_bits(data)) == ref_bytes_to_bitstring(data)


def test_bits_to_bytes_truncates_tail():
    # 10 bits -> keeps first 8 (reference: config_and_setup.py:25-30)
    bits = string_to_bits("1010101011")
    assert bits_to_bytes(bits) == bytes([0b10101010])


def test_bits_to_bytes_empty_raises():
    with pytest.raises(ValueError):
        bits_to_bytes(np.array([1, 0, 1], dtype=np.uint8))


def test_int_roundtrip():
    for val, n in [(0, 8), (255, 8), (1280, 16), (2**31 - 1, 32)]:
        bits = int_to_bits(val, n)
        assert bits.size == n
        assert bits_to_int(bits, n) == val
        assert bits_to_string(bits) == format(val, f"0{n}b")


def test_int_out_of_range():
    with pytest.raises(ValueError):
        int_to_bits(256, 8)
    with pytest.raises(ValueError):
        int_to_bits(-1, 8)


def test_bits_to_int_length_check():
    with pytest.raises(ValueError):
        bits_to_int(np.array([1, 0], dtype=np.uint8), expected_bits=8)
    with pytest.raises(ValueError):
        bits_to_int(np.array([], dtype=np.uint8))


def test_string_roundtrip(rng):
    bits = rng.integers(0, 2, 100).astype(np.uint8)
    assert np.array_equal(string_to_bits(bits_to_string(bits)), bits)


def test_pad_bits():
    bits = np.array([1, 1, 0], dtype=np.uint8)
    padded = pad_bits(bits, 8)
    assert padded.size == 8
    assert np.array_equal(padded[:3], bits)
    assert padded[3:].sum() == 0
    with pytest.raises(ValueError):
        pad_bits(padded, 4)
