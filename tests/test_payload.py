"""Wire-format tests: field layout, 976-bit fixed header, seal/parse/open
round-trip, incremental parsing (NeedMoreBits), garbage-tail tolerance."""

import numpy as np
import pytest

from stegotpu import crypto
from stegotpu.bitstream import bits_to_int, bits_to_string
from stegotpu.payload import (
    FIXED_HEADER_BITS,
    NeedMoreBits,
    PayloadParts,
    build_payload_bits,
    dims_header_bits,
    open_payload,
    parse_dims_header,
    parse_payload_bits,
    seal_payload,
)


def _standard_parts(ct_len=64):
    return PayloadParts(
        secret_width=64,
        secret_height=48,
        sender_pub_compressed=b"\x02" + b"\xab" * 32,
        hkdf_salt=b"\x11" * 16,
        sha3_hash=b"\x22" * 32,
        nonce=b"\x33" * 12,
        tag=b"\x44" * 16,
        ciphertext=bytes(range(256))[:ct_len],
    )


def test_fixed_header_is_976_bits():
    assert FIXED_HEADER_BITS == 976  # reference hardcodes this (extract_process.py:53)
    parts = _standard_parts(ct_len=0)
    assert build_payload_bits(parts).size == FIXED_HEADER_BITS


def test_dims_header_layout():
    bits = dims_header_bits(1280, 720)
    assert bits.size == 32
    # big-endian 16-bit fields (reference: helpers.py:97-102)
    assert bits_to_string(bits) == format(1280, "016b") + format(720, "016b")
    assert parse_dims_header(bits) == (1280, 720)


def test_dims_out_of_range():
    with pytest.raises(ValueError):
        dims_header_bits(65536, 1)
    with pytest.raises(ValueError):
        parse_dims_header(np.zeros(16, np.uint8))


def test_field_order_on_wire():
    parts = _standard_parts()
    bits = build_payload_bits(parts)
    # width(16) height(16) len_pub(8)=33 ...
    assert bits_to_int(bits[0:16]) == 64
    assert bits_to_int(bits[16:32]) == 48
    assert bits_to_int(bits[32:40]) == 33
    off = 40 + 33 * 8
    assert bits_to_int(bits[off : off + 8]) == 16  # len salt
    off += 8 + 16 * 8
    assert bits_to_int(bits[off : off + 8]) == 32  # len hash
    off += 8 + 32 * 8
    assert bits_to_int(bits[off : off + 8]) == 12  # len nonce
    off += 8 + 12 * 8
    assert bits_to_int(bits[off : off + 8]) == 16  # len tag
    off += 8 + 16 * 8
    assert bits_to_int(bits[off : off + 32]) == len(parts.ciphertext)
    assert off + 32 == FIXED_HEADER_BITS


def test_build_parse_roundtrip():
    parts = _standard_parts()
    bits = build_payload_bits(parts)
    parsed, consumed = parse_payload_bits(bits)
    assert parsed == parts
    assert consumed == bits.size


def test_parse_tolerates_garbage_tail(rng):
    """The extractor always over-reads frame capacity; excess bits must be
    ignored (reference: extract_process.py:167-188)."""
    parts = _standard_parts()
    bits = build_payload_bits(parts)
    noisy = np.concatenate([bits, rng.integers(0, 2, 5000).astype(np.uint8)])
    parsed, consumed = parse_payload_bits(noisy)
    assert parsed == parts
    assert consumed == bits.size


def test_parse_incremental_needs_more():
    parts = _standard_parts(ct_len=1000)
    bits = build_payload_bits(parts)
    with pytest.raises(NeedMoreBits):
        parse_payload_bits(bits[: FIXED_HEADER_BITS + 100])
    with pytest.raises(NeedMoreBits):
        parse_payload_bits(bits[:500])


def test_parse_zero_dims_rejected():
    parts = _standard_parts()
    bits = build_payload_bits(parts)
    bits[:32] = 0  # zero both dims (reference: extract_process.py:99)
    with pytest.raises(ValueError):
        parse_payload_bits(bits)


def test_seal_open_roundtrip():
    bob_priv, bob_pub = crypto.generate_keypair()
    bob_pub_c = crypto.serialize_public_compressed(bob_pub)
    img = bytes(range(256)) * 4  # 32x32 image bytes
    bits, parts = seal_payload(img, 32, 32, bob_pub_c)
    assert parts.secret_width == 32
    assert len(parts.ciphertext) == len(img)  # GCM: ct length == pt length
    parsed, _ = parse_payload_bits(bits)
    assert parsed == parts
    plaintext, hash_ok = open_payload(parsed, bob_priv)
    assert plaintext == img
    assert hash_ok


def test_open_with_wrong_key_fails_auth():
    bob_priv, bob_pub = crypto.generate_keypair()
    mallory_priv, _ = crypto.generate_keypair()
    bits, parts = seal_payload(b"\x00" * 64, 8, 8, crypto.serialize_public_compressed(bob_pub))
    plaintext, hash_ok = open_payload(parts, mallory_priv)
    assert plaintext is None
    assert not hash_ok
