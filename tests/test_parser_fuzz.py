"""Fuzz the payload parser: arbitrary bit garbage must produce only
NeedMoreBits or ValueError — never a crash, hang, or silent success with
absurd allocations."""

import numpy as np
import pytest

from stegotpu.payload import NeedMoreBits, parse_header_bits, parse_payload_bits


@pytest.mark.parametrize("seed", range(20))
def test_random_bits_never_crash(seed):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, 4000).astype(np.uint8)
    for parser in (parse_payload_bits, parse_header_bits):
        try:
            parser(bits)
        except (NeedMoreBits, ValueError):
            pass


@pytest.mark.parametrize("pattern", ["zeros", "ones", "alt"])
def test_degenerate_bit_patterns(pattern):
    n = 3000
    if pattern == "zeros":
        bits = np.zeros(n, np.uint8)
    elif pattern == "ones":
        bits = np.ones(n, np.uint8)
    else:
        bits = (np.arange(n) % 2).astype(np.uint8)
    for parser in (parse_payload_bits, parse_header_bits):
        try:
            parser(bits)
        except (NeedMoreBits, ValueError):
            pass


def test_truncation_at_every_field_boundary(rng):
    """Cut a valid payload at many lengths: every cut must raise NeedMoreBits
    (or parse successfully once complete), never anything else."""
    from stegotpu import crypto
    from stegotpu.payload import seal_payload

    _, pub = crypto.generate_keypair()
    bits, _ = seal_payload(b"x" * 64, 8, 8,
                           crypto.serialize_public_compressed(pub))
    for cut in list(range(1, 1100, 7)) + [bits.size - 1, bits.size]:
        try:
            parts, consumed = parse_payload_bits(bits[:cut])
            assert cut >= consumed
        except NeedMoreBits:
            assert cut < bits.size
        except ValueError:
            pytest.fail(f"valid-prefix cut at {cut} raised ValueError")
