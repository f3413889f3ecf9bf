"""Wire-format edge stress: nonstandard field sizes, multi-frame headers,
zero-length fields (VERDICT r1 #8).

The reference hardcodes the 976-bit header threshold
(extract_process.py:50-53) and so only supports the standard field sizes;
stegotpu's parser is length-driven (payload.py) and must genuinely handle
the nonstandard cases end-to-end, not just in unit parses.
"""

import numpy as np
import pytest

from stegotpu import crypto, fixtures, payload as payload_mod
from stegotpu.config import StegoConfig
from stegotpu.image import load_image_gray
from stegotpu.pipeline import embed_image_in_video, extract_image_from_video


@pytest.fixture(scope="module")
def keys(tmp_path_factory):
    d = tmp_path_factory.mktemp("keys")
    return crypto.setup_receiver_keys(d / "priv.pem", d / "pub.pem")


def _media(tmp_path, w, h, frames, secret=12):
    fixtures.make_secret_image(tmp_path / "secret.png", secret, secret,
                              kind="pattern")
    fixtures.make_cover_video(tmp_path / "cover.mp4", w, h, frames=frames,
                              kind="moving")
    return tmp_path


def test_nonstandard_dims_bits_end_to_end(keys, tmp_path):
    """dims_bits=24 changes the header length (992 bits != the reference's
    hardcoded 976); both sides must agree, and the length-driven parser must
    handle it through the full file-to-file pipeline."""
    priv, pub_c = keys
    media = _media(tmp_path, 320, 240, 6)
    cfg = StegoConfig(delta=20, num_ac_coeffs=10, dims_bits=24)
    res = embed_image_in_video(media / "cover.mp4", media / "secret.png",
                               tmp_path / "stego", pub_c, cfg, batch_frames=3)
    assert res.success
    ext = extract_image_from_video(res.output_path, priv, cfg, batch_frames=3)
    assert ext.success and ext.hash_ok
    np.testing.assert_array_equal(
        ext.pixels, load_image_gray(media / "secret.png"))

    # and a dims_bits-mismatched receiver fails CLOSED (shifted fields make
    # the pubkey/salt/nonce garbage -> structured error, never an exception)
    wrong = extract_image_from_video(
        res.output_path, priv, StegoConfig(delta=20, num_ac_coeffs=10),
        batch_frames=3,
    )
    assert not wrong.success and wrong.error


def test_header_spans_three_plus_frames(keys, tmp_path):
    """A cover so small (64x40 -> 8*5*4 = 160 bits/frame at N=4) that the
    976-bit fixed header alone spans 7 frames; the incremental NeedMoreBits
    parse must keep reading across them."""
    priv, pub_c = keys
    media = _media(tmp_path, 64, 40, 60, secret=8)
    cfg = StegoConfig(delta=20, num_ac_coeffs=4)
    cap = cfg.frame_capacity_bits(40, 64)
    assert payload_mod.FIXED_HEADER_BITS > 3 * cap  # the premise

    res = embed_image_in_video(media / "cover.mp4", media / "secret.png",
                               tmp_path / "stego", pub_c, cfg, batch_frames=4)
    assert res.success
    assert res.frames_used >= 7
    ext = extract_image_from_video(res.output_path, priv, cfg, batch_frames=4)
    assert ext.success and ext.hash_ok
    np.testing.assert_array_equal(
        ext.pixels, load_image_gray(media / "secret.png"))


def test_zero_length_fields_parse_and_fail_closed():
    """A syntactically valid header may declare 0-length fields; the parser
    must consume it without crashing, and decryption must fail cleanly (an
    empty 'compressed point' is invalid)."""
    parts = payload_mod.PayloadParts(
        secret_width=4, secret_height=4,
        sender_pub_compressed=b"", hkdf_salt=b"", sha3_hash=b"",
        nonce=b"", tag=b"", ciphertext=b"\xab" * 16,
    )
    bits = payload_mod.build_payload_bits(parts)
    back, consumed = payload_mod.parse_payload_bits(bits)
    assert consumed == bits.size
    assert back == parts

    priv, _ = crypto.generate_keypair()
    with pytest.raises(ValueError):
        payload_mod.open_payload(back, priv)


def test_one_pixel_secret_end_to_end(keys, tmp_path):
    """Minimal payload: 1x1 secret (8-bit ciphertext)."""
    priv, pub_c = keys
    fixtures.make_secret_image(tmp_path / "s.png", 1, 1, kind="gray")
    fixtures.make_cover_video(tmp_path / "cover.mp4", 320, 240, frames=2,
                              kind="moving")
    cfg = StegoConfig()
    res = embed_image_in_video(tmp_path / "cover.mp4", tmp_path / "s.png",
                               tmp_path / "stego", pub_c, cfg)
    assert res.success and res.total_payload_bits == 976 + 8
    ext = extract_image_from_video(res.output_path, priv, cfg)
    assert ext.success
    np.testing.assert_array_equal(ext.pixels,
                                  load_image_gray(tmp_path / "s.png"))


def test_delta_zero_extract_reads_all_zero_bits(rng):
    """Reference parity: delta <= 0 appends '0' per slot during extraction
    (config_and_setup.py:143-145); must be explicit, not a NaN cast."""
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import extract_frames_pallas
    from stegotpu.ops.qim import extract_frames

    frames = jnp.asarray(rng.integers(0, 256, (2, 16, 128), dtype=np.uint8))
    for fn in (extract_frames, extract_frames_pallas):
        out = np.asarray(fn(frames, jnp.float32(0.0), 10))
        assert out.shape == (2, 2 * 16 * 10)
        np.testing.assert_array_equal(out, 0)


@pytest.mark.parametrize("codec", ["HFYU", "RGBA"])
def test_alternate_lossless_codecs_end_to_end(keys, tmp_path, codec):
    """--codec HFYU/RGBA: faster lossless containers (FFV1 is ~0.2-0.45
    core-seconds per 1080p frame, benchmarks/ffv1_host.py); the stego must
    stay pixel-exact and extraction auto-detects the codec."""
    priv, pub_c = keys
    media = _media(tmp_path, 320, 240, 6)
    cfg = StegoConfig(codec=codec)
    res = embed_image_in_video(media / "cover.mp4", media / "secret.png",
                               tmp_path / "stego", pub_c, cfg, batch_frames=3)
    assert res.success
    ext = extract_image_from_video(res.output_path, priv, StegoConfig(),
                                   batch_frames=3)
    assert ext.success and ext.hash_ok, ext.error
    np.testing.assert_array_equal(
        ext.pixels, load_image_gray(media / "secret.png"))
