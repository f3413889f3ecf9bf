"""Raw-byte payload extension: embed/extract arbitrary files."""

import numpy as np
import pytest

from stegotpu import crypto, fixtures
from stegotpu.config import StegoConfig
from stegotpu.payload import RAW_DATA_DIMS, parse_payload_bits, seal_payload
from stegotpu.pipeline import embed_data_in_video, extract_image_from_video


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    fixtures.make_cover_video(d / "cover.mp4", 320, 240, frames=10)
    priv, pub_c = crypto.setup_receiver_keys(d / "k.pem", d / "p.pem")
    return d, priv, pub_c


def test_raw_marker_roundtrips_wire_format():
    _, pub = crypto.generate_keypair()
    pub_c = crypto.serialize_public_compressed(pub)
    bits, parts = seal_payload(b"hello world" * 10, *RAW_DATA_DIMS, pub_c)
    parsed, _ = parse_payload_bits(bits)
    assert parsed.is_raw_data
    assert parsed == parts


def test_embed_extract_arbitrary_bytes(env, rng, tmp_path):
    d, priv, pub_c = env
    data = rng.integers(0, 256, 1500, dtype=np.uint8).tobytes()
    res = embed_data_in_video(d / "cover.mp4", data, tmp_path / "st", pub_c,
                              StegoConfig(), batch_frames=4)
    assert res.success
    out = tmp_path / "recovered.bin"
    ext = extract_image_from_video(res.output_path, priv, StegoConfig(), out,
                                   batch_frames=4)
    assert ext.success, ext.error
    assert ext.is_raw_data
    assert ext.hash_ok
    assert ext.data == data
    assert out.read_bytes() == data
    assert ext.pixels is None


def test_cli_embed_data_roundtrip(env, rng, tmp_path, monkeypatch, capsys):
    from stegotpu.cli import main

    d, priv, pub_c = env
    monkeypatch.chdir(tmp_path)
    payload = b"arbitrary \x00 binary \xff payload" * 20
    (tmp_path / "blob.bin").write_bytes(payload)
    rc = main(["embed-data", str(d / "cover.mp4"), "blob.bin", "st",
               "--public-key", str(d / "p.pem"), "--batch", "4"])
    assert rc == 0
    rc = main(["extract", "st.avi", "out.bin",
               "--private-key", str(d / "k.pem"), "--batch", "4"])
    assert rc == 0
    assert "bytes of raw data" in capsys.readouterr().out
    assert (tmp_path / "out.bin").read_bytes() == payload
