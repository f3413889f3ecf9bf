"""Serving daemon: warm-process embed/extract/inspect over local HTTP.

Runs make_server() in-process on a free port; requests use stdlib urllib.
Covers the success path (embed -> inspect -> extract, pixel identity), the
structured-error paths (bad delta -> 422, missing field -> 400, unknown
route -> 404), and that the daemon survives request errors.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from stegotpu import crypto, fixtures
from stegotpu.image import load_image_gray
from stegotpu.server import make_server


@pytest.fixture
def server():
    srv = make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_embed_inspect_extract_roundtrip(server, tmp_path):
    fixtures.make_secret_image(tmp_path / "s.png", 24, 24, kind="noise", seed=2)
    fixtures.make_cover_video(tmp_path / "c.mp4", 160, 128, frames=8,
                              kind="moving", seed=3)
    crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")

    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["ok"]

    code, out = _post(server, "/embed", {
        "cover": str(tmp_path / "c.mp4"), "secret": str(tmp_path / "s.png"),
        "output": str(tmp_path / "st"), "public_key": str(tmp_path / "p.pem"),
    })
    assert code == 200 and out["success"], out
    assert out["frames_used"] == 8 and out["first_frame_psnr_db"] > 25

    code, out = _post(server, "/inspect", {"stego": str(tmp_path / "st.avi")})
    assert code == 200 and out["payload_type"] == "image"
    assert (out["secret_width"], out["secret_height"]) == (24, 24)

    code, out = _post(server, "/extract", {
        "stego": str(tmp_path / "st.avi"), "output": str(tmp_path / "out.png"),
        "private_key": str(tmp_path / "k.pem"),
    })
    assert code == 200 and out["success"] and out["hash_ok"], out
    np.testing.assert_array_equal(load_image_gray(tmp_path / "out.png"),
                                  load_image_gray(tmp_path / "s.png"))

    # wrong delta: structured 422, daemon stays alive
    code, out = _post(server, "/extract", {
        "stego": str(tmp_path / "st.avi"),
        "private_key": str(tmp_path / "k.pem"), "delta": 19,
    })
    assert code == 422 and not out["success"] and "error" in out

    # missing field -> 400; unknown route -> 404; still healthy after all
    code, out = _post(server, "/embed", {
        "secret": "x.png", "public_key": str(tmp_path / "p.pem")})
    assert code == 400 and "missing required field" in out["error"]
    code, _ = _post(server, "/nope", {})
    assert code == 404
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        assert r.status == 200


def test_serve_capacity_and_steganalyze(server, tmp_path):
    fixtures.make_secret_image(tmp_path / "s.png", 48, 48, kind="noise", seed=2)
    fixtures.make_cover_video(tmp_path / "c.mp4", 320, 240, frames=6,
                              kind="moving", seed=3)
    crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    code, out = _post(server, "/capacity", {"video": str(tmp_path / "c.mp4")})
    assert code == 200 and out["qim_bits_per_frame"] == 30 * 40 * 10

    code, out = _post(server, "/embed", {
        "cover": str(tmp_path / "c.mp4"), "secret": str(tmp_path / "s.png"),
        "output": str(tmp_path / "st"), "public_key": str(tmp_path / "p.pem"),
    })
    assert code == 200 and out["success"]
    code, out = _post(server, "/steganalyze",
                      {"video": str(tmp_path / "st.avi")})
    assert code == 200 and out["detected"]
    assert out["estimated_delta"] == 20


def test_serve_rejects_cross_origin_shapes(server):
    """Browser-reachable request shapes are refused: no/simple Content-Type
    -> 415 (forces a CORS preflight that is never granted), foreign Host
    header -> 403 (DNS rebinding)."""
    req = urllib.request.Request(
        server + "/inspect", data=b'{"stego":"x"}',
        headers={"Content-Type": "text/plain"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 415

    req = urllib.request.Request(
        server + "/inspect", data=b'{"stego":"x"}',
        headers={"Content-Type": "application/json",
                 "Host": "evil.example.com"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 403


def test_serve_host_header_bracket_aware(server):
    """Bracketed IPv6 and port-suffixed Host headers must pass the
    rebinding check (advisor r3: rsplit(':') mangled '[::1]' into '[::'
    and 403'd a legitimate loopback client)."""
    for host in ("[::1]", "[::1]:8752", "localhost:1234", "127.0.0.1:80"):
        req = urllib.request.Request(
            server + "/inspect", data=b'{"stego": "/nonexistent.avi"}',
            headers={"Content-Type": "application/json", "Host": host},
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        # 400 = past the host check into the handler (file missing); a 403
        # would mean the allowed loopback Host form was rejected
        assert e.value.code == 400, host
    # the rebinding check itself still fires, bracketed or not
    for host in ("evil.example.com:80", "[2001:db8::1]"):
        req = urllib.request.Request(
            server + "/inspect", data=b'{"stego": "x"}',
            headers={"Content-Type": "application/json", "Host": host},
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 403, host


def test_serve_extract_auto_params_recovery(server, tmp_path):
    """/extract {"auto_params": true} recovers non-default delta/coeffs via
    steganalysis and reports them (mirror of `extract --auto-params`)."""
    fixtures.make_secret_image(tmp_path / "s.png", 48, 48, kind="noise",
                               seed=7)
    fixtures.make_cover_video(tmp_path / "c.mp4", 320, 240, frames=8,
                              kind="moving", seed=8)
    crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    code, out = _post(server, "/embed", {
        "cover": str(tmp_path / "c.mp4"), "secret": str(tmp_path / "s.png"),
        "output": str(tmp_path / "st"), "public_key": str(tmp_path / "p.pem"),
        "delta": 32, "coeffs": 3,
    })
    assert code == 200 and out["success"], out

    base = {"stego": str(tmp_path / "st.avi"),
            "output": str(tmp_path / "x.png"),
            "private_key": str(tmp_path / "k.pem")}
    code, out = _post(server, "/extract", base)  # defaults 20/10: fails
    assert not out["success"]
    code, out = _post(server, "/extract", {**base, "auto_params": True})
    assert code == 200 and out["success"], out
    assert out["recovered_params"] == {"delta": 32, "coeffs": 3}
    secret = np.array(load_image_gray(tmp_path / "s.png"))
    np.testing.assert_array_equal(load_image_gray(tmp_path / "x.png"), secret)


def test_serve_with_encrypted_key_env_passphrase(server, tmp_path,
                                                 monkeypatch):
    """The daemon extracts with an at-rest-encrypted private PEM, decrypted
    via STEGOTPU_KEY_PASSPHRASE (genkey --passphrase deployment shape)."""
    monkeypatch.setenv("STEGOTPU_KEY_PASSPHRASE", "daemon-secret")
    fixtures.make_secret_image(tmp_path / "s.png", 24, 24, kind="noise",
                               seed=4)
    fixtures.make_cover_video(tmp_path / "c.mp4", 160, 128, frames=8,
                              kind="moving", seed=5)
    crypto.setup_receiver_keys(tmp_path / "ek.pem", tmp_path / "ep.pem",
                               b"daemon-secret")
    assert b"ENCRYPTED" in (tmp_path / "ek.pem").read_bytes()

    code, out = _post(server, "/embed", {
        "cover": str(tmp_path / "c.mp4"), "secret": str(tmp_path / "s.png"),
        "output": str(tmp_path / "st"), "public_key": str(tmp_path / "ep.pem"),
    })
    assert code == 200 and out["success"], out
    code, out = _post(server, "/extract", {
        "stego": str(tmp_path / "st.avi"),
        "output": str(tmp_path / "x.png"),
        "private_key": str(tmp_path / "ek.pem"),
    })
    assert code == 200 and out["success"], out
    np.testing.assert_array_equal(load_image_gray(tmp_path / "x.png"),
                                  load_image_gray(tmp_path / "s.png"))


def test_serve_wildcard_bind_accepts_any_host():
    """A 0.0.0.0/:: bind deliberately exposes the daemon on every
    interface; clients then send whatever address they reached it by, so
    the anti-rebinding Host allowlist is disabled there (round-5 review
    fix: the literal allowlist 403'd every legitimate remote client)."""
    srv = make_server(host="0.0.0.0", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inspect",
            data=b'{"stego": "/nonexistent.avi"}',
            headers={"Content-Type": "application/json",
                     "Host": "192.168.1.5:8752"},
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        # 400 = past the host check into the handler (file missing); the
        # old behavior was a 403 for any Host not literally '0.0.0.0'
        assert e.value.code == 400
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)
