"""Known-answer vectors: AES-GCM (NIST CAVS), HKDF-SHA256 (RFC 5869),
SHA3-256 (FIPS 202 examples), P-256 ECDH (RFC 5903)."""

import binascii

from cryptography.hazmat.primitives.asymmetric import ec
from cryptography.hazmat.primitives.ciphers.aead import AESGCM

from stegotpu import crypto


def _h(s: str) -> bytes:
    return binascii.unhexlify(s)


def test_aes_256_gcm_nist_vector():
    # NIST CAVS gcmEncryptExtIV256.rsp, Keylen=256, IVlen=96, PTlen=128, AADlen=0
    key = _h("31bdadd96698c204aa9ce1448ea94ae1fb4a9a0b3c9d773b51bb1822666b8f22")
    iv = _h("0d18e06c7c725ac9e362e1ce")
    pt = _h("2db5168e932556f8089a0622981d017d")
    expected_ct = _h("fa4362189661d163fcd6a56d8bf0405a")
    expected_tag = _h("d636ac1bbedd5cc3ee727dc2ab4a9489")
    out = AESGCM(key).encrypt(iv, pt, None)
    assert out[:-16] == expected_ct
    assert out[-16:] == expected_tag
    # and through our wrapper's decrypt path
    assert crypto.aes_gcm_decrypt(expected_ct, key, iv, expected_tag) == pt


def test_hkdf_sha256_rfc5869_case1():
    # RFC 5869 A.1 — but our derive_aes_key pins info to the protocol string,
    # so test the raw HKDF primitive with the RFC vector:
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.kdf.hkdf import HKDF

    ikm = _h("0b" * 22)
    salt = _h("000102030405060708090a0b0c")
    info = _h("f0f1f2f3f4f5f6f7f8f9")
    okm = HKDF(algorithm=hashes.SHA256(), length=42, salt=salt, info=info).derive(ikm)
    assert okm == _h(
        "3cb25f25faacd57a90434f64d0362f2a2d2d0a90cf1a5a4c5db02d56ecc4c5bf"
        "34007208d5b887185865"
    )


def test_sha3_256_fips202_vectors():
    assert crypto.sha3_256(b"") == _h(
        "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a"
    )
    assert crypto.sha3_256(b"abc") == _h(
        "3a985da74fe225b2045c172d6bd390bd855f086e3e9d525b46bfe24511431532"
    )


def test_p256_ecdh_rfc5903_vector():
    # RFC 5903 section 8.1 (256-bit random ECP group)
    d_i = int("C88F01F510D9AC3F70A292DAA2316DE544E9AAB8AFE84049C62A9C57862D1433", 16)
    d_r = int("C6EF9C5D78AE012A011164ACB397CE2088685D8F06BF9BE0B283AB46476BEE53", 16)
    shared_expected = _h(
        "D6840F6B42F6EDAFD13116E0E12565202FEF8E9ECE7DCE03812464D04B9442DE"
    )
    priv_i = ec.derive_private_key(d_i, ec.SECP256R1())
    priv_r = ec.derive_private_key(d_r, ec.SECP256R1())
    assert crypto.ecdh_shared_secret(priv_i, priv_r.public_key()) == shared_expected
    assert crypto.ecdh_shared_secret(priv_r, priv_i.public_key()) == shared_expected


def test_compressed_point_known_value():
    # generator point G of P-256, compressed form is well known
    d = 1
    pub = ec.derive_private_key(d, ec.SECP256R1()).public_key()
    assert crypto.serialize_public_compressed(pub) == _h(
        "036b17d1f2e12c4247f8bce6e563a440f277037d812deb33a0f4a13945d898c296"
    )
