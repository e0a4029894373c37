"""RS256 node keypairs — pure-python RSA (datahub_spark.rsa), NodeKeys
lifecycle, RS256 token issuance/verification, the OAuth2 JWT-bearer
client-assertion grant and node-to-node auth over HTTP.

Reference parity: internal/server/rsautils.go (PEM formats),
internal/security/manager.go:204-257 (load-or-generate node_key files),
:310-331 (CreateJWTForTokenRequest), :398-400 (active keypair),
:428-477 (ValidateClientJWTMakeJWTAccessToken),
internal/security/nodeprovider.go (remote assertion exchange)."""

from __future__ import annotations

import json
import shutil
import subprocess
import time
import urllib.parse
import urllib.request

import pytest

from datahub_spark import rsa
from datahub_spark import store as S
from datahub_spark.providers import ProviderConfig, ProviderStore
from datahub_spark.script import SCRIPT_OUTPUT_SCHEMA
from datahub_spark.security import (
    AccessControl, AuthError, NodeKeys, SecurityManager,
    jwt_sign_rs256, jwt_unverified_claims, jwt_verify_rs256,
)
from datahub_spark.server import UdaServer

BITS = 1024  # test-speed keys; the product default is 2048


@pytest.fixture(scope="module")
def keypair():
    return rsa.generate_keypair(BITS)


# -- RSA primitives --------------------------------------------------------

def test_sign_verify_and_tamper(keypair):
    priv, pub = keypair
    msg = b"the quick brown fox"
    sig = rsa.sign_sha256(msg, priv)
    assert len(sig) == pub.byte_size
    assert rsa.verify_sha256(msg, sig, pub)
    assert not rsa.verify_sha256(msg + b"!", sig, pub)
    flipped = bytearray(sig)
    flipped[0] ^= 0x01
    assert not rsa.verify_sha256(msg, bytes(flipped), pub)
    assert not rsa.verify_sha256(msg, sig[:-1], pub)  # wrong length
    other_priv, _ = rsa.generate_keypair(BITS)
    assert not rsa.verify_sha256(
        msg, rsa.sign_sha256(msg, other_priv), pub)


def test_pem_roundtrip_both_labels(keypair):
    priv, pub = keypair
    assert rsa.private_key_from_pem(rsa.private_key_to_pem(priv)) == priv
    # reference writes PKIX bytes as "RSA PUBLIC KEY" (rsautils.go:55)
    assert rsa.public_key_from_pem(rsa.public_key_to_pem(pub)) == pub
    assert rsa.public_key_from_pem(
        rsa.public_key_to_pem(pub, label="PUBLIC KEY")) == pub
    with pytest.raises(ValueError):
        rsa.private_key_from_pem(rsa.public_key_to_pem(pub))
    with pytest.raises(ValueError):
        rsa.public_key_from_pem("not pem at all")


def test_keypair_arithmetic(keypair):
    priv, pub = keypair
    assert priv.n == priv.p * priv.q
    assert priv.n.bit_length() == BITS
    assert pub.e == 65537
    m = 0x1234567890ABCDEF
    assert pow(pow(m, priv.e, priv.n), priv.d, priv.n) == m


@pytest.mark.skipif(shutil.which("openssl") is None,
                    reason="no openssl binary for interop check")
def test_openssl_interop(tmp_path, keypair):
    """Cross-implementation evidence: our PEM parses under openssl, our
    signatures verify there, and vice versa."""
    priv, pub = keypair
    (tmp_path / "k.pem").write_text(rsa.private_key_to_pem(priv))
    (tmp_path / "p.pem").write_text(
        rsa.public_key_to_pem(pub, label="PUBLIC KEY"))
    (tmp_path / "msg").write_bytes(b"interop message")
    (tmp_path / "sig").write_bytes(rsa.sign_sha256(b"interop message", priv))
    assert subprocess.run(
        ["openssl", "rsa", "-in", str(tmp_path / "k.pem"), "-check",
         "-noout"], capture_output=True).returncode == 0
    assert subprocess.run(
        ["openssl", "dgst", "-sha256", "-verify", str(tmp_path / "p.pem"),
         "-signature", str(tmp_path / "sig"), str(tmp_path / "msg")],
        capture_output=True).returncode == 0
    subprocess.run(
        ["openssl", "dgst", "-sha256", "-sign", str(tmp_path / "k.pem"),
         "-out", str(tmp_path / "sig2"), str(tmp_path / "msg")],
        capture_output=True, check=True)
    assert rsa.verify_sha256(
        b"interop message", (tmp_path / "sig2").read_bytes(), pub)


# -- NodeKeys lifecycle ----------------------------------------------------

def test_node_keys_generate_persist_reload(tmp_path):
    loc = str(tmp_path / "sec")
    nk = NodeKeys(loc, bits=BITS)
    # the reference's file layout (manager.go:245-249)
    assert (tmp_path / "sec" / "node_key").exists()
    assert (tmp_path / "sec" / "node_key.pub").exists()
    nk2 = NodeKeys(loc, bits=BITS)
    assert nk2.private_key == nk.private_key
    assert nk2.public_keys == nk.public_keys


def test_node_keys_rotation_keeps_old_tokens_valid(tmp_path):
    loc = str(tmp_path / "sec")
    nk = NodeKeys(loc, bits=BITS)
    sm = SecurityManager(node_keys=nk, node_id="n1")
    old_tok = sm.issue_token("admin", sm.admin_secret)
    nk.rotate(bits=BITS)
    new_tok = sm.issue_token("admin", sm.admin_secret)
    assert sm.authorize(f"Bearer {old_tok}", "GET", "/x")["sub"] == "admin"
    assert sm.authorize(f"Bearer {new_tok}", "GET", "/x")["sub"] == "admin"
    assert old_tok.split(".")[2] != new_tok.split(".")[2]
    # superseded public key persisted: a fresh process still verifies
    nk2 = NodeKeys(loc, bits=BITS)
    assert len(nk2.public_keys) == 2
    jwt_verify_rs256(old_tok, nk2.public_keys)
    jwt_verify_rs256(new_tok, nk2.public_keys)
    # but new signatures come from the ACTIVE pair = first in list
    jwt_verify_rs256(new_tok, nk2.public_keys[:1])
    with pytest.raises(AuthError):
        jwt_verify_rs256(old_tok, nk2.public_keys[:1])


# -- RS256 manager flows ---------------------------------------------------

def test_rs256_tokens_and_alg_pinning(tmp_path):
    nk = NodeKeys(str(tmp_path / "sec"), bits=BITS)
    sm = SecurityManager(node_keys=nk, node_id="n1")
    tok = sm.issue_token("admin", sm.admin_secret)
    header = json.loads(__import__("base64").urlsafe_b64decode(
        tok.split(".")[0] + "=="))
    assert header["alg"] == "RS256"
    # an HS256 token (even one keyed with material an attacker can
    # know) must NOT pass an RS256 verifier — alg confusion pinned
    from datahub_spark.security import jwt_sign
    forged = jwt_sign({"sub": "admin", "roles": ["admin"],
                       "exp": int(time.time()) + 60}, b"guessed")
    with pytest.raises(AuthError):
        sm.authorize(f"Bearer {forged}", "GET", "/x")
    with pytest.raises(AuthError):
        jwt_verify_rs256(tok, nk.public_keys, now=time.time() + 16 * 60)


def test_client_assertion_grant(tmp_path):
    nk = NodeKeys(str(tmp_path / "sec"), bits=BITS)
    sm = SecurityManager(node_keys=nk, node_id="n1")
    cpriv, cpub = rsa.generate_keypair(BITS)
    sm.register_client({"ClientId": "peer",
                        "PublicKey": rsa.public_key_to_pem(cpub)})
    sm.set_acls("peer", [AccessControl("/datasets/*", "read")])
    now = int(time.time())
    assertion = jwt_sign_rs256(
        {"sub": "peer", "aud": "node:n1", "exp": now + 60, "iat": now},
        cpriv)
    access = sm.exchange_client_assertion(assertion)
    claims = sm.authorize(f"Bearer {access}", "GET", "/datasets/d/entities")
    assert claims["sub"] == "peer" and claims["roles"] == ["client"]
    # assertion signed by the wrong key -> 401
    wrong, _ = rsa.generate_keypair(BITS)
    bad = jwt_sign_rs256({"sub": "peer", "exp": now + 60}, wrong)
    with pytest.raises(AuthError, match="invalid client jwt"):
        sm.exchange_client_assertion(bad)
    # unknown subject -> 401
    with pytest.raises(AuthError):
        sm.exchange_client_assertion(
            jwt_sign_rs256({"sub": "ghost", "exp": now + 60}, cpriv))
    # a key-only client has no usable shared secret
    with pytest.raises(AuthError):
        sm.issue_token("peer", "")


def test_create_jwt_for_token_request(tmp_path):
    nk = NodeKeys(str(tmp_path / "sec"), bits=BITS)
    sm = SecurityManager(node_keys=nk, node_id="nodeB")
    assertion = sm.create_jwt_for_token_request("node:nodeA")
    claims = jwt_verify_rs256(assertion, nk.public_keys)
    # manager.go:313-318 — 1-minute expiry, unique id, node subject
    assert claims["sub"] == "nodeB"
    assert claims["aud"] == "node:nodeA"
    assert claims["exp"] - claims["iat"] == 60
    assert len(claims["jti"]) >= 16
    sm_plain = SecurityManager()
    with pytest.raises(AuthError):
        sm_plain.create_jwt_for_token_request("x")


# -- node-to-node over HTTP ------------------------------------------------

def _get(url, token):
    req = urllib.request.Request(
        url, headers={"Authorization": f"Bearer {token}"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read().decode())


def test_node_to_node_rs256_over_http(spark, tmp_path):
    """Node B authenticates to node A exactly like the reference:
    B mints an RS256 client assertion with its own node key, posts the
    JWT-bearer grant to A's /security/token, and uses the returned
    node-A-signed access token to read a dataset (nodeprovider.go:82-129
    against securityhandler.go:85-116)."""
    store = S.EntityStore(spark, str(tmp_path / "storeA"))
    df = spark.createDataFrame(
        [("e:1", None, 0, False, {"p:name": "one"}, None, None)],
        SCRIPT_OUTPUT_SCHEMA).drop("dataset")
    store.store_entities("d", df)

    keys_a = NodeKeys(str(tmp_path / "secA"), bits=BITS)
    sm_a = SecurityManager(node_keys=keys_a, node_id="nodeA")
    srv = UdaServer(store, security=sm_a)
    base = srv.start()
    try:
        # node B's identity
        keys_b = NodeKeys(str(tmp_path / "secB"), bits=BITS)
        sm_b = SecurityManager(node_keys=keys_b, node_id="nodeB")
        # A registers B's PUBLIC key and grants read on the dataset
        sm_a.register_client({"ClientId": "nodeB",
                              "PublicKey": keys_b.public_key_pem()})
        sm_a.set_acls("nodeB", [AccessControl("/datasets/*", "read")])

        # B's outgoing nodebearer provider does the remote exchange
        ps = ProviderStore(security_manager=sm_b)
        ps.add(ProviderConfig.from_json({
            "name": "toA", "type": "nodebearer",
            "audience": {"type": "text", "value": "node:nodeA"},
            "endpoint": {"type": "text",
                         "value": f"{base}/security/token"}}))
        provider = ps.provider("toA")
        token = provider.bearer_token()
        # the access token is node-A-signed RS256 for subject nodeB
        claims = jwt_verify_rs256(token, keys_a.public_keys)
        assert claims["sub"] == "nodeB" and claims["roles"] == ["client"]
        # cached until expiry (nodeprovider.go:66-80)
        assert provider.bearer_token() == token

        code, body = _get(f"{base}/datasets/d/entities", token)
        assert code == 200
        assert [e for e in body if e.get("id") == "e:1"]

        # write is not granted
        req = urllib.request.Request(
            f"{base}/datasets/d/entities", data=b"[]", method="POST",
            headers={"Authorization": f"Bearer {token}",
                     "Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 403

        # an unregistered node's assertion is refused at the exchange
        keys_c = NodeKeys(str(tmp_path / "secC"), bits=BITS)
        sm_c = SecurityManager(node_keys=keys_c, node_id="nodeC")
        form = urllib.parse.urlencode({
            "grant_type": "client_credentials",
            "client_assertion_type":
                "urn:ietf:params:oauth:grant-type:jwt-bearer",
            "client_assertion":
                sm_c.create_jwt_for_token_request("node:nodeA"),
        }).encode()
        req = urllib.request.Request(
            f"{base}/security/token", data=form, method="POST",
            headers={"Content-Type":
                     "application/x-www-form-urlencoded"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 401
    finally:
        srv.stop()


def test_unverified_claims_is_routing_only():
    claims = jwt_unverified_claims(
        jwt_sign_rs256({"sub": "x"}, rsa.generate_keypair(BITS)[0]))
    assert claims == {"sub": "x"}
    with pytest.raises(AuthError):
        jwt_unverified_claims("garbage")


# -- property tests --------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=0, max_size=4096))
def test_property_sign_verify_roundtrip(msg):
    priv, pub = _PROP_KEYS
    sig = rsa.sign_sha256(msg, priv)
    assert rsa.verify_sha256(msg, sig, pub)
    assert not rsa.verify_sha256(msg + b"x", sig, pub)


@settings(max_examples=50, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.dictionaries(st.text(min_size=1, max_size=8),
                       st.one_of(st.text(max_size=16), st.integers(
                           min_value=-2**31, max_value=2**31)),
                       max_size=6))
def test_property_jwt_rs256_claims_roundtrip(claims):
    priv, _ = _PROP_KEYS
    nk_pubs = [priv.public_key]
    tok = jwt_sign_rs256(dict(claims, exp=2**40), priv)
    out = jwt_verify_rs256(tok, nk_pubs)
    assert out == dict(claims, exp=2**40)


_PROP_KEYS = rsa.generate_keypair(BITS)
