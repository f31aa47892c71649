"""OIDC / JWKS (RS256) validation — mcp_trino_spark/oidc.py.

Parity target: the reference's non-hmac OAuth providers
(internal/config/config.go:72-78, 157-160; oauth_test.go:139-180;
docs/oauth.md "Native Mode" token validation: JWKS signature +
audience + expiry).  Mirrors the reference test style: table-driven
accept/reject cases over a locally generated RSA keypair and a static
``file://`` JWKS.
"""

import json
import time

import pytest
from cryptography.hazmat.primitives.asymmetric import rsa

from mcp_trino_spark.auth import JWTError, encode_hs256
from mcp_trino_spark.oidc import (
    OidcConfig,
    OidcValidator,
    default_jwks_uri,
    encode_rs256,
    jwk_from_private_key,
)

ISSUER = "https://id.example.com"
AUDIENCE = "https://mcp.example.com"


@pytest.fixture(scope="module")
def keypair():
    return rsa.generate_private_key(public_exponent=65537, key_size=2048)


@pytest.fixture(scope="module")
def other_keypair():
    return rsa.generate_private_key(public_exponent=65537, key_size=2048)


@pytest.fixture()
def jwks_file(tmp_path, keypair):
    p = tmp_path / "jwks.json"
    p.write_text(json.dumps({"keys": [jwk_from_private_key(keypair, "kid-1")]}))
    return p


@pytest.fixture()
def validator(jwks_file):
    return OidcValidator(
        OidcConfig(
            provider="okta",
            issuer=ISSUER,
            audience=AUDIENCE,
            jwks_uri=f"file://{jwks_file}",
        )
    )


def claims(**over):
    now = time.time()
    base = {"sub": "alice", "iss": ISSUER, "aud": AUDIENCE,
            "iat": now, "exp": now + 600}
    base.update(over)
    return {k: v for k, v in base.items() if v is not None}


# ---------------------------------------------------------------------------
# config fail-fast (config.go:157-160)


def test_non_hmac_provider_requires_issuer():
    with pytest.raises(ValueError, match="OIDC_ISSUER"):
        OidcConfig(provider="okta", audience=AUDIENCE)


def test_non_hmac_provider_requires_audience():
    with pytest.raises(ValueError, match="OIDC_AUDIENCE"):
        OidcConfig(provider="google", issuer=ISSUER)


def test_unknown_provider_rejected():
    with pytest.raises(ValueError, match="unknown OAUTH_PROVIDER"):
        OidcConfig(provider="keycloak", issuer=ISSUER, audience=AUDIENCE)


def test_hmac_provider_needs_no_oidc_env():
    cfg = OidcConfig(provider="hmac")
    assert not cfg.oidc_enabled


def test_from_env_reads_reference_var_names():
    cfg = OidcConfig.from_env(
        {
            "OAUTH_PROVIDER": "azure",
            "OIDC_ISSUER": ISSUER,
            "OIDC_AUDIENCE": AUDIENCE,
        }
    )
    assert cfg.oidc_enabled and cfg.issuer == ISSUER


def test_okta_jwks_path_is_not_wellknown():
    """docs/oauth.md "Issue 1": Okta keys live at /oauth2/v1/keys."""
    assert default_jwks_uri("okta", ISSUER) == f"{ISSUER}/oauth2/v1/keys"
    assert (
        default_jwks_uri("google", ISSUER) == f"{ISSUER}/.well-known/jwks.json"
    )


# ---------------------------------------------------------------------------
# happy path


def test_valid_token_accepted(validator, keypair):
    got = validator.decode(encode_rs256(claims(), keypair, "kid-1"))
    assert got["sub"] == "alice"


def test_aud_list_containing_audience_accepted(validator, keypair):
    tok = encode_rs256(claims(aud=[AUDIENCE, "other"]), keypair, "kid-1")
    assert validator.decode(tok)["sub"] == "alice"


def test_kid_optional_with_single_key_jwks(validator, keypair):
    tok = encode_rs256(claims(), keypair, kid=None)
    assert validator.decode(tok)["sub"] == "alice"


def test_authenticate_bearer_roundtrip(validator, keypair):
    tok = encode_rs256(claims(), keypair, "kid-1")
    assert validator.authenticate_bearer(f"Bearer {tok}")["sub"] == "alice"


# ---------------------------------------------------------------------------
# rejection table (oauth_test.go style)


def test_wrong_issuer_rejected(validator, keypair):
    tok = encode_rs256(claims(iss="https://evil.example.com"), keypair, "kid-1")
    with pytest.raises(JWTError, match="issuer"):
        validator.decode(tok)


def test_wrong_audience_rejected(validator, keypair):
    tok = encode_rs256(claims(aud="https://other.example.com"), keypair, "kid-1")
    with pytest.raises(JWTError, match="audience"):
        validator.decode(tok)


def test_missing_audience_rejected(validator, keypair):
    tok = encode_rs256(claims(aud=None), keypair, "kid-1")
    with pytest.raises(JWTError, match="audience"):
        validator.decode(tok)


def test_expired_rejected(validator, keypair):
    tok = encode_rs256(claims(exp=time.time() - 3600), keypair, "kid-1")
    with pytest.raises(JWTError, match="expired"):
        validator.decode(tok)


def test_nbf_in_future_rejected(validator, keypair):
    tok = encode_rs256(claims(nbf=time.time() + 3600), keypair, "kid-1")
    with pytest.raises(JWTError, match="nbf"):
        validator.decode(tok)


def test_missing_sub_rejected(validator, keypair):
    tok = encode_rs256(claims(sub=None), keypair, "kid-1")
    with pytest.raises(JWTError, match="sub"):
        validator.decode(tok)


def test_signature_from_other_key_rejected(validator, other_keypair):
    tok = encode_rs256(claims(), other_keypair, "kid-1")
    with pytest.raises(JWTError, match="signature"):
        validator.decode(tok)


def test_tampered_payload_rejected(validator, keypair):
    h, p, s = encode_rs256(claims(), keypair, "kid-1").split(".")
    evil_p = encode_rs256(claims(sub="mallory"), keypair, "kid-1").split(".")[1]
    with pytest.raises(JWTError, match="signature"):
        validator.decode(f"{h}.{evil_p}.{s}")


def test_unknown_kid_rejected(validator, keypair):
    tok = encode_rs256(claims(), keypair, "kid-rotated-away")
    with pytest.raises(JWTError, match="kid"):
        validator.decode(tok)


def test_alg_none_rejected(validator):
    import base64

    def b64(d):
        return base64.urlsafe_b64encode(json.dumps(d).encode()).rstrip(b"=").decode()

    tok = f"{b64({'alg': 'none'})}.{b64(claims())}."
    with pytest.raises(JWTError, match="alg"):
        validator.decode(tok)


def test_hs256_alg_confusion_rejected(validator, keypair):
    """Classic downgrade: an HS256 token 'signed' with public material
    must be rejected by alg pinning, never verified as HMAC."""
    tok = encode_hs256(claims(), "not-the-rsa-key")
    with pytest.raises(JWTError, match="alg"):
        validator.decode(tok)


def test_garbage_tokens_rejected(validator):
    for bad in ["", "a.b", "a.b.c.d", "üñïcode.token.here", "Bearer x"]:
        with pytest.raises(JWTError):
            validator.decode(bad)


# ---------------------------------------------------------------------------
# JWKS cache behavior


def test_key_rotation_refreshes_jwks(tmp_path, keypair, other_keypair):
    p = tmp_path / "jwks.json"
    p.write_text(json.dumps({"keys": [jwk_from_private_key(keypair, "kid-1")]}))
    v = OidcValidator(
        OidcConfig(provider="okta", issuer=ISSUER, audience=AUDIENCE,
                   jwks_uri=f"file://{p}")
    )
    t0 = time.time()
    assert (
        v.decode(encode_rs256(claims(), keypair, "kid-1"), now=t0)["sub"]
        == "alice"
    )
    # provider rotates: kid-2 replaces kid-1 → unknown kid triggers one
    # refetch and the new key validates — but only after the refetch
    # cooldown (unauthenticated random-kid requests must not be able to
    # hammer the IdP)
    p.write_text(
        json.dumps({"keys": [jwk_from_private_key(other_keypair, "kid-2")]})
    )
    tok2 = encode_rs256(claims(), other_keypair, "kid-2")
    with pytest.raises(JWTError, match="kid"):
        v.decode(tok2, now=t0 + 1)  # inside the cooldown → no refetch
    later = t0 + v.MIN_REFETCH_INTERVAL_S + 1
    tok2_later = encode_rs256(claims(iat=later, exp=later + 600),
                              other_keypair, "kid-2")
    assert v.decode(tok2_later, now=later)["sub"] == "alice"


def test_jwks_without_rsa_keys_fails_loudly(tmp_path):
    p = tmp_path / "jwks.json"
    p.write_text(json.dumps({"keys": [{"kty": "EC", "kid": "e1"}]}))
    v = OidcValidator(
        OidcConfig(provider="okta", issuer=ISSUER, audience=AUDIENCE,
                   jwks_uri=f"file://{p}")
    )
    with pytest.raises(JWTError, match="no usable RSA"):
        v.decode(encode_rs256(claims(), rsa.generate_private_key(
            public_exponent=65537, key_size=2048), "e1"))


# ---------------------------------------------------------------------------
# HTTP transport integration (OIDC mode of _HTTPHandler)


def test_http_handler_oidc_mode(validator, keypair):
    import json as _json
    import threading
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    from server.mcp_server import MCPServer, _HTTPHandler

    httpd = ThreadingHTTPServer(
        ("localhost", 0),
        _HTTPHandler.make(MCPServer(spark=None), oidc_validator=validator),
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def post(headers):
            req = urllib.request.Request(
                f"http://localhost:{port}/mcp",
                data=_json.dumps(
                    {"jsonrpc": "2.0", "id": 1, "method": "tools/list"}
                ).encode(),
                headers={"Content-Type": "application/json", **headers},
            )
            try:
                with urllib.request.urlopen(req) as resp:
                    return resp.status
            except urllib.error.HTTPError as e:
                return e.code

        tok = encode_rs256(claims(sub="svc-account"), keypair, "kid-1")
        assert post({"Authorization": f"Bearer {tok}"}) == 200
        assert post({"Authorization": "Bearer nope"}) == 401
        assert post({}) == 401
        bad_iss = encode_rs256(
            claims(iss="https://evil.example.com"), keypair, "kid-1"
        )
        assert post({"Authorization": f"Bearer {bad_iss}"}) == 401
        # /status stays open (health probes carry no credentials)
        with urllib.request.urlopen(f"http://localhost:{port}/status") as r:
            assert r.status == 200
    finally:
        httpd.shutdown()


def test_protected_resource_metadata_endpoint(validator, monkeypatch):
    """RFC 9728 discovery (reference docs/oauth.md "Metadata Endpoints",
    server.go:187-204): /.well-known/oauth-protected-resource stays open
    and points clients at the IdP; 401s carry the resource_metadata
    pointer in WWW-Authenticate."""
    import json as _json
    import threading
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    from server.mcp_server import MCPServer, _HTTPHandler

    monkeypatch.setenv("MCP_URL", "https://mcp.example.com")
    httpd = ThreadingHTTPServer(
        ("localhost", 0),
        _HTTPHandler.make(MCPServer(spark=None), oidc_validator=validator),
    )
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://localhost:{port}/.well-known/oauth-protected-resource"
        ) as r:
            meta = _json.loads(r.read())
        assert meta["authorization_servers"] == [ISSUER]
        assert meta["resource"] == "https://mcp.example.com"
        # a tokenless POST carries the discovery pointer
        req = urllib.request.Request(
            f"http://localhost:{port}/mcp",
            data=b'{"jsonrpc":"2.0","id":1,"method":"tools/list"}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
            www = ",".join(
                v for k, v in e.headers.items() if k == "WWW-Authenticate"
            )
            assert "resource_metadata=" in www and "invalid_token" in www
            assert _json.loads(e.read())["error"] == "invalid_token"
    finally:
        httpd.shutdown()


# ---------------------------------------------------------------------------
# JWKS edge cases: kid-less keys (RFC 7517 makes kid OPTIONAL), corrupt
# key material


def test_kidless_single_key_jwks_accepts_kidless_token(tmp_path, keypair):
    jwk = jwk_from_private_key(keypair, "ignored")
    del jwk["kid"]
    p = tmp_path / "jwks.json"
    p.write_text(json.dumps({"keys": [jwk]}))
    v = OidcValidator(
        OidcConfig(provider="okta", issuer=ISSUER, audience=AUDIENCE,
                   jwks_uri=f"file://{p}")
    )
    got = v.decode(encode_rs256(claims(), keypair))  # no kid in header
    assert got["sub"] == "alice"


def test_kidless_single_key_jwks_accepts_kid_bearing_token(tmp_path, keypair):
    # common IdP shape: token carries a kid but the single JWKS key has
    # none — with one key there is no ambiguity (signature still gates)
    jwk = jwk_from_private_key(keypair, "ignored")
    del jwk["kid"]
    p = tmp_path / "jwks.json"
    p.write_text(json.dumps({"keys": [jwk]}))
    v = OidcValidator(
        OidcConfig(provider="okta", issuer=ISSUER, audience=AUDIENCE,
                   jwks_uri=f"file://{p}")
    )
    got = v.decode(encode_rs256(claims(), keypair, kid="kid-9"))
    assert got["sub"] == "alice"


def test_corrupt_jwks_key_material_is_jwt_error(tmp_path, keypair):
    # invalid RSA numbers (even modulus) must surface as JWTError — the
    # HTTP handler catches exactly that type to produce a clean 401
    jwk = jwk_from_private_key(keypair, "kid-1")
    jwk["n"] = "BAD0"  # decodes, but is not a valid modulus for e=65537
    jwk["e"] = "AA"    # e = 0 → RSAPublicNumbers rejects
    p = tmp_path / "jwks.json"
    p.write_text(json.dumps({"keys": [jwk]}))
    v = OidcValidator(
        OidcConfig(provider="okta", issuer=ISSUER, audience=AUDIENCE,
                   jwks_uri=f"file://{p}")
    )
    with pytest.raises(JWTError, match="invalid RSA key material"):
        v.decode(encode_rs256(claims(), keypair, kid="kid-1"))
