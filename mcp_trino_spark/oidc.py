"""OIDC / JWKS (RS256) bearer-token validation — the reference's
non-hmac OAuth providers.

Parity target: the reference's OAuth middleware supports real identity
providers besides the HS256 shared secret — ``OAUTH_PROVIDER`` in
{okta, google, azure} with ``OIDC_ISSUER`` / ``OIDC_AUDIENCE``
(reference internal/config/config.go:72-78, 157-160; test table
internal/config/oauth_test.go:139-180; flow in docs/oauth.md "Native
Mode": the server validates presented JWTs against the provider's JWKS
and checks audience + expiry — docs/oauth.md:50-70, 225-236).  This
module re-implements that validation path for the embedded engine:

- **JWKS fetch + cache**: keys come from ``OIDC_JWKS_URI`` when set,
  else the provider-conventional location — Okta serves keys at
  ``{issuer}/oauth2/v1/keys`` (the reference shipped a bug fix for
  exactly this, docs/oauth.md "Issue 1"), everyone else at
  ``{issuer}/.well-known/jwks.json``.  ``file://`` URIs are first-class
  so air-gapped deployments (and the test suite) can pin a static JWKS.
  Fetched key sets are cached with a TTL (default 1 h — the reference's
  token-cache TTL, external_auth.go:99-103) and refreshed once on an
  unknown ``kid`` (provider key rotation).
- **RS256 signature verification** via ``cryptography`` (RSA
  PKCS#1 v1.5 + SHA-256), with alg pinning: the token header must say
  RS256 and the selected JWK must be an RSA signing key; ``none`` /
  HS256-with-public-key confusion attacks are rejected before any
  crypto runs.
- **Claim checks** (docs/oauth.md:225-236 "Token Validation"): ``iss``
  must equal the configured issuer, ``aud`` must contain the configured
  audience, ``exp``/``iat`` required numeric with leeway, ``nbf``
  honored, ``sub`` required non-empty (it becomes the attribution user,
  same as the HS256 path).
- **Fail-fast startup validation** mirroring config.go: a non-hmac
  provider without ``OIDC_ISSUER`` / ``OIDC_AUDIENCE`` is a
  configuration error raised at construction, not a 500 at first
  request.

The OAuth *flows* (authorization-code, PKCE, redirect handling) are
client↔provider machinery the reference's proxy mode implements for
browser clients; the engine's surface is validating the resulting
access token, which is exactly this module.
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

from mcp_trino_spark.auth import (
    DEFAULT_LEEWAY_S,
    JWTError,
    _b64url_decode,
)

#: JWKS cache TTL — the reference caches auth material for 1 h
#: (external_auth.go:99-103)
DEFAULT_JWKS_TTL_S = 3600.0

_KNOWN_PROVIDERS = ("hmac", "okta", "google", "azure")


def default_jwks_uri(provider: str, issuer: str) -> str:
    """Provider-conventional JWKS location (docs/oauth.md "Issue 1":
    Okta is ``{issuer}/oauth2/v1/keys``, not the well-known path)."""
    base = issuer.rstrip("/")
    if provider == "okta":
        return f"{base}/oauth2/v1/keys"
    return f"{base}/.well-known/jwks.json"


@dataclass
class OidcConfig:
    """Validated OIDC configuration (config.go:72-78 env contract)."""

    provider: str = "hmac"
    issuer: str = ""
    audience: str = ""
    jwks_uri: str = ""
    leeway_s: int = DEFAULT_LEEWAY_S
    jwks_ttl_s: float = DEFAULT_JWKS_TTL_S

    def __post_init__(self) -> None:
        self.provider = (self.provider or "hmac").strip().lower()
        if self.provider not in _KNOWN_PROVIDERS:
            raise ValueError(
                f"unknown OAUTH_PROVIDER {self.provider!r} "
                f"(expected one of {_KNOWN_PROVIDERS})"
            )
        if self.provider != "hmac":
            # fail-fast startup validation (config.go:157-160): a real
            # IdP provider cannot work without issuer+audience
            if not self.issuer:
                raise ValueError(
                    f"OIDC_ISSUER is required for OAUTH_PROVIDER={self.provider}"
                )
            if not self.audience:
                raise ValueError(
                    f"OIDC_AUDIENCE is required for OAUTH_PROVIDER={self.provider}"
                )
            if not self.jwks_uri:
                self.jwks_uri = default_jwks_uri(self.provider, self.issuer)

    @classmethod
    def from_env(cls, env: Optional[Dict[str, str]] = None) -> "OidcConfig":
        e = os.environ if env is None else env
        return cls(
            provider=e.get("OAUTH_PROVIDER", "hmac"),
            issuer=e.get("OIDC_ISSUER", ""),
            audience=e.get("OIDC_AUDIENCE", ""),
            jwks_uri=e.get("OIDC_JWKS_URI", ""),
        )

    @property
    def oidc_enabled(self) -> bool:
        return self.provider != "hmac"


def _fetch_jwks(uri: str) -> Dict[str, Dict[str, Any]]:
    """Fetch a JWKS document and index its RSA signing keys by kid.

    Every failure mode — unreachable endpoint, missing file, non-JSON
    body — surfaces as JWTError: the HTTP transport catches exactly that
    type to produce a clean 401, and anything else would escape the
    handler and reset the client connection with no response."""
    try:
        if uri.startswith("file://"):
            with open(uri[len("file://"):], "rb") as f:
                doc = json.load(f)
        elif uri.startswith(("http://", "https://")):
            with urllib.request.urlopen(uri, timeout=10) as resp:  # noqa: S310
                doc = json.load(resp)
        else:
            raise JWTError(f"unsupported JWKS URI scheme: {uri!r}")
    except JWTError:
        raise
    except (OSError, ValueError) as exc:  # URLError/IO/JSONDecodeError
        raise JWTError(f"JWKS fetch failed: {exc}") from exc
    keys = doc.get("keys")
    if not isinstance(keys, list):
        raise JWTError("JWKS document has no 'keys' array")
    out: Dict[str, Dict[str, Any]] = {}
    for k in keys:
        if not isinstance(k, dict) or k.get("kty") != "RSA":
            continue
        if k.get("use") not in (None, "sig"):
            continue
        kid = k.get("kid")
        if "n" not in k or "e" not in k:
            continue
        if isinstance(kid, str):
            out[kid] = k
        elif kid is None:
            # RFC 7517 makes kid OPTIONAL — index kid-less keys under a
            # synthetic name so a single-key JWKS still authenticates
            # via _pick's single-key fallback (key selection is only a
            # routing hint; the signature check is what gates access)
            out[f"\x00nokid{len(out)}"] = k
    if not out:
        raise JWTError("JWKS document contains no usable RSA signing keys")
    return out


def _rsa_public_key(jwk: Dict[str, Any]):
    from cryptography.hazmat.primitives.asymmetric.rsa import RSAPublicNumbers

    try:
        n = int.from_bytes(_b64url_decode(jwk["n"]), "big")
        e = int.from_bytes(_b64url_decode(jwk["e"]), "big")
        return RSAPublicNumbers(e, n).public_key()
    except JWTError:
        raise
    except (ValueError, TypeError) as exc:
        # RSAPublicNumbers rejects invalid RSA material (e=0, even
        # modulus, ...) with ValueError — surface it as JWTError so the
        # HTTP handler's catch produces a clean 401 instead of an
        # unhandled exception resetting the connection
        raise JWTError(f"invalid RSA key material in JWKS: {exc}") from exc


class OidcValidator:
    """Validates RS256 bearer JWTs against a JWKS, with key caching.

    Thread-safe: the HTTP transport serves from a ThreadingHTTPServer,
    so the JWKS cache refresh is guarded by a lock."""

    #: minimum seconds between forced (unknown-kid) JWKS refetches —
    #: without a cooldown, unauthenticated requests carrying random kids
    #: would each fire a synchronous IdP fetch while holding the lock
    #: (serializing all auth behind network timeouts and hammering the
    #: provider — a classic JWKS-refresh DoS amplifier)
    MIN_REFETCH_INTERVAL_S = 30.0

    def __init__(self, config: OidcConfig):
        if not config.oidc_enabled:
            raise ValueError("OidcValidator needs a non-hmac provider config")
        self.config = config
        self._keys: Dict[str, Dict[str, Any]] = {}
        self._fetched_at = 0.0
        self._lock = threading.Lock()

    # -- JWKS cache ---------------------------------------------------------

    def _get_key(self, kid: Optional[str], now: float) -> Dict[str, Any]:
        with self._lock:
            stale = now - self._fetched_at > self.config.jwks_ttl_s
            if stale or not self._keys:
                self._keys = _fetch_jwks(self.config.jwks_uri)
                self._fetched_at = now
            key = self._pick(kid)
            if (
                key is None
                and not stale
                and now - self._fetched_at >= self.MIN_REFETCH_INTERVAL_S
            ):
                # unknown kid on a fresh-ish cache → one refresh, in case
                # the provider rotated keys (standard JWKS practice),
                # rate-limited by the cooldown above
                self._keys = _fetch_jwks(self.config.jwks_uri)
                self._fetched_at = now
                key = self._pick(kid)
        if key is None:
            raise JWTError(f"no JWKS key matches kid={kid!r}")
        return key

    def _pick(self, kid: Optional[str]) -> Optional[Dict[str, Any]]:
        if kid is not None and kid in self._keys:
            return self._keys[kid]
        if len(self._keys) == 1:
            only_kid, only = next(iter(self._keys.items()))
            if kid is None:
                # kid optional in the token (RFC 7517): one key → no
                # ambiguity
                return only
            if only_kid.startswith("\x00nokid"):
                # token names a kid but the single JWKS key has none —
                # no basis for a mismatch; the signature check gates.
                # (A kid-BEARING key with a different kid stays a
                # rejection: that is a real rotated-away mismatch.)
                return only
        return None

    # -- validation ---------------------------------------------------------

    def decode(self, token: str, *, now: Optional[float] = None) -> Dict[str, Any]:
        """Validate ``token`` and return its claims, else raise JWTError."""
        from cryptography.exceptions import InvalidSignature
        from cryptography.hazmat.primitives import hashes
        from cryptography.hazmat.primitives.asymmetric import padding

        t = time.time() if now is None else now
        if not token or not all(32 < ord(c) < 127 for c in token):
            raise JWTError("token contains non-ASCII or control characters")
        parts = token.split(".")
        if len(parts) != 3:
            raise JWTError("token must have 3 dot-separated segments")
        header_b64, payload_b64, sig_b64 = parts

        try:
            header = json.loads(_b64url_decode(header_b64))
        except JWTError:
            raise
        except ValueError as exc:
            raise JWTError("header is not valid JSON") from exc
        if not isinstance(header, dict) or header.get("alg") != "RS256":
            # pin RS256: rejects 'none' and the HS256-signed-with-public-key
            # downgrade before any key material is touched
            alg = header.get("alg") if isinstance(header, dict) else header
            raise JWTError(f"unsupported alg {alg!r} (expected RS256)")
        kid = header.get("kid")
        if kid is not None and not isinstance(kid, str):
            raise JWTError("kid must be a string when present")

        jwk = self._get_key(kid, t)
        if jwk.get("alg") not in (None, "RS256"):
            raise JWTError(f"JWKS key {kid!r} is not an RS256 key")
        pub = _rsa_public_key(jwk)
        try:
            pub.verify(
                _b64url_decode(sig_b64),
                f"{header_b64}.{payload_b64}".encode("ascii"),
                padding.PKCS1v15(),
                hashes.SHA256(),
            )
        except InvalidSignature as exc:
            raise JWTError("signature mismatch") from exc

        try:
            claims = json.loads(_b64url_decode(payload_b64))
        except JWTError:
            raise
        except ValueError as exc:
            raise JWTError("payload is not valid JSON") from exc
        if not isinstance(claims, dict):
            raise JWTError("payload must be a JSON object")
        self._check_claims(claims, t)
        return claims

    def _check_claims(self, claims: Dict[str, Any], t: float) -> None:
        cfg = self.config
        iss = claims.get("iss")
        if iss != cfg.issuer:
            raise JWTError("issuer mismatch")
        aud = claims.get("aud")
        auds = aud if isinstance(aud, list) else [aud]
        if cfg.audience not in [a for a in auds if isinstance(a, str)]:
            raise JWTError("audience mismatch")
        sub = claims.get("sub")
        if not isinstance(sub, str) or not sub:
            raise JWTError("missing required claim: sub")
        for name in ("exp", "iat"):
            if not isinstance(claims.get(name), (int, float)):
                raise JWTError(f"missing required numeric claim: {name}")
        if t > float(claims["exp"]) + cfg.leeway_s:
            raise JWTError("token expired")
        nbf = claims.get("nbf")
        if isinstance(nbf, (int, float)) and t < float(nbf) - cfg.leeway_s:
            raise JWTError("token not yet valid (nbf)")

    def authenticate_bearer(
        self, authorization_header: str, *, now: Optional[float] = None
    ) -> Dict[str, Any]:
        scheme, _, token = (authorization_header or "").partition(" ")
        if scheme.lower() != "bearer" or not token.strip():
            raise JWTError("missing bearer token")
        return self.decode(token.strip(), now=now)


# ---------------------------------------------------------------------------
# test/ops tooling: mint RS256 tokens and static JWKS documents


def _b64url_encode_bytes(raw: bytes) -> str:
    import base64

    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii")


def jwk_from_private_key(private_key, kid: str) -> Dict[str, Any]:
    """Public JWK dict for an ``rsa.RSAPrivateKey`` (test fixtures)."""
    pub = private_key.public_key().public_numbers()

    def enc(i: int) -> str:
        return _b64url_encode_bytes(i.to_bytes((i.bit_length() + 7) // 8, "big"))

    return {"kty": "RSA", "use": "sig", "alg": "RS256", "kid": kid,
            "n": enc(pub.n), "e": enc(pub.e)}


def encode_rs256(
    claims: Dict[str, Any], private_key, kid: Optional[str] = None
) -> str:
    """Mint an RS256 JWT (test fixtures; the server only validates)."""
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding

    header: Dict[str, Any] = {"alg": "RS256", "typ": "JWT"}
    if kid is not None:
        header["kid"] = kid
    h = _b64url_encode_bytes(json.dumps(header, separators=(",", ":")).encode())
    p = _b64url_encode_bytes(json.dumps(claims, separators=(",", ":")).encode())
    sig = private_key.sign(
        f"{h}.{p}".encode("ascii"), padding.PKCS1v15(), hashes.SHA256()
    )
    return f"{h}.{p}.{_b64url_encode_bytes(sig)}"
