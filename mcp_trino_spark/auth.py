"""JWT bearer-token validation for the HTTP transport.

Parity target: the reference wraps its HTTP transport in OAuth
middleware with an HMAC provider (reference internal/mcp/server.go:
170-215, internal/config/config.go:27-31 ``OAuthProvider: "hmac"`` +
``JWTSecret``; behavioral contract in docs/jwt.md).  Its validation
features, re-implemented here on the stdlib (no JWT package in this
container, and HS256 needs only ``hmac`` + ``hashlib`` + ``base64``):

- **HMAC-SHA256 signature verification** with a constant-time compare.
- **Algorithm pinning**: the header must declare ``alg: HS256``.
  Anything else — including ``none`` — is rejected outright, which
  closes the classic alg-confusion downgrade.
- **Required claims** (docs/jwt.md "Required JWT Claims"): ``sub``
  (becomes the attribution user for the impersonation chain —
  execute.py tags Spark jobs with it), ``exp`` and ``iat`` (both
  numeric; ``exp`` must be in the future modulo a small leeway).
- Optional ``nbf`` honored when present.

The OAuth *flows* themselves (authorization-code, provider discovery —
reference delegates to an external proxy library) are identity-provider
machinery, not engine surface; a deployment terminates them in front of
this server and forwards the resulting JWT, which is exactly what this
module consumes.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
from typing import Any, Dict, Optional

#: clock-skew allowance for exp/nbf (seconds)
DEFAULT_LEEWAY_S = 30


class JWTError(ValueError):
    """Token failed validation; ``str(exc)`` says why (never echoes the token)."""


def _b64url_encode(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii")


def _b64url_decode(part: str) -> bytes:
    pad = -len(part) % 4
    try:
        return base64.urlsafe_b64decode(part + "=" * pad)
    except Exception as exc:  # binascii.Error subclasses ValueError
        raise JWTError(f"invalid base64url segment: {exc}") from exc


def encode_hs256(claims: Dict[str, Any], secret: str | bytes) -> str:
    """Mint an HS256 JWT (test fixtures and ops tooling; the server only
    ever *validates*)."""
    key = secret.encode() if isinstance(secret, str) else secret
    header = _b64url_encode(json.dumps({"alg": "HS256", "typ": "JWT"}, separators=(",", ":")).encode())
    payload = _b64url_encode(json.dumps(claims, separators=(",", ":")).encode())
    signing_input = f"{header}.{payload}".encode("ascii")
    sig = _b64url_encode(hmac.new(key, signing_input, hashlib.sha256).digest())
    return f"{header}.{payload}.{sig}"


def decode_hs256(
    token: str,
    secret: str | bytes,
    *,
    now: Optional[float] = None,
    leeway_s: int = DEFAULT_LEEWAY_S,
) -> Dict[str, Any]:
    """Validate ``token`` and return its claims dict, else raise JWTError."""
    key = secret.encode() if isinstance(secret, str) else secret
    if not all(32 < ord(c) < 127 for c in token):
        # JWTs are base64url + dots; anything else can't be valid and
        # must fail as a clean 401, not an encode error mid-validation
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
        # JSONDecodeError, or UnicodeDecodeError when the segment is valid
        # base64url of non-UTF-8 bytes — both must 401, not crash
        raise JWTError("header is not valid JSON") from exc
    if not isinstance(header, dict) or header.get("alg") != "HS256":
        # reject 'none' and any non-HMAC alg before touching the signature
        raise JWTError(f"unsupported alg {header.get('alg') if isinstance(header, dict) else header!r}")

    signing_input = f"{header_b64}.{payload_b64}".encode("ascii")
    expected = hmac.new(key, signing_input, hashlib.sha256).digest()
    if not hmac.compare_digest(expected, _b64url_decode(sig_b64)):
        raise JWTError("signature mismatch")

    try:
        claims = json.loads(_b64url_decode(payload_b64))
    except JWTError:
        raise
    except ValueError as exc:
        raise JWTError("payload is not valid JSON") from exc
    if not isinstance(claims, dict):
        raise JWTError("payload must be a JSON object")

    sub = claims.get("sub")
    if not isinstance(sub, str) or not sub:
        raise JWTError("missing required claim: sub")
    for name in ("exp", "iat"):
        if not isinstance(claims.get(name), (int, float)):
            raise JWTError(f"missing required numeric claim: {name}")

    t = time.time() if now is None else now
    if t > float(claims["exp"]) + leeway_s:
        raise JWTError("token expired")
    nbf = claims.get("nbf")
    if isinstance(nbf, (int, float)) and t < float(nbf) - leeway_s:
        raise JWTError("token not yet valid (nbf)")
    return claims


def authenticate_bearer(
    authorization_header: str,
    jwt_secret: str | bytes,
    *,
    now: Optional[float] = None,
) -> Dict[str, Any]:
    """Extract + validate the bearer JWT from an Authorization header."""
    scheme, _, token = (authorization_header or "").partition(" ")
    if scheme.lower() != "bearer" or not token.strip():
        raise JWTError("missing bearer token")
    return decode_hs256(token.strip(), jwt_secret, now=now)
