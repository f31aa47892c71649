"""Environment configuration — SURVEY §2.1 F16 (reference
internal/config/config.go:58-228).

Env vars keep the reference's semantics under a ``SPARK_ENGINE_``
prefix (the ``TRINO_*`` names map 1:1; both are accepted so existing
reference deployments can switch without config edits).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

from mcp_trino_spark.allowlist import Allowlists, parse_allowlist

DEFAULT_QUERY_TIMEOUT_S = 30
DEFAULT_CATALOG = "spark_catalog"
DEFAULT_SCHEMA = "default"


def _env(name: str, default: str = "") -> str:
    """Look up SPARK_ENGINE_<name>, falling back to TRINO_<name>."""
    return os.environ.get(f"SPARK_ENGINE_{name}", os.environ.get(f"TRINO_{name}", default))


def _parse_timeout(raw: str) -> int:
    """Positive-integer timeout with warn-and-default fallback
    (reference config.go:93-107)."""
    try:
        value = int(raw)
    except (TypeError, ValueError):
        return DEFAULT_QUERY_TIMEOUT_S
    return value if value > 0 else DEFAULT_QUERY_TIMEOUT_S


def _parse_amf_mode(raw: str) -> Optional[str]:
    """'exact'/'sketch', else None (defer to the session knob) — the
    warn-and-default idiom (reference config.go:93-107)."""
    mode = raw.strip().lower()
    return mode if mode in ("exact", "sketch") else None


def _parse_bool(raw: str, default: bool = False) -> bool:
    if raw == "":
        return default
    return raw.strip().lower() in ("1", "true", "t", "yes", "y", "on")


@dataclass
class EngineConfig:
    default_catalog: str = DEFAULT_CATALOG
    default_schema: str = DEFAULT_SCHEMA
    query_timeout_s: int = DEFAULT_QUERY_TIMEOUT_S
    allow_write_queries: bool = False
    allowlists: Allowlists = field(default_factory=Allowlists)
    #: identity queries run as when the transport supplies none
    #: (reference config.go:201 `TRINO_USER`, default "trino")
    default_user: str = "trino"
    #: approx_most_frequent routing: "exact" (one-shuffle distributed
    #: plan) or "sketch" (Misra-Gries mergeable summary — bounded
    #: memory past the per-group distinct-value wall at 100 TB).
    #: None defers to the session-level Python knob
    #: (trino_compat.set_approx_most_frequent_mode); env:
    #: SPARK_ENGINE_APPROX_MOST_FREQUENT_MODE /
    #: TRINO_APPROX_MOST_FREQUENT_MODE — the reference's
    #: config-from-env idiom (config.go:58-228) applied to the one
    #: engine knob that previously needed a Python call.
    approx_most_frequent_mode: Optional[str] = None

    @classmethod
    def from_env(cls) -> "EngineConfig":
        allowlists = Allowlists(
            catalogs=parse_allowlist(_env("ALLOWED_CATALOGS")),
            schemas=parse_allowlist(_env("ALLOWED_SCHEMAS")),
            tables=parse_allowlist(_env("ALLOWED_TABLES")),
        )
        allowlists.validate()
        return cls(
            default_catalog=_env("CATALOG", DEFAULT_CATALOG),
            default_schema=_env("SCHEMA", DEFAULT_SCHEMA),
            query_timeout_s=_parse_timeout(_env("QUERY_TIMEOUT", str(DEFAULT_QUERY_TIMEOUT_S))),
            allow_write_queries=_parse_bool(_env("ALLOW_WRITE_QUERIES"), False),
            allowlists=allowlists,
            default_user=_env("USER", "trino") or "trino",
            approx_most_frequent_mode=_parse_amf_mode(
                _env("APPROX_MOST_FREQUENT_MODE")
            ),
        )
