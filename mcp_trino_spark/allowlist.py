"""Catalog / schema / table allowlist filtering.

Same contract as the reference (SURVEY §2.1 F9; reference
internal/trino/client.go:814-895, internal/config/config.go:231-258,
docs/allowlists.md): empty allowlist ⇒ no filtering; matching is
case-insensitive on the full dotted name (``catalog``,
``catalog.schema``, ``catalog.schema.table``).  This is the façade's
headline metadata optimization — scoping discovery to allowed schemas
is the "10-20x" win the reference documents (README.md:159-161) — and
it is pure Python over catalog listings, engine-independent.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, List, Sequence


class AllowlistFormatError(ValueError):
    pass


def parse_allowlist(value: str | None) -> List[str]:
    """Comma-separated, whitespace-trimmed, empty entries dropped."""
    if not value:
        return []
    return [item.strip() for item in value.split(",") if item.strip()]


def validate_allowlist(env_var: str, allowlist: Sequence[str], expected_dots: int) -> None:
    """Entries must have exactly the dot count of their namespace level."""
    for item in allowlist:
        dots = item.count(".")
        if dots != expected_dots:
            raise AllowlistFormatError(
                f"invalid format in {env_var}: '{item}' "
                f"(expected {expected_dots} dots, found {dots})"
            )


def _allowed(full_name: str, allowlist: Sequence[str]) -> bool:
    return any(full_name.lower() == item.lower() for item in allowlist)


@dataclass
class Allowlists:
    catalogs: List[str] = field(default_factory=list)
    schemas: List[str] = field(default_factory=list)  # catalog.schema
    tables: List[str] = field(default_factory=list)  # catalog.schema.table

    def validate(self) -> None:
        validate_allowlist("ALLOWED_CATALOGS", self.catalogs, 0)
        validate_allowlist("ALLOWED_SCHEMAS", self.schemas, 1)
        validate_allowlist("ALLOWED_TABLES", self.tables, 2)

    # -- per-level checks ---------------------------------------------------

    def is_catalog_allowed(self, catalog: str) -> bool:
        return not self.catalogs or _allowed(catalog, self.catalogs)

    def is_schema_allowed(self, catalog: str, schema: str) -> bool:
        return not self.schemas or _allowed(f"{catalog}.{schema}", self.schemas)

    def is_table_allowed(self, catalog: str, schema: str, table: str) -> bool:
        return not self.tables or _allowed(f"{catalog}.{schema}.{table}", self.tables)

    # -- listing filters (empty allowlist ⇒ pass-through) -------------------

    def filter_catalogs(self, catalogs: Iterable[str]) -> List[str]:
        if not self.catalogs:
            return list(catalogs)
        return [c for c in catalogs if _allowed(c, self.catalogs)]

    def filter_schemas(self, schemas: Iterable[str], catalog: str) -> List[str]:
        if not self.schemas:
            return list(schemas)
        return [s for s in schemas if _allowed(f"{catalog}.{s}", self.schemas)]

    def filter_tables(self, tables: Iterable[str], catalog: str, schema: str) -> List[str]:
        if not self.tables:
            return list(tables)
        return [t for t in tables if _allowed(f"{catalog}.{schema}.{t}", self.tables)]
