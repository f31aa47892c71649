"""Allowlist + name-resolution + config tests.

Ports the reference's table-driven cases (reference
internal/trino/client_test.go:15-290 allowlists, :292-341 resolution;
internal/config/config_test.go:9-335 parsing/validation).  No Spark.
"""

import pytest

from mcp_trino_spark.allowlist import (
    Allowlists,
    AllowlistFormatError,
    parse_allowlist,
    validate_allowlist,
)
from mcp_trino_spark.catalog_api import resolve_table_name
from mcp_trino_spark.config import EngineConfig, _parse_timeout


# --- parsing (config_test.go) ---------------------------------------------

def test_parse_allowlist_basic():
    assert parse_allowlist("hive,postgresql,mysql") == ["hive", "postgresql", "mysql"]


def test_parse_allowlist_whitespace_and_empties():
    assert parse_allowlist(" hive , ,postgresql,, mysql ") == ["hive", "postgresql", "mysql"]


def test_parse_allowlist_empty():
    assert parse_allowlist("") == []
    assert parse_allowlist(None) == []


def test_validate_allowlist_dot_counts():
    validate_allowlist("X", ["hive.analytics"], 1)
    with pytest.raises(AllowlistFormatError, match="expected 1 dots"):
        validate_allowlist("X", ["hive"], 1)
    with pytest.raises(AllowlistFormatError, match="expected 2 dots"):
        validate_allowlist("X", ["hive.analytics"], 2)


def test_timeout_fallback():
    assert _parse_timeout("45") == 45
    assert _parse_timeout("not_a_number") == 30
    assert _parse_timeout("-5") == 30
    assert _parse_timeout("0") == 30


# --- filtering (client_test.go:15-290) ------------------------------------

def test_filter_catalogs_case_insensitive():
    al = Allowlists(catalogs=["HIVE", "PostgreSQL"])
    assert al.filter_catalogs(["hive", "postgresql", "mysql"]) == ["hive", "postgresql"]


def test_filter_catalogs_empty_allowlist_passthrough():
    al = Allowlists()
    assert al.filter_catalogs(["hive", "mysql"]) == ["hive", "mysql"]


def test_filter_schemas_scoped_to_catalog():
    al = Allowlists(schemas=["hive.analytics", "hive.marts"])
    assert al.filter_schemas(["analytics", "marts", "staging"], "hive") == [
        "analytics",
        "marts",
    ]
    # same schema names under a different catalog are filtered out
    assert al.filter_schemas(["analytics", "marts"], "postgresql") == []


def test_filter_tables_three_part():
    al = Allowlists(tables=["hive.analytics.users", "hive.analytics.Events"])
    assert al.filter_tables(["users", "events", "other"], "hive", "analytics") == [
        "users",
        "events",
    ]
    assert al.filter_tables(["users"], "hive", "marts") == []


def test_is_table_allowed_empty_lists():
    assert Allowlists().is_table_allowed("any", "schema", "table")


# --- name resolution (client_test.go:292-341) ------------------------------

CFG = EngineConfig(default_catalog="memory", default_schema="default")


@pytest.mark.parametrize(
    "catalog,schema,table,expected",
    [
        (None, "analytics", "users", ("memory", "analytics", "users")),
        (None, None, "analytics.users", ("memory", "analytics", "users")),
        (None, None, "hive.analytics.users", ("hive", "analytics", "users")),
        ("hive", "analytics", "users", ("hive", "analytics", "users")),
        (None, None, "users", ("memory", "default", "users")),
    ],
)
def test_resolve_table_name(catalog, schema, table, expected):
    assert resolve_table_name(CFG, catalog, schema, table) == expected


def test_resolve_table_name_empty():
    import pytest as _pytest

    from mcp_trino_spark.catalog_api import InvalidTableName

    with _pytest.raises(InvalidTableName):
        resolve_table_name(CFG, None, None, "")
