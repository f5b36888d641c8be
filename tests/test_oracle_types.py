"""Representation-layer gate for the DuckDB oracles (VERDICT r4 #2/#6).

Rounds 3 and 4 shipped driver rows that were rows+schema green but hash red
while the local gate passed: the oracles' uncast ``SUM(...) OVER`` windows
surfaced as DuckDB HUGEINT — ``decimal128(38,0)`` under an Arrow/pandas
fetch (what the driver uses), silently laundered to Python ``int`` by the
``fetchall()`` path the local gate used. These tests pin the fix at the type
level so the gap can never reopen:

1. ``lint_arrow_schema`` must flag an uncast integer ``SUM OVER`` (the exact
   r3/r4 bug) and pass its ``CAST(... AS BIGINT)`` form — a regression test
   for the lint itself.
2. Every registered oracle (driver 50 + extras) must produce an Arrow output
   schema with no decimal / unsigned / float16 column.
3. For the events family (the r3/r4 red set), the DuckDB Arrow output types
   must equal the Spark result schema types field by field — the type-level
   twin of the driver's value-hash gate.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import types as T

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from check_queries import SF_DIR, TABLES, lint_arrow_schema  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def _oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_lint_catches_uncast_sum_over():
    """The exact r3/r4 driver-red mechanism must fail the lint; the cast
    form must pass."""
    con = duckdb.connect()
    uncast = con.execute(
        "SELECT SUM(x) OVER () AS s FROM (VALUES (1::BIGINT)) t(x)"
    ).arrow()
    viol = lint_arrow_schema(uncast.schema)
    assert viol and "decimal128(38, 0)" in viol[0], viol
    cast = con.execute(
        "SELECT CAST(SUM(x) OVER () AS BIGINT) AS s FROM (VALUES (1::BIGINT)) t(x)"
    ).arrow()
    assert lint_arrow_schema(cast.schema) == []
    # plain (non-window) SUM has the same HUGEINT surface
    plain = con.execute("SELECT SUM(x) AS s FROM (VALUES (1::BIGINT)) t(x)").arrow()
    assert lint_arrow_schema(plain.schema), "plain SUM(BIGINT) must lint too"


def test_all_oracle_arrow_schemas_lint_clean():
    """Driver-proof sweep: no registered oracle (driver 50 + extras) may
    expose a decimal/unsigned/float16 column under Arrow fetch."""
    from klog_spark.entry_queries import ORACLE_SF, ensure_fixture

    ensure_fixture(ORACLE_SF)  # klog oracles read the sf0.01 fixture files
    con = _oracle_con()
    oss = {**entry.oracle_sql(), **entry.extra_oracle_sql()}
    bad = {}
    for name, sql in oss.items():
        schema = con.execute(sql).arrow().schema
        viol = lint_arrow_schema(schema)
        if viol:
            bad[name] = viol
    assert not bad, bad


# Spark result type -> acceptable DuckDB Arrow types. string/large_string
# both map to Spark StringType depending on DuckDB version.
_SPARK_TO_ARROW = {
    T.LongType(): {"int64"},
    T.IntegerType(): {"int32"},
    T.DoubleType(): {"double"},
    T.FloatType(): {"float"},
    T.StringType(): {"string", "large_string"},
    T.BooleanType(): {"bool"},
    T.DateType(): {"date32[day]"},
    T.TimestampNTZType(): {"timestamp[us]", "timestamp[ns]"},
}

_EVENTS_FAMILY = [
    "events_daily",
    "event_sessions",
    "events_rolling_7d",
    "event_session_interval_join",
    "events_hypertable",
]


@pytest.mark.parametrize("name", _EVENTS_FAMILY)
def test_events_oracle_types_match_spark(spark, name):
    """Field-by-field type equality between the Spark result schema and the
    oracle's Arrow output schema — fails on any representation divergence
    (HUGEINT, DECIMAL, unsigned) even when values would hash equal."""
    qs = {**entry.queries(), **entry.extra_queries()}
    oss = {**entry.oracle_sql(), **entry.extra_oracle_sql()}
    sschema = {f.name.lower(): f.dataType for f in qs[name](spark, SF_DIR).schema}
    con = _oracle_con()
    aschema = con.execute(oss[name]).arrow().schema
    oschema = {f.name.lower(): str(f.type) for f in aschema}
    assert sorted(sschema) == sorted(oschema)
    for col, sparktype in sschema.items():
        allowed = _SPARK_TO_ARROW.get(sparktype)
        assert allowed is not None, f"{name}.{col}: unmapped Spark type {sparktype}"
        assert oschema[col] in allowed, (
            f"{name}.{col}: Spark {sparktype} vs oracle Arrow {oschema[col]}"
        )
