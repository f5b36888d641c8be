"""Property tests for the events/telemetry query surface (VERDICT r3 #6).

The driver regenerates the events fixture every round; round 3 proved the
sessionization queries were correct-on-the-happy-fixture but not
engine-robust (session-TZ drift, NULL-ordering divergence, ROUND(double)
ties). These tests generate the hostile fixtures FIRST: random event
streams with null timestamps, gaps exactly at the 1800s boundary, and
tie-prone values — then demand exact agreement between the Spark query, the
DuckDB oracle SQL, and (for sessionization) a sequential Python oracle,
with the Spark session pinned to a NON-UTC timezone throughout.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from klog_spark import entry_queries as eq

HOSTILE_TZ = "America/New_York"
GAP_MS = 1800 * 1000


@pytest.fixture(autouse=True)
def _hostile_tz(spark):
    """Every test in this module runs under a non-UTC session timezone; the
    queries must not notice."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.17g}"  # full precision: the point is bit-identical doubles
    return str(v)


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def _write_events(tmpdir, events):
    """events: list of (event_id, ts_ms_or_None, user_id, event_type, value).
    Written exactly like the driver's fixture: naive timestamp[us] parquet."""
    df = pd.DataFrame(
        {
            "event_id": np.array([e[0] for e in events], dtype="int64"),
            "ts": pd.to_datetime(
                [None if e[1] is None else e[1] for e in events], unit="ms"
            ).astype("datetime64[us]"),
            "user_id": np.array([e[2] for e in events], dtype="int64"),
            "event_type": [e[3] for e in events],
            "value": np.array([e[4] for e in events], dtype="float64"),
            "props": ['{"k": %d}' % (e[0] % 7) for e in events],
        }
    )
    path = f"{tmpdir}/events.parquet"
    df.to_parquet(path, index=False)
    return path


def _compare(spark, tmpdir, qfn, sql):
    sdf = qfn(spark, str(tmpdir))
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmpdir}/events.parquet')"
    )
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    con.close()
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols)
    assert _rowset(srows, scols) == _rowset(orows, ocols)
    return srows, scols


def _python_sessions(events):
    """Sequential oracle: NULLS FIRST (ts_ms=None sorts before everything),
    gap strictly > 1800000 ms opens a session, null deltas never do."""
    out = {}
    by_user = {}
    for eid, ts_ms, uid, _, _ in events:
        by_user.setdefault(uid, []).append((ts_ms, eid))
    for uid, evs in by_user.items():
        evs.sort(key=lambda t: (t[0] is not None, t[0] if t[0] is not None else 0, t[1]))
        sid, prev = 0, None
        for ts_ms, _eid in evs:
            if prev is not None and ts_ms is not None and ts_ms - prev > GAP_MS:
                sid += 1
            key = (uid, sid)
            lo, hi, n = out.get(key, (None, None, 0))
            if ts_ms is not None:
                lo = ts_ms if lo is None else min(lo, ts_ms)
                hi = ts_ms if hi is None else max(hi, ts_ms)
            out[key] = (lo, hi, n + 1)
            if ts_ms is not None:
                prev = ts_ms
    return {
        (uid, sid): (n, lo, hi, None if lo is None else hi - lo)
        for (uid, sid), (lo, hi, n) in out.items()
    }


BASE_MS = 1704067200000  # 2024-01-01T00:00:00Z

# deltas engineered around the boundary: exactly 1800000 ms must NOT open a
# session, 1800001 must; interleaved nulls must not reset the gap chain
delta = st.sampled_from([0, 1, 500, GAP_MS - 1, GAP_MS, GAP_MS + 1, 86_400_000])
# tie-prone doubles: x.xxxx5 values where Spark/DuckDB ROUND(double,4)
# legitimately diverge — the integer-micro-unit path must not care
value = st.sampled_from([0.00005, 0.12345, 6.55, 1.5e7, 0.1, 2.675, 0.0])
etype = st.sampled_from(["click", "view", "error"])


@st.composite
def event_streams(draw):
    events = []
    eid = 0
    for uid in range(draw(st.integers(1, 4))):
        t = BASE_MS + draw(st.integers(0, 10)) * 86_400_000
        for _ in range(draw(st.integers(1, 12))):
            if draw(st.booleans()) and draw(st.booleans()):  # ~25% null ts
                ts = None
            else:
                t += draw(delta)
                ts = t
            events.append((eid, ts, uid, draw(etype), draw(value)))
            eid += 1
    return events


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_streams())
def test_event_sessions_three_way(spark, tmp_path_factory, events):
    tmpdir = tmp_path_factory.mktemp("events_prop")
    _write_events(tmpdir, events)
    srows, scols = _compare(spark, tmpdir, eq.q_event_sessions, eq.SQL_EVENT_SESSIONS)
    # third engine: the sequential Python oracle
    idx = {c: i for i, c in enumerate(scols)}
    got = {
        (r[idx["user_id"]], r[idx["session_id"]]): (
            r[idx["n_events"]],
            r[idx["session_start_ms"]],
            r[idx["session_end_ms"]],
            r[idx["duration_ms"]],
        )
        for r in srows
    }
    assert got == _python_sessions(events)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_streams())
def test_events_rolling_and_daily(spark, tmp_path_factory, events):
    tmpdir = tmp_path_factory.mktemp("events_prop")
    _write_events(tmpdir, events)
    _compare(spark, tmpdir, eq.q_events_rolling, eq.SQL_EVENTS_ROLLING)
    _compare(spark, tmpdir, eq.q_events_daily, eq.SQL_EVENTS_DAILY)


def test_boundary_gap_exactly_1800s(spark, tmp_path_factory):
    """Deterministic pin: a delta of exactly 1800000 ms stays in-session,
    1800001 opens a new one, and a null-ts event neither opens a session nor
    resets the previous non-null timestamp."""
    tmpdir = tmp_path_factory.mktemp("events_edge")
    events = [
        (0, BASE_MS, 1, "click", 0.00005),
        (1, BASE_MS + GAP_MS, 1, "click", 0.00005),      # same session
        (2, None, 1, "view", 2.675),                      # null: no boundary
        (3, BASE_MS + 2 * GAP_MS + 1, 1, "click", 0.1),  # >gap vs event 1: new
    ]
    _write_events(tmpdir, events)
    srows, scols = _compare(spark, tmpdir, eq.q_event_sessions, eq.SQL_EVENT_SESSIONS)
    idx = {c: i for i, c in enumerate(scols)}
    sessions = sorted((r[idx["session_id"]], r[idx["n_events"]]) for r in srows)
    assert sessions == [(0, 3), (1, 1)]
    assert _python_sessions(events) == {
        (1, 0): (3, BASE_MS, BASE_MS + GAP_MS, GAP_MS),
        (1, 1): (1, BASE_MS + 2 * GAP_MS + 1, BASE_MS + 2 * GAP_MS + 1, 0),
    }


def _write_simple_events(tmpdir, events):
    return _write_events(tmpdir, events)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_streams())
def test_funnel_and_retention_three_way(spark, tmp_path_factory, events):
    """Property parity for the round-5 event analytics: the funnel's
    step-k-after-step-(k-1) semantics and the weekly retention triangle
    must match a sequential Python oracle on random hostile streams (null
    timestamps, boundary gaps), under the module's non-UTC session TZ."""
    from klog_spark.entry_queries import (
        SQL_EVENT_FUNNEL, SQL_USER_RETENTION, q_event_funnel, q_user_retention,
    )

    tmpdir = tmp_path_factory.mktemp("events_prop5")
    _write_simple_events(tmpdir, events)
    _compare(spark, tmpdir, q_user_retention, SQL_USER_RETENTION)
    srows, scols = _compare(spark, tmpdir, q_event_funnel, SQL_EVENT_FUNNEL)

    # sequential oracle for the funnel (view -> click -> purchase)
    def first_at_or_after(uid, etype, t0):
        ts = sorted(t for _eid, t, u, e, _v in events
                    if u == uid and e == etype and t is not None
                    and (t0 is None or t >= t0))
        return ts[0] if ts else None

    users = {u for _eid, _t, u, _e, _v in events}
    n1 = n2 = n3 = 0
    for u in users:
        t1 = first_at_or_after(u, "view", None)
        if t1 is None:
            continue
        n1 += 1
        t2 = first_at_or_after(u, "click", t1)
        if t2 is None:
            continue
        n2 += 1
        if first_at_or_after(u, "purchase", t2) is not None:
            n3 += 1
    idx = {c: i for i, c in enumerate(scols)}
    row = srows[0]
    assert (row[idx["n_view"]], row[idx["n_click"]], row[idx["n_purchase"]]) == (n1, n2, n3)

    # sequential oracle for retention
    week = 7 * 86_400_000
    wk = {(u, t // week) for _eid, t, u, _e, _v in events if t is not None}
    cohort = {}
    for u, w in wk:
        cohort[u] = min(cohort.get(u, w), w)
    want = {}
    for u, w in wk:
        key = (cohort[u], w - cohort[u])
        want.setdefault(key, set()).add(u)
    got = {
        (r[0], r[1]): r[2]
        for r in [tuple(r) for r in q_user_retention(spark, str(tmpdir)).collect()]
    }
    assert got == {k: len(v) for k, v in want.items()}


def test_interval_join_oversized_exercises_both_paths(spark):
    """q_interval_join_oversized's contract is that the gate row hashes
    output from BOTH interval_join physical paths: with bucket_width=30min
    and max_interval_buckets=4, the planted per-user audit intervals must
    exceed the cap (broadcast BETWEEN path) while most real sessions stay
    under it (bucketed explode path). Degenerate fixtures — every interval
    on one path — would silently gut the gate row's point."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    sessions = eq.q_event_sessions(spark, sf_dir).select(
        "user_id", "session_id", "session_start_ms", "session_end_ms"
    )
    pts = eq._read_events(spark, sf_dir).select(
        "user_id", eq._ts_ms_ntz("ts").alias("ts_ms")
    ).filter(F.col("ts_ms").isNotNull())
    audit = pts.groupBy("user_id").agg(
        F.lit(-1).cast("long").alias("session_id"),
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
    )
    bw, cap = 1800 * 1000, 4
    span = (
        F.floor(F.col("session_end_ms") / bw)
        - F.floor(F.col("session_start_ms") / bw) + 1
    )
    intervals = sessions.unionByName(audit)
    n_big = intervals.filter(span > cap).count()
    n_small = intervals.filter(span <= cap).count()
    assert n_big > 0, "no oversized interval: broadcast path never runs"
    assert n_small > 0, "no in-cap interval: bucketed path never runs"
    # and every audit interval is oversized (each user spans > 2h of events)
    assert audit.filter(span <= cap).count() == 0
