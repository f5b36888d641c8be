"""Generic AS-OF join: for every left row, the newest right row at or
before it.

Spark has no built-in as-of join; the classic scalable construction is
union + running ``last_value``: tag the two sides, union them on the key
columns, and carry the latest right-side payload forward in event order.
One shuffle on the ``by`` keys, no range-condition explosion, no
driver-side state — O(n log n) per key group, the same shape this engine
already uses for parent-batch and txn-marker attribution
(aggregates.attach_parent_batch, group_offsets.read_committed_group_offsets).

DuckDB note (why the oracle mirrors this construction instead of using
DuckDB's native ``ASOF JOIN``): DuckDB pushes outer predicates into the
ASOF build side, which silently changes which right row is "latest" —
the union+window form keeps both engines on identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: list[str], right_cols: list[str],
              tolerance: int | None = None) -> DataFrame:
    """Attach to every ``left`` row the newest ``right`` row with
    ``right[on] <= left[on]`` within the same ``by`` keys.

    ``right_cols`` are carried over (nulled when no right row precedes).
    ``tolerance``: optional max allowed ``left[on] - right[on]`` — an older
    match is treated as absent (the pandas ``merge_asof`` contract).
    Ties on ``on`` prefer the right side (<= semantics); multiple right
    rows at one instant resolve to the last in ``right_cols`` order of
    appearance, so give ``right`` a deterministic secondary order column
    if that matters.
    """
    payload = F.struct(*[F.col(c) for c in right_cols], F.col(on).alias("_asof_on"))
    l_tag = left.withColumn("_tag", F.lit(1)).withColumn("_payload", F.lit(None).cast(
        "struct<" + ",".join([f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols])
        + f",_asof_on:{right.schema[on].dataType.simpleString()}>"
    ))
    r_tag = right.withColumn("_tag", F.lit(0)).withColumn("_payload", payload).select(
        *by, on, "_tag", "_payload"
    )
    common = [*by, on, "_tag", "_payload"]
    unioned = l_tag.select(*left.columns, "_tag", "_payload").unionByName(
        r_tag.select(*common), allowMissingColumns=True
    )
    w = Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col("_tag").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = F.last(F.when(F.col("_tag") == 0, F.col("_payload")), ignorenulls=True).over(w)
    out = unioned.withColumn("_carried", carried).filter(F.col("_tag") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_carried",
            F.when(
                F.col(on) - F.col("_carried._asof_on") <= tolerance, F.col("_carried")
            ),
        )
    return out.select(
        *left.columns,
        *[F.col(f"_carried.{c}").alias(c) for c in right_cols],
    )


def _interval_span_buckets(start: str, end: str, bucket_width: int):
    """Number of buckets an interval replicates into under the binning."""
    return (
        F.floor(F.col(end) / bucket_width) - F.floor(F.col(start) / bucket_width) + 1
    )


def interval_join(points: DataFrame, intervals: DataFrame, point_ts: str,
                  start: str, end: str, by: list[str],
                  bucket_width: int, max_interval_buckets: int = 256,
                  on_oversize: str = "broadcast") -> DataFrame:
    """Containment (range) join: each point row attached to the interval
    rows with ``start <= point_ts <= end`` within the ``by`` keys.

    Scalable construction: time-bucket binning. Every interval is
    replicated into the buckets it covers (replication factor =
    length/bucket_width + 1 — pick ``bucket_width`` near the typical
    interval length), points land in exactly one bucket, and the join is a
    plain equi-join on (by, bucket) followed by the exact BETWEEN filter.
    No O(points x intervals) stage ever materializes, and because a point
    has exactly one bucket, no dedup pass is needed.

    **Replication contract** (VERDICT r4 #2): the bucketed path replicates
    an interval into at most ``max_interval_buckets`` rows. An interval
    spanning more buckets (an unclosed session carried as ``[start, +inf)``,
    a data-quality outlier spanning months) would otherwise explode into
    ``length/bucket_width`` rows — an OOM/straggler at scale. Oversized
    intervals are therefore split out of the explode entirely and handled
    per ``on_oversize``:

    - ``"broadcast"`` (default): the oversized tail is joined via a
      broadcast BETWEEN join. Oversized intervals must be *rare* (they fit
      in a broadcast); that is exactly the regime where this is the right
      plan — each is checked against every same-key point anyway, so
      replicating the handful of intervals beats replicating by length.
    - ``"error"``: any oversized interval fails the job executor-side
      (``assert_true`` — no driver-side count) with a message naming the
      contract. Use when an oversized interval can only mean bad data.
    """
    if on_oversize not in ("broadcast", "error"):
        raise ValueError(f"on_oversize must be 'broadcast'|'error', got {on_oversize!r}")
    span = _interval_span_buckets(start, end, bucket_width)
    b_pts = points.withColumn("_b", F.floor(F.col(point_ts) / bucket_width))

    lo = F.floor(F.col(start) / bucket_width)
    if on_oversize == "error":
        # assert_true returns NULL on success and throws executor-side on
        # failure; folding it into the sequence's lower bound (+0) keeps it
        # un-prunable — a guard in its own dropped column would be removed
        # by Catalyst's column pruning and never evaluate.
        guard = F.assert_true(
            span <= max_interval_buckets,
            F.concat(
                F.lit(
                    f"interval_join: interval spans more than "
                    f"{max_interval_buckets} buckets of width {bucket_width} "
                    f"([{start}, {end}] = "
                ),
                span.cast("string"),
                F.lit(" buckets); widen bucket_width, raise "
                      "max_interval_buckets, or use on_oversize='broadcast'"),
            ),
        )
        lo = lo + F.coalesce(guard.cast("long"), F.lit(0))
        small, big = intervals, None
    else:
        small = intervals.filter(span <= max_interval_buckets)
        big = intervals.filter(span > max_interval_buckets)

    b_iv = small.withColumn(
        "_b",
        F.explode(F.sequence(lo, F.floor(F.col(end) / bucket_width))),
    )
    out = (
        b_pts.join(b_iv, [*by, "_b"])
        .filter(F.col(point_ts).between(F.col(start), F.col(end)))
        .drop("_b")
    )
    if big is not None:
        tail = (
            points.join(F.broadcast(big), by)
            .filter(F.col(point_ts).between(F.col(start), F.col(end)))
        )
        out = out.unionByName(tail)
    return out


def hypertable_rollup(events: DataFrame, ts_ms: str, by: list[str],
                      value: str, resolutions_ms: list[int]) -> DataFrame:
    """Multi-resolution continuous aggregate (the hypertable rollup
    pattern): bucket counts/sums/min/max at the finest resolution, then
    derive every coarser level BY RE-AGGREGATING THE FINER ROLLUP — the
    raw table is scanned exactly once no matter how many resolutions are
    materialized, which is the whole point at 10^12 events.

    ``resolutions_ms`` must be sorted ascending and each must divide the
    next (1m -> 1h -> 1d); all emitted aggregates (count, sum, min, max —
    and avg derived from sum/count) re-aggregate losslessly. Output:
    one row per (resolution_ms, bucket_start_ms, *by).
    """
    for fine, coarse in zip(resolutions_ms, resolutions_ms[1:]):
        if coarse % fine:
            raise ValueError(f"{coarse} not a multiple of {fine}")

    def agg(df, res, from_raw):
        bucket = (F.floor(F.col(ts_ms if from_raw else "bucket_start_ms") / res) * res)
        if from_raw:
            n, s = F.count("*"), F.sum(value)
            mn, mx = F.min(value), F.max(value)
        else:
            n, s = F.sum("n_events"), F.sum("sum_value")
            mn, mx = F.min("min_value"), F.max("max_value")
        return df.groupBy(bucket.cast("long").alias("bucket_start_ms"), *by).agg(
            n.cast("long").alias("n_events"), s.alias("sum_value"),
            mn.alias("min_value"), mx.alias("max_value"),
        ).withColumn("resolution_ms", F.lit(res))

    levels = [agg(events, resolutions_ms[0], from_raw=True)]
    for res in resolutions_ms[1:]:
        levels.append(agg(levels[-1].drop("resolution_ms"), res, from_raw=False))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("resolution_ms", "bucket_start_ms", *by,
                      "n_events", "sum_value", "min_value", "max_value")
