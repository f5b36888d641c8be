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


def interval_join(points: DataFrame, intervals: DataFrame, point_ts: str,
                  start: str, end: str, by: list[str],
                  bucket_width: int) -> DataFrame:
    """Containment (range) join: each point row attached to the interval
    rows with ``start <= point_ts <= end`` within the ``by`` keys.

    Scalable construction: time-bucket binning. Every interval is
    replicated into the buckets it covers (replication factor =
    length/bucket_width + 1 — pick ``bucket_width`` near the typical
    interval length), points land in exactly one bucket, and the join is a
    plain equi-join on (by, bucket) followed by the exact BETWEEN filter.
    No O(points x intervals) stage ever materializes, and because a point
    has exactly one bucket, no dedup pass is needed.
    """
    b_pts = points.withColumn("_b", F.floor(F.col(point_ts) / bucket_width))
    b_iv = (
        intervals
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / bucket_width),
                    F.floor(F.col(end) / bucket_width),
                )
            ),
        )
    )
    return (
        b_pts.join(b_iv, [*by, "_b"])
        .filter(F.col(point_ts).between(F.col(start), F.col(end)))
        .drop("_b")
    )


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
