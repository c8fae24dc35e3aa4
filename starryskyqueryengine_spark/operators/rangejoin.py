"""Interval (range) join without an equi-key, made shuffle-joinable.

The reference has no range join (SURVEY §2.3 notes none exists); this is a
north-star temporal operator a training-data pipeline needs (e.g. "events
within N minutes of each anchor"). A naive Spark plan for

    probe.join(build, (build.ts >= probe.ts - width) & (build.ts <= probe.ts))

is a BroadcastNestedLoopJoin — O(|probe|·|build|) comparisons and a
broadcast of one whole side, which dies at scale. The scale-safe shape used
here is *temporal bucketing*: quantize time into buckets of the range width,
explode each probe row to the (at most two) buckets its window can touch,
then equi-join on the bucket key and re-apply the exact range predicate.
One shuffle on a well-distributed key, no quadratic pair space, and AQE can
split skewed buckets. This is the same trick DuckDB's IEJoin / Flink's
interval join solve natively; Spark expresses it as a plan rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_count_join(
    probe: DataFrame,
    build: DataFrame,
    probe_ts: str,
    build_ts: str,
    width_us: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """For each probe row, count build rows with
    ``probe_ts - width_us < build_ts <= probe_ts``.

    Both ts columns are bigint epoch-micros. Returns probe columns +
    ``count_alias`` (bigint, 0 when none in range). The window spans at
    most two buckets of size ``width_us``, so the explode fan-out is
    exactly 2 rows per probe row.
    """
    b = build.select(
        (F.col(build_ts) / F.lit(width_us)).cast("bigint").alias("_bkt"),
        F.col(build_ts).alias("_bts"),
    )
    lo = F.col(probe_ts) - F.lit(width_us)
    p = probe.withColumn(
        "_bkt",
        F.explode(
            F.array_distinct(
                F.array(
                    (lo / F.lit(width_us)).cast("bigint"),
                    (F.col(probe_ts) / F.lit(width_us)).cast("bigint"),
                )
            )
        ),
    )
    joined = p.join(
        b,
        (p["_bkt"] == b["_bkt"]) & (b["_bts"] > lo) & (b["_bts"] <= F.col(probe_ts)),
        "left",
    )
    return (
        joined.groupBy(*[F.col(c) for c in probe.columns])
        .agg(F.count("_bts").alias(count_alias))
    )


def bucket_key(ts: Column, width_us: int) -> Column:
    """Bucket id for a bigint-micros timestamp (exposed for tests)."""
    return (ts / F.lit(width_us)).cast("bigint")
