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

from pyspark.sql import DataFrame
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
    # helper-column collisions corrupt silently (a probe column named
    # _bkt would be overwritten by the explode and the groupBy would
    # split each probe row across buckets with partial counts) — the
    # same fail-fast contract as as_of_join
    # review r13: SQL `div 0` is null, so width_us == 0 used to yield a
    # null bucket on every row → the equi-join matched nothing → every
    # count silently 0.  A non-positive width is a caller bug and must
    # fail loudly, same contract as the reserved-name clash below.
    if width_us <= 0:
        raise ValueError(
            f"interval_count_join: width_us must be positive, got {width_us}"
        )
    reserved = {"_bkt", "_bts", "_pid"}
    clash = reserved & (set(probe.columns) | set(build.columns))
    if clash:
        raise ValueError(
            f"interval_count_join: column name(s) {sorted(clash)} are "
            f"reserved internally; rename them before joining"
        )
    # bucket ids via exact integer `div`, never double `/` + cast: a
    # double division loses ULPs at large epoch-micros, and a build ts
    # exactly on a bucket boundary could round into the neighboring
    # bucket on one side of the join only — a silently missed match.
    # `div` truncates toward zero on both sides, so coverage holds for
    # any sign.
    b = build.select(
        F.expr(f"{build_ts} div {width_us}").alias("_bkt"),
        F.col(build_ts).alias("_bts"),
    )
    lo = F.col(probe_ts) - F.lit(width_us)
    # a private row id preserves DUPLICATE probe rows: grouping on the
    # probe columns alone would merge identical rows and SUM their
    # counts (two equal rows with 3 in-range builds each came back as
    # one row with 6) — the id keeps each input row its own group and
    # is dropped from the output
    p = probe.withColumn("_pid", F.monotonically_increasing_id()).withColumn(
        "_bkt",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"({probe_ts} - {width_us}) div {width_us}"),
                    F.expr(f"{probe_ts} div {width_us}"),
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
        joined.groupBy(F.col("_pid"), *[F.col(c) for c in probe.columns])
        .agg(F.count("_bts").alias(count_alias))
        .drop("_pid")
    )


def trunc_div(a: int, w: int) -> int:
    """Python mirror of SQL ``div`` (truncation toward zero; Python //
    floors) — exposed for the bucket-coverage property test."""
    q = abs(a) // w
    return q if a >= 0 else -q
