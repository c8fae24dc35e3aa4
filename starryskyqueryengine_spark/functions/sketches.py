"""Frequency sketches: Misra-Gries heavy-hitter candidates and the
two-pass EXACT heavy-hitters operator built on them.

The one-pass exact answer ("all items with frequency >= phi*n") needs a
full groupBy over every distinct item — at 100 TB of n-grams that is a
shuffle keyed by billions of distinct strings, almost all of which are
far below the support threshold.  The classic fix (Misra & Gries 1982;
the merge argument per Agarwal et al., "Mergeable Summaries", PODS'12)
is sublinear candidate generation:

- **Pass 1**: each partition keeps a k-counter Misra-Gries summary
  (k = 2/phi), O(k) memory per task, emitted as (term, est) rows —
  at most tasks*k rows total, independent of the distinct count.
  Union-summed estimates underestimate true counts by at most n/k, so
  EVERY item with true count > n/k appears in some summary: the union
  is a guaranteed superset of the heavy hitters.
- **Pass 2**: exact counts for the candidate set only (broadcast
  semi-join — the shuffle now carries only candidate keys), filtered
  at the exact integer threshold.

The output is therefore EXACT (value-checkable against a plain SQL
GROUP BY ... HAVING oracle) while the full-key shuffle never happens —
sketch for candidates, count for truth.  With ``phi`` given the total
count rides along pass 1 (per-partition totals next to the summaries),
so the whole operator is TWO corpus scans — sketch and verify — not
three; without it a dedicated count pass sizes k first (legacy shape).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_fold(counters: dict, weights, k: int) -> dict:
    """Fold one batch frequency summary into a Misra-Gries summary of
    capacity ``k`` (the MERGE of Agarwal et al.): add, then if more than
    k counters remain subtract the (k+1)-th largest value from all and
    keep the strictly positive ones.  Module-level (r13) so the superset
    guarantee — every item with total weight > W/k survives the fold
    sequence — is property-testable without a SparkSession; the Spark
    kernel below delegates here."""
    for t, w in weights.items():
        counters[t] = counters.get(t, 0) + int(w)
    if len(counters) > k:
        d = sorted(counters.values(), reverse=True)[k]
        counters = {t: w - d for t, w in counters.items() if w > d}
    return counters


def misra_gries_candidates(
    df: DataFrame,
    term_col: str,
    k: int,
    emit_partition_totals: bool = False,
) -> DataFrame:
    """Per-partition k-counter Misra-Gries summaries as (term, est)
    rows.  Arrow-batched; counters persist across a partition's batches
    and are emitted once at partition end.

    Each Arrow batch is itself a complete frequency summary (a
    vectorized ``value_counts``), so batches fold in via the MERGE
    operation of Agarwal et al.: add the two summaries, and when more
    than k counters remain subtract the (k+1)-th largest value from all
    and keep the positive ones.  Every subtraction of d is backed by at
    least (k+1) counters holding >= d, so the cumulative underestimate
    stays <= W/(k+1) and the superset guarantee (every item with weight
    > W/k survives) holds — with O(u log u) work per batch (u = distinct
    terms in play), not the O(u*k) of per-term eviction scans.

    ``emit_partition_totals=True`` appends a ``w`` column: NULL on
    summary rows, plus ONE (term=NULL, est=NULL, w=partition weight) row
    per partition — how ``heavy_hitters_exact`` learns n without a
    dedicated count scan.  The term column keeps the input column's
    type (a bigint token-id corpus sketches as naturally as strings).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    term_dt = dict(df.dtypes)[term_col]

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        total = 0
        for pdf in batches:
            vc = pdf[term_col].value_counts(dropna=True, sort=False)
            total += int(vc.sum())
            counters = mg_fold(counters, vc, k)
        out = pd.DataFrame(
            {"term": list(counters.keys()), "est": list(counters.values())}
        )
        if emit_partition_totals:
            out["w"] = pd.array([None] * len(out), dtype="Int64")
            out = pd.concat(
                [out, pd.DataFrame({"term": [None], "est": pd.array([None], dtype="Int64"),
                                    "w": pd.array([total], dtype="Int64")})],
                ignore_index=True,
            )
        yield out

    src = df.select(F.col(term_col).alias(term_col))
    # a tiny local fixture often arrives as ONE input partition — spread
    # the Python sketch work across cores; a real at-scale input already
    # has many partitions and skips this
    par = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < max(2, par // 4):
        src = src.repartition(par)
    schema = f"term {term_dt}, est long"
    if emit_partition_totals:
        schema += ", w long"
    return src.mapInPandas(mg, schema)


def heavy_hitters_exact(
    df: DataFrame,
    term_col: str,
    threshold_of_n,
    k_of_threshold=None,
    phi: float | None = None,
) -> DataFrame:
    """All items of ``term_col`` with exact count >= threshold, computed
    with the two-pass sketch-then-verify plan.

    ``threshold_of_n`` maps the total item count n to the integer
    support threshold (e.g. ``lambda n: (2 * n + 999) // 1000`` for
    phi = 0.2%).  Returns (term, n) rows — exact, deterministic,
    partition-independent.

    With ``phi`` given (the support fraction the threshold mapping
    implements), the sketch capacity is the n-free k = ceil(2/phi), so
    pass 1 runs WITHOUT knowing n: the per-partition totals ride along
    the summaries and the whole operator costs exactly two corpus scans
    (at 100 TB the old dedicated count pass re-ran the full upstream
    tokenize lineage a third time).  The mapping must satisfy
    ``threshold_of_n(n) >= phi * n`` — checked, since the superset
    guarantee depends on it.  Without ``phi`` the legacy three-scan
    shape (count, sketch with k = 2n/threshold, verify) is kept.

    ``k_of_threshold`` (n, threshold) -> capacity overrides k in the
    legacy path only.
    """
    term_dt = dict(df.dtypes)[term_col]
    empty = f"term {term_dt}, n long"
    if phi is not None:
        if not 0 < phi <= 1:
            raise ValueError(f"phi must be in (0, 1], got {phi}")
        k = max(1, math.ceil(2 / phi))
        sk = misra_gries_candidates(
            df, term_col, k, emit_partition_totals=True
        ).localCheckpoint(eager=True)  # tiny (tasks*k rows); lineage severed
        n = sk.agg(F.sum("w").alias("n")).collect()[0]["n"] or 0
        if n == 0:
            return df.sparkSession.createDataFrame([], empty)
        threshold = int(threshold_of_n(n))
        if threshold < 1:
            raise ValueError(f"threshold must be >= 1, got {threshold}")
        if threshold < phi * n:
            raise ValueError(
                f"threshold_of_n(n={n}) = {threshold} is below phi*n = "
                f"{phi * n:.1f}: the k = 2/phi sketch only guarantees a "
                f"candidate superset at or above that support"
            )
        cands = (
            sk.filter(F.col("term").isNotNull())
            .select(F.col("term").alias(term_col))
            .distinct()
        )
    else:
        n = df.filter(F.col(term_col).isNotNull()).count()
        if n == 0:
            return df.sparkSession.createDataFrame([], empty)
        threshold = int(threshold_of_n(n))
        if threshold < 1:
            raise ValueError(f"threshold must be >= 1, got {threshold}")
        k = (
            int(k_of_threshold(n, threshold))
            if k_of_threshold is not None
            else max(1, (2 * n + threshold - 1) // threshold)
        )
        cands = (
            misra_gries_candidates(df, term_col, k)
            .select(F.col("term").alias(term_col))
            .distinct()
        )
    return (
        df.join(F.broadcast(cands), term_col, "left_semi")
        .groupBy(F.col(term_col).alias("term"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") >= threshold)
    )
