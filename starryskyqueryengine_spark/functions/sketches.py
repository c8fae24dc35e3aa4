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
sketch for candidates, count for truth.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, term_col: str, k: int) -> DataFrame:
    """Per-partition k-counter Misra-Gries summaries as (term, est)
    rows.  Arrow-batched; counters persist across a partition's batches
    and are emitted once at partition end."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # WEIGHTED Misra-Gries: each Arrow batch is pre-aggregated with a
        # vectorized value_counts, then unique (term, weight) pairs feed
        # the counters — dict work scales with distinct terms per batch,
        # not rows.  A weight-d subtraction event removes d*(k+1) total
        # weight, so the underestimate stays <= W/(k+1) and the superset
        # guarantee (every item with weight > W/k survives) holds
        # unchanged (Agarwal et al., Mergeable Summaries).
        counters: dict[str, int] = {}
        for pdf in batches:
            for t, w in pdf[term_col].value_counts(dropna=True).items():
                w = int(w)
                if t in counters:
                    counters[t] += w
                elif len(counters) < k:
                    counters[t] = w
                else:
                    d = min(w, min(counters.values()))
                    for key in list(counters):
                        counters[key] -= d
                        if counters[key] == 0:
                            del counters[key]
                    if w > d and len(counters) < k:
                        counters[t] = w - d
        yield pd.DataFrame(
            {"term": list(counters.keys()), "est": list(counters.values())}
        )

    src = df.select(F.col(term_col).alias(term_col))
    # a tiny local fixture often arrives as ONE input partition — spread
    # the Python sketch work across cores; a real at-scale input already
    # has many partitions and skips this
    par = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < max(2, par // 4):
        src = src.repartition(par)
    return src.mapInPandas(mg, "term string, est long")


def heavy_hitters_exact(
    df: DataFrame, term_col: str, threshold_of_n, k_of_threshold=None
) -> DataFrame:
    """All items of ``term_col`` with exact count >= threshold, computed
    with the two-pass sketch-then-verify plan.

    ``threshold_of_n`` maps the total item count n to the integer
    support threshold (e.g. ``lambda n: (2 * n + 999) // 1000`` for
    phi = 0.2%).  ``k_of_threshold`` maps (n, threshold) to the MG
    capacity; the default 2n/threshold guarantees the superset property
    with a 2x margin.  Returns (term, n) rows — exact, deterministic,
    partition-independent."""
    n = df.filter(F.col(term_col).isNotNull()).count()
    if n == 0:
        return df.sparkSession.createDataFrame([], "term string, n long")
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
