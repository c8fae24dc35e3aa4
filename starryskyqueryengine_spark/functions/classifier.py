"""Distributed linear-model training as Catalyst aggregates: the
model-based quality filtering step of a modern LLM data pipeline
(DCLM, FineWeb-Edu style: train a small classifier on labeled docs,
score the corpus, keep the top quantile).

The reference has no learned operator; this is a north-star addition.
The design point is the SCALE SHAPE, not the model class: batch
gradient descent for logistic regression where

- the MODEL lives on the driver (d+1 doubles — constant size),
- each iteration is ONE map-side-combined aggregate over the corpus
  (the gradient per feature — partial aggregates merge associatively,
  no shuffle of data rows, no Python UDF),
- the updated weights re-enter the next iteration's expression as
  LITERALS — nothing is broadcast, nothing is collected but one row.

At 100 TB each iteration costs one corpus scan with a scalar result —
the same cost envelope as any global aggregate — and scoring is a pure
per-row projection.  This is exactly how production distributed GD on
Spark is structured when the feature dimension is small (the
hashing-trick regime swaps the per-feature sum for a vector aggregate;
same shape).

ENGINE-EXACT REPLAY (the same fixed-point discipline as
functions/graph.pagerank): a double SUM is partition-order dependent,
so gradients are accumulated as INTEGERS — each row's gradient term is
floor-scaled (``floor(term * GRAD_SCALE)``, an exact IEEE operation)
and summed as DECIMAL(38,0) (exact, associative, order-independent).
The weight update then runs the identical double arithmetic on the
driver and in the oracle's unrolled SQL from identical integers, so
the learned weights match bit-for-bit; a final floor-quantization to
1e-9 absorbs the one remaining cross-engine wobble (a 1-ulp
``exp`` difference on a row whose scaled term lands within ~2e-4 of
an integer can shift one term by one unit — ~1e-16 in the gradient).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: per-row gradient terms are floor-scaled by this before the exact
#: integer sum; 1e12 keeps |term| resolution at ~1e-12 while row sums
#: stay far inside DECIMAL(38,0)
GRAD_SCALE = 1e12
#: final weight quantum (see module docstring)
WEIGHT_QUANT = 1e9


def _dot(weights: list[float], xs: list[Column]) -> Column:
    # left-associated sum so the oracle's `w0*x0 + w1*x1 + ...` is the
    # identical IEEE evaluation order
    return reduce(lambda a, b: a + b, [F.lit(w) * x for w, x in zip(weights, xs)])


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def quantize_weight(w: float, quant: float = WEIGHT_QUANT) -> float:
    """``floor(w * quant) / quant`` — exact IEEE double ops, identical
    in Python, Spark SQL, and DuckDB."""
    return math.floor(w * quant) / quant


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 2,
    lr: float = 0.5,
) -> list[float]:
    """Batch-GD logistic regression; returns ``[bias, w_1, ..., w_d]``.

    One aggregate job per iteration: per row the gradient term
    ``(sigmoid(x·w) - y) * x_j`` (bias = feature 1.0) is floor-scaled
    to an integer and summed exactly; the update is
    ``w_j <- floorq(w_j - lr * ((k_j / n) / GRAD_SCALE))`` with
    ``k_j`` the integer sum and ``n`` the row count.  ``df`` must
    carry numeric ``feature_cols`` and a 0/1 ``label_col``.
    """
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * len(xs)
    for _ in range(iters):
        p = _sigmoid(_dot(w, xs))

        def _term(j):
            # Spark floor(double) bottlenecks through LONG: a term past
            # 2^63 would silently saturate here while the DuckDB oracle's
            # CAST(... AS BIGINT) raises — so raise on OUR side too
            # (wrong-but-silent weights are worse than a loud rescale
            # demand).  |p - y| <= 1, so this fires only for feature
            # magnitudes >= ~9.2e6 at the default GRAD_SCALE.
            t = (p - y) * xs[j] * F.lit(GRAD_SCALE)
            # NULL terms (NULL feature/label rows) must stay NULL —
            # sum() skips them, the pre-guard behavior; CaseWhen treats
            # a NULL condition as false, so without the isNull arm a
            # NULL row would fall through to the raise
            return F.when(
                t.isNull() | (F.abs(t) < F.lit(9.2e18)), F.floor(t)
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "logreg_train: gradient term overflows BIGINT or "
                        "is NaN/Inf (a NaN feature lands here too: "
                        "abs(NaN) < bound is false) — clean or rescale "
                        "the feature (e.g. log it) or lower GRAD_SCALE"
                    )
                ).cast("bigint")
            )

        aggs = [
            F.sum(_term(j).cast("decimal(38,0)")).alias(f"k{j}")
            for j in range(len(xs))
        ] + [F.count(F.lit(1)).alias("n")]
        row = df.agg(*aggs).collect()[0]
        n = int(row["n"])
        if n == 0:
            return w
        # a sum over all-NULL terms (every row NULL in that feature) is
        # NULL — treat as zero gradient rather than crash; rows with a
        # NULL feature simply contribute nothing (SQL sum semantics,
        # identical in the oracle)
        ks = [int(row[f"k{j}"] or 0) for j in range(len(xs))]
        w = [
            quantize_weight(w[j] - lr * ((float(ks[j]) / n) / GRAD_SCALE))
            for j in range(len(xs))
        ]
    return w


def logreg_score(weights: list[float], feature_cols: list[str]) -> Column:
    """P(y=1 | x) as a pure per-row projection of the trained model."""
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    return _sigmoid(_dot(weights, xs))
