"""Distributed logistic-regression trainer (functions/classifier.py):
bit-exact against a driver-side reference GD (same floor quantization),
deterministic across runs, and actually learns a separable dataset."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from starryskyqueryengine_spark.functions.classifier import (
    GRAD_SCALE,
    logreg_score,
    logreg_train,
    quantize_weight,
)


def _reference_gd(rows, iters, lr):
    """rows: list of (x1, .., xd, y). Same update rule — exact integer
    gradient accumulation + floor-quantized weights — driver-side."""
    d = len(rows[0]) - 1
    w = [0.0] * (d + 1)
    for _ in range(iters):
        ks = [0] * (d + 1)
        for r in rows:
            xs = (1.0,) + tuple(r[:d])
            z = 0.0
            for wj, xj in zip(w, xs):
                z = z + wj * xj
            p = 1.0 / (1.0 + math.exp(-z))
            for j in range(d + 1):
                ks[j] += math.floor((p - r[d]) * xs[j] * GRAD_SCALE)
        n = len(rows)
        w = [
            quantize_weight(w[j] - lr * ((float(ks[j]) / n) / GRAD_SCALE))
            for j in range(d + 1)
        ]
    return w


def _df(spark, rows):
    return spark.createDataFrame(
        [tuple(float(v) for v in r) for r in rows],
        "x1 double, x2 double, y double",
    )


ROWS = [
    # y correlates with x1 (x2 is noise)
    (0.2, 0.9, 0.0), (0.3, 0.1, 0.0), (0.1, 0.5, 0.0), (0.4, 0.7, 0.0),
    (0.8, 0.2, 1.0), (0.9, 0.8, 1.0), (0.7, 0.4, 1.0), (0.95, 0.6, 1.0),
]


def test_logreg_matches_driver_reference_exactly(spark):
    got = logreg_train(_df(spark, ROWS), ["x1", "x2"], "y", iters=3, lr=0.5)
    want = _reference_gd(ROWS, iters=3, lr=0.5)
    # quantization makes both sides land on the same 1e-9 grid; the
    # float-sum association difference is ~1e-16, far below a quantum
    assert got == want, (got, want)


def test_logreg_deterministic_across_runs(spark):
    df = _df(spark, ROWS).repartition(7)  # different partitioning
    w1 = logreg_train(df, ["x1", "x2"], "y", iters=2, lr=0.5)
    w2 = logreg_train(_df(spark, ROWS).repartition(3), ["x1", "x2"], "y",
                      iters=2, lr=0.5)
    assert w1 == w2


def test_logreg_learns_the_separable_feature(spark):
    df = _df(spark, ROWS)
    w = logreg_train(df, ["x1", "x2"], "y", iters=20, lr=2.0)
    assert w[1] > 0, w  # x1 drives the label
    scored = df.select(
        "y", logreg_score(w, ["x1", "x2"]).alias("p")
    ).collect()
    pos = [r["p"] for r in scored if r["y"] == 1.0]
    neg = [r["p"] for r in scored if r["y"] == 0.0]
    assert min(pos) > max(neg), (pos, neg)  # separable -> separated


def test_logreg_score_is_probability(spark):
    df = _df(spark, ROWS)
    w = logreg_train(df, ["x1", "x2"], "y", iters=2, lr=0.5)
    vals = [r["p"] for r in df.select(logreg_score(w, ["x1", "x2"]).alias("p")).collect()]
    assert all(0.0 < v < 1.0 for v in vals)


def test_logreg_null_features_drop_rows_not_crash(spark):
    # NULL propagates through x·w, so a row with ANY NULL feature
    # contributes nothing (SQL sum-skips-NULL semantics, mirrored by the
    # oracle); an all-NULL column therefore drops every row — weights
    # stay zero instead of the float(None) crash
    rows = [(0.2, None, 0.0), (0.8, None, 1.0), (0.9, None, 1.0),
            (0.1, None, 0.0)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    assert logreg_train(df, ["x1", "x2"], "y", iters=2, lr=0.5) == [0.0] * 3
    # a PARTIALLY-null feature: non-null rows still learn
    rows2 = [(0.2, 0.1, 0.0), (0.8, None, 1.0), (0.9, 0.3, 1.0),
             (0.1, 0.2, 0.0)]
    df2 = spark.createDataFrame(rows2, "x1 double, x2 double, y double")
    w = logreg_train(df2, ["x1", "x2"], "y", iters=2, lr=0.5)
    assert w[1] != 0.0


def test_logreg_gradient_plan_is_map_side_combined(spark):
    """Each GD iteration must cost one scan + partial aggregates merged
    through a single one-row-per-task exchange — never a shuffle of
    data rows.  (The 100 TB property the operator exists for.)"""
    import pyspark.sql.functions as F

    from starryskyqueryengine_spark.functions.classifier import (
        GRAD_SCALE,
        _dot,
        _sigmoid,
    )

    df = spark.range(1000).select(
        (F.col("id") / 1000).alias("x1"),
        (F.col("id") % 2).cast("double").alias("y"),
    )
    xs = [F.lit(1.0), F.col("x1").cast("double")]
    p = _sigmoid(_dot([0.0, 0.0], xs))
    agg = df.agg(
        *[
            F.sum(
                F.floor((p - F.col("y")) * xs[j] * F.lit(GRAD_SCALE)).cast(
                    "decimal(38,0)"
                )
            ).alias(f"k{j}")
            for j in range(2)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan  # map-side combine
    assert plan.count("Exchange") == 1 and "SinglePartition" in plan
