"""Distributed PCA over an embedding column (fit + project).

Standard two-phase design (the same shape Spark MLlib's RowMatrix PCA
uses, re-expressed over DataFrames; public algorithm — e.g. Halko et al.
2011 for the randomized variant, classic eigendecomposition here):

1. **fit** — the d×d scatter matrix Xᵀ X and the column-sum vector are
   accumulated as PER-PARTITION numpy partials inside one Arrow-batched
   ``mapInPandas`` pass (each task emits ONE row carrying a d² array —
   never the n×d data), then the ~p partials are summed and
   eigendecomposed on the driver: O(n·d²) distributed flops, O(p·d²)
   driver bytes, one pass, no shuffle of the input.  With d = 64 a
   partial is 32 KiB — at 100 TB the reduce is p rows, independent of n.
2. **project** — components are broadcast inside a closed-over numpy
   array; projection is one more Arrow-batched pass (matmul per batch).

Determinism note: float partial sums depend on partition boundaries, so
PCA is policy-classed with the trained IVF index (rows-only at the
catalog level; numpy-parity + invariant tests in tests/test_pca.py).
The value-checkable twins live in catalog_similarity.py:
``embedding_dim_stats`` (exact fixed-point moments) and
``embedding_random_projection`` (data-independent JL matrix).

Sign convention: each eigenvector is flipped so its largest-|.|
component is positive — removes the eigensolver's sign ambiguity so
fits are comparable across runs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _scatter_partials(vec_col: str, d: int):
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        ss = np.zeros((d, d))
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            bad = next((v for v in vecs if v.shape != (d,)), None)
            if bad is not None:
                # name the problem instead of letting np.asarray build a
                # ragged object array and fail later with an unrelated
                # broadcasting error
                raise ValueError(
                    f"pca_fit: vector of size {bad.shape} in "
                    f"{vec_col!r}, expected ({d},)"
                )
            x = np.asarray(vecs)
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += x.T @ x
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
        )

    return emit, schema


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 8
) -> dict:
    """Fit PCA: returns {"mean": (d,), "components": (k, d),
    "explained_variance": (k,)} as numpy arrays.  One distributed pass;
    eigendecomposition of the d×d covariance happens on the driver
    (d is small by construction — the 100 TB cost is the data pass)."""
    # derive d from the first NON-NULL vector (a one-row probe — a NULL
    # first row previously gave F.size = -1 and an opaque
    # np.zeros(-1) ValueError on the driver); ragged/null vectors are
    # checked inside the single scatter pass itself, so the guard costs
    # no extra scan of the data
    first = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    if first is None:
        raise ValueError("pca_fit: empty input (no non-null vectors)")
    d = first["d"]
    if not 0 < k <= d:
        # loud, named (review r10): argsort[:k] would silently return
        # d components for k > d — the caller's downstream shapes then
        # break far from the cause (sklearn raises here too)
        raise ValueError(f"pca_fit: k={k} must be in [1, d={d}]")
    emit, schema = _scatter_partials(vec_col, d)
    parts = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(emit, schema)
        .collect()  # one row per task: p × (d² + d) doubles, data-size independent
    )
    n = sum(r["n"] for r in parts)
    if n == 0:
        raise ValueError("pca_fit: empty input")
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.asarray(r["ss"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)  # population covariance
    evals, evecs = np.linalg.eigh(cov)   # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T            # (k, d)
    flip = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": evals[order],
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append the k-dim PCA projection (x - mean) @ componentsᵀ as
    ``out_col``.  Components ride the closure (broadcast once per
    executor); one Arrow-batched matmul pass, no shuffle."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)

    if out_col in df.columns:
        # fail fast (review r12): appending a duplicate field name
        # builds a two-`pca`-column schema that errors in the Arrow
        # serializer far from the cause — same contract as the
        # retention/asof reserved-name guards
        raise ValueError(
            f"pca_project: output column {out_col!r} already exists; "
            "pass a different out_col"
        )
    out_fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.DoubleType()))
    ]
    out_schema = T.StructType(out_fields)

    d = len(mean)

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # same NULL/ragged discipline as pca_fit: a NULL or
            # wrong-width vector projects to NULL instead of collapsing
            # the whole batch into an opaque inhomogeneous-shape error
            vecs = list(pdf[vec_col])
            ok = [
                v is not None and len(v) == d
                for v in vecs
            ]
            x = np.asarray(
                [
                    np.asarray(v, dtype=np.float64) if good
                    else np.zeros(d)
                    for v, good in zip(vecs, ok)
                ]
            )
            y = (x - mean) @ comps.T
            pdf = pdf.copy()
            pdf[out_col] = [
                row.tolist() if good else None
                for row, good in zip(y, ok)
            ]
            yield pdf

    return df.mapInPandas(proj, out_schema)
