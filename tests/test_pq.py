"""Product-quantization invariants beyond the oracle parity check."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.catalog_similarity import (
    PQ_K,
    PQ_M,
    PQ_SCALE,
    PQ_SUB,
    _pq_codebook,
    _pq_encoded,
    ann_pq_adc_topk,
    pq_encode,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def encoded(spark):
    return pq_encode(spark, SF_DIR).collect()


def test_pq_codes_in_range_and_err_nonneg(encoded):
    assert len(encoded) > 0
    for r in encoded:
        for m in range(PQ_M):
            assert 0 <= r[f"code_{m}"] < PQ_K
        assert r["pq_err"] >= 0


def test_pq_encode_matches_numpy_reference(spark, encoded):
    """Bit-exact replay of a row sample against a straight-line numpy
    implementation reading the raw parquet (independent of the kernel's
    batching)."""
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype="float64")
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .limit(50)
        .collect()
    }
    cb = _pq_codebook()
    got = {r["vec_id"]: r for r in encoded if r["vec_id"] in emb}
    assert len(got) == len(emb)
    for vid, x in emb.items():
        qv = np.floor(x * PQ_SCALE + 0.5).astype("int64")
        err = 0
        for m in range(PQ_M):
            sub = qv[m * PQ_SUB:(m + 1) * PQ_SUB]
            d = ((sub[None, :] - cb[m]) ** 2).sum(axis=1)
            code = int(d.argmin())
            assert got[vid][f"code_{m}"] == code, (vid, m)
            err += int(d[code])
        assert got[vid]["pq_err"] == err, vid


def test_pq_encode_partition_invariant(spark, encoded):
    """Same codes regardless of batch/partition layout (the kernel is
    per-row pure, so any slicing must agree)."""
    base = _pq_encoded(spark, SF_DIR)
    again = sorted(
        tuple(r) for r in
        base.repartition(7).collect()
    )
    assert again == sorted(tuple(r) for r in encoded)


def test_adc_self_distance_equals_pq_err(spark, encoded):
    """ADC(q, q) with q = the query vector itself: the LUT lookup at q's
    own codes is exactly q's quantization error — pins the LUT and the
    code columns to the same codebook."""
    top = ann_pq_adc_topk(spark, SF_DIR).collect()
    by_id = {r["vec_id"]: r["adc_dist"] for r in top}
    q_err = next(r["pq_err"] for r in encoded if r["vec_id"] == 0)
    assert 0 in by_id, "query vector should appear in its own top-k"
    assert by_id[0] == q_err


def test_adc_topk_sorted_and_bounded(spark):
    top = ann_pq_adc_topk(spark, SF_DIR).collect()
    dists = [r["adc_dist"] for r in top]
    assert dists == sorted(dists)
    assert all(d >= 0 for d in dists)
