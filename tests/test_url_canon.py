"""URL canonicalization properties beyond the oracle check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _canon_df(spark, urls):
    """Run the PRODUCTION canonicalization Column (catalog_curation.
    canonical_url_col — the same expression url_canonical_dedup uses, so
    these properties pin the real operator, not a copy)."""
    from starryskyqueryengine_spark.catalog_curation import canonical_url_col

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonical_url_col("url").alias("c")).collect()]


VARIANTS = [
    # all six spell the same resource
    "https://CDN.Example.COM/page/7?id=7",
    "https://cdn.example.com:443/page/7?id=7",
    "https://cdn.example.com/page/7/?id=7",
    "https://cdn.example.com/page/7?utm_source=feed&id=7",
    "https://cdn.example.com/page/7?id=7#section",
    "https://CDN.example.com:443/page/7///?utm_source=x&id=7#frag",
]


def test_variants_collapse_to_one(spark):
    out = set(_canon_df(spark, VARIANTS))
    assert out == {"https://cdn.example.com/page/7?id=7"}


def test_canonicalization_idempotent(spark):
    """canon(canon(u)) == canon(u): canonical outputs are fixed points."""
    once = _canon_df(spark, VARIANTS)
    twice = _canon_df(spark, once)
    assert once == twice


def test_distinct_resources_stay_distinct(spark):
    urls = [
        "https://cdn.example.com/page/7?id=7",
        "https://cdn.example.com/page/8?id=8",          # other page
        "https://cdn.example.com:8443/page/7?id=7",     # explicit non-default port
        "https://other.example.com/page/7?id=7",        # other host
        "https://cdn.example.com/page/7?id=7&x=1",      # extra non-utm param
    ]
    out = _canon_df(spark, urls)
    assert len(set(out)) == len(urls)
