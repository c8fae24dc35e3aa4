"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship feed-materialization query at sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY §2 operator catalog with
DuckDB oracles (see starryskyqueryengine_spark/catalog.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from starryskyqueryengine_spark import catalog  # noqa: E402
from starryskyqueryengine_spark.config import ConditionsRegistry, FeedCondition  # noqa: E402
from starryskyqueryengine_spark.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: single-pass multi-condition feed materialization.

    Evaluates three feed conditions against the documents fixture in ONE
    scan (the reference loops conditions and rows; here it is one columnar
    plan — predicate.compile_all_conditions), producing the (post, key)
    pairs that the upsert sink would append.
    """
    from pyspark.sql import functions as F

    from starryskyqueryengine_spark.ingest import IngestJob
    from starryskyqueryengine_spark.sources import load_table

    apply_runtime_confs(spark)
    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    posts = docs.select(
        F.concat(F.lit("at://did:ex/app.bsky.feed.post/"), F.col("doc_id")).alias("uri"),
        F.format_string("cid%06d", F.col("doc_id")).alias("cid"),
        F.lit(None).cast("string").alias("author_did"),
        F.col("text"),
        F.array(F.col("lang")).alias("langs"),
        F.lit(None).cast("string").alias("replyParent"),
        F.lit(None).cast("string").alias("replyRoot"),
        F.lit(None).cast(
            "array<struct<alt:string,aspectRatio:struct<height:int,width:int>,"
            "fullsize:string,thumb:string>>"
        ).alias("images"),
        F.array().cast("array<string>").alias("labels"),
        F.timestamp_millis(F.lit(1704067200000) + F.col("doc_id") * 60000).alias("createdAt"),
    )
    registry = ConditionsRegistry()
    registry.upsert(FeedCondition(key="vectorfeed", recordName="vectorfeed",
                                  inputRegex="vector", lang="en"))
    registry.upsert(FeedCondition(key="joinfeed", recordName="joinfeed",
                                  inputRegex="join.*merge", invertRegex="slow"))
    registry.upsert(FeedCondition(key="sparkfeed", recordName="sparkfeed",
                                  inputRegex="spark|stream"))
    job = IngestJob(spark, registry, store=None)
    pairs = job.accepted_pairs(posts)
    return pairs.select("key", "uri", "cid", F.col("createdAt").alias("indexedAt"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return catalog.get_oracle_sql()
