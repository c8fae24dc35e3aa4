"""End-to-end streaming ingest: native paged-cursor DataSource ->
condition evaluation (IngestJob) -> PostStore on TxnLogFormat with the
txn watermark — one chain, killed mid-run and resumed.

Round-5 verdict ask #9: the pieces (cursor checkpoint resume, upsert
idempotence, exactly-once txn appends) were each tested separately;
this proves the composed chain delivers exactly-once under a crash that
lands BETWEEN the physical commit and Spark's batch checkpoint — the
window where a non-transactional sink double-writes.
"""

import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.config import ConditionsRegistry, FeedCondition
from starryskyqueryengine_spark.ingest import IngestJob
from starryskyqueryengine_spark.sources import load_table
from starryskyqueryengine_spark.sources.paged_datasource import (
    register_paged_sources,
)
from starryskyqueryengine_spark.store import PostStore
from starryskyqueryengine_spark.table_format import TxnLogFormat

SF_DIR = "/root/testdata/sf0.001"
DOCS = f"{SF_DIR}/documents.parquet"


def _registry():
    reg = ConditionsRegistry()
    reg.upsert(FeedCondition(key="sparkfeed", recordName="sparkfeed",
                             inputRegex="spark|stream"))
    reg.upsert(FeedCondition(key="vecfeed", recordName="vecfeed",
                             inputRegex="vector", lang="en"))
    return reg


def _to_posts(df):
    return df.select(
        F.concat(F.lit("at://did:ex/app.bsky.feed.post/"), F.col("doc_id")).alias("uri"),
        F.format_string("cid%06d", F.col("doc_id")).alias("cid"),
        F.col("text"),
        F.array(F.col("lang")).alias("langs"),
        F.lit(None).cast("string").alias("replyParent"),
        F.lit(None).cast("string").alias("replyRoot"),
        F.lit(None).cast(
            "array<struct<alt:string,aspectRatio:struct<height:int,width:int>,"
            "fullsize:string,thumb:string>>"
        ).alias("images"),
        F.array().cast("array<string>").alias("labels"),
        F.timestamp_millis(F.lit(1704067200000) + F.col("doc_id") * 60000).alias(
            "createdAt"
        ),
    )


def test_e2e_paged_stream_ingest_exactly_once_across_crash(spark, tmp_path):
    register_paged_sources(spark)
    reg = _registry()
    fmt = TxnLogFormat(spark, str(tmp_path / "table"))
    store = PostStore(spark, str(tmp_path / "table"), fmt=fmt)
    job = IngestJob(spark, reg, store=store)
    ck = str(tmp_path / "ck")
    seen_batches: list[int] = []
    crash_after = {"batch": 1, "armed": True}

    def sink(batch_df, batch_id):
        pairs = job.accepted_pairs(_to_posts(batch_df))
        posts = pairs.select(
            "uri", "key", "cid", "replyParent", "replyRoot",
            F.col("createdAt").alias("indexedAt"),
        )
        store.upsert(posts, txn=("e2e-ingest", batch_id))
        seen_batches.append(batch_id)
        if crash_after["armed"] and batch_id >= crash_after["batch"]:
            crash_after["armed"] = False
            # die AFTER the physical commit, BEFORE Spark checkpoints
            # this batch — the classic double-write window
            raise RuntimeError("simulated crash after commit")

    def drain():
        # availableNow + SimpleDataSourceStreamReader = exactly ONE
        # micro-batch (one cursor page here) per query start; repeated
        # drains on the same checkpoint are the kill-and-restart cycle
        sdf = (
            spark.readStream.format("starrysky_paged_stream")
            .option("path", DOCS)
            .option("page_size", "100")
            .option("max_pages", "1")
            .load()
        )
        q = (
            sdf.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        except Exception:
            pass  # the simulated crash surfaces here

    drain()   # batch 0: ok
    drain()   # batch 1: committed, then CRASH before the checkpoint
    n_committed_at_crash = len(fmt.history())
    assert crash_after["armed"] is False, "crash never fired"

    for _ in range(6):  # resume: batch 1 replays, then 2..4 + idle tail
        drain()

    # every accepted (uri, key) pair appears EXACTLY once
    expected = (
        job.accepted_pairs(_to_posts(load_table(spark, SF_DIR, "documents")))
        .select("uri", "key")
        .distinct()
    )
    got = store.read().select("uri", "key")
    assert got.count() == got.distinct().count(), "duplicate rows in store"
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )

    # the replayed batch must NOT have produced a second physical append:
    # each distinct batch id commits at most once
    txns = [
        fmt._read_entry(v).get("txn") for v in fmt._versions()
    ]
    batch_versions = [t["version"] for t in txns if t and t["app"] == "e2e-ingest"]
    assert len(batch_versions) == len(set(batch_versions)), batch_versions

    # the resumed run replayed the crashed batch id (cursor came back to
    # the checkpointed offset), then advanced
    assert seen_batches.count(1) >= 2
    assert max(seen_batches) >= 4
    assert len(fmt.history()) > n_committed_at_crash
