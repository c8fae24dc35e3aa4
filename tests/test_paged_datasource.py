"""Python DataSource for the paged cursor API (sources/paged_datasource.py):
batch partition-parallel page windows, sequential-cursor degradation,
streaming cursor-as-offset with checkpoint resume, and growth polling."""

import tempfile

import pytest

from starryskyqueryengine_spark.sources.paged_datasource import (
    register_paged_sources,
)

SF_DIR = "/root/testdata/sf0.001"
DOCS = f"{SF_DIR}/documents.parquet"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_paged_sources(spark)


def test_batch_source_matches_parquet_and_parallelizes(spark):
    df = (
        spark.read.format("starrysky_paged")
        .option("path", DOCS)
        .option("page_size", "50")
        .option("num_partitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # page windows split across tasks
    ref = spark.read.parquet(DOCS).select("doc_id", "text", "lang")
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, ref.collect()))


def test_batch_source_opaque_cursor_single_partition(spark):
    df = (
        spark.read.format("starrysky_paged")
        .option("path", DOCS)
        .option("addressable", "false")
        .load()
    )
    assert df.rdd.getNumPartitions() == 1  # sequential cursor: honest shape
    assert df.count() == 500


def test_batch_source_page_caps(spark):
    df = (
        spark.read.format("starrysky_paged")
        .option("path", DOCS)
        .option("page_size", "50")
        .option("max_pages", "3")
        .option("addressable", "false")
        .load()
    )
    assert df.count() == 150  # T7: the reference's page-count cap


def test_stream_source_cursor_checkpoint_resume(spark):
    sink: list = []
    ck = tempfile.mkdtemp()

    def drain():
        sdf = (
            spark.readStream.format("starrysky_paged_stream")
            .option("path", DOCS)
            .option("page_size", "100")
            .load()
        )
        q = (
            sdf.writeStream.foreachBatch(lambda b, i: sink.extend(b.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert len(sink) == 500
    n1 = len(sink)
    drain()  # same checkpoint, no new remote rows -> zero new emissions
    assert len(sink) == n1
    assert len({r["doc_id"] for r in sink}) == 500  # no duplicates either
