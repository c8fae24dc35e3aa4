"""Python DataSource for the paged cursor API (sources/paged_datasource.py):
batch partition-parallel page windows, sequential-cursor degradation,
streaming cursor-as-offset with checkpoint resume, and growth polling."""

import tempfile

from pyspark.sql import functions as F

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


def test_table_changes_stream_source(spark, tmp_path):
    """starrysky_table_changes: the TxnLogFormat commit log as a
    streaming source. A drain surfaces every commit past the
    checkpointed offset as insert/delete rows tagged with the commit
    version; a second drain on the same checkpoint replays ONLY commits
    that landed in between (the offset IS the consumer cursor). Also
    covers: partition-key injection (incl. escaped values), schema
    evolution NULL-fill for pre-widening files, and zero-row handling
    of metadata-only commits."""
    import datetime

    from starryskyqueryengine_spark.sources.table_changes import (
        register_table_changes_source,
    )
    from starryskyqueryengine_spark.table_format import TxnLogFormat

    register_table_changes_source(spark)
    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    fmt.append(_batch_tc(spark, 0, 4, key="NOT SPECIFIED"))
    fmt.append(
        _batch_tc(spark, 4, 3, key="k2").withColumn("score", F.lit(1.5))
    )  # widens the schema; v0's rows must NULL-fill on read
    fmt.delete_partition("NOT SPECIFIED")
    fmt.add_constraint("uri_ok", "uri IS NOT NULL")  # metadata-only commit

    stream = (
        spark.readStream.format("starrysky_table_changes")
        .option("path", str(tmp_path / "t"))
        .load()
    )
    assert "score" in stream.columns and "_change" in stream.columns
    out = str(tmp_path / "rows")
    spark.createDataFrame([], stream.schema).write.mode("append").parquet(out)

    def drain():
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    rows = spark.read.parquet(out)
    per = {
        (r["_commit_version"], r["_change"]): r["count"]
        for r in rows.groupBy("_commit_version", "_change").count().collect()
    }
    assert per == {(0, "insert"): 4, (1, "insert"): 3, (2, "delete"): 4}
    # key injected + unescaped; evolved column NULL-filled for v0 files
    v0 = rows.filter(F.col("_commit_version") == 0)
    assert v0.select("key").distinct().collect()[0][0] == "NOT SPECIFIED"
    assert v0.filter(F.col("score").isNull()).count() == 4

    n1 = rows.count()
    fmt.append(_batch_tc(spark, 10, 2, key="k2"))
    drain()
    rows2 = spark.read.parquet(out)
    assert rows2.count() == n1 + 2  # ONLY the new commit replayed
    assert (
        rows2.filter(F.col("_commit_version") == 4).count() == 2
    )


def _batch_tc(spark, n0, n, key="k1"):
    import datetime

    rows = [
        (f"at://u/p/{i}", key, f"c{i:03d}", None, None,
         datetime.datetime(2026, 1, 1, 0, 0, i % 60))
        for i in range(n0, n0 + n)
    ]
    return spark.createDataFrame(
        rows,
        "uri string, key string, cid string, replyParent string, "
        "replyRoot string, indexedAt timestamp",
    )


def test_table_changes_stream_replays_under_user_projected_schema(
    spark, tmp_path
):
    """A stream defined with a user-specified SUBSET schema must replay
    the table's historical schema-bearing commits cleanly — the extra
    columns are projected away by read(), not misclassified as a
    mid-stream evolution (the baseline is the table schema pinned in
    the offsets, never the reader's possibly-projected column set)."""
    from starryskyqueryengine_spark.sources.table_changes import (
        register_table_changes_source,
    )
    from starryskyqueryengine_spark.table_format import TxnLogFormat

    register_table_changes_source(spark)
    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    fmt.append(_batch_tc(spark, 0, 3))  # v0 logs the full schema

    stream = (
        spark.readStream.format("starrysky_table_changes")
        .schema(
            "uri string, key string, _change string, _commit_version int"
        )
        .option("path", str(tmp_path / "t"))
        .load()
    )
    out = str(tmp_path / "rows")
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert set(got.columns) == {"uri", "key", "_change", "_commit_version"}


def test_table_changes_stream_rejects_midstream_schema_evolution(
    spark, tmp_path
):
    """Round-7 verdict #8: the CDF stream's column set is frozen at
    definition — a mid-stream schema evolution adding a column the
    stream cannot represent must FAIL the micro-batch loudly (Delta's
    incompatible-schema-change behavior), never silently drop the new
    column from later batches.  Historical (narrower) schemas replayed
    from before the stream started stay fine — the first drain below
    replays the initial schema-bearing commit without complaint."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from starryskyqueryengine_spark.sources.table_changes import (
        register_table_changes_source,
    )
    from starryskyqueryengine_spark.table_format import TxnLogFormat

    register_table_changes_source(spark)
    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    fmt.append(_batch_tc(spark, 0, 3))

    stream = (
        spark.readStream.format("starrysky_table_changes")
        .option("path", str(tmp_path / "t"))
        .load()
    )
    out = str(tmp_path / "rows")

    def drain():
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # replays v0 (its logged schema == the frozen one): fine
    assert spark.read.parquet(out).count() == 3

    # table evolves AFTER the stream was defined: the next drain must
    # fail loudly instead of silently dropping the new column
    fmt.append(_batch_tc(spark, 10, 2).withColumn("score", F.lit(1.5)))
    with pytest.raises(StreamingQueryException, match="incompatible schema"):
        drain()


def test_ddl_field_names_bracket_aware():
    """Commas inside decimal(10,2) / map<string,int> / struct<...> must
    not split fields — the old naive split produced phantom columns
    that KeyError'd the parquet read."""
    from starryskyqueryengine_spark.sources.paged_datasource import (
        _ddl_field_names,
    )

    assert _ddl_field_names("doc_id bigint, price decimal(10,2)") == [
        "doc_id",
        "price",
    ]
    assert _ddl_field_names(
        "a map<string,int>, b struct<x:int,y:decimal(5,2)>, c string"
    ) == ["a", "b", "c"]
    assert _ddl_field_names("d: string, e: int") == ["d", "e"]
    assert _ddl_field_names("x int") == ["x"]


def test_ddl_field_names_backtick_aware():
    """Review r11: a backtick-quoted column may legally contain a comma
    or space — the scanner must treat quoted spans as opaque instead of
    splitting at an embedded comma or truncating at an embedded space."""
    from starryskyqueryengine_spark.sources.paged_datasource import (
        _ddl_field_names,
    )

    assert _ddl_field_names("`my col` string, plain int") == ["my col", "plain"]
    assert _ddl_field_names("`a,b` bigint, c string") == ["a,b", "c"]
    assert _ddl_field_names("`weird<ty,pe>` map<string,int>") == ["weird<ty,pe>"]
    assert _ddl_field_names("`x` int") == ["x"]


def test_ddl_field_names_doubled_backtick_escape():
    """r12 (advice): Spark escapes a literal backtick in a quoted
    identifier by doubling it — ``` `a``b` ``` is the column named
    ``a`b``.  The r11 scanner closed the quote at the first backtick
    (extracting 'a') and re-opened mid-name; the escape must keep the
    scanner in-quote and unescape in the extracted name."""
    from starryskyqueryengine_spark.sources.paged_datasource import (
        _ddl_field_names,
    )

    assert _ddl_field_names("`a``b` int") == ["a`b"]
    assert _ddl_field_names("`a``b` int, c string") == ["a`b", "c"]
    # escape adjacent to the closing quote, and a comma AFTER the escape
    assert _ddl_field_names("`trailing``` string") == ["trailing`"]
    assert _ddl_field_names("`a``,b` int, c string") == ["a`,b", "c"]
    # multiple escapes in one name
    assert _ddl_field_names("`x````y` int") == ["x``y"]


def test_ddl_field_names_unterminated_quote_raises():
    """ADVICE r13: an unterminated quoted identifier used to leave the
    scanner in-quote through the sentinel comma and silently DROP the
    final field (a truncated name list reads as a narrower schema).
    Malformed DDL must raise instead."""
    import pytest

    from starryskyqueryengine_spark.sources.paged_datasource import (
        _ddl_field_names,
    )

    for bad in ("`oops int", "a int, `no_close string", "x int, `"):
        with pytest.raises(ValueError, match="unterminated"):
            _ddl_field_names(bad)
    # a properly ESCAPED trailing backtick still parses (not confused
    # with an unterminated quote)
    assert _ddl_field_names("`trailing``` string") == ["trailing`"]


def _spark_quote(name: str) -> str:
    """Quote an identifier the way Spark's DDL printer does."""
    return "`" + name.replace("`", "``") + "`"


def test_ddl_field_names_property_roundtrip():
    """Property (r12): any identifier — including commas, spaces,
    angle brackets, and literal backticks — survives a
    quote-then-extract roundtrip, in multi-field DDL strings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from starryskyqueryengine_spark.sources.paged_datasource import (
        _ddl_field_names,
    )

    name = st.text(
        alphabet=st.sampled_from(list("ab `,<>():é")), min_size=1, max_size=12
    ).filter(lambda s: s.strip() == s and s != "")

    @settings(max_examples=300, deadline=None)
    @given(st.lists(name, min_size=1, max_size=4))
    def check(names):
        ddl = ", ".join(f"{_spark_quote(n)} decimal(10,2)" for n in names)
        assert _ddl_field_names(ddl) == names

    check()
