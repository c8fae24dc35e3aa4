"""Format-agnostic IO: round trips across orc/csv/json must reproduce the
parquet fixture exactly (schema-disciplined), corrupt text rows must be
isolated not fatal."""

import pytest

from starryskyqueryengine_spark.sources.fixtures import load_table
from starryskyqueryengine_spark.sources.formats import (
    CORRUPT_COL,
    convert_to_parquet,
    read_any,
    sniff_format,
    write_any,
)

SF_DIR = "/root/testdata/sf0.001"


def test_sniff_format():
    assert sniff_format("/a/b/nation.parquet") == "parquet"
    assert sniff_format("/a/b/dir") == "parquet"
    assert sniff_format("x.ORC") == "orc"
    assert sniff_format("x.jsonl") == "json"
    with pytest.raises(ValueError):
        sniff_format("x.xlsx")


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_roundtrip_matches_parquet(spark, tmp_path, fmt):
    src = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / f"nation.{fmt}")
    write_any(src, path)
    got = read_any(spark, path, schema=src.schema)
    if fmt == "orc":
        assert got.schema == src.schema
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, src.collect()))


def test_text_formats_require_schema(spark, tmp_path):
    src = load_table(spark, SF_DIR, "region")
    path = str(tmp_path / "region.csv")
    write_any(src, path)
    with pytest.raises(ValueError, match="authoritative schema"):
        read_any(spark, path)


def test_corrupt_json_rows_isolated(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text(
        '{"a": 1, "b": "x"}\n'
        'not json at all\n'
        '{"a": 2, "b": "y"}\n'
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([StructField("a", LongType()), StructField("b", StringType())])
    clean = read_any(spark, str(p), schema=schema, fmt="json")
    assert sorted((r["a"], r["b"]) for r in clean.collect()) == [(1, "x"), (2, "y")]
    kept = read_any(spark, str(p), schema=schema, fmt="json", keep_corrupt=True)
    corrupt = [r for r in kept.collect() if r[CORRUPT_COL] is not None]
    assert len(corrupt) == 1 and "not json" in corrupt[0][CORRUPT_COL]


def test_read_any_drop_path_supports_count(spark, tmp_path):
    """Review r11: the drop-corrupt path used PERMISSIVE + a filter on
    the rescue column, and count()'s column pruning then collapsed the
    referenced columns to the corrupt column alone — Spark refuses that
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so read_any(...).count() crashed
    on BOTH text formats.  The drop path now uses DROPMALFORMED and must
    support count()/collect() on JSON and CSV alike."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([StructField("a", LongType()), StructField("b", StringType())])
    pj = tmp_path / "rows.jsonl"
    pj.write_text('{"a": 1, "b": "x"}\nnope\n{"a": 2, "b": "y"}\n')
    dj = read_any(spark, str(pj), schema=schema, fmt="json")
    assert dj.count() == 2
    pc = tmp_path / "rows.csv"
    pc.write_text("a,b\n1,x\nnot,valid,width,at,all\n2,y\n")
    dc = read_any(spark, str(pc), schema=schema, fmt="csv")
    assert dc.count() == 2
    assert sorted((r["a"], r["b"]) for r in dc.collect()) == [(1, "x"), (2, "y")]


def test_csv_pruning_conf_declared_at_session_not_mutated(spark, tmp_path):
    """r12 (advice): the CSV count-vs-collect consistency conf now lives
    in session.RUNTIME_CONFS; read_any VERIFIES it instead of silently
    reconfiguring the caller's session — under a pruning session the CSV
    drop path refuses loudly."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from starryskyqueryengine_spark.session import RUNTIME_CONFS

    assert RUNTIME_CONFS["spark.sql.csv.parser.columnPruning.enabled"] == "false"
    assert spark.conf.get("spark.sql.csv.parser.columnPruning.enabled") == "false"

    schema = StructType([StructField("a", LongType()), StructField("b", StringType())])
    pc = tmp_path / "rows.csv"
    pc.write_text("a,b\n1,x\nnot,valid,width,at,all\n2,y\n")
    spark.conf.set("spark.sql.csv.parser.columnPruning.enabled", "true")
    try:
        # r13 (verdict #6): the refusal must NAME BOTH REMEDIES — the
        # embedder's first CSV read is where the contract surfaces, so
        # the message is the documentation (README "runtime-conf
        # contract" section)
        with pytest.raises(
            RuntimeError,
            match=r"(?s)columnPruning.*get_spark\(\).*apply_runtime_confs\(\)",
        ):
            read_any(spark, str(pc), schema=schema, fmt="csv")
        # the reader must NOT have flipped the session conf behind us
        assert (
            spark.conf.get("spark.sql.csv.parser.columnPruning.enabled") == "true"
        )
        # keep_corrupt path does not depend on the conf: still readable
        kept = read_any(
            spark, str(pc), schema=schema, fmt="csv", keep_corrupt=True
        )
        assert kept.count() == 3
    finally:
        spark.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")


def test_convert_to_parquet(spark, tmp_path):
    src = load_table(spark, SF_DIR, "region")
    csv_path = str(tmp_path / "region.csv")
    write_any(src, csv_path)
    pq = convert_to_parquet(spark, csv_path, str(tmp_path / "region_pq"),
                            schema=src.schema)
    assert sorted(map(tuple, pq.collect())) == sorted(map(tuple, src.collect()))
    assert pq.schema == src.schema


def test_read_any_array_json_raises_instead_of_zero_rows(spark, tmp_path):
    """A pretty-printed/array .json fed to the line reader must raise
    (with a pointer to multiline=True), never silently return 0 rows;
    multiline=True must then parse it."""
    import json

    import pytest
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from starryskyqueryengine_spark.sources.formats import read_any

    p = tmp_path / "payload.json"
    p.write_text(json.dumps([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], indent=2))
    schema = StructType(
        [StructField("id", LongType()), StructField("v", StringType())]
    )
    with pytest.raises(ValueError, match="multiline"):
        read_any(spark, str(p), schema=schema)
    got = sorted(
        tuple(r) for r in read_any(spark, str(p), schema=schema, multiline=True).collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_register_views_explicit_empty_list_registers_nothing(spark):
    from starryskyqueryengine_spark.sources.fixtures import register_views

    spark.catalog.dropTempView("region") if spark.catalog.tableExists("region") else None
    register_views(spark, "/root/testdata/sf0.001", tables=[])
    assert not spark.catalog.tableExists("region")


def test_catalog_register_rejects_duplicate_names():
    import pytest

    from starryskyqueryengine_spark.catalog import register

    with pytest.raises(ValueError, match="registered twice"):
        register("q1_pricing_summary")(lambda spark, sf: None)
