"""JSONL DataSource sinks (sources/jsonl_sink.py): round trip, two-phase
commit atomicity under task failure, overwrite semantics, and idempotent
streaming replay."""

import json
import os

import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.sources.jsonl_sink import (
    read_manifest,
    register_jsonl_sink,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_jsonl_sink(spark)


def _df(spark, n=50):
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    path = str(tmp_path / "out")
    _df(spark).write.format("starrysky_jsonl").option("path", path).mode("append").save()
    man = read_manifest(path)
    assert man["n_rows"] == 50
    assert sum(f["n_rows"] for f in man["files"]) == 50
    # spark.read.json round trip over exactly the manifest's files
    files = [os.path.join(path, f["name"]) for f in man["files"] if f["n_rows"]]
    back = spark.read.json(files)
    got = sorted(
        (r["id"], r["name"], r["score"]) for r in back.collect()
    )
    want = sorted(
        (r["id"], r["name"], r["score"]) for r in _df(spark).collect()
    )
    assert got == want


def test_failed_job_leaves_no_manifest(spark, tmp_path):
    path = str(tmp_path / "out")

    @F.udf("long")
    def boom(v):
        if v == 37:
            raise RuntimeError("poison row")
        return v

    bad = spark.range(50).select(boom(F.col("id")).alias("id"))
    with pytest.raises(Exception):
        bad.write.format("starrysky_jsonl").option("path", path).mode("append").save()
    # two-phase commit: no manifest, so a manifest-reader sees NOTHING
    with pytest.raises(FileNotFoundError):
        read_manifest(path)
    # and no published data files at the destination root
    if os.path.isdir(path):
        assert [
            n for n in os.listdir(path)
            if n.endswith(".jsonl") and not n.startswith("_")
        ] == []


def test_overwrite_replaces_previous_files(spark, tmp_path):
    path = str(tmp_path / "out")
    _df(spark, 30).write.format("starrysky_jsonl").option("path", path).mode("append").save()
    first = {f["name"] for f in read_manifest(path)["files"]}
    _df(spark, 10).write.format("starrysky_jsonl").option(
        "path", path
    ).mode("overwrite").save()
    man = read_manifest(path)
    assert man["n_rows"] == 10
    # none of the first write's files survive on disk
    for name in first:
        assert not os.path.exists(os.path.join(path, name))


def test_append_mode_keeps_both(spark, tmp_path):
    # append mode: the second save's manifest carries the first job's
    # entries forward — Spark append semantics, earlier rows stay
    # visible to manifest readers.  (The original contract made the
    # manifest describe only the LAST job: the first 20 rows sat on
    # disk but vanished from read_manifest — silent data loss.)
    path = str(tmp_path / "out")
    _df(spark, 20).write.format("starrysky_jsonl").option("path", path).mode("append").save()
    _df(spark, 5).write.format("starrysky_jsonl").option(
        "path", path
    ).mode("append").save()
    m = read_manifest(path)
    assert m["n_rows"] == 25
    assert sum(e["n_rows"] for e in m["files"]) == 25
    # overwrite still resets: manifest describes only the new job and
    # the superseded files are deleted
    _df(spark, 3).write.format("starrysky_jsonl").option(
        "path", path
    ).mode("overwrite").save()
    m2 = read_manifest(path)
    assert m2["n_rows"] == 3
    import os

    on_disk = [n for n in os.listdir(path) if n.endswith(".jsonl")]
    assert sorted(on_disk) == sorted(e["name"] for e in m2["files"])


def test_stream_sink_idempotent_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _df(spark, 25).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("starrysky_jsonl")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    man0 = read_manifest(out, 0)
    assert man0["n_rows"] == 25
    n_files = len(
        [n for n in os.listdir(out) if n.endswith(".jsonl")]
    )

    # wipe the checkpoint: Spark replays batch 0 from scratch; the sink
    # must recognize the published manifest and commit ZERO new files
    import shutil

    shutil.rmtree(ck)
    drain()
    assert read_manifest(out, 0) == man0
    assert (
        len([n for n in os.listdir(out) if n.endswith(".jsonl")]) == n_files
    )


def test_overwrite_crash_before_manifest_swap_keeps_old(spark, tmp_path):
    """Overwrite's atomic visibility point is the manifest swap: a crash
    BEFORE it must leave the previous manifest and its files fully
    readable (publish-then-cleanup, never delete-then-publish)."""
    path = str(tmp_path / "out")
    _df(spark, 30).write.format("starrysky_jsonl").option("path", path).mode("append").save()
    man_before = read_manifest(path)

    # the commit runs in a separate driver-side Python worker, so crash
    # injection goes through the writer's option seam, not monkeypatch
    with pytest.raises(Exception):
        _df(spark, 10).write.format("starrysky_jsonl").option(
            "path", path
        ).option("_test_crash_before_publish", "true").mode(
            "overwrite"
        ).save()

    man_after = read_manifest(path)
    assert man_after == man_before
    for f in man_after["files"]:
        assert os.path.exists(os.path.join(path, f["name"]))


def test_failed_job_staging_fully_reclaimed(spark, tmp_path):
    """A failing task must remove its own partial staged file before
    re-raising (it returns no commit message, so abort cannot enumerate
    it).  Single partition keeps this deterministic — sibling tasks
    hard-killed mid-write are inherently best-effort and are reclaimed
    by the age-based staging janitor at the next successful commit."""
    path = str(tmp_path / "out")

    @F.udf("long")
    def boom(v):
        if v == 41:
            raise RuntimeError("poison row")
        return v

    bad = spark.range(60).repartition(1).select(boom(F.col("id")).alias("id"))
    with pytest.raises(Exception):
        bad.write.format("starrysky_jsonl").option("path", path).mode("append").save()
    staging_root = os.path.join(path, "_staging")
    if os.path.isdir(staging_root):
        leftovers = [
            os.path.join(dp, n)
            for dp, _, ns in os.walk(staging_root)
            for n in ns
        ]
        assert leftovers == []


def test_struct_and_array_columns_serialize(spark, tmp_path):
    """Review r10: a STRUCT column reaches the task serializer as a
    pyspark Row — a tuple SUBCLASS, so json.dumps silently encoded it
    as a JSON ARRAY and the field names vanished (the `default` hook
    never fires for types json already handles).  Structs (and structs
    nested in arrays) must keep their field names."""
    path = str(tmp_path / "nested")
    df = spark.range(3).select(
        F.col("id"),
        F.struct(
            F.concat(F.lit("u"), F.col("id")).alias("name"),
            (F.col("id") + 10).alias("score"),
        ).alias("meta"),
        F.array(F.col("id"), F.col("id") * 2).alias("pair"),
    )
    df.write.format("starrysky_jsonl").option("path", path).mode(
        "append"
    ).save()
    man = read_manifest(path)
    assert man["n_rows"] == 3
    rows = []
    for f in man["files"]:
        if not f["n_rows"]:
            continue
        with open(os.path.join(path, f["name"])) as fh:
            rows += [json.loads(line) for line in fh]
    got = sorted(
        (r["id"], r["meta"]["name"], r["meta"]["score"], tuple(r["pair"]))
        for r in rows
    )
    assert got == [(0, "u0", 10, (0, 0)), (1, "u1", 11, (1, 2)),
                   (2, "u2", 12, (2, 4))]
