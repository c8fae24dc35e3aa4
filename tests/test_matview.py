"""Incremental materialized view (operators/matview.py): after every
base-table mutation, an incremental refresh from the CDF must equal a
recompute from scratch — including across file-granular MERGE, partition
deletes, and an OPTIMIZE compaction whose CDF nets out to zero."""

import datetime

from pyspark.sql import functions as F

from starryskyqueryengine_spark.operators.matview import CountByKeyView
from starryskyqueryengine_spark.table_format import TxnLogFormat

from tests.conftest import make_posts


def _batch(spark, n0, n, key="k1"):
    rows = [
        {
            "uri": f"at://u/p/{i}",
            "cid": f"c{i:03d}",
            "text": "x",
            "createdAt": datetime.datetime(2026, 1, 1, 0, 0, i % 60),
        }
        for i in range(n0, n0 + n)
    ]
    return make_posts(spark, rows).select(
        "uri",
        F.lit(key).alias("key"),
        "cid",
        "replyParent",
        "replyRoot",
        F.col("createdAt").alias("indexedAt"),
    )


def _state(view):
    return sorted(tuple(r) for r in view.read().collect())


def _recompute(spark, fmt):
    return sorted(
        tuple(r)
        for r in fmt.read(spark)
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_posts"))
        .collect()
    )


def test_matview_tracks_all_mutation_kinds(spark, tmp_path):
    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    view = CountByKeyView(spark, fmt, str(tmp_path / "mv"))

    fmt.append(_batch(spark, 0, 5, key="a"))
    assert view.refresh()["mode"] == "full"
    assert _state(view) == _recompute(spark, fmt) == [("a", 5)]

    # append to a second key → incremental picks up only the delta
    fmt.append(_batch(spark, 100, 3, key="b"))
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert _state(view) == _recompute(spark, fmt)

    # MERGE rewrites rows in place: counts must NOT drift (same uris)
    upd = _batch(spark, 0, 2, key="a").withColumn(
        "cid", F.concat(F.col("cid"), F.lit("-v2"))
    )
    fmt.merge(upd, on=["key", "uri"])
    view.refresh()
    assert _state(view) == _recompute(spark, fmt)

    # merge that INSERTS new rows
    fmt.merge(_batch(spark, 200, 4, key="c"), on=["key", "uri"])
    view.refresh()
    assert _state(view) == _recompute(spark, fmt)

    # partition delete → the key's group disappears from the view
    fmt.delete_partition("b")
    view.refresh()
    state = _state(view)
    assert state == _recompute(spark, fmt)
    assert all(k != "b" for k, _ in state)

    # noop refresh is a noop
    assert view.refresh()["mode"] == "noop"
    assert _state(view) == _recompute(spark, fmt)


def test_matview_optimize_nets_to_zero_delta(spark, tmp_path):
    """Compaction re-adds exactly the rows it removes; the CDF delta per
    key must cancel and the incremental refresh must not change state."""
    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    for i in range(4):  # many small files
        fmt.append(_batch(spark, 10 * i, 3, key="a"))
    view = CountByKeyView(spark, fmt, str(tmp_path / "mv"))
    view.refresh()
    before = _state(view)

    res = fmt.optimize()
    assert res["files_compacted"] >= 2
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert _state(view) == before == _recompute(spark, fmt)


def test_matview_crash_between_state_and_meta_is_invisible(spark, tmp_path):
    """A refresh that dies after writing the new state dir but BEFORE
    the meta swap leaves the previous (state, version) pair intact."""
    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    fmt.append(_batch(spark, 0, 5, key="a"))
    view = CountByKeyView(spark, fmt, str(tmp_path / "mv"))
    view.refresh()
    before = _state(view)
    v_before = view.synced_version

    fmt.append(_batch(spark, 100, 2, key="b"))
    import starryskyqueryengine_spark.operators.matview as mv_mod

    real_replace = mv_mod.os.replace
    try:
        mv_mod.os.replace = lambda *a: (_ for _ in ()).throw(
            OSError("crash before meta swap")
        )
        try:
            view.refresh()
        except OSError:
            pass
    finally:
        mv_mod.os.replace = real_replace

    assert view.synced_version == v_before
    assert _state(view) == before  # still the old consistent pair
    view.refresh()  # retry completes normally
    assert _state(view) == _recompute(spark, fmt)


def test_matview_vacuum_past_sync_falls_back_to_full(spark, tmp_path):
    """vacuum() reclaiming files inside the unsynced interval must force
    a full recompute — an incremental delta over a vacuumed CDF would
    silently drop the reclaimed rows' changes."""
    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    fmt.append(_batch(spark, 0, 3, key="a"))
    fmt.append(_batch(spark, 100, 3, key="b"))
    view = CountByKeyView(spark, fmt, str(tmp_path / "mv"))
    view.refresh()

    fmt.delete_partition("b")          # v2
    fmt.append(_batch(spark, 200, 2, key="c"))  # v3
    fmt.vacuum(min_age_sec=0)          # reclaims b's removed files
    r = view.refresh()
    assert r["mode"] == "full"
    assert _state(view) == _recompute(spark, fmt)
    assert all(k != "b" for k, _ in _state(view))


def test_matview_reader_survives_one_refresh(spark, tmp_path):
    """A DataFrame from read() must stay collectable across the NEXT
    refresh (previous state dir is retained; only older ones are GCed)."""
    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    fmt.append(_batch(spark, 0, 4, key="a"))
    view = CountByKeyView(spark, fmt, str(tmp_path / "mv"))
    view.refresh()
    pinned = view.read()  # plan pinned to state_v0

    fmt.append(_batch(spark, 50, 2, key="b"))
    view.refresh()  # writes state_v1, must NOT delete state_v0
    assert sorted(tuple(r) for r in pinned.collect()) == [("a", 4)]
    assert _state(view) == _recompute(spark, fmt)


def test_matview_follows_streaming_ingest(spark, tmp_path):
    """End-to-end chain: a real stream drains through the exactly-once
    TxnLogFormat sink and the view refreshes INCREMENTALLY per batch —
    final state equals a scratch recompute, and a checkpoint-wiped
    replay of the whole stream moves neither the table nor the view."""
    from starryskyqueryengine_spark.store import PostStore
    from starryskyqueryengine_spark.streaming import (
        foreach_batch_upsert,
        parquet_stream,
        run_available_now,
    )

    src = str(tmp_path / "src")
    _batch(spark, 0, 8, key="a").write.parquet(src)
    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    store = PostStore(spark, str(tmp_path / "t"), fmt=fmt)
    view = CountByKeyView(spark, fmt, str(tmp_path / "mv"))
    refreshed_modes = []

    def sink(batch_df, batch_id):
        foreach_batch_upsert(store, txn_app_id="mv-e2e")(batch_df, batch_id)
        refreshed_modes.append(view.refresh()["mode"])

    schema = spark.read.parquet(src).schema
    run_available_now(
        parquet_stream(spark, src, schema=schema), sink, str(tmp_path / "c1")
    )
    assert _state(view) == _recompute(spark, fmt) == [("a", 8)]
    assert refreshed_modes[0] in ("full", "incremental")

    # second wave of data, fresh drain: incremental refresh follows
    _batch(spark, 100, 4, key="b").write.mode("append").parquet(src)
    run_available_now(
        parquet_stream(spark, src, schema=schema), sink, str(tmp_path / "c1")
    )
    assert _state(view) == _recompute(spark, fmt)
    assert ("b", 4) in _state(view)

    # checkpoint wipe: full replay is a no-op end to end (exactly-once
    # sink commits nothing; the view sees no new version)
    v_before = view.synced_version
    run_available_now(
        parquet_stream(spark, src, schema=schema), sink, str(tmp_path / "c2")
    )
    assert view.synced_version == v_before
    assert _state(view) == _recompute(spark, fmt)


def test_matview_bootstrap_before_any_commit_does_not_leak_state_dir(spark, tmp_path):
    """A refresh against a base table with no commits writes state_v-1;
    the keep-one-previous GC must still SEE that dir (negative version)
    and reclaim it once two newer states exist."""
    import os

    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    view = CountByKeyView(spark, fmt, str(tmp_path / "mv"))

    assert view.refresh()["mode"] == "full"
    assert _state(view) == []
    assert os.path.isdir(str(tmp_path / "mv" / "state_v-1"))

    fmt.append(_batch(spark, 0, 2, key="a"))
    view.refresh()
    # state_v-1 is the retained previous version here
    assert os.path.isdir(str(tmp_path / "mv" / "state_v-1"))

    fmt.append(_batch(spark, 100, 2, key="b"))
    view.refresh()
    dirs = {n for n in os.listdir(str(tmp_path / "mv")) if n.startswith("state_v")}
    assert "state_v-1" not in dirs, "bootstrap state dir leaked past GC"
    assert _state(view) == _recompute(spark, fmt)


def test_matview_gc_protects_reader_dir_after_crashed_refresh(spark, tmp_path):
    """Review r9: after a crashed refresh leaves an orphan state dir at
    a HIGHER version than meta points to, the next successful refresh's
    GC must retain the dir live readers hold (the one meta pointed to),
    and reclaim the orphan — retaining by version number protected the
    orphan and deleted the readers' dir."""
    import os

    import starryskyqueryengine_spark.operators.matview as mv_mod

    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    fmt.append(_batch(spark, 0, 5, key="a"))
    view = CountByKeyView(spark, fmt, str(tmp_path / "mv"))
    view.refresh()
    reader = view.read()  # plan pinned to the current state dir
    pinned_dir = view._meta()["state_dir"]

    # crash a refresh after the state write, before the meta swap
    fmt.append(_batch(spark, 100, 2, key="b"))
    real_replace = mv_mod.os.replace
    try:
        mv_mod.os.replace = lambda *a: (_ for _ in ()).throw(OSError("crash"))
        try:
            view.refresh()
        except OSError:
            pass
    finally:
        mv_mod.os.replace = real_replace
    orphan = [
        d for d in os.listdir(str(tmp_path / "mv"))
        if d.startswith("state_v")
        and os.path.join(str(tmp_path / "mv"), d) != pinned_dir
    ]
    assert orphan, "crash should have left an orphan state dir"

    fmt.append(_batch(spark, 200, 3, key="c"))
    view.refresh()  # successful refresh; GC runs
    # the reader's dir survived the GC, the orphan did not
    assert os.path.isdir(pinned_dir)
    assert reader.count() == 1  # still collectable
    for d in orphan:
        assert not os.path.isdir(os.path.join(str(tmp_path / "mv"), d))
    assert _state(view) == _recompute(spark, fmt)


def test_matview_strict_cdf_raises_on_vacuumed_interval(spark, tmp_path):
    """Review r9: changes_between(strict=True) must raise (not silently
    read survivors) when the interval references vacuumed files — the
    guarantee the view's incremental path now rests on."""
    import pytest

    from starryskyqueryengine_spark.table_format import VacuumedIntervalError

    fmt = TxnLogFormat(spark, str(tmp_path / "t"))
    fmt.append(_batch(spark, 0, 4, key="a"))
    fmt.append(_batch(spark, 100, 4, key="b"))
    fmt.delete_partition("a")
    fmt.vacuum(min_age_sec=0)  # reclaims key=a files named by the interval
    with pytest.raises(VacuumedIntervalError, match="vacuumed"):
        fmt.changes_between(spark, 0, 2, strict=True).collect()
    # default stays read-what-survives (documented Delta CDF behavior)
    fmt.changes_between(spark, 0, 2).count()
