"""Hypothesis property suite for the TxnLogFormat log-replay algebra
(r14 — property target #9).  The transaction log is the single source of
truth for snapshot resolution, checkpoint resume, and the CDF's interval
netting; a divergence between any two of those is silent data loss or
resurrection.  Three properties over randomly generated logs (pure
filesystem + JSON — no SparkSession, hundreds of examples are cheap):

1. ``_replay(v)`` equals a direct Python fold of the entries at EVERY
   version, with and without checkpoints interleaved (checkpoint resume
   must be invisible to resolution).
2. ``interval_file_changes(v1, v2)`` obeys the snapshot set equation
   ``live(v2) == (live(v1) - removed) | added`` for every version pair,
   plus its documented contracts: removes only for files live at v1,
   add+remove inside the window nets out.
3. Per-file stats survive replay exactly like liveness does (an add
   without stats clears any stale stats for that path).
"""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.table_format import TxnLogFormat

# small universes so add/remove/re-add collisions actually happen
_PATHS = [f"key=k{k}/{n}.parquet" for k in range(3) for n in ("a", "b", "c")]


@st.composite
def _log_entries(draw):
    n = draw(st.integers(1, 12))
    entries = []
    for v in range(n):
        adds = [
            {
                "path": p,
                "key": p.split("/")[0][4:],
                **(
                    {"stats": {"rows": draw(st.integers(1, 9))}}
                    if draw(st.booleans())
                    else {}
                ),
            }
            for p in draw(
                st.lists(st.sampled_from(_PATHS), max_size=3, unique=True)
            )
        ]
        removes = draw(
            st.lists(st.sampled_from(_PATHS), max_size=3, unique=True)
        )
        entries.append(
            {
                "version": v,
                "op": draw(st.sampled_from(["append", "overwrite", "delete"])),
                "ts": 0.0,
                "add": adds,
                "remove": removes,
            }
        )
    return entries


def _write_log(tmp_path, entries, checkpoint_interval):
    fmt = TxnLogFormat(
        None, str(tmp_path), checkpoint_interval=checkpoint_interval
    )
    for e in entries:
        with open(
            os.path.join(fmt.log_path, f"{e['version']:020d}.json"), "w"
        ) as f:
            json.dump(e, f)
        # checkpoints are written by the committer as versions land;
        # replaying that cadence here pins checkpoint-resume equivalence
        fmt._maybe_checkpoint(e["version"])
    return fmt


def _fold(entries, version):
    """The reference semantics, folded directly (no checkpoints)."""
    live, stats = {}, {}
    for e in entries:
        if e["version"] > version:
            break
        for rm in e["remove"]:
            live.pop(rm, None)
            stats.pop(rm, None)
        for a in e["add"]:
            live[a["path"]] = a["key"]
            if "stats" in a:
                stats[a["path"]] = a["stats"]
            else:
                stats.pop(a["path"], None)
    return live, stats


@settings(max_examples=150, deadline=None)
@given(entries=_log_entries(), ci=st.sampled_from([0, 1, 2, 3, 10]))
def test_replay_equals_fold_at_every_version(tmp_path_factory, entries, ci):
    tmp = tmp_path_factory.mktemp("txnprop")
    fmt = _write_log(tmp, entries, checkpoint_interval=ci)
    for v in range(len(entries)):
        live, stats = fmt._replay(v)
        want_live, want_stats = _fold(entries, v)
        assert live == want_live, (v, ci)
        assert stats == want_stats, (v, ci)
    # default (latest) resolution too
    live, stats = fmt._replay()
    assert live == _fold(entries, len(entries) - 1)[0]


@st.composite
def _meta_entries(draw):
    """Logs carrying metadata actions: schema notes, constraint
    add/drop, per-app txn watermarks (watermarks may arrive out of
    order across entries — the fold takes the max per app)."""
    n = draw(st.integers(1, 10))
    entries = []
    for v in range(n):
        e = {"version": v, "op": "meta", "ts": 0.0, "add": [], "remove": []}
        if draw(st.booleans()):
            e["schema"] = {"v": draw(st.integers(0, 3))}  # opaque to the fold
        kind = draw(st.sampled_from(["none", "cadd", "cdrop", "txn"]))
        if kind == "cadd":
            e["constraint_add"] = {
                "name": draw(st.sampled_from(["c1", "c2"])),
                "expr": "x > 0",
            }
        elif kind == "cdrop":
            e["constraint_drop"] = draw(st.sampled_from(["c1", "c2"]))
        elif kind == "txn":
            e["txn"] = {
                "app": draw(st.sampled_from(["a", "b"])),
                "version": draw(st.integers(0, 5)),
            }
        entries.append(e)
    return entries


def _meta_fold(entries, version):
    meta = {"schema": None, "constraints": {}, "txn": {}}
    for e in entries:
        if e["version"] > version:
            break
        if e.get("schema") is not None:
            meta["schema"] = e["schema"]
        if e.get("constraint_add"):
            c = e["constraint_add"]
            meta["constraints"][c["name"]] = c["expr"]
        if e.get("constraint_drop"):
            meta["constraints"].pop(e["constraint_drop"], None)
        if e.get("txn"):
            t = e["txn"]
            meta["txn"][t["app"]] = max(
                int(meta["txn"].get(t["app"], -1)), int(t["version"])
            )
    return meta


@settings(max_examples=150, deadline=None)
@given(entries=_meta_entries(), ci=st.sampled_from([0, 1, 2, 4]))
def test_meta_replay_equals_fold_under_checkpoints(
    tmp_path_factory, entries, ci
):
    """_meta_replay (schema / constraint set / txn watermarks) must
    resolve identically with and without checkpoint resume — the
    watermark max-merge and the constraint add/drop ordering are the
    exactly-once and governance foundations."""
    tmp = tmp_path_factory.mktemp("txnmeta")
    fmt = _write_log(tmp, entries, checkpoint_interval=ci)
    for v in range(len(entries)):
        assert fmt._meta_replay(v) == _meta_fold(entries, v), (v, ci)
    assert fmt._meta_replay() == _meta_fold(entries, len(entries) - 1)


@settings(max_examples=150, deadline=None)
@given(entries=_log_entries(), ci=st.sampled_from([0, 2, 5]), data=st.data())
def test_interval_netting_obeys_snapshot_equation(
    tmp_path_factory, entries, ci, data
):
    tmp = tmp_path_factory.mktemp("txnprop")
    fmt = _write_log(tmp, entries, checkpoint_interval=ci)
    hi = len(entries) - 1
    v1 = data.draw(st.integers(0, hi))
    v2 = data.draw(st.integers(v1, hi))
    added, removed = fmt.interval_file_changes(v1, v2)
    live1, _ = _fold(entries, v1)
    live2, _ = _fold(entries, v2)
    # the CDF's defining set equation
    assert (set(live1) - set(removed)) | set(added) == set(live2), (v1, v2)
    # removes are scoped to files live at the interval start
    assert set(removed) <= set(live1)
    # an added file that is not live at v2 was re-removed AFTER the
    # window closed — impossible inside (v1, v2] because in-window
    # add+remove pairs net out
    for p in added:
        assert p in live2, p
