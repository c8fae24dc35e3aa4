"""Incrementally-maintained materialized aggregate view over TxnLogFormat.

Classic incremental view maintenance (IVM; Blakeley et al. 1986, and the
mechanism behind Delta Live Tables / Materialize): a groupBy aggregate
whose measures form an abelian group (count, sum — anything with an
inverse) can be maintained from a row-level change feed without ever
re-reading the base table.  TxnLogFormat.changes_between already derives
exactly that feed from the transaction log, so the maintenance step is:

    delta(key) = Σ (+measure for _change='insert', −measure for 'delete')
    new_state  = old_state ⊕ delta,   groups at identity dropped

Cost per refresh is O(changed files) + O(|delta keys|) — at 100 TB a
micro-batch sync touches only the files its commits named, while a full
recompute would scan the table.  Compaction/OPTIMIZE commits net out
automatically: they re-add the same rows they remove, so every key's
delta is 0 (insert +1 cancels delete −1 row-for-row).

State is versioned parquet under ``<path>/state_v<version>/`` with an
atomically-replaced ``_mv_meta.json`` pointing at the synced base-table
version — a reader always sees a consistent (state, version) pair, and a
crash mid-refresh leaves the previous pair intact (write-new-then-swap,
the same discipline as the table format itself).

The reference maintains its ``sub_state`` cursor table by hand after
each batch (src/subscription.ts:360 area); this generalizes that idea to
arbitrary additive aggregates with the table format's log as the single
source of truth.  Equivalence with recompute-from-scratch is pinned
across append / merge / delete / optimize in tests/test_matview.py.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..table_format import TxnLogFormat, VacuumedIntervalError

META_NAME = "_mv_meta.json"


class CountByKeyView:
    """Materialized ``SELECT key, count(*) FROM t GROUP BY key``.

    ``refresh()`` picks full vs incremental automatically: the first
    call (or a vacuumed-past-sync log) computes from the base snapshot;
    later calls fold the CDF delta into stored state.
    """

    def __init__(self, spark: SparkSession, fmt: TxnLogFormat, path: str):
        self.spark = spark
        self.fmt = fmt
        self.path = path
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------- state

    def _meta(self) -> dict | None:
        p = os.path.join(self.path, META_NAME)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_state(self, df: DataFrame, version: int) -> None:
        state_dir = os.path.join(self.path, f"state_v{version}")
        # capture which dir live readers are pinned to BEFORE the swap:
        # after a crashed refresh the highest-versioned leftover dir is
        # an ORPHAN meta never pointed at — retaining by version number
        # would protect the orphan and delete the dir readers hold
        prev_meta = self._meta()
        df.write.mode("overwrite").parquet(state_dir)
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".json")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {"synced_version": version, "state_dir": state_dir}, f
                )
                # fsync before the rename (the table format's _commit
                # discipline): without it a power loss can persist the
                # rename but not the bytes, wedging every later _meta()
                # on a truncated JSON file
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(self.path, META_NAME))
        except BaseException:
            # failed swap must not leave tmpXXXX.json accumulating in
            # the view dir (it would also confuse directory globbers)
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        # GC superseded state dirs, RETAINING the dir the PREVIOUS meta
        # pointed to: a DataFrame handed out by read() before this
        # refresh has its plan pinned there and must stay collectable
        # (deleting it mid-lifetime would fail the reader).  Everything
        # else — older states AND orphans from crashed refreshes — is
        # reclaimed.
        survivors = {state_dir}
        if prev_meta is not None:
            survivors.add(prev_meta["state_dir"])
        # -?\d+ so the empty-base-table bootstrap dir (state_v-1,
        # written when the base has no commits yet) is listed too — a
        # bare isdigit() would hide it from the GC and leak it forever.
        # A strict regex (ONE optional dash), not lstrip("-"): a stray
        # state_v--2 would pass an lstrip filter and then crash the
        # int() parse, aborting the GC pass.
        import re as _re

        for n in os.listdir(self.path):
            if (
                n.startswith("state_v")
                and os.path.isdir(os.path.join(self.path, n))
                and _re.fullmatch(r"-?\d+", n[len("state_v"):])
            ):
                d = os.path.join(self.path, n)
                if d not in survivors:
                    shutil.rmtree(d, ignore_errors=True)

    def read(self) -> DataFrame:
        meta = self._meta()
        if meta is None:
            raise FileNotFoundError("view never refreshed")
        return self.spark.read.parquet(meta["state_dir"])

    @property
    def synced_version(self) -> int | None:
        meta = self._meta()
        return None if meta is None else meta["synced_version"]

    # ----------------------------------------------------------- refresh

    def _full_state(self, version: int | None) -> DataFrame:
        # pin the read to the version recorded in meta: a commit landing
        # between the log listing and this (lazy) plan's execution must
        # NOT leak into the state, or the next incremental refresh would
        # double-apply it
        return (
            self.fmt.read(self.spark, version=version)
            .groupBy("key")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_posts"))
        )

    def refresh(self) -> dict:
        """Sync to the base table's latest version. Returns
        {"mode": "full"|"incremental"|"noop", "synced_version": v}."""
        versions = self.fmt._versions()
        tip = versions[-1] if versions else -1
        meta = self._meta()
        if meta is None:
            # pin the bootstrap read to tip UNCONDITIONALLY: read(-1)
            # resolves to the empty snapshot, while version=None (latest)
            # would bake a commit landing mid-refresh into state with
            # synced_version still -1 — the next refresh would then
            # re-apply that commit's CDF and double-count every key
            self._write_state(self._full_state(tip), tip)
            return {"mode": "full", "synced_version": tip}
        last = meta["synced_version"]
        if tip <= last:
            return {"mode": "noop", "synced_version": last}

        try:
            # strict: a vacuumed interval raises HERE (at plan build)
            # instead of silently reading only the surviving files —
            # the pre-check/TOCTOU pair this replaces left a window
            # where a concurrent vacuum corrupted the delta between the
            # intact-check and the CDF's own file listing.  A vacuum
            # racing even later (after this call, before the executors
            # read) fails the refresh with the meta unswapped — safe,
            # and the retry falls back to full here.
            cdf = self.fmt.changes_between(self.spark, last, tip, strict=True)
        except VacuumedIntervalError:
            # vacuum reclaimed part of the interval's change feed; fall
            # back to a pinned full recompute (the docstring's contract)
            self._write_state(self._full_state(tip), tip)
            return {"mode": "full", "synced_version": tip}
        delta = (
            cdf.groupBy("key")
            .agg(
                F.sum(
                    F.when(F.col("_change") == "insert", F.lit(1)).otherwise(
                        F.lit(-1)
                    )
                )
                .cast("bigint")
                .alias("d")
            )
            .filter(F.col("d") != 0)
        )
        # read the state dir from the meta ALREADY HELD — re-reading the
        # meta file here could observe another refresher's newer swap
        # and fold the (last, tip] delta onto the wrong base
        old = self.spark.read.parquet(meta["state_dir"])
        merged = (
            old.join(delta, "key", "full_outer")
            .select(
                "key",
                (
                    F.coalesce(F.col("n_posts"), F.lit(0))
                    + F.coalesce(F.col("d"), F.lit(0))
                )
                .cast("bigint")
                .alias("n_posts"),
            )
            .filter(F.col("n_posts") > 0)
        )
        # `merged` scans the previous state_v dir; _write_state writes a
        # NEW state_v{tip} dir and only then swaps the meta pointer, so
        # the plan never overwrites its own input (tip > last always).
        self._write_state(merged, tip)
        return {"mode": "incremental", "synced_version": tip}
