"""S10's JSON response surface as first-class Spark Python DataSource
SINKS (Spark 4 writer API) — the write-side twin of the round-5 reader
connectors (`sources/paged_datasource.py`).

The reference serializes feed results to JSON at its HTTP edge
(src/methods/feed-generation.ts:40-56, the `{cursor, feed: [...]}`
response and src/util/subscription.ts JSON frames).  At engine scale the
same need is "emit query results as line-delimited JSON with transaction
discipline", so this module implements:

- ``starrysky_jsonl`` (batch): each task streams its rows into a
  task-scoped staging dir and returns (staging dir, file name, rows) as
  its commit message; the DRIVER commit renames staged files into the
  destination and swaps ``_MANIFEST.json`` in LAST (one ``os.replace``
  — the single atomic visibility point), and only THEN deletes files
  the previous manifest referenced (overwrite).  A crash anywhere
  leaves either the old or the new manifest fully intact — worst case
  is orphaned data files no manifest references.  A task that FAILS
  mid-write removes its own partial file before re-raising (it has no
  commit message for abort to find), and ``abort`` additionally clears
  the staging dirs of the tasks that did succeed.
- ``starrysky_jsonl`` as a streaming sink: same task protocol per
  micro-batch, with the manifest written as ``_MANIFEST-<batchId>.json``;
  a replayed batch id whose manifest already exists commits ZERO new
  files (idempotent replay — the same exactly-once watermark idea as
  TxnLogFormat.append(txn=...)).  Staging locations travel IN the
  commit messages, never in writer instance state: Spark constructs
  separate writer instances on the driver and per executor for
  streaming sinks, so instance fields cannot be assumed shared.

100 TB shape: tasks write independently (no driver data path), commit
cost is O(files) renames of metadata on the driver, and row payloads
never serialize through the driver.  JSON encoding is line-buffered
per task; values encode as JSON scalars with timestamps in ISO-8601.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _FileMsg(WriterCommitMessage):
    staging: str = ""
    name: str = ""
    n_rows: int = 0


def _json_default(v):
    # datetime / date / Decimal / bytes / nested Row -> JSON-safe,
    # deterministic
    import datetime as dt
    import decimal

    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        import base64

        return base64.b64encode(bytes(v)).decode("ascii")
    raise TypeError(f"not JSON serializable: {type(v)}")


def _normalize(v):
    """STRUCT columns arrive as pyspark Rows — a tuple SUBCLASS, so
    json.dumps serializes them as JSON arrays and the field names
    vanish silently (the ``default`` hook only fires for types json
    can't already encode; review r10).  Recurse structs to dicts (and
    their children, so a struct inside an array keeps its names too);
    scalars fall through to ``_json_default`` at dump time."""
    if hasattr(v, "asDict"):
        return {k: _normalize(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [_normalize(x) for x in v]
    if isinstance(v, dict):
        return {k: _normalize(x) for k, x in v.items()}
    return v


def _write_task_file(staging_root: str, fields, iterator) -> _FileMsg:
    """Executor side: stream rows to a task-scoped staged file.  On ANY
    failure the partial file is removed before re-raising — a failed
    task produces no commit message, so driver-side abort could never
    enumerate it."""
    staging = os.path.join(staging_root, uuid.uuid4().hex)
    os.makedirs(staging, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.jsonl"
    full = os.path.join(staging, name)
    n = 0
    try:
        with open(full, "w") as f:
            for row in iterator:
                obj = {k: _normalize(v) for k, v in zip(fields, row)}
                f.write(
                    json.dumps(
                        obj, default=_json_default, ensure_ascii=False,
                        sort_keys=True,
                    )
                )
                f.write("\n")
                n += 1
    except BaseException:
        try:
            os.remove(full)
            os.rmdir(staging)
        except OSError:
            pass
        raise
    return _FileMsg(staging=staging, name=name, n_rows=n)


def _publish(path: str, messages, manifest_name: str, carry=()) -> None:
    """Driver side: move every staged file into the destination, then
    swap the manifest in as the LAST step — the atomic visibility
    point.  ``carry`` is prior manifest entries to retain (append
    mode): they ride into the new manifest unchanged, so the swap
    stays the single all-or-nothing visibility event for the union."""
    files = [dict(e) for e in carry]
    total = sum(e["n_rows"] for e in files)
    for m in messages:
        if m is None:
            continue
        os.replace(os.path.join(m.staging, m.name), os.path.join(path, m.name))
        files.append({"name": m.name, "n_rows": m.n_rows})
        total += m.n_rows
    tmp = os.path.join(path, f".{manifest_name}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump({"files": sorted(files, key=lambda d: d["name"]),
                   "n_rows": total}, f)
    os.replace(tmp, os.path.join(path, manifest_name))


def _gc_stale_staging(staging_root: str, max_age_sec: float = 86400.0) -> None:
    """Janitor for staging debris from HARD-killed tasks (SIGKILL cannot
    unwind the task-side self-clean): any staging subdir untouched for
    ``max_age_sec`` belongs to no live job and is reclaimed at the next
    successful commit — the same age-based GC discipline as Hadoop's
    _temporary cleanup, safe under concurrent jobs because live dirs are
    recent by definition."""
    import time

    if not os.path.isdir(staging_root):
        return
    cutoff = time.time() - max_age_sec
    for n in os.listdir(staging_root):
        d = os.path.join(staging_root, n)
        try:
            if os.path.isdir(d) and os.path.getmtime(d) < cutoff:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            pass


def _discard(messages) -> None:
    for m in messages:
        if m is None:
            continue
        shutil.rmtree(m.staging, ignore_errors=True)


class JsonlBatchWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("starrysky_jsonl requires option 'path'")
        self.fields = schema.fieldNames()
        self.overwrite = overwrite
        self.staging_root = os.path.join(self.path, "_staging")
        # test seam: force a crash between staging and the manifest swap
        self.crash_before_publish = (
            str(options.get("_test_crash_before_publish", "")).lower()
            == "true"
        )

    def write(self, iterator):
        return _write_task_file(self.staging_root, self.fields, iterator)

    def commit(self, messages):
        os.makedirs(self.path, exist_ok=True)
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        old_entries: list[dict] = []
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                old_entries = json.load(f)["files"]
        old_files = [e["name"] for e in old_entries] if self.overwrite else []
        if self.crash_before_publish:
            raise OSError("test seam: crash before manifest swap")
        # publish new files + SWAP the manifest first (atomic visibility
        # point: a crash before it leaves the old manifest fully intact,
        # after it the new one).  Append mode CARRIES the previous
        # manifest's entries into the new one — without that, an append
        # clobbered the manifest with only the new write's files and
        # every previously committed row went invisible to
        # read_manifest (silent data loss at the reader contract).
        _publish(
            self.path,
            messages,
            "_MANIFEST.json",
            carry=() if self.overwrite else old_entries,
        )
        # ... and only then clean up files the old manifest referenced;
        # a crash in this loop orphans data files but never breaks a
        # manifest-reader
        new_names = {m.name for m in messages if m is not None}
        for name in old_files:
            if name not in new_names:
                try:
                    os.remove(os.path.join(self.path, name))
                except FileNotFoundError:
                    pass
        _discard(messages)
        _gc_stale_staging(self.staging_root)

    def abort(self, messages):
        # successful tasks' staged files; FAILED tasks already
        # self-cleaned inside _write_task_file
        _discard(messages)


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, schema: StructType, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "starrysky_jsonl stream writer requires option 'path'"
            )
        self.fields = schema.fieldNames()
        self.staging_root = os.path.join(self.path, "_staging")

    def write(self, iterator):
        return _write_task_file(self.staging_root, self.fields, iterator)

    def commit(self, messages, batchId):
        os.makedirs(self.path, exist_ok=True)
        manifest = f"_MANIFEST-{batchId}.json"
        if os.path.exists(os.path.join(self.path, manifest)):
            # replayed micro-batch after a checkpoint/sink race: the
            # batch already published — discard the duplicate staging
            # files so replay is a no-op (exactly-once at the sink)
            _discard(messages)
            return
        _publish(self.path, messages, manifest)
        # drop the now-empty per-task staging dirs immediately (the
        # batch path does the same) — leaving them for the age-based
        # janitor leaked one dir per task per micro-batch for 24 h,
        # hundreds of thousands of inodes on a fast trigger
        _discard(messages)
        # a continuously-running sink needs the same hard-kill janitor
        # as the batch path; each successful micro-batch is the GC point
        _gc_stale_staging(self.staging_root)

    def abort(self, messages, batchId):
        _discard(messages)


class JsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "starrysky_jsonl"

    def writer(self, schema: StructType, overwrite: bool):
        return JsonlBatchWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return JsonlStreamWriter(schema, self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlDataSource)


def read_manifest(path: str, batch_id: int | None = None) -> dict:
    """Read a committed manifest; raises FileNotFoundError if the write
    never committed (the all-or-nothing read contract)."""
    name = (
        "_MANIFEST.json" if batch_id is None else f"_MANIFEST-{batch_id}.json"
    )
    with open(os.path.join(path, name)) as f:
        return json.load(f)
