"""S10's JSON response surface as first-class Spark Python DataSource
SINKS (Spark 4 writer API) — the write-side twin of the round-5 reader
connectors (`sources/paged_datasource.py`).

The reference serializes feed results to JSON at its HTTP edge
(src/methods/feed-generation.ts:40-56, the `{cursor, feed: [...]}`
response and src/util/subscription.ts JSON frames).  At engine scale the
same need is "emit query results as line-delimited JSON with transaction
discipline", so this module implements:

- ``starrysky_jsonl`` (batch): each task streams its rows to a staged
  ``_staging/<uuid>.jsonl`` file and returns the name as its commit
  message; the DRIVER commit renames every staged file into the
  destination and then writes ``_MANIFEST.json`` (file list + row
  counts) LAST — a reader that requires the manifest sees all-or-
  nothing, and an aborted job leaves only unreferenced staging garbage
  that ``abort`` removes.  Spark's task retry + this two-phase commit
  give the same visible-atomicity discipline as the TxnLogFormat.
- ``starrysky_jsonl_stream`` (streaming ``foreach``-class sink): same
  task protocol per micro-batch, with the manifest written as
  ``_MANIFEST-<batchId>.json``; a replayed batch id whose manifest
  already exists commits ZERO new files (idempotent replay — the same
  exactly-once watermark idea as TxnLogFormat.append(txn=...)).

100 TB shape: tasks write independently (no driver data path), commit
cost is O(files) renames of metadata on the driver, and row payloads
never serialize through the driver.  JSON encoding is line-buffered
per task; values encode as JSON scalars with timestamps in ISO-8601.
"""

from __future__ import annotations

import json
import os
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
    name: str = ""
    n_rows: int = 0


def _json_default(v):
    # datetime / date / Decimal / bytes -> JSON-safe, deterministic
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


def _write_task_file(staging: str, fields, iterator) -> _FileMsg:
    os.makedirs(staging, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.jsonl"
    n = 0
    with open(os.path.join(staging, name), "w") as f:
        for row in iterator:
            obj = dict(zip(fields, row))
            f.write(
                json.dumps(
                    obj, default=_json_default, ensure_ascii=False,
                    sort_keys=True,
                )
            )
            f.write("\n")
            n += 1
    return _FileMsg(name=name, n_rows=n)


def _publish(path: str, staging: str, messages, manifest_name: str) -> None:
    files = []
    total = 0
    for m in messages:
        if m is None:
            continue
        os.replace(
            os.path.join(staging, m.name), os.path.join(path, m.name)
        )
        files.append({"name": m.name, "n_rows": m.n_rows})
        total += m.n_rows
    tmp = os.path.join(path, f".{manifest_name}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump({"files": sorted(files, key=lambda d: d["name"]),
                   "n_rows": total}, f)
    os.replace(tmp, os.path.join(path, manifest_name))


def _discard(staging: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        try:
            os.remove(os.path.join(staging, m.name))
        except FileNotFoundError:
            pass


class JsonlBatchWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("starrysky_jsonl requires option 'path'")
        self.fields = schema.fieldNames()
        self.overwrite = overwrite
        self.staging = os.path.join(self.path, "_staging")

    def write(self, iterator):
        return _write_task_file(self.staging, self.fields, iterator)

    def commit(self, messages):
        os.makedirs(self.path, exist_ok=True)
        if self.overwrite:
            old = os.path.join(self.path, "_MANIFEST.json")
            if os.path.exists(old):
                with open(old) as f:
                    for entry in json.load(f)["files"]:
                        try:
                            os.remove(os.path.join(self.path, entry["name"]))
                        except FileNotFoundError:
                            pass
                os.remove(old)
        _publish(self.path, self.staging, messages, "_MANIFEST.json")

    def abort(self, messages):
        _discard(self.staging, messages)


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, schema: StructType, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("starrysky_jsonl stream writer requires option 'path'")
        self.fields = schema.fieldNames()
        self.staging = os.path.join(self.path, "_staging")

    def write(self, iterator):
        return _write_task_file(self.staging, self.fields, iterator)

    def commit(self, messages, batchId):
        os.makedirs(self.path, exist_ok=True)
        manifest = f"_MANIFEST-{batchId}.json"
        if os.path.exists(os.path.join(self.path, manifest)):
            # replayed micro-batch after a checkpoint/sink race: the
            # batch already published — discard the duplicate staging
            # files so replay is a no-op (exactly-once at the sink)
            _discard(self.staging, messages)
            return
        _publish(self.path, self.staging, messages, manifest)

    def abort(self, messages, batchId):
        _discard(self.staging, messages)


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
