"""TxnLogFormat change feed as a STREAMING source (Delta's
``spark.readStream.format("delta")`` + CDF analog).

``starrysky_table_changes`` tails the table's transaction log: every
committed version past the checkpointed offset becomes part of the next
micro-batch, surfacing file adds as ``_change = 'insert'`` rows and file
removes as ``_change = 'delete'`` rows, each tagged with
``_commit_version``. Offsets are log versions, so Spark's checkpoint IS
the consumer's cursor — kill the stream, append more commits, restart:
only the new commits replay (test-pinned).

Scale shape (the reason this is a full ``DataSourceStreamReader``, not
the Simple driver-side variant): the DRIVER only lists and parses the
JSON log (file-granularity metadata, KBs per thousand commits); each
changed data file becomes one ``InputPartition`` and is read
EXECUTOR-side via pyarrow — row bytes never pass through the driver.
Vacuumed files yield zero rows (the documented CDF-over-vacuum
behavior, matching ``TxnLogFormat.changes_between``).

Schema comes from the table's logged per-version StructType (schema
evolution aware): files written before a widening NULL-fill the newer
columns, and the partition column ``key`` — absent from data files, as
with any partitionBy layout — is injected from the log's add-action,
unescaped from the on-disk directory form.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType

from ..schemas import POST_SCHEMA

LOG_DIR = "_txn_log"
DATA_DIR = "data"


def _versions(log_path: str) -> list[int]:
    out = []
    for n in os.listdir(log_path):
        if n.endswith(".json") and not n.endswith(".checkpoint.json"):
            stem = n[: -len(".json")]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


def _entry(log_path: str, v: int) -> dict:
    with open(os.path.join(log_path, f"{v:020d}.json")) as f:
        return json.load(f)


def _table_schema(log_path: str) -> StructType:
    """Latest logged schema (no SparkSession needed — the log is JSON)."""
    for v in reversed(_versions(log_path)):
        s = _entry(log_path, v).get("schema")
        if s is not None:
            return StructType.fromJson(s)
    return POST_SCHEMA


class _FileChange(InputPartition):
    def __init__(self, rel: str, key: str, change: str, version: int):
        self.rel = rel
        self.key = key
        self.change = change
        self.version = version


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self.table_path = options["path"]
        self.log_path = os.path.join(self.table_path, LOG_DIR)
        self.data_path = os.path.join(self.table_path, DATA_DIR)
        self.schema = schema
        self.start_version = int(options.get("start_version", -1))

    def initialOffset(self):
        return {"version": self.start_version}

    def latestOffset(self):
        vs = _versions(self.log_path)
        return {"version": vs[-1] if vs else self.start_version}

    def partitions(self, start, end):
        parts: list[_FileChange] = []
        base_types = {
            f.name: f.dataType
            for f in self.schema.fields
            if f.name not in ("_change", "_commit_version")
        }
        for v in _versions(self.log_path):
            if v <= start["version"] or v > end["version"]:
                continue
            e = _entry(self.log_path, v)
            s = e.get("schema")
            if s is not None:
                # The stream's column set is FROZEN at definition (the
                # DataSource schema() call).  A commit that logs a schema
                # the frozen one cannot represent — a new column (which
                # later batches would silently drop) or a changed type —
                # is an incompatible mid-stream evolution: fail loudly
                # (Delta's incompatible-schema-change behavior) so the
                # user restarts the stream with the new schema.
                # HISTORICAL narrower schemas (replaying commits from
                # before the current schema) are fine: the reader
                # NULL-fills missing columns.
                for fld in StructType.fromJson(s).fields:
                    if (
                        fld.name not in base_types
                        or base_types[fld.name] != fld.dataType
                    ):
                        raise RuntimeError(
                            f"incompatible schema change at table version "
                            f"{v}: column {fld.name!r} "
                            f"({fld.dataType.simpleString()}) is not in "
                            f"the stream's start schema — restart the "
                            f"stream to pick up the evolved schema"
                        )
            for a in e.get("add", []):
                parts.append(_FileChange(a["path"], a["key"], "insert", v))
            for rm in e.get("remove", []):
                key = ""
                for seg in rm.split("/"):
                    if seg.startswith("key="):
                        key = seg[4:]
                parts.append(_FileChange(rm, key, "delete", v))
        # Spark requires >= 1 partition per planned batch (a commit with
        # neither adds nor removes, e.g. a constraint change, still
        # advances the offset) — a zero-row sentinel covers it
        return parts or [_FileChange("", "", "none", end["version"])]

    def read(self, partition: _FileChange):
        if partition.change == "none":
            return
        path = os.path.join(self.data_path, partition.rel)
        if not os.path.exists(path):
            return  # vacuumed: CDF keeps whatever survives
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        base_fields = [
            f for f in self.schema.fields
            if f.name not in ("_change", "_commit_version")
        ]
        cols = {}
        for f in base_fields:
            if f.name == "key":
                cols[f.name] = [unquote(partition.key)] * tbl.num_rows
            elif f.name in tbl.column_names:
                cols[f.name] = tbl.column(f.name).to_pylist()
            else:  # pre-evolution file: NULL-fill the newer column
                cols[f.name] = [None] * tbl.num_rows
        names = [f.name for f in base_fields]
        for i in range(tbl.num_rows):
            yield tuple(cols[n][i] for n in names) + (
                partition.change,
                partition.version,
            )

    def commit(self, end):
        pass


class TableChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "starrysky_table_changes"

    def schema(self):
        base = _table_schema(
            os.path.join(self.options["path"], LOG_DIR)
        )
        from pyspark.sql.types import IntegerType

        return StructType(
            list(base.fields)
            + [
                StructField("_change", StringType()),
                StructField("_commit_version", IntegerType()),
            ]
        )

    def streamReader(self, schema: StructType):
        return TableChangesStreamReader(schema, self.options)


def register_table_changes_source(spark) -> None:
    spark.dataSource.register(TableChangesDataSource)
