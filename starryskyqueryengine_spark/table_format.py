"""TableFormat: the physical-layout seam under :class:`.store.PostStore`.

The reference's post table lives in SQLite, where every mutation is a
transaction (``src/db/migrations.ts:13-22``). The Spark-first equivalent
separates LOGICAL mutation semantics (upsert = anti-join + append,
retention = windowed rewrite, cascade = partition drop — all in
``store.py``) from the PHYSICAL commit protocol, which this interface
owns. Two reasons:

1. The sandbox implementation (vanilla Parquet + dynamic partition
   overwrite) has documented non-ACID edges: dynamic overwrite cannot
   express "this partition now has zero rows" (the deletion blind spot,
   worked around with ``expected_keys``), and concurrent readers can see
   a partially rewritten partition mid-job.
2. At 100 TB you would run this on an ACID table format instead, and the
   mapping is mechanical. For Delta / Iceberg, implement this interface
   as:

   - ``append(df)``                 -> plain transactional append
     (or ``MERGE INTO t USING batch ON t.uri = b.uri AND t.key = b.key
     WHEN NOT MATCHED THEN INSERT *`` to fold the anti-join into the
     commit and make upsert a single atomic op).
   - ``overwrite_partitions(df)``   -> ``REPLACE WHERE key IN (...)``
     (Delta ``replaceWhere`` / Iceberg ``overwritePartitions``) — an
     empty result for a named key is an honest transactional delete, so
     the ``expected_keys`` blind-spot workaround DISAPPEARS.
   - ``delete_partition(key)``      -> ``DELETE FROM t WHERE key = k``.
   - ``file_counts``/compaction     -> ``OPTIMIZE`` / ``rewrite_data_files``;
     snapshot isolation makes compaction safe under concurrent reads,
     replacing the Parquet impl's visible-rewrite window.

The interface is deliberately tiny and key-partition-oriented: every
PostStore mutation is scoped to the feed keys a micro-batch touches, and
that scoping is what keeps mutations O(touched partitions), not O(table),
at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import POST_SCHEMA

_COLS = [f.name for f in POST_SCHEMA.fields]


class TableFormat:
    """Abstract physical table adapter (see module docstring)."""

    def exists(self) -> bool:
        raise NotImplementedError

    def read(self, spark: SparkSession) -> DataFrame:
        """Full-table scan in canonical column order (empty DF if absent)."""
        raise NotImplementedError

    def append(self, df: DataFrame) -> None:
        raise NotImplementedError

    def overwrite_partitions(
        self, df: DataFrame, expected_keys: list[str] | None = None
    ) -> None:
        """Replace exactly the key partitions named in ``df`` (plus, for
        formats that need the workaround, drop any ``expected_keys``
        partition that ``df`` left empty)."""
        raise NotImplementedError

    def delete_partition(self, key: str) -> None:
        raise NotImplementedError

    def file_counts(self) -> dict[str, int]:
        """Data files per key partition (compaction signal); formats with
        native compaction may return {}."""
        raise NotImplementedError


class ParquetPartitionedFormat(TableFormat):
    """Default sandbox implementation: ``key``-partitioned vanilla
    Parquet with dynamic partition overwrite. Runs anywhere Spark runs;
    carries the two documented non-ACID edges the module docstring maps
    onto Delta/Iceberg."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        # dynamic: INSERT OVERWRITE replaces only partitions present in
        # the written data — untouched keys keep their files
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            not n.startswith(("_", ".")) for n in os.listdir(self.path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.exists():
            return spark.createDataFrame([], POST_SCHEMA)
        # partition column comes back typed; keep canonical column order
        return spark.read.parquet(self.path).select(_COLS)

    def append(self, df: DataFrame) -> None:
        df.select(_COLS).write.mode("append").partitionBy("key").parquet(self.path)

    def overwrite_partitions(
        self, df: DataFrame, expected_keys: list[str] | None = None
    ) -> None:
        # Dynamic overwrite's deletion blind spot: a key with ZERO
        # remaining rows writes no partition, so its old files silently
        # survive. Callers that may empty a partition pass expected_keys;
        # any expected key absent from df gets its partition dropped
        # explicitly. (On Delta/Iceberg REPLACE WHERE this body is one
        # atomic statement and the workaround disappears.)
        written: set[str] = set()
        if expected_keys is not None:
            written = {r["key"] for r in df.select("key").distinct().collect()}
        if expected_keys is None or written:
            df.select(_COLS).write.mode("overwrite").partitionBy("key").parquet(
                self.path
            )
        if expected_keys is not None:
            for k in set(expected_keys) - written:
                self.delete_partition(k)

    def delete_partition(self, key: str) -> None:
        part_dir = os.path.join(self.path, f"key={key}")
        if os.path.isdir(part_dir):
            import shutil

            shutil.rmtree(part_dir)

    def file_counts(self) -> dict[str, int]:
        out: dict[str, int] = {}
        if not self.exists():
            return out
        for entry in os.listdir(self.path):
            if entry.startswith("key="):
                part = os.path.join(self.path, entry)
                n = sum(
                    1
                    for f in os.listdir(part)
                    if f.endswith(".parquet") and not f.startswith((".", "_"))
                )
                out[entry[len("key=") :]] = n
        return out
