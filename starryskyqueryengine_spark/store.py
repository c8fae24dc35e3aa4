"""PostStore: the materialized feed-contents table (reference ``post``).

The reference stores posts in SQLite with PK(uri, key) and mutates it with
upserts/deletes (``src/db/migrations.ts:13-22``). Spark-first equivalent:
a ``key``-partitioned Parquet table with

- upsert       = within-batch PK dedup + left-anti join against stored +
                 append (S8/J3; ``ON CONFLICT DO NOTHING`` semantics)
- retention    = window-rank rewrite of only the affected key partitions
                 (T3/W7), via dynamic partition overwrite
- delete(key)  = drop the key's partition (U4 cascade)

At 100 TB, partitioning by ``key`` (plus a date bucket of ``indexedAt``
for very hot keys) keeps every one of these operations scoped to the keys
actually touched in a micro-batch — never a full-table rewrite.

The LOGICAL mutation semantics live here; the PHYSICAL commit protocol
lives behind the :class:`.table_format.TableFormat` seam (default:
key-partitioned vanilla Parquet with dynamic partition overwrite, which
runs anywhere). Two ACID upgrades exist: pass
:class:`.table_format.TxnLogFormat` for the built-in transaction-log
format (atomic commits, snapshot isolation, time travel, vacuum — no
extra dependencies), or a Delta/Iceberg-backed adapter on a real
deployment, where every mutation becomes one ACID statement — the
mapping (MERGE / REPLACE WHERE / DELETE / OPTIMIZE) is documented in
``table_format.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import dedup_within_batch, new_rows_anti_join
from .operators.retention import refresh_delete, retain_latest
from .schemas import POST_SCHEMA
from .table_format import ParquetPartitionedFormat, TableFormat


class PostStore:
    def __init__(self, spark: SparkSession, path: str, fmt: TableFormat | None = None):
        self.spark = spark
        self.path = path
        self.fmt: TableFormat = fmt or ParquetPartitionedFormat(spark, path)

    # -- read ---------------------------------------------------------------

    def exists(self) -> bool:
        return self.fmt.exists()

    def read(self) -> DataFrame:
        return self.fmt.read(self.spark)

    def read_key(self, key: str) -> DataFrame:
        # equality filter on the partition column -> partition pruning
        return self.read().filter(F.col("key") == key)

    def stored_uris(self, key: str) -> DataFrame:
        """J2 build side (src/subscription.ts:172-178): URI set for a key,
        pruned to the single `uri` column at the scan."""
        return self.read_key(key).select("uri")

    def count_by_key(self) -> DataFrame:
        """A1 (src/subscription.ts:183-189)."""
        return self.read().groupBy("key").agg(F.count("*").alias("n"))

    # -- write --------------------------------------------------------------

    def _append(self, df: DataFrame, txn: tuple[str, int] | None = None) -> None:
        # Feature-detect transactional appends STATICALLY from the
        # signature — never by catching TypeError around the real call: a
        # TypeError raised inside a txn-capable format's append (possibly
        # after staging work) would be misread as "no txn support" and
        # silently retried on the plain path, duplicating the append and
        # downgrading exactly-once to at-least-once.
        if txn is not None:
            import inspect

            try:
                params = inspect.signature(self.fmt.append).parameters
            except (TypeError, ValueError):  # builtins without signatures
                params = {}
            if "txn" in params:
                self.fmt.append(df, txn=txn)
                return
        self.fmt.append(df)

    def upsert(
        self, incoming: DataFrame, txn: tuple[str, int] | None = None
    ) -> dict[str, int]:
        """S8: INSERT ... ON CONFLICT DO NOTHING on PK(uri, key).
        Returns rows actually inserted per key (counted on the deduped
        anti-joined batch — no store rescan).

        ``txn=(app_id, version)`` rides through to formats with
        transactional appends (TxnLogFormat): a replayed (app, version)
        skips the physical append entirely — exactly-once on top of the
        anti-join's logical idempotence.

        The anti-join's stored side is pruned to the key partitions the
        batch actually touches — the feed-key set is small by design
        (one row per configured feed), so this is a cheap driver-side
        collect that turns a full-store shuffle into a few-partition
        scan at any store size."""
        # NULL-PK rows are rejected outright: a post without uri/key can
        # never be served, and NULL never equals NULL in the anti-join,
        # so such a row would be re-inserted on EVERY re-delivery —
        # 'ON CONFLICT DO NOTHING' silently lost for exactly the hostile
        # rows PERMISSIVE parsing lets through
        incoming = incoming.filter(
            F.col("uri").isNotNull() & F.col("key").isNotNull()
        )
        deduped = dedup_within_batch(incoming, ["uri", "key"]).cache()
        batch = deduped
        try:
            if self.exists():
                keys = [r["key"] for r in deduped.select("key").distinct().collect()]
                if not keys:
                    return {}
                stored = self.read().filter(F.col("key").isin(keys))
                batch = new_rows_anti_join(deduped, stored, ["uri", "key"]).cache()
            inserted = {
                r["key"]: r["n"]
                for r in batch.groupBy("key").agg(F.count("*").alias("n")).collect()
            }
            self._append(batch, txn=txn)
            return inserted
        finally:
            deduped.unpersist()
            if batch is not deduped:
                batch.unpersist()

    def _overwrite_keys(self, df: DataFrame, expected_keys: list[str] | None = None) -> None:
        """Rewrite only the key partitions present in ``df`` (dynamic
        partition overwrite — untouched keys keep their files).

        ``expected_keys`` names partitions that may legitimately end up
        EMPTY; how that is honored is format-specific (the Parquet
        format drops them explicitly to cover dynamic overwrite's
        deletion blind spot; an ACID format expresses it in the same
        transactional REPLACE)."""
        self.fmt.overwrite_partitions(df, expected_keys=expected_keys)

    def apply_retention(self, limit_by_key: dict[str, int]) -> None:
        """T3/W7: evict rows beyond each key's cap, rewriting only keys
        that are actually over their cap."""
        if not self.exists() or not limit_by_key:
            return
        limits = self.spark.createDataFrame(
            list(limit_by_key.items()), "key string, _cap int"
        )
        stored = self.read().join(F.broadcast(limits), "key", "inner")
        over = (
            stored.groupBy("key", "_cap")
            .count()
            .filter(F.col("count") > F.col("_cap"))
            .select("key")
        )
        over_keys = [r["key"] for r in over.collect()]  # one row per feed key
        if not over_keys:
            return
        affected = stored.filter(F.col("key").isin(over_keys))
        # cache: overwrite_partitions consumes this plan twice (its
        # written-keys collect + the write itself) — without the cache
        # the affected partitions' join+window rescans per consumer
        kept = retain_latest(affected, F.col("_cap"), "key").drop("_cap").cache()
        try:
            # expected_keys closes the dynamic-overwrite blind spot here
            # too: a cap that keeps ZERO rows for a key (cap 0) must
            # still rewrite (empty) that key's partition, not skip it
            self._overwrite_keys(kept, expected_keys=over_keys)
        finally:
            kept.unpersist()

    def apply_refresh(self, key: str, refresh: int) -> None:
        """T4: drop the N newest rows for key (or all rows for -1)."""
        if not self.exists() or refresh == 0:
            return
        if refresh == -1:
            self.delete_key(key)
            return
        remaining = refresh_delete(self.read_key(key), refresh, key)
        self._overwrite_keys(remaining, expected_keys=[key])

    def delete_rows(self, doomed: DataFrame) -> None:
        """W6 CDC delete-apply: remove specific (uri, key) rows by
        rewriting only the key partitions that actually contain them."""
        if not self.exists():
            return
        doomed = doomed.select("uri", "key").distinct()
        keys = [r["key"] for r in doomed.select("key").distinct().collect()]
        if not keys:
            return
        affected = self.read().filter(F.col("key").isin(keys))
        remaining = affected.join(doomed, ["uri", "key"], "left_anti")
        self._overwrite_keys(remaining, expected_keys=keys)

    def file_counts(self) -> dict[str, int]:
        """Data files per key partition (compaction signal)."""
        return self.fmt.file_counts()

    def compact(self, max_files_per_key: int = 4) -> list[str]:
        """Rewrite fragmented key partitions into few files. Micro-batch
        appends add a file per batch per key; without compaction a
        long-running feed degrades every read (file-listing + tiny
        row groups). Only partitions above the threshold are rewritten
        (same dynamic-partition-overwrite scoping as retention).
        Returns the keys compacted."""
        fragmented = [
            k for k, n in self.file_counts().items() if n > max_files_per_key
        ]
        if not fragmented:
            return []
        affected = self.read().filter(F.col("key").isin(fragmented))
        # hash-repartition by key -> one writer task (one file) per key;
        # a pathologically hot key would add a salt column here to split
        # output into size-targeted files. Rows are written newest-first
        # within each partition so parquet row-group min/max stats on
        # indexedAt become selective — keyset pagination (T2) filters on
        # indexedAt and skips whole row groups in a compacted store.
        self._overwrite_keys(
            affected.repartition(len(fragmented), "key")
            .sortWithinPartitions("key", F.col("indexedAt").desc(), F.col("cid").desc())
        )
        return fragmented

    @staticmethod
    def save_bucketed(df: DataFrame, table_name: str, n_buckets: int = 64) -> None:
        """Write a bucketed copy of the store (bucketBy uri) for
        co-located PK joins: two tables bucketed the same way join
        bucket-to-bucket with NO exchange on either side — at 100 TB
        this removes the dominant shuffle from the upsert anti-join
        (see tests/test_plan_shapes.py::test_bucketed_join_avoids_shuffle).
        Requires a metastore-backed table (saveAsTable)."""
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, "uri")
            .sortBy("uri")
            .saveAsTable(table_name)
        )

    def delete_key(self, key: str) -> None:
        """U4 cascade: remove the key's partition entirely."""
        self.fmt.delete_partition(key)
