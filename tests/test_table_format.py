"""TableFormat seam: PostStore's logical mutations must route every
physical write through the injected adapter, and an alternate adapter
must produce byte-identical logical state to the default."""

import pytest

from starryskyqueryengine_spark.store import PostStore
from starryskyqueryengine_spark.table_format import (
    ParquetPartitionedFormat,
    TableFormat,
)

from tests.conftest import make_posts


class RecordingFormat(TableFormat):
    """Delegates to the Parquet impl but records the physical protocol —
    a stand-in for a Delta/Iceberg adapter proving the seam is the only
    write path."""

    def __init__(self, spark, path):
        self.inner = ParquetPartitionedFormat(spark, path)
        self.calls: list[str] = []

    def exists(self):
        return self.inner.exists()

    def read(self, spark):
        return self.inner.read(spark)

    def append(self, df):
        self.calls.append("append")
        self.inner.append(df)

    def overwrite_partitions(self, df, expected_keys=None):
        self.calls.append(f"overwrite:{sorted(expected_keys or [])}")
        self.inner.overwrite_partitions(df, expected_keys=expected_keys)

    def delete_partition(self, key):
        self.calls.append(f"delete:{key}")
        self.inner.delete_partition(key)

    def file_counts(self):
        return self.inner.file_counts()


def _batch(spark, n0, n, key="k1"):
    import datetime

    rows = [
        {
            "uri": f"at://u/p/{i}",
            "cid": f"c{i:03d}",
            "text": "x",
            "createdAt": datetime.datetime(2026, 1, 1, 0, 0, i % 60),
        }
        for i in range(n0, n0 + n)
    ]
    df = make_posts(spark, rows)
    from pyspark.sql import functions as F

    return df.select(
        "uri",
        F.lit(key).alias("key"),
        "cid",
        "replyParent",
        "replyRoot",
        F.col("createdAt").alias("indexedAt"),
    )


def test_poststore_routes_all_writes_through_format(spark, tmp_path):
    fmt = RecordingFormat(spark, str(tmp_path / "t"))
    store = PostStore(spark, str(tmp_path / "t"), fmt=fmt)

    ins = store.upsert(_batch(spark, 0, 6))
    assert ins == {"k1": 6}
    assert fmt.calls == ["append"]

    # idempotent re-upsert: all rows dedup away -> nothing inserted
    again = store.upsert(_batch(spark, 0, 6))
    assert sum(again.values()) == 0

    store.apply_retention({"k1": 4})
    assert any(c.startswith("overwrite") for c in fmt.calls)
    assert store.read_key("k1").count() == 4

    # refresh that empties the partition exercises expected_keys routing
    store.apply_refresh("k1", -1)
    assert "delete:k1" in fmt.calls
    assert store.read().count() == 0


def test_injected_format_state_matches_default(spark, tmp_path):
    """Same mutation sequence through the default and an injected
    adapter lands in identical logical state."""
    s_def = PostStore(spark, str(tmp_path / "a"))
    s_inj = PostStore(
        spark, str(tmp_path / "b"), fmt=RecordingFormat(spark, str(tmp_path / "b"))
    )
    for s in (s_def, s_inj):
        s.upsert(_batch(spark, 0, 8))
        s.upsert(_batch(spark, 4, 8))  # 4 dup, 4 new
        s.apply_retention({"k1": 10})
        s.apply_refresh("k1", 2)
    a = sorted(tuple(r) for r in s_def.read().collect())
    b = sorted(tuple(r) for r in s_inj.read().collect())
    assert a == b and len(a) == 8


def test_abstract_format_refuses_silently_partial_impls(spark):
    class Half(TableFormat):
        def exists(self):
            return False

    h = Half()
    with pytest.raises(NotImplementedError):
        h.append(None)
    with pytest.raises(NotImplementedError):
        h.overwrite_partitions(None)
