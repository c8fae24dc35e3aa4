"""Top-k serving scan, keyset (cursor) pagination, pinned prepend.

Reference read path (``src/algos/starrysky.ts:50-78``): per feed key,
``ORDER BY indexedAt DESC, cid DESC LIMIT n``, with a keyset cursor
``"{epochMillis}::{cid}"``. Spark plans ``orderBy().limit()`` as
TakeOrderedAndProject — a true distributed top-k (per-partition heap +
driver merge), never a full sort. The key equality filter prunes
partitions when the store is partitioned by ``key``.

The reference has an OR-precedence bug that drops the key constraint on
the tie branch (``src/algos/starrysky.ts:64-67``, noted in SURVEY §2.5);
this implements the *intended* keyset semantics: key = k AND
(indexedAt, cid) <lex (t, c).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_cursor(cursor: str) -> tuple[int, str]:
    """Parse ``"{epochMicros}::{cid}"`` (reference format
    src/algos/starrysky.ts:58-63, precision-widened — see encode)."""
    us_str, _, cid = cursor.partition("::")
    if not us_str or not cid:
        raise ValueError(f"malformed cursor {cursor!r}")
    return int(us_str), cid


def encode_cursor(indexed_at_us: int, cid: str) -> str:
    """Encode the next-page cursor from the last row
    (src/algos/starrysky.ts:75-78). Documented improvement over the
    reference: the cursor carries epoch MICROseconds. The reference's
    ms truncation was lossless for its ms-precision ISO strings, but
    this store keeps microsecond timestamps — an ms cursor would make
    the keyset predicate silently skip rows whose timestamp differs
    from the page boundary only below the millisecond."""
    return f"{indexed_at_us}::{cid}"


def keyset_predicate(cursor: str, ts_col: str = "indexedAt", cid_col: str = "cid") -> Column:
    """(indexedAt, cid) lexicographically before the cursor row."""
    us, cid = parse_cursor(cursor)
    t = F.timestamp_micros(F.lit(us))
    return (F.col(ts_col) < t) | ((F.col(ts_col) == t) & (F.col(cid_col) < F.lit(cid)))


def top_k(
    df: DataFrame,
    key: str | None,
    limit: int,
    ts_col: str = "indexedAt",
    cid_col: str = "cid",
    key_col: str = "key",
) -> DataFrame:
    """T1: newest-first top-k within a key (src/algos/starrysky.ts:50-56)."""
    if key is not None:
        df = df.filter(F.col(key_col) == key)
    return df.orderBy(F.col(ts_col).desc(), F.col(cid_col).desc()).limit(limit)


def keyset_page(
    df: DataFrame,
    key: str | None,
    limit: int,
    cursor: str | None = None,
    ts_col: str = "indexedAt",
    cid_col: str = "cid",
    key_col: str = "key",
) -> DataFrame:
    """T2: one keyset-paginated page (T1 + cursor predicate)."""
    if cursor:
        df = df.filter(keyset_predicate(cursor, ts_col, cid_col))
    return top_k(df, key, limit, ts_col, cid_col, key_col)


def prepend_pinned(
    spark,
    page: DataFrame,
    pinned_uris: list[str],
    ts_col: str = "indexedAt",
    cid_col: str = "cid",
) -> DataFrame:
    """T5/U1: prepend pinned post URIs on the first page only
    (src/algos/starrysky.ts:43-48). Output is the feed-skeleton
    projection ``{post: uri}`` plus an explicit ``rank`` ordering
    column (pinned first, then newest-first): union PHYSICAL order is
    not a contract — any repartition, AQE shuffle, or parquet
    round-trip by a distributed consumer would scramble it, so the
    order a consumer must re-sort by travels as data."""
    from pyspark.sql.window import Window

    n_pin = len(pinned_uris)
    # the page is limit-sized (keyset_page caps it), so the single-task
    # unpartitioned window is a non-issue
    skeleton = page.select(
        F.col("uri").alias("post"),
        (
            F.row_number().over(
                Window.orderBy(F.col(ts_col).desc(), F.col(cid_col).desc())
            )
            + F.lit(n_pin - 1)
        ).cast("long").alias("rank"),
    )
    if not pinned_uris:
        return skeleton
    pinned = spark.createDataFrame(
        [(u, i) for i, u in enumerate(pinned_uris)], "post string, rank long"
    )
    return pinned.unionByName(skeleton)
