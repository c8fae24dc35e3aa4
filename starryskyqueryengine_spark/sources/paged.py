"""S1/T7: cursor-driven paginated source scan.

The reference pulls posts 100/page from a remote search API in a
driver-side loop with hard caps — 100 pages x 100 rows — and stops early
on a short page or when the catch-up watermark is hit
(``src/subscription.ts:227-239``, loop guard ``:227``).

Spark-first shape: the page loop stays on the driver (it is inherently
sequential — each call needs the previous cursor), but each page lands as
a DataFrame and the union is one distributed relation; downstream
filtering/dedup runs on executors. For a replayable source (files, Kafka)
prefer Structured Streaming offsets (W2); this operator is for
cursor-API-shaped sources only, where the remote cursor IS the offset.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: fetch_page(cursor) -> (rows, next_cursor); next_cursor None = exhausted
PageFetcher = Callable[[str | None], tuple[Sequence, str | None]]

PAGE_SIZE = 100  # src/subscription.ts:231
MAX_PAGES = 100  # src/subscription.ts:227


def paged_scan(
    spark: SparkSession,
    fetch_page: PageFetcher,
    schema: StructType,
    max_pages: int = MAX_PAGES,
    page_size: int = PAGE_SIZE,
    stop_on_short_page: bool = True,
) -> DataFrame:
    """Drive the cursor loop and return one DataFrame of all fetched rows.

    Reference quirks preserved: the loop ends after ``max_pages`` calls,
    AND on a short page (the reference's ``cursor % 100 == 0`` guard also
    exits when the final page is not full — SURVEY §2.5 T7).

    ``page_size`` MUST be the fetcher's actual page size: the short-page
    stop compares against it, so a fetcher serving smaller pages would
    silently truncate the scan after one page (review r9).  An
    over-full page — the unambiguous half of that mismatch — raises
    instead of silently mis-classifying every page as "long"."""
    pages: list[list] = []
    cursor: str | None = None
    for _ in range(max_pages):
        rows, cursor = fetch_page(cursor)
        if len(rows) > page_size:
            raise ValueError(
                f"fetch_page returned {len(rows)} rows > page_size="
                f"{page_size}: the short-page stop would never fire — "
                f"pass the fetcher's real page size"
            )
        if rows:
            pages.append(list(rows))
        if cursor is None or (stop_on_short_page and len(rows) < page_size):
            break
    flat = [r for page in pages for r in page]
    if not flat:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(flat, schema)


def fetcher_from_rows(all_rows: Sequence, page_size: int = PAGE_SIZE) -> PageFetcher:
    """Build a deterministic PageFetcher over an in-memory sequence —
    the test stand-in for the remote search API."""

    def fetch(cursor: str | None):
        start = int(cursor) if cursor else 0
        page = list(all_rows[start : start + page_size])
        nxt = start + len(page)
        return page, (str(nxt) if nxt < len(all_rows) else None)

    return fetch
