"""S1/S4 as a first-class Spark Python DataSource (Spark 4 API).

``operators``-era shape (``sources/paged.py``) drives the cursor loop on
the DRIVER and materializes every page there before parallelize. This
module moves the same protocol into Spark's source framework
(``pyspark.sql.datasource``), which changes where the work happens:

- BATCH (``starrysky_paged``): the page loop runs INSIDE read tasks.
  With an offset-addressable cursor space (``addressable=true`` — the
  from/size style many search APIs offer) the page range splits across
  ``num_partitions`` input partitions, each executor pulling its own
  page window CONCURRENTLY — the driver never touches a row. With an
  opaque sequential cursor the source degrades honestly to one
  partition whose task runs the loop executor-side (still zero rows on
  the driver, unlike ``paged_scan``).
- STREAMING (``starrysky_paged_stream``): the reference's live
  searchPosts poll (``src/subscription.ts:227-239``) as a Spark
  streaming source — the PAGE CURSOR IS THE OFFSET. Each micro-batch
  reads from the last committed cursor to the current end of the
  remote feed; Spark's checkpoint persists the cursor, giving the
  poll loop exactly-once restart semantics for free (W2/W3's
  stored-watermark logic, but owned by the engine).

Fetchers cross process boundaries by DOTTED PATH, not pickle: the
``fetcher_factory`` option names ``module:function``; executors import
it and call ``factory(options) -> fetch_page(cursor)``. The built-in
factory (``fixture_fetcher_factory``) serves deterministic pages from a
parquet file via pyarrow — the sandbox stand-in for the remote HTTP
API, same seam the engine's IngestJob uses (no network in this
environment; a real deployment points the factory at its HTTP client).

100 TB note: a cursor API is a trickle source — the scale story is not
volume but CORRECTNESS under restarts (offset=cursor checkpointing)
and driver isolation (pages decode on executors). Both are the point
of doing this as a DataSource instead of a driver loop.
"""

from __future__ import annotations

import importlib
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from .paged import MAX_PAGES, PAGE_SIZE  # one canonical pair of caps

DEFAULT_SCHEMA = "doc_id bigint, text string, lang string"


def _resolve_factory(options):
    """Import ``module:function`` named by fetcher_factory and build the
    fetcher. Runs on the EXECUTOR — only the dotted path travels."""
    dotted = options.get(
        "fetcher_factory",
        "starryskyqueryengine_spark.sources.paged_datasource:fixture_fetcher_factory",
    )
    mod, fn = dotted.split(":")
    return getattr(importlib.import_module(mod), fn)(options)


def _quoted_name(fld: str) -> str:
    """Extract the identifier from a backtick-quoted field prefix,
    unescaping Spark's doubled-backtick escape (``` `a``b` ``` is the
    column literally named ``a`b``)."""
    out: list[str] = []
    j = 1
    while j < len(fld):
        if fld[j] == "`":
            if j + 1 < len(fld) and fld[j + 1] == "`":
                out.append("`")
                j += 2
                continue
            break  # the real closing backtick
        out.append(fld[j])
        j += 1
    return "".join(out)


def _ddl_field_names(ddl: str) -> list[str]:
    """Top-level field names from a DDL struct string, splitting on
    commas only at bracket depth 0 — commas inside ``decimal(10,2)``,
    ``map<string,int>``, or ``struct<a:int,b:string>`` stay within
    their field.  Backtick-quoted names are opaque (review r11): a
    legal parquet column like ``` `my,col` ``` or ``` `my col` ```
    previously split at its embedded comma / lost everything after its
    embedded space, yielding phantom names that KeyError the read.
    A doubled backtick inside a quoted span is Spark's escape for a
    literal backtick (r12): it keeps the scanner in-quote and
    unescapes to one backtick in the extracted name."""
    names: list[str] = []
    depth = 0
    in_bt = False
    field_start = 0
    s = ddl + ","
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "`":
            if in_bt and i + 1 < len(s) and s[i + 1] == "`":
                i += 2  # escaped literal backtick: consume, stay quoted
                continue
            in_bt = not in_bt
        elif in_bt:
            pass
        elif ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            fld = s[field_start:i].strip()
            if fld:
                if fld.startswith("`"):
                    names.append(_quoted_name(fld))
                else:
                    # "name type..." or "name: type" — name is the first
                    # token, with any trailing colon stripped
                    names.append(fld.split()[0].rstrip(":"))
            field_start = i + 1
        i += 1
    if in_bt:
        # ADVICE r13: an unterminated quoted identifier left the scanner
        # in-quote through the appended sentinel comma, silently DROPPING
        # the final field.  Malformed DDL must fail loudly, not truncate.
        raise ValueError(
            f"unterminated backtick-quoted identifier in DDL: {ddl!r}"
        )
    return names


def fixture_fetcher_factory(options):
    """Deterministic page server over a parquet file (pyarrow, local to
    the task): cursor = stringified row offset — an ADDRESSABLE cursor
    space, so the batch source can split the page range."""
    import pyarrow.parquet as pq

    path = options["path"]
    page_size = int(options.get("page_size", PAGE_SIZE))
    # a DEPTH-AWARE field split, not a naive comma split: types like
    # decimal(10,2) or map<string,int> contain commas and the naive
    # split yielded phantom column names that KeyError the parquet
    # read.  (Not StructType.fromDDL: this factory runs task-side,
    # where Python workers have no JVM gateway for the DDL parser.)
    cols = _ddl_field_names(options.get("ddl_schema", DEFAULT_SCHEMA))

    table = pq.read_table(path, columns=list(cols))
    n = table.num_rows

    def fetch(cursor):
        start = int(cursor) if cursor else 0
        end = min(start + page_size, n)
        rows = [
            tuple(table.column(i)[j].as_py() for i in range(table.num_columns))
            for j in range(start, end)
        ]
        return rows, (str(end) if end < n else None)

    return fetch


class _PageRange(InputPartition):
    def __init__(self, first_page: int, n_pages: int):
        self.first_page = first_page
        self.n_pages = n_pages


class PagedApiReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.options = dict(options)
        self.page_size = int(options.get("page_size", PAGE_SIZE))
        self.max_pages = int(options.get("max_pages", MAX_PAGES))
        self.addressable = options.get("addressable", "true").lower() == "true"
        self.num_partitions = int(options.get("num_partitions", 4))

    def partitions(self):
        if not self.addressable:
            # opaque sequential cursor: one executor-side loop
            return [_PageRange(0, self.max_pages)]
        per = -(-self.max_pages // self.num_partitions)
        return [
            _PageRange(i * per, min(per, self.max_pages - i * per))
            for i in range(self.num_partitions)
            if i * per < self.max_pages
        ]

    def read(self, partition: _PageRange):
        fetch = _resolve_factory(self.options)
        cursor = (
            str(partition.first_page * self.page_size)
            if self.addressable
            else None
        )
        for _ in range(partition.n_pages):
            rows, cursor = fetch(cursor)
            yield from rows
            if cursor is None or len(rows) < self.page_size:
                break  # exhausted or short page (reference loop guard, T7)


class PagedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "starrysky_paged"

    def schema(self) -> str:
        return self.options.get("ddl_schema", DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> DataSourceReader:
        return PagedApiReader(schema, self.options)


class PagedPollStreamReader(SimpleDataSourceStreamReader):
    """Streaming poll over the cursor API: offset = {'pos': row_offset}.
    Spark checkpoints the offset; on restart the poll resumes from the
    committed cursor (the reference persists the same watermark by hand,
    src/subscription.ts:360-372)."""

    def __init__(self, options):
        self.options = dict(options)
        self.page_size = int(options.get("page_size", PAGE_SIZE))
        self.max_pages_per_batch = int(options.get("max_pages", MAX_PAGES))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        fetch = _resolve_factory(self.options)
        cursor = str(start["pos"]) if start["pos"] else None
        out = []
        for _ in range(self.max_pages_per_batch):
            rows, cursor = fetch(cursor)
            out.extend(rows)
            if cursor is None or len(rows) < self.page_size:
                break
        end_pos = start["pos"] + len(out)
        return iter(out), {"pos": end_pos}

    def readBetweenOffsets(self, start, end):
        # deterministic replay for recovery: re-serve [start, end)
        fetch = _resolve_factory(self.options)
        cursor = str(start["pos"]) if start["pos"] else None
        need = end["pos"] - start["pos"]
        out = []
        while len(out) < need:
            rows, cursor = fetch(cursor)
            if not rows:
                break
            out.extend(rows)
            if cursor is None:
                break
        return iter(out[:need])


class PagedPollStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "starrysky_paged_stream"

    def schema(self) -> str:
        return self.options.get("ddl_schema", DEFAULT_SCHEMA)

    def simpleStreamReader(self, schema: StructType):
        return PagedPollStreamReader(self.options)


def register_paged_sources(spark) -> None:
    """Idempotently register both sources on this session."""
    spark.dataSource.register(PagedApiDataSource)
    spark.dataSource.register(PagedPollStreamDataSource)
