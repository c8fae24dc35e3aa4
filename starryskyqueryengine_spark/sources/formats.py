"""Format-agnostic table IO: parquet / ORC / CSV / JSON(L) behind one call.

The reference ingests from HTTP JSON and persists to SQLite
(``src/db/index.ts:6-12``); on Spark the storage boundary is a columnar
file format plus optional text interchange formats. This module gives the
engine one entry point for each direction with schema discipline:

- ``read_any`` requires an explicit schema for text formats (CSV/JSON
  carry no types — silent inference drift is how timestamp and decimal
  bugs enter a pipeline; pass the authoritative StructType instead).
  Columnar formats read their embedded schema.
- Text reads drop malformed rows natively (DROPMALFORMED); with
  ``keep_corrupt=True`` they run PERMISSIVE instead, exposing a
  ``_corrupt_record`` rescue column the caller can route to a
  quarantine sink (same stance as the streaming validator,
  ``streaming/pipeline.py::validated_json`` — W5).  The split matters:
  referencing the rescue column in a filter makes Spark refuse any
  downstream query that prunes to it alone (count() does), so the
  drop path must never touch it.

Scale notes: all four formats split by file; parquet/ORC additionally
split by row group/stripe and support predicate pushdown + column
pruning. CSV/JSON are interchange-only — a 100 TB pipeline lands them
into parquet in one pass (``convert_to_parquet``) and queries the
parquet.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}

CORRUPT_COL = "_corrupt_record"


def sniff_format(path: str) -> str:
    """Format from the file/directory extension; parquet if none."""
    base = path.rstrip("/")
    _, ext = os.path.splitext(base)
    try:
        return _EXT_FORMAT[ext.lower()]
    except KeyError:
        if ext == "":
            return "parquet"
        raise ValueError(
            f"unrecognized extension {ext!r} (known: {sorted(_EXT_FORMAT)})"
        ) from None


def read_any(
    spark: SparkSession,
    path: str,
    schema: Optional[StructType] = None,
    fmt: Optional[str] = None,
    keep_corrupt: bool = False,
    multiline: bool = False,
) -> DataFrame:
    """Read ``path`` in the sniffed (or given) format.

    Text formats demand ``schema``; with ``keep_corrupt`` the PERMISSIVE
    rescue column stays in the result (else unparseable rows are dropped,
    matching the validator's stance).

    ``multiline=True`` reads array / pretty-printed JSON (one document
    spanning lines) instead of JSON-Lines.  Without it, an entirely
    unparseable non-empty JSON input raises instead of silently
    returning zero rows — a standard ``[{...}, {...}]`` payload would
    otherwise corrupt EVERY line and the drop-corrupt filter would
    swallow the whole file, the exact silent drift this module exists
    to prevent.

    Session requirement (CSV drop path): the session must run with
    ``spark.sql.csv.parser.columnPruning.enabled=false`` — declared in
    :data:`session.RUNTIME_CONFS` so ``get_spark()`` sessions always
    qualify — because under pruning a zero-column CSV query (count())
    skips row parsing and DROPMALFORMED drops nothing there.  This
    function verifies the conf and raises rather than mutating the
    session behind the embedder's back.
    """
    fmt = fmt or sniff_format(path)
    if fmt in ("parquet", "orc"):
        return spark.read.format(fmt).load(path)
    if schema is None:
        raise ValueError(
            f"{fmt} carries no types: pass the authoritative schema "
            "(inference drift is a correctness bug, not a convenience)"
        )
    reader = spark.read.format(fmt)
    if keep_corrupt:
        full = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
        )
        reader = (
            reader.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
        )
    else:
        # DROPMALFORMED, NOT permissive-then-filter (review r11): a
        # filter on the rescue column poisons the whole frame — any
        # downstream query whose pruned columns collapse to the corrupt
        # column alone (count() being the canonical case) raises
        # UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN, so
        # read_any(...).count() crashed on BOTH text formats.  Letting
        # the reader drop malformed rows natively keeps the corrupt
        # column out of the plan entirely.
        reader = reader.schema(schema).option("mode", "DROPMALFORMED")
        if fmt == "csv":
            # second CSV-only quirk: under parser column pruning a
            # query that parses no columns (count()) skips row parsing,
            # so DROPMALFORMED drops NOTHING there — count() would
            # disagree with collect() on the same frame.  The conf
            # lives in session.RUNTIME_CONFS (r12: a reader silently
            # reconfiguring the session was a footgun for embedders);
            # here we only VERIFY, loudly, because the conf is read at
            # execution time and a lazy frame from this call would
            # silently change semantics under a pruning session.
            pruning = spark.conf.get(
                "spark.sql.csv.parser.columnPruning.enabled", "true"
            )
            if pruning.lower() != "false":
                raise RuntimeError(
                    "read_any(csv, keep_corrupt=False) requires "
                    "spark.sql.csv.parser.columnPruning.enabled=false "
                    "(else count() and collect() disagree on malformed "
                    "rows); build the session via get_spark() or "
                    "apply_runtime_confs()"
                )
    if fmt == "csv":
        reader = reader.option("header", "true")
    if fmt == "json" and multiline:
        reader = reader.option("multiLine", "true")
    df = reader.load(path)
    if keep_corrupt:
        return df
    if fmt == "json" and not multiline:
        # all-corrupt guard: one bounded probe, only on the read path
        # that can misfire wholesale (array JSON fed to the line
        # reader).  spark.read.text sidesteps the corrupt-column
        # restriction for the any-input-at-all probe.
        if len(df.take(1)) == 0 and len(spark.read.text(path).take(1)) > 0:
            raise ValueError(
                f"{path}: no line parsed as JSON-Lines — if this is an "
                "array / pretty-printed JSON document, pass "
                "multiline=True (refusing to silently return 0 rows)"
            )
    return df


def write_any(df: DataFrame, path: str, fmt: Optional[str] = None, mode: str = "overwrite") -> None:
    fmt = fmt or sniff_format(path)
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)


def convert_to_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: Optional[StructType] = None,
    fmt: Optional[str] = None,
) -> DataFrame:
    """Land an interchange file as parquet (the one-pass 100 TB move) and
    return the parquet-backed DataFrame."""
    read_any(spark, src, schema=schema, fmt=fmt).write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)
