"""Z-order (Morton) clustering + file-level min/max data skipping.

The public technique (Morton 1966; popularized for lakehouse layouts by
Delta Lake's OPTIMIZE ZORDER BY and Iceberg's sort orders): interleave
the bits of two (or more) scaled column values into one code, range-
partition and sort the data by that code, and multi-dimensional locality
falls out — every file then covers a small RECTANGLE of the key space,
so per-file min/max statistics prune files for predicates on EITHER
dimension. A linear sort gives narrow stats only on its leading column;
Z-order gives useful stats on all clustered columns at once.

Pieces:

- :func:`zvalue_expr` — the interleave as a pure Catalyst expression
  tree (shifts/masks/ors), whole-stage-codegen friendly, no UDF.
- :func:`write_zordered` — scale each cluster column to ``bits``-bit
  ranks (one cheap min/max pass), ``repartitionByRange`` on the z-code
  (sampled range boundaries -> near-equal file sizes even on skewed
  data), sort within partitions, write Parquet, and record a per-file
  min/max manifest for the clustered columns (the sandbox analog of
  Delta's per-file stats in the transaction log).
- :func:`read_with_skipping` — consult the manifest with a conjunction
  of per-column [lo, hi] ranges and read only files whose rectangle
  intersects; returns (DataFrame, n_files_read, n_files_total).

Skipping is a pure optimization: predicates are re-applied by Spark on
the surviving files, so a pruned read ALWAYS returns exactly the rows
the unpruned read would (tests assert both the equality and the
pruning). At 100 TB this is the difference between touching ~1 % of a
table's files for a selective 2-D predicate and touching all of them;
row-group-level min/max inside each file stacks on top for free because
the sort makes those ranges narrow too.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import math as _math
import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_zorder_manifest.json"

# a bare ISO date, as produced by str(datetime.date)
_DATE_LAYOUT = _re.compile(r"\d{4}-\d{2}-\d{2}")


def _pad_date(s: str) -> str:
    """Normalize a bare-date rendering to its midnight timestamp so
    date-vs-timestamp comparisons are layout-consistent (review r13):
    '2024-01-01' sorts strictly BEFORE '2024-01-01 00:00:00'
    lexicographically, so a date bound against stringified timestamp
    stats (or a timestamp bound against date stats) pruned a file whose
    min is exactly midnight — a row Spark's own date->timestamp cast
    semantics says matches.  Padding to midnight matches that cast on
    both sides; sub-second suffixes stay order-correct because they
    only append to an equal 19-char prefix."""
    return s + " 00:00:00" if _DATE_LAYOUT.fullmatch(s) else s

# dtypes write_zordered can scale to integer ranks (numeric casts to
# double; temporal converts to epoch seconds / days).  Matched on the
# BASE token (text before any '(' parameter list), never by prefix:
# startswith('int') also matched 'interval day to second' etc., routing
# an interval cluster column to cast('double') instead of the loud
# cannot-cluster error below (r10, ADVICE).
_NUMERIC_BASES = frozenset(
    {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}
)


def _rank_source_expr(col_name: str, dtype: str):
    """A double-valued expression for the rank scaling, or None when the
    dtype has no meaningful linear order for z-clustering."""
    base = dtype.split("(", 1)[0]
    if base in _NUMERIC_BASES:
        return F.col(col_name).cast("double")
    if base in ("timestamp", "timestamp_ntz"):
        return F.col(col_name).cast("double")  # epoch seconds
    if base == "date":
        return F.unix_date(F.col(col_name)).cast("double")  # epoch days
    return None


def _col_kind(dtype: str) -> str:
    """'numeric' | 'temporal' — the manifest records this per cluster
    column (ADVICE r13) so the read path knows whether string-rendered
    stats carry date/timestamp LAYOUT semantics.  _pad_date normalizes
    '2024-01-01' to its midnight timestamp, which is correct for
    temporal columns but would be WRONG for a genuine string column
    whose values merely look like bare dates (padding flips the
    lexicographic order against strings with control characters after a
    date prefix — an incorrect prune).  write_zordered itself refuses
    string cluster columns, so every manifest it writes is covered by
    these two kinds; the flag exists so the read side never has to
    guess from the rendered value."""
    base = dtype.split("(", 1)[0]
    if base in ("timestamp", "timestamp_ntz", "date"):
        return "temporal"
    return "numeric"


def _stat_canon(v, side: str):
    """Canonicalize a per-file min/max stat for the JSON manifest so the
    read path's comparisons are sound:

    - int/float pass through (numeric compare)
    - Decimal converts to float OUTWARD-rounded (lo down, hi up): a
      nearest-rounding that moved a lo up / hi down could shrink a
      file's rectangle past a row it contains — silently pruning a file
      with matching rows.  (json.dump(default=str) used to stringify
      Decimals, and str(100) < '20.0' lexicographically pruned wrongly.)
    - datetime/date stringify via str() — the exact form str(query
      bound) produces on the read side, and lexicographically
      order-correct for the fixed ISO-like layout
    - anything else falls back to str(v) (the old default=str)
    """
    if v is None or isinstance(v, (bool, int, float)):
        return v
    if isinstance(v, _decimal.Decimal):
        f = float(v)
        exact = _decimal.Decimal(f)
        if side == "lo" and exact > v:
            f = _math.nextafter(f, -_math.inf)
        elif side == "hi" and exact < v:
            f = _math.nextafter(f, _math.inf)
        return f
    if isinstance(v, (_dt.datetime, _dt.date)):
        return str(v)
    return str(v)


def zvalue_expr(scaled_cols, bits: int = 16):
    """Morton code of pre-scaled non-negative int columns (each already
    in [0, 2**bits)): bit i of column j lands at position
    i * n_cols + j. Pure expression tree — shifts and ORs only."""
    n = len(scaled_cols)
    if n * bits > 63:
        # Spark's shiftleft masks the shift amount mod 64: positions
        # past 63 would silently WRAP onto low bits, scrambling the
        # interleave (files stop covering key-space rectangles and
        # min/max pruning quietly degrades to nothing). Refuse loudly —
        # callers lower `bits` (write_zordered auto-fits).
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} interleaved bits "
            f"exceeds the 63 available in a signed long; use bits <= "
            f"{63 // n}"
        )
    z = F.lit(0).cast("long")
    for j, c in enumerate(scaled_cols):
        for i in range(bits):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def _scale_expr(col, lo: float, hi: float, bits: int):
    """Map [lo, hi] to integer ranks [0, 2**bits - 1]; constant column
    (hi == lo) maps to 0."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi - lo)
    return F.least(
        F.greatest(
            F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(span)
                    * F.lit(float((1 << bits) - 1))).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit((1 << bits) - 1).cast("long"),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> dict:
    """Cluster ``df`` by the Morton code of ``cols`` into ``n_files``
    range partitions, write Parquet, and write the per-file min/max
    manifest. Returns the manifest dict.

    One extra pass computes global min/max per cluster column (2 numbers
    each on the driver — scale-independent); the clustering itself is
    one range shuffle. Stats collection reads only the clustered columns
    of each written file (column pruning keeps it cheap)."""
    spark = df.sparkSession
    # auto-fit the per-column bit budget to the 63 bits a signed long
    # interleave can hold (4 default-bits columns would otherwise wrap)
    bits = min(bits, 63 // max(len(cols), 1))
    # rank sources: numeric casts, temporal -> epoch seconds/days (the
    # canonical time x key layout used to crash on float(datetime));
    # unordered types (string/binary/...) are refused loudly — a NULL
    # rank would silently degrade clustering to noise
    dtypes = dict(df.dtypes)
    srcs: dict[str, object] = {}
    for c in cols:
        src = _rank_source_expr(c, dtypes[c])
        if src is None:
            raise ValueError(
                f"write_zordered cannot cluster on {c!r} of type "
                f"{dtypes[c]!r}: numeric, decimal, timestamp, and date "
                f"columns are supported"
            )
        srcs[c] = src
    # bounds computed on the RANK SOURCE (already double) — no driver-
    # side float() of whatever Python object the raw column collects to
    mm = df.agg(
        *[F.min(srcs[c]).alias(f"lo_{c}") for c in cols],
        *[F.max(srcs[c]).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    bounds = {c: (mm[f"lo_{c}"], mm[f"hi_{c}"]) for c in cols}
    scaled = [
        # an all-NULL column has None bounds — degrade to the constant-
        # column rank 0 (same as hi == lo) instead of a float(None)
        # TypeError on the driver
        _scale_expr(srcs[c], 0.0, 0.0, bits)
        if bounds[c][0] is None or bounds[c][1] is None
        else _scale_expr(srcs[c], bounds[c][0], bounds[c][1], bits)
        for c in cols
    ]
    zcol = zvalue_expr(scaled, bits=bits)
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    # Manifest stats in ONE Spark job: groupBy(input_file_name()) over a
    # single pruned scan of the written directory.  A per-file job loop
    # is fine at 16 files but is a driver-side job storm at 100k files —
    # one distributed aggregation keyed by file name costs one pass no
    # matter how many files the write produced.
    stat_rows = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("_file"), *cols)
        .groupBy("_file")
        .agg(
            *[F.min(c).alias(f"lo_{c}") for c in cols],
            *[F.max(c).alias(f"hi_{c}") for c in cols],
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()
    )
    stats: dict[str, dict] = {}
    for row in stat_rows:
        fn = os.path.basename(row["_file"].split("?", 1)[0])
        stats[fn] = {
            "rows": row["rows"],
            **{
                c: [
                    _stat_canon(row[f"lo_{c}"], "lo"),
                    _stat_canon(row[f"hi_{c}"], "hi"),
                ]
                for c in cols
            },
        }
    stats = dict(sorted(stats.items()))
    manifest = {
        "cols": cols,
        "bits": bits,
        # per-column kind (ADVICE r13): lets read_with_skipping apply
        # the date->midnight layout normalization ONLY to temporal
        # columns instead of to any stat that stringified
        "kinds": {c: _col_kind(dtypes[c]) for c in cols},
        "files": stats,
    }
    # atomic manifest swap (review r13): a plain open(w) let a concurrent
    # reader (two processes sharing the per-uid layout cache) see a torn
    # manifest; os.replace makes manifest existence imply completeness —
    # the same single-visibility-point rule as the JSONL sink
    tmp = os.path.join(path, f".{MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return manifest


def select_files(manifest: dict, ranges: dict[str, tuple]) -> list[str]:
    """The pure pruning decision: file names whose per-file [min, max]
    rectangle intersects every ``col: (lo, hi)`` range.  Factored out of
    read_with_skipping so the Hypothesis suite can drive thousands of
    bound combinations against a Python oracle without a Spark job per
    example (r14, verdict ask #5)."""
    # kind gate for the date-layout normalization (ADVICE r13): pad only
    # temporal columns.  Manifests predating the "kinds" key were still
    # written by write_zordered, which REFUSES string cluster columns —
    # so any string-rendered stat in a legacy manifest is temporal and
    # the pad-always fallback is safe for exactly that population.
    kinds = manifest.get("kinds", {})
    keep = []
    for fn, st in manifest["files"].items():
        ok = True
        for c, (lo, hi) in ranges.items():
            fmin, fmax = st[c]
            if fmin is None or fmax is None:
                continue  # all-null stats: cannot prune
            pad = (
                _pad_date if kinds.get(c, "temporal") == "temporal"
                else (lambda s: s)
            )
            # numeric stats compare numerically; anything else (e.g.
            # timestamps stringified into the manifest) lexicographically,
            # which is order-correct for ISO-8601
            if isinstance(fmin, (int, float)) and not isinstance(fmin, bool):
                lo_c = None if lo is None else float(lo)
                hi_c = None if hi is None else float(hi)
                fmin_c, fmax_c = float(fmin), float(fmax)
            else:
                lo_c = None if lo is None else pad(str(lo))
                hi_c = None if hi is None else pad(str(hi))
                fmin_c, fmax_c = pad(str(fmin)), pad(str(fmax))
            if (hi_c is not None and hi_c < fmin_c) or (
                lo_c is not None and lo_c > fmax_c
            ):
                ok = False
                break
        if ok:
            keep.append(fn)
    return keep


def read_with_skipping(
    spark: SparkSession, path: str, ranges: dict[str, tuple]
) -> tuple[DataFrame, int, int]:
    """Read only the files whose per-file [min, max] rectangle
    intersects every ``col: (lo, hi)`` range (None = unbounded side).
    The caller still applies its own row-level filter — skipping only
    rules out files that PROVABLY contain no matching row, so results
    are identical to an unpruned scan by construction."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    keep = select_files(manifest, ranges)
    total = len(manifest["files"])
    if not keep:
        empty = spark.read.parquet(path).limit(0)
        return empty, 0, total
    df = spark.read.parquet(*[os.path.join(path, fn) for fn in sorted(keep)])
    return df, len(keep), total
