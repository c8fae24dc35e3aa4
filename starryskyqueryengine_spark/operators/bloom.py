"""Bloom-filter pre-probe for the PK anti-join (S8/J3 at 100 TB).

The upsert's correctness comes from the exact anti-join; its COST at
scale is joining the incoming batch against the stored key partitions.
A Bloom filter over the stored URIs lets the batch pre-drop every row
the filter definitely hasn't seen: Bloom filters have NO false
negatives, so a row the filter rejects is provably new and skips the
join entirely, while false positives (expected rate ``fpp``) merely
take the exact anti-join path they would have taken anyway. On the
dominant ingest shape — most incoming rows are new — the exact join
runs over only the small maybe-duplicate remainder.

Construction is pure public technique and stays engine-friendly:

- k bit positions per key via Kirsch–Mitzenmacher double hashing
  (h_i = h1 + i*h2 mod m, Kirsch & Mitzenmacher 2006) over two
  JVM-side ``xxhash64`` columns — position computation is whole-stage
  codegen on BOTH build and probe sides, never Python.
- Build: the distinct set-bit positions come back from one
  explode+distinct aggregation — at most ``m`` values regardless of
  store size — and pack into a numpy bool bitset on the driver.
- Probe: the bitset broadcasts and an Arrow-batched pandas UDF does a
  single vectorized gather ``bits[positions]`` per batch (the
  sanctioned Python path: one numpy op per Arrow batch, no per-row
  work).

Scale honesty: any BROADCAST bloom carries ~9.6 bits per stored key at
1% fpp, so a driver/executor-resident filter fits up to roughly 10^9
stored keys (~1.2 GB). Beyond that the same split runs against
per-partition filters (build per key partition, probe joined on key) —
the shape Delta/Iceberg use with per-file bloom indexes. The operator
takes ``expected_items`` so callers can size from a table stat instead
of a count pass.

Correctness invariant (test-pinned): split-by-bloom then exact-join the
remainder == exact-join everything, row for row, at any fpp.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key_col: str, m: int, k: int):
    """k codegen bit-position expressions via double hashing. pmod keeps
    positions non-negative; the +i*h2 stride is the KM construction."""
    # reduce both hashes mod m BEFORE the linear combination: keeps every
    # intermediate below k*m (no ANSI int64 overflow) and the KM
    # guarantee is unaffected by working in Z_m
    h1 = F.pmod(F.xxhash64(F.col(key_col)), F.lit(m))
    # force the stride into [1, m-1]: h2 == 0 mod m would collapse all k
    # probe positions onto the single bit h1, silently inflating that
    # key's effective fpp to the 1-hash rate (~bits_set/m); a nonzero
    # stride keeps the KM guarantee and the configured fpp sizing honest
    h2 = F.pmod(F.xxhash64(F.col(key_col), F.lit(1)), F.lit(m - 1)) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)).cast("long") for i in range(k)]


def build_bloom(
    stored: DataFrame,
    key_col: str = "uri",
    expected_items: int | None = None,
    fpp: float = 0.01,
):
    """Build the bitset: returns (numpy bool array of size m, k)."""
    # clamp BOTH sizing paths: a first-ingest empty store's table stat
    # is 0, and an unclamped n=0 divided by zero in the k computation
    n = max(expected_items, 1) if expected_items is not None else max(
        stored.count(), 1
    )
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    # OR-pack the set bits into 64-bit words ON THE EXECUTORS and collect
    # only the words: the driver transfer is ceil(m/64) longs (~9.6 bits
    # per key at 1% fpp -> ~0.15 bytes/key over the wire), 64x smaller
    # than collecting distinct positions, and the aggregation map-side
    # combines. bit 63 round-trips through the signed long fine.
    nwords = (m + 63) // 64
    words = (
        stored.select(F.explode(F.array(*_positions(key_col, m, k))).alias("p"))
        .groupBy(F.expr("p div 64").alias("w"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))")
            ).alias("bits")
        )
        .toPandas()  # Arrow: two numpy columns, no per-row Row objects
    )
    arr = np.zeros(nwords, dtype=np.uint64)
    # vectorized scatter — at the 10^9-key ceiling ~150M words come
    # back; a collect() + Python assignment loop materialized 150M Row
    # objects (tens of GB of driver heap) where this is two arrays
    arr[words["w"].to_numpy(dtype=np.int64)] = (
        words["bits"].to_numpy(dtype=np.int64).view(np.uint64)
    )
    bits = np.unpackbits(
        arr.view(np.uint8), bitorder="little", count=m
    ).astype(bool)
    return bits, k


def bloom_split_new(
    incoming: DataFrame,
    stored: DataFrame,
    key_col: str = "uri",
    expected_items: int | None = None,
    fpp: float = 0.01,
):
    """Split ``incoming`` into (definitely_new, maybe_dup) against a
    Bloom filter of ``stored[key_col]``.

    - ``definitely_new``: filter rejects the key — provably absent from
      ``stored`` (no false negatives), safe to append joinlessly.
    - ``maybe_dup``: filter accepts — true duplicates plus ~fpp false
      positives; run the exact anti-join on this remainder only.

    The probed batch is materialized ONCE (localCheckpoint): the two
    halves share the scan+probe subtree, and Spark has no cross-branch
    CSE — a caller consuming both (the normal split shape, e.g.
    definitely_new ∪ exact-joined remainder) would otherwise run the
    incoming scan and the xxhash64+gather probe twice, doubling exactly
    the cost this operator exists to cut.  Checkpoint blocks free at
    driver GC of the returned frames.
    """
    from pyspark.sql.functions import pandas_udf

    if "_maybe" in incoming.columns:
        raise ValueError(
            "bloom_split_new: column name '_maybe' is reserved internally;"
            " rename it before splitting"
        )
    bits, k = build_bloom(stored, key_col, expected_items, fpp)
    m = bits.shape[0]
    spark = incoming.sparkSession
    bc = spark.sparkContext.broadcast(np.packbits(bits))

    @pandas_udf("boolean")
    def _all_set(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # iterator form: unpack the broadcast bitset ONCE PER TASK, not
        # once per Arrow batch — at 10^9 stored keys the unpacked bool
        # array is ~9.6 GB of memory traffic per unpack, which
        # previously repeated every ~10k rows in the probe hot path
        unpacked = np.unpackbits(bc.value, count=m).astype(bool)
        for pos in it:
            if len(pos) == 0:
                yield pd.Series([], dtype=bool)
                continue
            mat = np.stack(pos.to_numpy())  # (batch, k) positions
            yield pd.Series(unpacked[mat].all(axis=1))

    flagged = incoming.withColumn(
        "_maybe", _all_set(F.array(*_positions(key_col, m, k)))
    ).localCheckpoint(eager=True)
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybe_dup = flagged.filter(F.col("_maybe")).drop("_maybe")
    return definitely_new, maybe_dup
