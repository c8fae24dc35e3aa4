"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only cross-batch state is the stored-URI set (W2
catch-up watermark, ``src/subscription.ts:172-189,274-278``) and the
per-key retention cap (W7, ``src/subscription.ts:379-393``). The
foreachBatch + PostStore path covers both for the materialization
pipeline; this module provides the *in-stream* formulation — per-key
state kept by Spark's state store, no external table — for consumers
that want feed stats or caps maintained continuously.

Scale notes: state is partitioned by the grouping key across executors
and checkpointed incrementally (RocksDB-backed state store per task in a
real deployment, spark.sql.streaming.stateStore.providerClass); each
micro-batch only touches keys present in that batch. The Arrow batches
arriving at the Python worker are bounded, so per-task memory stays
flat regardless of stream length — per-key state must stay small
(here: counters + a bounded top-N heap), never the full history.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_total", LongType()),
        StructField("n_batch", LongType()),
        StructField("max_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = "n_total LONG, max_ts_us LONG"


# idle-key state expiry horizon for the ProcessingTimeTimeout wiring:
# a key silent for this long has its running counters dropped (the
# next event simply restarts them at zero — the same contract as a
# retention-evicted feed)
IDLE_KEY_TIMEOUT_MS = 30 * 60 * 1000


def running_key_stats(
    key: Tuple[Any, ...],
    batch_iter: Iterator[pd.DataFrame],
    state: GroupState,
    *,
    arm_idle_timeout: bool = False,
) -> Iterator[pd.DataFrame]:
    """A2/A5-style per-key running stats as true streaming state:
    cumulative row count and newest event time, maintained by the state
    store across micro-batches (the reference persists the analogous
    ``recordCount``/``lastExecTime`` into the conditions table,
    ``src/subscription.ts:373-400``).

    Counting semantics: rows DELIVERED — a source that re-delivers a row
    (at-least-once) counts it again; O(1) state cannot dedup by uri.
    Where exactly-once accepted-counts matter, use the foreachBatch
    upsert path (PK anti-join) whose insert counts are replay-safe."""
    if state.hasTimedOut:
        # idle-key expiry (ProcessingTimeTimeout path): drop the state
        # WITHOUT emitting — a timeout invocation carries no new rows,
        # and updating state here would resurrect what we just expired
        state.remove()
        return
    if state.exists:
        (n_total, max_ts_us) = state.get
    else:
        n_total, max_ts_us = 0, None

    n_batch = 0
    for pdf in batch_iter:
        if pdf.empty:
            continue
        n_batch += len(pdf)
        batch_max = pdf["indexedAt"].max()
        if pd.isna(batch_max):
            # every indexedAt in the chunk is NULL (PERMISSIVE-rescued
            # rows): max() is NaT, whose .value is the int64 sentinel —
            # adopting it would poison the state and blow up the
            # pd.Timestamp below (OutOfBoundsDatetime kills the query,
            # the exact poison-pill mode W5 exists to prevent).  Rows
            # still COUNT; they just carry no event time.
            continue
        batch_max_us = int(batch_max.value // 1_000)
        if max_ts_us is None or batch_max_us > max_ts_us:
            max_ts_us = batch_max_us

    n_total += n_batch
    state.update((n_total, max_ts_us))
    # arm the idle-key expiry when the stream was wired with
    # ProcessingTimeTimeout: Spark only times out keys that REGISTERED
    # a duration, so without this call the configured timeout is a
    # silent no-op and churned keys accumulate state forever.  The mode
    # is threaded in EXPLICITLY by stream_running_stats (ADVICE r8):
    # the earlier GroupState._timeout_conf introspection read an
    # undocumented PySpark internal that a minor upgrade could rename,
    # silently disabling expiry.
    if arm_idle_timeout:
        state.setTimeoutDuration(IDLE_KEY_TIMEOUT_MS)
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_total": [n_total],
            "n_batch": [n_batch],
            # `is not None`, not truthiness: epoch-0 (max_ts_us == 0) is a
            # legitimate timestamp and must not collapse to NaT
            "max_ts": [pd.Timestamp(max_ts_us * 1_000) if max_ts_us is not None else pd.NaT],
        }
    )


def stream_running_stats(posts_stream, timeout: str = "NoTimeout"):
    """Wire running_key_stats onto a (key, indexedAt) stream. Output
    mode must be 'update'.  ``timeout`` maps to a GroupStateTimeout
    constant (``NoTimeout`` / ``ProcessingTimeTimeout`` /
    ``EventTimeTimeout``) — callers wanting idle-key state expiry pass
    ProcessingTimeTimeout; previously the argument was silently
    dropped and state never expired."""
    try:
        conf = getattr(GroupStateTimeout, timeout)
    except AttributeError:
        raise ValueError(
            f"unknown GroupStateTimeout {timeout!r}; expected NoTimeout,"
            f" ProcessingTimeTimeout, or EventTimeTimeout"
        ) from None

    # close over the configured mode instead of letting the worker
    # introspect GroupState internals — the closure is what ships to
    # executors, so the arming decision is pinned at wiring time
    arm = timeout == "ProcessingTimeTimeout"

    def stats_fn(key, batch_iter, state):
        return running_key_stats(key, batch_iter, state,
                                 arm_idle_timeout=arm)

    return (
        posts_stream.groupBy("key")
        .applyInPandasWithState(
            stats_fn,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=conf,
        )
    )


TOPK_STATE_SCHEMA = "uris ARRAY<STRING>, ts_us ARRAY<LONG>"

TOPK_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("uri", StringType()),
        StructField("ts_us", LongType()),
    ]
)


def make_streaming_topk(k: int):
    """W7 retention as in-stream state: keep only the newest ``k`` rows
    per key across the whole stream. State is the bounded (uri, ts)
    top-k list — O(k) per key, never the full history; each batch merges
    and truncates, and the operator emits the current survivors."""

    def topk_fn(
        key: Tuple[Any, ...],
        batch_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            uris, ts_us = state.get
            uris, ts_us = list(uris), list(ts_us)
        else:
            uris, ts_us = [], []

        # dedup against state AND within the batch: file/cursor sources
        # re-deliver rows across micro-batches (at-least-once); without
        # this a re-delivered uri occupies a second top-k slot and
        # evicts a genuinely distinct post. A re-delivery with a NEWER
        # timestamp (edit/update) refreshes the stored one instead of
        # being discarded. O(k) state keeps both checks cheap.
        idx = {u: i for i, u in enumerate(uris)}
        for pdf in batch_iter:
            if pdf.empty:
                continue
            for u, v in zip(pdf["uri"].tolist(), pdf["indexedAt"]):
                if pd.isna(v):
                    # NULL indexedAt (PERMISSIVE-rescued row): NaT.value
                    # is the int64 sentinel — adopting it would park a
                    # garbage-timestamp survivor in a top-k slot (same
                    # poison-pill guard as running_key_stats)
                    continue
                vus = int(v.value // 1_000)
                if u in idx:
                    if vus > ts_us[idx[u]]:
                        ts_us[idx[u]] = vus
                    continue
                idx[u] = len(uris)
                uris.append(u)
                ts_us.append(vus)

        order = sorted(range(len(uris)), key=lambda i: (-ts_us[i], uris[i]))[:k]
        uris = [uris[i] for i in order]
        ts_us = [ts_us[i] for i in order]
        state.update((uris, ts_us))
        yield pd.DataFrame(
            {"key": [key[0]] * len(uris), "uri": uris, "ts_us": ts_us}
        )

    return topk_fn


def stream_topk_retention(posts_stream, k: int):
    """Wire the bounded per-key retention onto a (key, uri, indexedAt)
    stream; output mode 'update' (each batch re-emits the survivors for
    keys it touched)."""
    return posts_stream.groupBy("key").applyInPandasWithState(
        make_streaming_topk(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_STATE_SCHEMA = "terms ARRAY<STRING>, counts ARRAY<LONG>, total LONG"

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("term", StringType()),
        StructField("est", LongType()),
        StructField("shard_total", LongType()),
    ]
)


def make_streaming_heavy_hitters(k: int):
    """Streaming Misra-Gries: per term-space shard, a k-counter summary
    maintained as stream state (O(k) per shard forever, regardless of
    how many distinct terms flow through).  Weighted batch updates: each
    micro-batch is pre-aggregated vectorized, then unique (term, weight)
    pairs hit the counters — same algorithm and error bound as the batch
    sketch (``functions/sketches.py``): est underestimates by at most
    shard_total/k, so every term with true shard frequency > total/k is
    guaranteed present in the emitted summary at every point in the
    stream."""

    def mg_fn(
        key: Tuple[Any, ...],
        batch_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            terms, counts, total = state.get
            counters = dict(zip(list(terms), [int(c) for c in counts]))
            total = int(total)
        else:
            counters, total = {}, 0
        for pdf in batch_iter:
            if pdf.empty:
                continue
            for t, w in pdf["term"].value_counts(dropna=True).items():
                w = int(w)
                total += w
                if t in counters:
                    counters[t] += w
                elif len(counters) < k:
                    counters[t] = w
                else:
                    d = min(w, min(counters.values()))
                    for ky in list(counters):
                        counters[ky] -= d
                        if counters[ky] == 0:
                            del counters[ky]
                    if w > d and len(counters) < k:
                        counters[t] = w - d
        state.update((list(counters.keys()), list(counters.values()), total))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "term": list(counters.keys()),
                "est": list(counters.values()),
                "shard_total": [total] * len(counters),
            }
        )

    return mg_fn


def stream_heavy_hitters(term_stream, k: int = 64, shards: int = 8):
    """Wire streaming Misra-Gries onto a stream with a ``term`` column.
    The term space is hash-sharded so state parallelizes across ``shards``
    groups (each an independent exact partition of the terms — the
    per-shard guarantee implies the global one). Output mode 'update':
    each batch re-emits the summaries of the shards it touched."""
    sharded = term_stream.withColumn(
        "shard", F.pmod(F.xxhash64("term"), F.lit(shards)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        make_streaming_heavy_hitters(k),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PATTERN_STATE_SCHEMA = (
    "first_ts ARRAY<LONG>, max_ts LONG,"
    " matched_ids ARRAY<LONG>, matched_ts ARRAY<LONG>"
)

PATTERN_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
    ]
)


def make_pattern_matcher(
    first_type: str, then_type: str, within_us: int
):
    """CEP-lite sequence detection as stream state: emit every
    ``then_type`` event that follows a ``first_type`` event of the same
    key within ``within_us`` (strictly after — the streaming form of
    the batch funnel/EXISTS-range semantics).

    State per key is the list of ``first_type`` timestamps still young
    enough to matter — pruned to ``[max_seen_ts - within_us, ...]``
    every batch, so state is O(window × per-key rate), never history.

    Ordering contract: rows WITHIN a batch are sorted here, so
    intra-batch disorder is free; ACROSS batches the source must be
    per-key event-time ordered (true of cursor/firehose ingest and of
    file replays in order — the reference's feed is an ordered stream,
    src/util/subscription.ts).  A late-across-batch ``then`` event would
    consult already-pruned state; pair with watermarked sources when
    that matters.  Output mode: append (matches are immutable facts)."""

    def pattern_fn(
        key: Tuple[Any, ...],
        batch_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            first_ts, max_ts, matched_ids, matched_ts = state.get
            first_ts = list(first_ts)
            matched = dict(zip(matched_ids, matched_ts))
        else:
            first_ts, max_ts, matched = [], -(1 << 62), {}

        rows = [
            pdf[["event_id", "ts_us", "event_type"]]
            for pdf in batch_iter
            if len(pdf)
        ]
        out_ids: list[int] = []
        out_ts: list[int] = []
        if rows:
            batch = pd.concat(rows)
            # NULL ts_us (PERMISSIVE-rescued rows) have no position on
            # the timeline: int(NaN) below would raise and KILL the
            # query — the exact poison-pill mode W5 exists to prevent,
            # guarded in every other operator of this module (review
            # r14).  They cannot match, anchor, or advance the clock.
            batch = batch[batch["ts_us"].notna()].sort_values(
                ["ts_us", "event_id"]
            )
            for eid, ts, etype in batch.itertuples(index=False):
                ts = int(ts)
                if etype == first_type:
                    # set semantics: a re-delivered first event (or two
                    # firsts at one ts — any() can't tell them apart)
                    # must not grow state
                    if ts not in first_ts:
                        first_ts.append(ts)
                elif etype == then_type and not pd.isna(eid):
                    # a NULL event_id then-event can be neither emitted
                    # nor deduped (the append-mode fact needs an id);
                    # its timestamp still advances the clock below
                    lo = ts - within_us
                    # matched_ids dedups at-least-once re-delivery: the
                    # sink is append-mode, so re-emitting a match row
                    # for a re-delivered then-event would duplicate an
                    # immutable fact.  Bounded by the same pruning
                    # horizon as first_ts (below).
                    if int(eid) not in matched and any(
                        lo <= s < ts for s in first_ts
                    ):
                        out_ids.append(int(eid))
                        out_ts.append(ts)
                        matched[int(eid)] = ts
                max_ts = max(max_ts, ts)
            # keep s >= max_ts - within_us (INCLUSIVE, mirroring the
            # lo <= s match bound): a first at exactly max_ts-within_us
            # can still pair with a then at ts == max_ts arriving in the
            # next batch (equal cross-batch timestamps are legal under
            # the non-strict per-key ordering contract)
            first_ts = [s for s in first_ts if s >= max_ts - within_us]
            # prune matched to the same horizon so state stays
            # O(window x per-key rate).  Dedup scope = the ordering
            # contract above: re-delivery of rows at/near the stream
            # head (the standard crashed-last-micro-batch replay) is
            # fully deduped; a replay of a segment OLDER than the
            # horizon already violates the per-key event-time-ordered
            # contract (its first-events would re-enter pruned state
            # too), so it is out of scope rather than silently handled
            matched = {
                i: t for i, t in matched.items()
                if t >= max_ts - within_us
            }
        mi = sorted(matched)
        state.update((first_ts, max_ts, mi, [matched[i] for i in mi]))
        if out_ids:
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * len(out_ids),
                    "event_id": out_ids,
                    "ts_us": out_ts,
                }
            )

    return pattern_fn


def stream_pattern_matches(
    events_stream,
    first_type: str = "view",
    then_type: str = "purchase",
    within_us: int = 10 * 60 * 1_000_000,
):
    """Wire the pattern matcher onto a (user_id, event_id, ts_us,
    event_type) stream; output mode must be 'append'."""
    return (
        events_stream.select("user_id", "event_id", "ts_us", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_pattern_matcher(first_type, then_type, within_us),
            outputStructType=PATTERN_OUTPUT_SCHEMA,
            stateStructType=PATTERN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
