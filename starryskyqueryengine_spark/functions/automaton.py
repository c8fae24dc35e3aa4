"""Aho-Corasick multi-pattern text scan (broadcast automaton).

The blocklist-phrase primitive a training-data pipeline needs at corpus
scale: given N literal patterns (banned phrases, contamination markers,
compliance terms), find every occurrence of every pattern in ONE pass
over the text — not N regexp passes. Classic construction (Aho &
Corasick 1975, CACM): a trie over the patterns, BFS failure links, and
output links so a pattern that is a proper suffix of another ("tab"
inside "table") is still reported at the inner match position.

Spark shape: the automaton is built ONCE on the driver (O(total pattern
chars)), broadcast to executors (a few KB per thousand short patterns),
and applied inside Arrow-batched ``mapInPandas`` — one streaming pass
per text, O(len(text) + matches) per row, independent of N. The
reference engine's per-feed regex loop (src/subscription.ts:203-204,
:291-299) is the one-pattern special case; this is the N-pattern scan
the multi-feed rewrite needs when feeds share a single corpus pass.

Scale honesty: the per-character inner loop runs in Python here (the
sandbox has no native AC binding); the automaton interface and the
broadcast/batch shape are exactly what a production deployment keeps
while swapping the inner loop for a compiled kernel (pyahocorasick,
re2::Set, or a pandas str-engine hybrid). All COUNTING semantics are
pinned by tests against brute force, including overlapping and nested
matches.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame


def build_aho_corasick(patterns: list[str]):
    """Build the automaton: returns (goto, fail, out) where ``goto`` is
    a list of dicts char->state, ``fail`` the failure links, and
    ``out[state]`` the pattern indexes ending at that state (own +
    output-link closure, precomputed so matching never walks links)."""
    if not patterns or any(not p for p in patterns):
        raise ValueError("patterns must be non-empty strings")
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    for idx, pat in enumerate(patterns):
        s = 0
        for ch in pat:
            if ch not in goto[s]:
                goto.append({})
                out.append([])
                goto[s][ch] = len(goto) - 1
            s = goto[s][ch]
        out[s].append(idx)
    fail = [0] * len(goto)
    q = deque()
    for s in goto[0].values():
        q.append(s)
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            # no self-loop hazard: every state in the failure chain of r
            # is strictly shallower than r, so goto[f][ch] is strictly
            # shallower than s and can never BE s — the textbook
            # assignment needs no guard
            fail[s] = goto[f].get(ch, 0)
            # output-link closure: matches ending at fail[s] also end here
            out[s] = out[s] + out[fail[s]]
    return goto, fail, out


def ac_count(text: str, goto, fail, out, n_patterns: int) -> list[int]:
    """Occurrence count per pattern (ALL positions, overlapping and
    nested included) in one pass over ``text``."""
    counts = [0] * n_patterns
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for idx in out[s]:
            counts[idx] += 1
    return counts


def multi_pattern_counts(
    df: DataFrame, patterns: list[str], text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_hits, n_patterns) per document: total occurrences across
    all patterns and how many distinct patterns hit, via the broadcast
    automaton in one Arrow-batched pass."""
    import pandas as pd

    spark = df.sparkSession
    automaton = build_aho_corasick(patterns)
    # broadcast lifetime: the returned frame's closure is the only
    # holder, so the blocks free at driver GC of the frame (same
    # discipline as localCheckpoint blocks) — no explicit destroy(),
    # which would break re-execution of a still-live lazy plan
    bc = spark.sparkContext.broadcast(automaton)
    n = len(patterns)

    def scan(batches):
        goto, fail, out = bc.value
        for pdf in batches:
            hits, distinct = [], []
            for text in pdf[text_col]:
                c = ac_count(text or "", goto, fail, out, n)
                hits.append(sum(c))
                distinct.append(sum(1 for x in c if x))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_hits": hits, "n_patterns": distinct}
            )

    # the id column keeps its INPUT type — hardcoding bigint made any
    # string/uuid id fail in the Arrow serializer on every batch
    id_dt = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        scan, f"{id_col} {id_dt}, n_hits long, n_patterns long"
    )
