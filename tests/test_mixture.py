"""Semantic tests for catalog_mixture: budget adherence and monotone
upweighting for mixture_sample, shard balance + reproducibility for
shuffle_shard_manifest, first-occurrence semantics for line_dedup_stats.
Value parity with DuckDB is covered by test_oracle_parity.py; these pin
the *meaning* of the numbers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark import catalog

SF_DIR = "/root/testdata/sf0.001"


def _q(name):
    return catalog.get_queries()[name]


def test_mixture_sample_respects_token_budget(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total_tok = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).collect()[0]["t"]
    out = _q("mixture_sample")(spark, SF_DIR).collect()
    kept_tok = sum(r["tok_kept"] for r in out)
    # expected kept ≈ 1/4 of corpus tokens; hash sampling at 500 docs has
    # real variance, so assert a generous band around the target
    assert 0.15 * total_tok < kept_tok < 0.40 * total_tok, (kept_tok, total_tok)


def test_mixture_sample_upweights_rare_sources(spark):
    """alpha=0.5: smaller sources get HIGHER sampling thresholds (rates)
    than larger ones — the whole point of temperature mixing."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sizes = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"))
        .collect()
    }
    thresholds = {
        r["source"]: r["threshold"]
        for r in _q("mixture_sample")(spark, SF_DIR).collect()
    }
    pairs = sorted(sizes.items(), key=lambda kv: kv[1])
    small, large = pairs[0][0], pairs[-1][0]
    if small in thresholds and large in thresholds and sizes[small] < sizes[large]:
        assert thresholds[small] >= thresholds[large]


def test_shuffle_shard_manifest_is_a_permutation_and_reproducible(spark):
    from starryskyqueryengine_spark.catalog_mixture import N_SHARDS

    out = _q("shuffle_shard_manifest")(spark, SF_DIR)
    rows = out.collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs  # every doc exactly once
    # positions within each shard are 1..count(shard) with no gaps
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(N_SHARDS))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # no shard is empty or pathologically skewed at 500 docs / 16 shards
    counts = [len(v) for v in by_shard.values()]
    assert len(by_shard) == N_SHARDS and max(counts) < 4 * (n_docs // N_SHARDS)
    # reproducible: a second run yields the identical manifest
    again = {(r["shard"], r["pos"], r["doc_id"]) for r in out.collect()}
    assert again == {(r["shard"], r["pos"], r["doc_id"]) for r in rows}


def test_line_dedup_keeps_first_occurrence_only(spark, tmp_path):
    """Three docs where doc 2 repeats doc 1's only line and doc 3 is half
    novel: survivors follow (doc_id, chunk) order exactly."""
    from starryskyqueryengine_spark.catalog_mixture import LINE_WORDS, line_dedup_stats

    a = " ".join(["alpha"] * LINE_WORDS)
    b = " ".join(["beta"] * LINE_WORDS)
    df = spark.createDataFrame(
        [(1, a, "en", "s", 1), (2, a, "en", "s", 1), (3, a + " " + b, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "fx")
    df.write.parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: (r["n_lines"], r["n_kept"])
           for r in line_dedup_stats(spark, d).collect()}
    assert out[1] == (1, 1)  # first occurrence of line a
    assert out[2] == (1, 0)  # exact repeat, fully deduped
    assert out[3] == (2, 1)  # line a deduped, line b novel


def test_span_dedup_marks_copied_passage_exactly(spark, tmp_path):
    """Doc 2 copies a 20-word passage from doc 1 inside otherwise-unique
    text: the merged duplicated interval must cover exactly those 20
    tokens. Short docs (< SPAN_WORDS words) get dup_tokens = 0."""
    import random

    from starryskyqueryengine_spark.catalog_mixture import SPAN_WORDS, span_dedup_stats

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(1000)]
    uniq = lambda n: " ".join(rng.choice(vocab) for _ in range(n))  # noqa: E731
    passage = " ".join(f"p{i}" for i in range(20))
    d1 = passage + " " + uniq(30)
    d2 = uniq(25) + " " + passage + " " + uniq(25)
    d3 = uniq(40)
    d4 = "tiny doc under span width"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (4, d4)],
        "doc_id long, text string",
    )
    d = str(tmp_path / "fx")
    df.write.parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
           for r in span_dedup_stats(spark, d).collect()}
    assert out[1][1] == 0          # first occurrence survives in doc 1
    assert out[2][1] == 20         # exactly the copied passage
    assert out[3][1] == 0
    assert out[4] == (5, 0)        # too short for any span
    assert SPAN_WORDS == 15        # the 20-token expectation assumes this


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_span_dedup_matches_bruteforce(spark, tmp_path, seed):
    """Randomized corpora with a tiny vocabulary (forcing accidental
    shingle collisions within and across docs) against a brute-force
    Python reference of the same first-occurrence + interval-union
    semantics."""
    import random

    from starryskyqueryengine_spark.catalog_mixture import SPAN_WORDS, span_dedup_stats

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(6)]  # tiny vocab => many repeats
    docs = {
        i: [rng.choice(vocab) for _ in range(rng.randint(1, 60))]
        for i in range(1, 13)
    }

    # brute-force reference
    seen: dict[tuple, tuple] = {}
    expected = {}
    for did in sorted(docs):
        ws = docs[did]
        dup_pos = []
        for pos in range(max(0, len(ws) - SPAN_WORDS + 1)):
            gram = tuple(ws[pos:pos + SPAN_WORDS])
            if gram in seen:
                dup_pos.append(pos)
            else:
                seen[gram] = (did, pos)
        covered = set()
        for pos in dup_pos:
            covered.update(range(pos, pos + SPAN_WORDS))
        expected[did] = (len(ws), len(covered))

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs.items()], "doc_id long, text string"
    )
    d = str(tmp_path / "fx")
    df.write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
           for r in span_dedup_stats(spark, d).collect()}
    assert got == expected


def test_neardup_gate_flags_across_batches_and_survives_restart(spark, tmp_path):
    """Batch 1 admits all; batch 2 near-copies (one word changed) are
    flagged against the STORE, exact within-batch copies flag the lower
    id; a fresh gate instance over the same path keeps the state."""
    from starryskyqueryengine_spark.functions.dedup import NearDupGate

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight alone")
    b1 = spark.createDataFrame(
        [(1, base), (2, "completely different text about spark plans and "
                        "shuffle exchanges broadcast joins and catalyst rules ok")],
        "doc_id long, text string",
    )
    gate = NearDupGate(spark, str(tmp_path / "sigstore"))
    v1 = {r["doc_id"]: r["is_dup"] for r in gate.admit(b1).collect()}
    assert v1 == {1: False, 2: False}

    near = base.replace("tonight", "yesterday")  # near-dup of doc 1
    b2 = spark.createDataFrame(
        [(10, near), (11, "fresh unique content nothing shared with any "
                          "other document in this corpus at all really truly"),
         (12, "fresh unique content nothing shared with any "
              "other document in this corpus at all really truly")],
        "doc_id long, text string",
    )
    gate2 = NearDupGate(spark, str(tmp_path / "sigstore"))  # restart
    v2 = {r["doc_id"]: r["is_dup"] for r in gate2.admit(b2).collect()}
    assert v2[10] is True    # near-dup vs stored doc 1
    assert v2[11] is False   # novel, lower id wins its bucket
    assert v2[12] is True    # exact within-batch copy of 11

    # idempotent replay: re-admitting batch 2 flags everything
    v3 = {r["doc_id"]: r["is_dup"] for r in gate2.admit(b2).collect()}
    assert v3 == {10: True, 11: True, 12: True}


def test_neardup_gate_in_streaming_ingest(spark, tmp_path):
    """The gate as a streaming stage: a document file-stream drains
    through foreachBatch -> NearDupGate.admit; across micro-batches the
    store accumulates, so a doc repeated in a LATER file is flagged
    while its first arrival was admitted."""
    import time as _t

    from starryskyqueryengine_spark.functions.dedup import NearDupGate
    from starryskyqueryengine_spark.streaming.pipeline import parquet_stream

    src = str(tmp_path / "docs")
    t1 = ("one two three four five six seven eight nine ten eleven "
          "twelve thirteen fourteen fifteen sixteen")
    t2 = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi")
    spark.createDataFrame([(1, t1)], "doc_id long, text string").coalesce(1).write.parquet(src)

    gate = NearDupGate(spark, str(tmp_path / "store"))
    verdicts = {}

    def sink(bdf, bid):
        if bdf.isEmpty():
            return
        for r in gate.admit(bdf).collect():
            verdicts[r["doc_id"]] = r["is_dup"]
        if bid == 0:
            spark.createDataFrame(
                [(2, t2), (3, t1)], "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(src)

    stream = parquet_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = _t.time() + 120
    while _t.time() < deadline and len(verdicts) < 3:
        _t.sleep(0.5)
    q.stop()
    assert verdicts == {1: False, 2: False, 3: True}


def test_chunk_documents_cover_and_overlap(spark, tmp_path):
    """100-word doc with W=50/S=40: chunks start at 0/40/80 with sizes
    50/50/20; consecutive chunks overlap by exactly 10 tokens; a short
    doc yields one full-copy chunk."""
    from starryskyqueryengine_spark.catalog_mixture import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    assert (CHUNK_TOKENS, CHUNK_STRIDE) == (50, 40)
    words = [f"w{i}" for i in range(100)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "just five words right here")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "fx")
    df.write.parquet(f"{d}/documents.parquet")
    rows = chunk_documents(spark, d).collect()
    c1 = sorted([r for r in rows if r["doc_id"] == 1], key=lambda r: r["chunk_id"])
    assert [(r["start_tok"], r["n_tok"]) for r in c1] == [(0, 50), (40, 50), (80, 20)]
    # overlap: chunk k's last 10 tokens == chunk k+1's first 10
    t0, t1 = c1[0]["chunk_text"].split(), c1[1]["chunk_text"].split()
    assert t0[-10:] == t1[:10]
    # full reconstruction: stride-aligned prefixes concatenate to the doc
    recon = t0 + t1[10:] + c1[2]["chunk_text"].split()[10:]
    assert recon == words
    c2 = [r for r in rows if r["doc_id"] == 2]
    assert len(c2) == 1 and c2[0]["chunk_text"] == "just five words right here"


def test_neardup_gate_compaction_preserves_state(spark, tmp_path):
    """After many small admits the store fragments; compact() rewrites it
    into few files without changing verdicts for subsequent batches."""
    from starryskyqueryengine_spark.functions.dedup import NearDupGate

    gate = NearDupGate(spark, str(tmp_path / "store"))
    texts = {}
    for i in range(6):
        t = " ".join(f"batch{i} tok{j} filler word number {j}" for j in range(6))
        texts[i] = t
        gate.admit(spark.createDataFrame([(i, t)], "doc_id long, text string"))
    n_before = gate.file_count()
    assert gate.compact(max_files=4) is True
    assert gate.file_count() < n_before
    # replaying an old doc still flags; a novel doc still passes
    v = {r["doc_id"]: r["is_dup"] for r in gate.admit(
        spark.createDataFrame(
            [(100, texts[3]), (101, "entirely novel content not seen in any "
                                    "previous batch of this little corpus")],
            "doc_id long, text string",
        )
    ).collect()}
    assert v == {100: True, 101: False}


def test_neardup_gate_crashed_compaction_fails_loudly(spark, tmp_path):
    """Review r13: a compact() that crashed between its two renames
    leaves the store dir missing with every signature in the __old_
    rename-aside dir; treating that as an empty store would silently
    re-admit every duplicate. The next probe must raise with the
    recovery step instead."""
    import os

    from starryskyqueryengine_spark.functions.dedup import NearDupGate

    store = str(tmp_path / "store")
    gate = NearDupGate(spark, store)
    gate.admit(spark.createDataFrame(
        [(1, "some content words enough to shingle into grams here ok")],
        "doc_id long, text string",
    ))
    # simulate the mid-swap crash: path -> __old_, tmp never moved in
    os.rename(store, store + "__old_deadbeef")
    with pytest.raises(RuntimeError, match="crashed mid-swap"):
        gate.admit(spark.createDataFrame(
            [(2, "another doc with plenty of words to shingle here too")],
            "doc_id long, text string",
        ))
    # recovery: rename back -> the gate works again and remembers doc 1
    os.rename(store + "__old_deadbeef", store)
    v = {r["doc_id"]: r["is_dup"] for r in gate.admit(
        spark.createDataFrame(
            [(3, "some content words enough to shingle into grams here ok")],
            "doc_id long, text string",
        )
    ).collect()}
    assert v == {3: True}


def test_winnowing_guarantee_shared_substring_shares_fingerprint(spark, tmp_path):
    """The winnowing theorem: two documents sharing a substring of at
    least W + K - 1 words must share at least one selected fingerprint;
    and the fingerprint density stays well under 1 (the point of
    winnowing vs keeping all grams)."""
    import random

    from starryskyqueryengine_spark.catalog_mixture import (
        _WIN_POS_CAP,
        _md5int,
        WIN_K,
        WIN_W,
    )
    from pyspark.sql import Window

    rng = random.Random(7)
    words = [f"w{i}" for i in range(200)]
    shared = " ".join(rng.choice(words) for _ in range(WIN_W + WIN_K - 1))
    doc = lambda n: " ".join(rng.choice(words) for _ in range(n))
    rows = [
        (1, doc(30) + " " + shared + " " + doc(25), "en", "s", 1),
        (2, doc(40) + " " + shared, "en", "s", 1),
        (3, doc(35), "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "fx")
    df.write.parquet(f"{d}/documents.parquet")

    # recompute the selected fingerprint SET per doc (the catalog query
    # reports stats; the guarantee is about the sets)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    w = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("ws"))
    n_grams = F.size("ws") - F.lit(WIN_K - 1)
    sh = w.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_grams - 1)).alias("pos"),
        F.col("ws"),
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        (
            _md5int(F.array_join(F.slice("ws", F.col("pos") + 1, WIN_K), " "))
            * F.lit(_WIN_POS_CAP)
            + (F.lit(_WIN_POS_CAP - 1) - F.col("pos"))
        ).alias("pk"),
    )
    win = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(-(WIN_W - 1), Window.currentRow)
    )
    sel = (
        sh.select("doc_id", "pos", F.min("pk").over(win).alias("fp"))
        .filter(F.col("pos") >= WIN_W - 1)
        .select("doc_id", (F.col("fp") / F.lit(_WIN_POS_CAP)).cast("bigint").alias("h"))
        .distinct()
        .collect()
    )
    fps: dict[int, set] = {}
    for r in sel:
        fps.setdefault(r["doc_id"], set()).add(r["h"])
    assert fps[1] & fps[2], "docs sharing a W+K-1-word substring must share a fingerprint"
    assert not (fps[3] & fps[1]) or len(fps[3] & fps[1]) <= 1  # unrelated docs: ~no overlap

    from starryskyqueryengine_spark.catalog_mixture import winnow_fingerprints

    stats = {r["doc_id"]: r for r in winnow_fingerprints(spark, d).collect()}
    for did, r in stats.items():
        assert 0 < r["n_fingerprints"] <= r["n_grams"]
        # density ~ 2/(W+1); allow generous slack but forbid keep-everything
        assert r["n_fingerprints"] < r["n_grams"] * 0.8, (did, r)


def test_winnowing_pos_cap_guard_raises_loudly(spark, tmp_path, monkeypatch):
    """A document with >= _WIN_POS_CAP word grams would drive the packed
    offset negative and corrupt the hash field — and the oracle computes
    the identical wrong value, so the parity gate cannot catch it. The
    guard must surface it as an executor-side error instead. Shrinking
    the cap via monkeypatch stands in for a multi-megaword document."""
    import pytest
    from starryskyqueryengine_spark import catalog_mixture

    rows = [(1, " ".join(f"w{i}" for i in range(40)), "en", "s", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "fx")
    df.write.parquet(f"{d}/documents.parquet")

    monkeypatch.setattr(catalog_mixture, "_WIN_POS_CAP", 8)
    with pytest.raises(Exception, match="gram position >= pack base"):
        catalog_mixture.winnow_fingerprints(spark, d).collect()
    # untouched cap: same fixture runs clean
    monkeypatch.undo()
    assert catalog_mixture.winnow_fingerprints(spark, d).count() == 1


def test_neardup_gate_streaming_checkpoint_resume(spark, tmp_path):
    """Kill-and-resume proof for the NearDupGate streaming leg
    (equivalent to the upsert path's): drain a file-stream through
    foreachBatch -> gate.admit with a checkpoint, STOP the query, append
    new files (one a near-dup of a PRE-restart doc), then start a NEW
    query object on the SAME checkpoint with a REBUILT gate. The resumed
    query must (1) skip already-processed files (checkpoint advanced:
    their doc_ids never re-emit), (2) flag the cross-restart dup (the
    parquet band store survived the restart), (3) admit novel content."""
    from starryskyqueryengine_spark.functions.dedup import NearDupGate
    from starryskyqueryengine_spark.streaming.pipeline import parquet_stream

    src = str(tmp_path / "docs")
    ck = str(tmp_path / "gate_resume_ck")
    t1 = ("one two three four five six seven eight nine ten eleven "
          "twelve thirteen fourteen fifteen sixteen")
    t2 = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi")

    def drain(verdicts):
        gate = NearDupGate(spark, str(tmp_path / "store"))  # fresh object
        def sink(bdf, bid):
            if bdf.isEmpty():
                return
            for r in gate.admit(bdf).collect():
                verdicts[r["doc_id"]] = r["is_dup"]
        q = (
            parquet_stream(spark, src, max_files_per_trigger=1)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    v1: dict = {}
    drain(v1)
    assert v1 == {1: False, 2: False}

    # restart: doc 3 duplicates PRE-restart doc 1; doc 4 is novel
    spark.createDataFrame(
        [(3, t1), (4, "totally fresh material unseen before in this corpus "
                      "with enough words to shingle")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    v2: dict = {}
    drain(v2)  # new query + new gate object, same checkpoint + store
    assert 1 not in v2 and 2 not in v2, "checkpoint failed to skip old files"
    assert v2[3] is True, "signature store lost across restart"
    assert v2[4] is False


def test_neardup_gate_gates_short_docs_exactly(spark, tmp_path):
    """Docs under SHINGLE_N words have no minhash bands; the gate must
    still catch their exact duplicates (via the synthetic band=-1 exact
    key) instead of admitting every short doc forever."""
    from starryskyqueryengine_spark.functions.dedup import NearDupGate

    gate = NearDupGate(spark, str(tmp_path / "store"))
    b1 = spark.createDataFrame(
        [(1, "hello world"), (2, "bye")], "doc_id long, text string"
    )
    v1 = {r["doc_id"]: r["is_dup"] for r in gate.admit(b1).collect()}
    assert v1 == {1: False, 2: False}

    b2 = spark.createDataFrame(
        [
            (10, "hello   WORLD"),   # normalizes to stored doc 1 -> dup
            (11, "new short"),        # novel short doc -> admitted
            (12, "new short"),        # exact within-batch copy -> dup
            (13, "bye"),              # stored doc 2 -> dup
        ],
        "doc_id long, text string",
    )
    v2 = {r["doc_id"]: r["is_dup"] for r in gate.admit(b2).collect()}
    assert v2 == {10: True, 11: False, 12: True, 13: True}

    # replay idempotence holds for the short-doc leg too
    v3 = {r["doc_id"]: r["is_dup"] for r in gate.admit(b2).collect()}
    assert v3 == {10: True, 11: True, 12: True, 13: True}


def test_neardup_gate_verdict_is_materialized(spark, tmp_path):
    """admit() returns an eagerly-materialized verdict: consuming it
    must not recompute the minhash pipeline (lineage severed), and the
    call must leave NO DataFrame cache entries behind — one leaked
    shingle table per admitted batch is executor-storage death for a
    long-running gate."""
    from starryskyqueryengine_spark.functions.dedup import NearDupGate

    spark.catalog.clearCache()
    gate = NearDupGate(spark, str(tmp_path / "store"))
    docs = spark.createDataFrame(
        [(i, f"w{i} common words shared across documents here {i}")
         for i in range(6)],
        "doc_id long, text string",
    )
    verdict = gate.admit(docs)
    # lineage severed: the returned plan reads checkpointed rows, not
    # the tokenize/shingle pipeline
    plan = verdict._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan
    assert verdict.count() == 6
    # every internal cache released (CacheManager entries persist until
    # explicit unpersist — GC never reclaims them)
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), "admit() leaked DataFrame cache entries"


def test_neardup_gate_crash_check_survives_glob_metachars(spark, tmp_path):
    """ADVICE r13: the rename-aside probe used the store path as a raw
    glob pattern, so metacharacters in the path ([, ?, *) silently
    missed the leftover dir and fell back to the exact empty-store
    behavior the check exists to prevent.  glob.escape makes the path
    match literally."""
    import os

    from starryskyqueryengine_spark.functions.dedup import NearDupGate

    store = str(tmp_path / "st[0]re")  # '[0]' is a glob character class
    gate = NearDupGate(spark, store)
    gate.admit(spark.createDataFrame(
        [(1, "some content words enough to shingle into grams here ok")],
        "doc_id long, text string",
    ))
    os.rename(store, store + "__old_cafe01")
    with pytest.raises(RuntimeError, match="crashed mid-swap"):
        gate.admit(spark.createDataFrame(
            [(2, "another doc with plenty of words to shingle here too")],
            "doc_id long, text string",
        ))
