"""Predicate compiler: one FeedCondition -> one Spark ``Column``.

The reference evaluates its filter chain row-at-a-time in TypeScript
(``src/subscription.ts:280-350``). Here each condition compiles to a single
boolean ``Column`` of pure built-in expressions — fully columnar, runs
inside whole-stage codegen, no Python in the loop. All conditions can then
be evaluated in ONE scan (see ``compile_all_conditions``), replacing the
reference's per-condition loop (``src/subscription.ts:140``).

Expected input columns (see schemas.INGEST_POST_SCHEMA): ``text``,
``images`` (array<struct<alt,...>>), ``labels`` (array<string>),
``replyParent``, ``langs`` (array<string>), ``author_profile_text``
(string, from the S3/J1 broadcast profile join; may be absent if no
condition uses profileMatch).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .config import FeedCondition
from .regex_dialect import js_to_java


def search_text(cond: FeedCondition) -> Column:
    """P6 ALT-text augmentation (src/subscription.ts:284-288).

    When includeAltText, each embedded image's alt joins the searchable
    text with newlines; otherwise the raw text.
    """
    base = F.coalesce(F.col("text"), F.lit(""))
    if not cond.includeAltText:
        return base
    alts = F.array_join(
        F.transform(
            F.coalesce(F.col("images"), F.array()),
            lambda i: F.coalesce(i["alt"], F.lit("")),
        ),
        "\n",
    )
    return F.when(
        F.size(F.coalesce(F.col("images"), F.array())) > 0,
        F.concat_ws("\n", base, alts),
    ).otherwise(base)


def match_count(text_col: Column, js_pattern: str, flags: str = "ig") -> Column:
    """A3/F1 global match count — ``(text.match(re) || []).length``
    (src/subscription.ts:291). JS 'g' flag semantics = count of
    non-overlapping matches, i.e. ``regexp_count``."""
    return F.regexp_count(text_col, F.lit(js_to_java(js_pattern, flags)))


def compile_condition(cond: FeedCondition) -> Column:
    """Compile the full P4-P10 filter chain to one boolean Column."""
    txt = search_text(cond)
    pred = F.lit(True)

    # P4 include regex: keep iff match count > 0 (src/subscription.ts:291-294).
    # When nothing downstream needs the actual count (no profileMatch
    # arithmetic), count > 0 === rlike — and rlike stops at the first
    # match while regexp_count materializes every match
    # (size(regexp_extract_all(...)) in the physical plan): measurably
    # cheaper per condition in the N-feed single-scan.
    if cond.inputRegex:
        if cond.profile_match_parts() is not None:
            pred = pred & (match_count(txt, cond.inputRegex, "ig") > 0)
        else:
            pred = pred & txt.rlike(js_to_java(cond.inputRegex, "ig"))

    # P5 exclude regex (src/subscription.ts:297-299)
    if cond.invertRegex:
        pred = pred & ~txt.rlike(js_to_java(cond.invertRegex, "i"))

    # P7 image/text-only (src/subscription.ts:302-307). Note the reference
    # asymmetry: 'imageOnly' requires the images embed to be *present*
    # (even empty); 'textOnly' rejects only a *non-empty* images array.
    if cond.imageOnly == "imageOnly":
        pred = pred & F.col("images").isNotNull()
    elif cond.imageOnly == "textOnly":
        pred = pred & (F.size(F.coalesce(F.col("images"), F.array())) == 0)

    # P8 moderation-label filter (src/subscription.ts:310-312): keep iff
    # labels == []. (Reference quirk: `labels?.length !== 0` also drops
    # rows with *absent* labels; search-API rows always carry labels:[],
    # so empty-or-absent is the intended keep-set here.)
    if cond.labelDisable:
        pred = pred & (F.size(F.coalesce(F.col("labels"), F.array())) == 0)

    # P9 reply filter (src/subscription.ts:315-317)
    if cond.replyDisable:
        pred = pred & F.col("replyParent").isNull()

    # P12 language filter — the reference pushes `lang:xx` into the remote
    # search query (src/subscription.ts:219-222); locally it's an array
    # membership test, pushed down to the scan by Catalyst.
    if cond.lang:
        pred = pred & F.array_contains(F.coalesce(F.col("langs"), F.array()), cond.lang)

    # P10 profile-match (src/subscription.ts:319-350): if the text matches
    # ONLY the profile term (term count > 0 and inputRegex count == term
    # count), the author's profile text must match profileRegex.
    pm = cond.profile_match_parts()
    if pm is not None:
        term, prof_re = pm
        mwp = match_count(txt, term, "ig")
        matches = (
            match_count(txt, cond.inputRegex, "ig")
            if cond.inputRegex
            else F.lit(0)
        )
        needs_profile = (mwp > 0) & ((matches - mwp) == 0)
        profile_ok = F.coalesce(F.col("author_profile_text"), F.lit("")).rlike(
            js_to_java(prof_re, "i")
        )
        pred = pred & (~needs_profile | profile_ok)

    return pred


def _uses_extended_legs(c: FeedCondition) -> bool:
    """True when the condition needs any P6-P10 leg beyond
    include/exclude/lang.  THE single enumeration both the plan
    auto-selector and the data-driven evaluator's guard share — two
    verbatim copies invited silent drift: a new leg added to only one
    would route conditions through a path that neither evaluates nor
    rejects it (posts the leg should filter would silently pass)."""
    return bool(
        c.imageOnly or c.labelDisable or c.replyDisable
        or c.includeAltText or c.profileMatch
    )


def datadriven_supported(conditions: list[FeedCondition]) -> bool:
    """True when every condition uses only the include/exclude/lang legs
    — the subset ``evaluate_conditions_datadriven`` evaluates.  Used by
    the plan auto-selector (``ingest.IngestJob.accepted_pairs``)."""
    return not any(_uses_extended_legs(c) for c in conditions)


def evaluate_conditions_datadriven(
    posts, conditions: list[FeedCondition], text_col: str = "text"
):
    """Plan-size-bounded multi-feed evaluation: conditions stay DATA.

    ``compile_all_conditions`` inlines one expression per feed — optimal
    for tens of feeds, but the plan (and its codegen) grows linearly
    with feed count; at 10k+ feeds analysis/compile time and generated
    code size become the bottleneck. This variant keeps the plan O(1):
    posts x broadcast(conditions) with COLUMN-valued regex predicates
    (rlike with a non-literal pattern), so 10 feeds and 100k feeds run
    the same plan. Tradeoff: per-row pattern compilation (the regex is
    not a constant the codegen can pre-compile) — roughly the cost the
    reference pays per row anyway, and the broadcast join stays a single
    pass over the posts.

    Supports the include/exclude/lang legs (the hot path); conditions
    needing the full P6-P10 surface use the compiled path. Returns one
    (post, key) row per accepting condition, like the compiled+explode
    form.
    """
    unsupported = [c.key for c in conditions if _uses_extended_legs(c)]
    if unsupported:
        raise ValueError(
            "evaluate_conditions_datadriven supports include/exclude/lang "
            f"only; conditions {unsupported} use P6-P10 legs — route them "
            "through compile_all_conditions"
        )
    rows = [
        (
            c.key,
            js_to_java(c.inputRegex, "ig") if c.inputRegex else None,
            js_to_java(c.invertRegex, "i") if c.invertRegex else None,
            c.lang or None,
        )
        for c in conditions
    ]
    spark = posts.sparkSession
    conds = spark.createDataFrame(
        rows, "key string, _inc string, _exc string, _lang string"
    )
    pairs = posts.join(F.broadcast(conds))
    # coalesce to '' exactly like the compiled path's search_text: a
    # NULL text must behave as empty, not NULL out the whole predicate
    txt = f"coalesce({text_col}, '')"
    keep = F.col("_inc").isNull() | F.expr(f"{txt} rlike _inc")
    if any(r[2] is not None for r in rows):
        keep = keep & (F.col("_exc").isNull() | ~F.expr(f"{txt} rlike _exc"))
    if any(r[3] is not None for r in rows):
        keep = keep & (
            F.col("_lang").isNull()
            | F.array_contains(F.coalesce(F.col("langs"), F.array()), F.col("_lang"))
        )
    return pairs.filter(keep).drop("_inc", "_exc", "_lang")


def compile_all_conditions(conditions: list[FeedCondition]) -> Column:
    """Single-pass multi-condition evaluation (SURVEY §7.2 step 7).

    Returns an ``array<string>`` Column of the keys whose predicate
    accepts the row — one shared scan instead of N loops. At 100 TB this
    turns N full passes into one; explode the result to get (row, key)
    pairs for the per-key upsert.
    """
    pairs = [
        F.when(compile_condition(c), F.lit(c.key)).otherwise(F.lit(None))
        for c in conditions
    ]
    return F.array_compact(F.array(*pairs)).alias("matched_keys")
