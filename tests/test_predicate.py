"""Unit tests for the condition->Column predicate compiler (P4-P12, P6).

Mirrors the reference's row-loop semantics (src/subscription.ts:280-350)
including the quirks SURVEY §2 calls out: match-*count* semantics for P4,
imageOnly presence-vs-nonempty asymmetry for P7, and P10's
"matches only the profile term" arithmetic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.config import (
    ConditionValidationError,
    FeedCondition,
)
from starryskyqueryengine_spark.predicate import (
    compile_all_conditions,
    compile_condition,
)
from tests.conftest import make_posts


def kept_uris(spark, rows, cond):
    df = make_posts(spark, rows)
    if "author_profile_text" not in df.columns:
        df = df.withColumn("author_profile_text", F.lit(None).cast("string"))
    # emulate the profile join for tests that pass profile text directly
    texts = {r.get("uri"): r.get("profile_text") for r in rows if "profile_text" in r}
    if texts:
        m = F.create_map(*[F.lit(x) for kv in texts.items() for x in kv])
        df = df.withColumn("author_profile_text", m[F.col("uri")])
    return {r["uri"] for r in df.filter(compile_condition(cond)).collect()}


def test_p4_include_regex_case_insensitive(spark):
    cond = FeedCondition(key="k", recordName="k", inputRegex="spark")
    rows = [
        {"uri": "a", "text": "I love SPARK pipelines"},
        {"uri": "b", "text": "nothing here"},
        {"uri": "c", "text": "spark spark spark"},
    ]
    assert kept_uris(spark, rows, cond) == {"a", "c"}


def test_p5_invert_regex(spark):
    cond = FeedCondition(key="k", recordName="k", inputRegex="data", invertRegex="BAD")
    rows = [
        {"uri": "a", "text": "data is bad here"},  # 'bad' matches (?i)BAD
        {"uri": "b", "text": "data is fine"},
    ]
    assert kept_uris(spark, rows, cond) == {"b"}


def test_p6_alt_text_included_only_when_enabled(spark):
    img = [{"alt": "a spark logo", "aspectRatio": None, "fullsize": None, "thumb": None}]
    rows = [{"uri": "a", "text": "no keyword", "images": img}]
    off = FeedCondition(key="k", recordName="k", inputRegex="spark")
    on = FeedCondition(key="k", recordName="k", inputRegex="spark", includeAltText=True)
    assert kept_uris(spark, rows, off) == set()
    assert kept_uris(spark, rows, on) == {"a"}


def test_p7_image_only_and_text_only(spark):
    img = [{"alt": "x", "aspectRatio": None, "fullsize": None, "thumb": None}]
    rows = [
        {"uri": "with_img", "text": "t", "images": img},
        {"uri": "no_img", "text": "t", "images": None},
        {"uri": "empty_img", "text": "t", "images": []},
    ]
    image_only = FeedCondition(key="k", recordName="k", imageOnly="imageOnly")
    text_only = FeedCondition(key="k", recordName="k", imageOnly="textOnly")
    # presence (even empty array) satisfies imageOnly — reference
    # src/subscription.ts:302 checks `=== undefined` only
    assert kept_uris(spark, rows, image_only) == {"with_img", "empty_img"}
    assert kept_uris(spark, rows, text_only) == {"no_img", "empty_img"}


def test_p8_label_filter(spark):
    rows = [
        {"uri": "clean", "text": "t", "labels": []},
        {"uri": "flagged", "text": "t", "labels": ["porn"]},
    ]
    cond = FeedCondition(key="k", recordName="k", labelDisable=True)
    assert kept_uris(spark, rows, cond) == {"clean"}


def test_p9_reply_filter(spark):
    rows = [
        {"uri": "root", "text": "t"},
        {"uri": "reply", "text": "t", "replyParent": "at://x"},
    ]
    cond = FeedCondition(key="k", recordName="k", replyDisable=True)
    assert kept_uris(spark, rows, cond) == {"root"}


def test_p12_lang_filter(spark):
    rows = [
        {"uri": "ja", "text": "t", "langs": ["ja"]},
        {"uri": "en", "text": "t", "langs": ["en", "ja"]},
        {"uri": "none", "text": "t", "langs": None},
    ]
    cond = FeedCondition(key="k", recordName="k", lang="ja")
    assert kept_uris(spark, rows, cond) == {"ja", "en"}


def test_p10_profile_match(spark):
    # condition: include 'cat|feline'; profileMatch 'cat::veterinar'
    cond = FeedCondition(
        key="k", recordName="k", inputRegex="cat|feline", profileMatch="cat::veterinar"
    )
    rows = [
        # matches ONLY 'cat' -> requires vet profile: kept
        {"uri": "vet_cat", "text": "my cat", "profile_text": "I am a Veterinarian"},
        # matches ONLY 'cat', profile doesn't match: dropped
        {"uri": "rando_cat", "text": "my cat", "profile_text": "I sell cars"},
        # matches 'feline' too (matches - matchesWithProfile > 0): kept
        {"uri": "feline_fan", "text": "cat and feline", "profile_text": "I sell cars"},
        # no term match at all -> P4 include still applies: kept via feline
        {"uri": "pure_feline", "text": "felines forever", "profile_text": "I sell cars"},
    ]
    assert kept_uris(spark, rows, cond) == {"vet_cat", "feline_fan", "pure_feline"}


def test_match_count_semantics_global_flag(spark):
    """P4 uses match *count* (JS 'g' flag), not boolean rlike."""
    cond = FeedCondition(key="k", recordName="k", inputRegex="na", profileMatch="na::x")
    # text 'banana' has 2 'na' matches; term 'na' also 2 -> needs profile
    rows = [{"uri": "a", "text": "banana", "profile_text": "nothing"}]
    assert kept_uris(spark, rows, cond) == set()
    rows = [{"uri": "a", "text": "banana", "profile_text": "xylophone"}]
    assert kept_uris(spark, rows, cond) == {"a"}


def test_compile_all_conditions_single_pass(spark):
    c1 = FeedCondition(key="k1", recordName="k1", inputRegex="spark")
    c2 = FeedCondition(key="k2", recordName="k2", inputRegex="data")
    df = make_posts(
        spark,
        [
            {"uri": "a", "text": "spark and data"},
            {"uri": "b", "text": "only data"},
            {"uri": "c", "text": "neither"},
        ],
    ).withColumn("author_profile_text", F.lit(None).cast("string"))
    out = {
        r["uri"]: sorted(r["matched_keys"])
        for r in df.select("uri", compile_all_conditions([c1, c2])).collect()
    }
    assert out == {"a": ["k1", "k2"], "b": ["k2"], "c": []}


def test_p13_validation():
    with pytest.raises(ConditionValidationError):
        FeedCondition(key="k", recordName="BadName!", inputRegex="x").validate()
    with pytest.raises(Exception):
        FeedCondition(key="k", recordName="ok", inputRegex="(unclosed").validate()
    with pytest.raises(ConditionValidationError):
        FeedCondition(key="k", recordName="ok", profileMatch="no-separator").validate()
    FeedCondition(key="k", recordName="ok", inputRegex="a+b", profileMatch="a::b").validate()


def test_from_raw_defaults():
    c = FeedCondition.from_raw({"key": "k", "recordName": "k", "labelDisable": "true",
                               "privateFeed": "did:a,did:b", "limitCount": ""})
    assert c.labelDisable is True
    assert c.privateFeed == ["did:a", "did:b"]
    assert c.limitCount == 2000 and c.initPost == 100 and c.refresh == 0


# ------------------------------------------------------- plan auto-select


def _mk_posts(spark):
    return spark.createDataFrame(
        [("at://u/1", "spark streams", ["en"]), ("at://u/2", "other", ["de"])],
        "uri string, text string, langs array<string>",
    )


def _mk_registry(n, with_profile_match=False):
    from starryskyqueryengine_spark.config import (
        ConditionsRegistry, FeedCondition,
    )

    reg = ConditionsRegistry()
    for i in range(n):
        reg.upsert(FeedCondition(key=f"f{i}", recordName=f"f{i}",
                                 inputRegex=f"spark{i % 7}|stream"))
    if with_profile_match:
        reg.upsert(FeedCondition(key="pm", recordName="pm",
                                 inputRegex="x", profileMatch="term::bio.*"))
    return reg


def _uses_datadriven(df):
    # the data-driven form is a join against the broadcast conditions
    # table; the compiled form is a single-relation project/explode
    return "Join" in df._jdf.queryExecution().optimizedPlan().toString()


@pytest.mark.parametrize("n_feeds,expect_dd", [(3, False), (32, True), (1000, True)])
def test_accepted_pairs_selects_plan_by_feed_count(spark, n_feeds, expect_dd):
    from starryskyqueryengine_spark.ingest import IngestJob

    job = IngestJob(spark, _mk_registry(n_feeds), store=None)
    pairs = job.accepted_pairs(_mk_posts(spark))
    assert _uses_datadriven(pairs) is expect_dd
    # both forms accept the same rows
    got = {(r["uri"], r["key"]) for r in pairs.collect()}
    assert ("at://u/1", "f0") in got
    assert all(u != "at://u/2" for u, _ in got)


def test_accepted_pairs_unsupported_leg_forces_compiled_path(spark):
    from starryskyqueryengine_spark.ingest import IngestJob

    job = IngestJob(spark, _mk_registry(40, with_profile_match=True), store=None)
    pairs = job.accepted_pairs(_mk_posts(spark))
    assert _uses_datadriven(pairs) is False  # P10 leg -> compiled form


def test_both_plan_forms_agree_at_the_threshold(spark):
    from starryskyqueryengine_spark.ingest import DATADRIVEN_FEED_THRESHOLD, IngestJob
    from starryskyqueryengine_spark.predicate import compile_all_conditions

    reg = _mk_registry(DATADRIVEN_FEED_THRESHOLD)
    posts = _mk_posts(spark)
    job = IngestJob(spark, reg, store=None)
    dd = {(r["uri"], r["key"]) for r in job.accepted_pairs(posts).collect()}
    tagged = posts.withColumn("matched_keys", compile_all_conditions(reg.all()))
    comp = {
        (r["uri"], k)
        for r in tagged.collect()
        for k in r["matched_keys"]
    }
    assert dd == comp


def test_validate_pattern_checks_java_dialect(spark):
    """Patterns Python re accepts but java.util.regex rejects ('a{'
    bare brace) must fail AT VALIDATION when a live JVM is reachable —
    not blow up every executor task at query time."""
    from starryskyqueryengine_spark.regex_dialect import (
        RegexValidationError,
        validate_pattern,
    )

    with pytest.raises(RegexValidationError, match="Java dialect"):
        validate_pattern("color{s", "i")
    # still-valid patterns pass through both dialects
    assert validate_pattern("colou?r", "i") == "(?iu)colou?r"


def test_unsupported_js_flags_raise():
    """'y' (sticky) changes matching semantics with no Java equivalent:
    silently dropping it would return wrong matches with no error."""
    from starryskyqueryengine_spark.regex_dialect import (
        RegexValidationError,
        js_to_java,
    )

    with pytest.raises(RegexValidationError, match="flag 'y'"):
        js_to_java("abc", "iy")


def test_case_insensitive_flag_is_unicode(spark):
    """JS 'i' case-folds Unicode; Java's bare (?i) is ASCII-only — the
    translation must emit (?iu) so 'ärger' matches 'ÄRGER' exactly as
    the reference's RegExp does."""
    from starryskyqueryengine_spark.regex_dialect import js_to_java

    pat = js_to_java("ärger", "i")
    df = spark.createDataFrame([("ÄRGER",), ("THE END",)], "text string")
    got = [r["text"] for r in df.filter(F.col("text").rlike(pat)).collect()]
    assert got == ["ÄRGER"]


def test_js_whitespace_class_is_unicode(spark):
    """Review r9: JS \\s matches Unicode whitespace (NBSP, BOM, em
    space — routine in copy-pasted web text); Java's \\s is ASCII-only,
    so translated feed regexes silently excluded posts the reference
    includes.  \\s / \\S now rewrite to the explicit ECMA class,
    inside and outside character classes; escaped backslashes are left
    alone."""
    from starryskyqueryengine_spark.regex_dialect import js_to_java

    jvm = spark.sparkContext._jvm

    def find(pat, text):
        return jvm.java.util.regex.Pattern.compile(pat).matcher(text).find()

    p = js_to_java(r"foo\sbar", "ig")
    assert find(p, "foo\u00a0bar")      # NBSP
    assert find(p, "foo\ufeffbar")      # BOM
    assert find(p, "foo\u2003bar")      # em space
    assert find(p, "foo bar") and not find(p, "fooXbar")
    # \S is the complement
    p2 = js_to_java(r"a\Sb", "")
    assert not find(p2, "a\u00a0b") and find(p2, "axb")
    # splices bracket-free inside an existing class
    p3 = js_to_java(r"x[\s,]y", "")
    assert find(p3, "x\u00a0y") and find(p3, "x,y") and not find(p3, "xzy")
    # literal backslash-s (escaped escape) is untouched
    p4 = js_to_java(r"a\\sb", "")
    assert find(p4, "a\\sb") and not find(p4, "a b")


def test_dollar_anchor_matches_js_end_of_input(spark):
    """Review r9: Java's unflagged $ also matches before a trailing line
    terminator; JS's matches only at the true end of input.  'keyword$'
    must not match 'keyword\\n'; under the m flag multiline behavior is
    preserved, and $ inside a class or escaped stays literal."""
    from starryskyqueryengine_spark.regex_dialect import (
        js_to_java,
        validate_pattern,
    )

    jvm = spark.sparkContext._jvm

    def find(pat, text):
        return jvm.java.util.regex.Pattern.compile(pat).matcher(text).find()

    p = js_to_java(r"keyword$", "")
    assert not find(p, "keyword\n")
    assert find(p, "see keyword")
    pm = js_to_java(r"keyword$", "m")
    assert find(pm, "keyword\nmore")
    assert find(js_to_java(r"price[$]", ""), "price$x")
    assert find(js_to_java(r"cost\$", ""), "cost$ extra")
    # the Java-only \\z anchor still passes the Python proxy compile
    assert validate_pattern(r"end$", "").endswith("\\z")


def test_js_empty_class_idioms(spark):
    """Review r10: JS ``[^]`` (any char including line terminators) and
    ``[]`` (matches nothing) are Java syntax errors — a feed author
    migrating a JS regex got a validation rejection instead of the
    reference's match behavior.  They now rewrite to ``(?s:.)`` and
    ``(?!)``; quantified forms keep JS semantics, class-internal and
    escaped brackets are untouched."""
    from starryskyqueryengine_spark.regex_dialect import (
        js_to_java,
        validate_pattern,
    )

    jvm = spark.sparkContext._jvm

    def find(pat, text):
        return jvm.java.util.regex.Pattern.compile(pat).matcher(text).find()

    # [^]: the JS dot-with-newlines idiom
    p = js_to_java(r"x[^]y", "")
    assert find(p, "x\ny") and find(p, "xay") and not find(p, "xy")
    pq = js_to_java(r"x[^]*y", "")
    assert find(pq, "x\nabc\ny") and find(pq, "xy")
    # []: matches nothing; []* matches empty (0 reps), []+ never matches
    assert not find(js_to_java(r"a[]b", ""), "ab")
    assert find(js_to_java(r"a[]*b", ""), "ab")
    assert not find(js_to_java(r"a[]+b", ""), "ab")
    # validation now ACCEPTS both idioms (was: loud rejection)
    assert validate_pattern(r"x[^]y", "i") == "(?iu)x(?s:.)y"
    assert validate_pattern(r"a[]?b", "") == "a(?!)?b"
    # a REAL class containing ^ is untouched (no idiom rewrite fires):
    # [a^] is the class {a,^}, the trailing ] a literal in both dialects
    preal = js_to_java(r"[a^]]", "")
    assert preal == r"[a^]]"
    assert find(preal, "a]") and find(preal, "^]") and not find(preal, "z]")
    # an escaped bracket is consumed as a pair — the walker must not
    # see '[^]' starting at the escaped '[' (here ^ is a mid-pattern
    # anchor in BOTH dialects, so the translation is pure passthrough)
    assert js_to_java(r"\[^]", "") == r"\[^]"
