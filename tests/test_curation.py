"""Unit tests for curation primitives (edge semantics the catalog parity
tests don't isolate)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from starryskyqueryengine_spark.functions import curation as cu
from starryskyqueryengine_spark.functions import dedup as dd


def _one(spark, text):
    df = spark.createDataFrame([Row(t=text)])
    return df.select(
        cu.redact_pii(F.col("t")).alias("red"),
        *[v.alias(k) for k, v in cu.pii_counts(F.col("t")).items()],
    ).first()


def test_redact_all_three_classes(spark):
    r = _one(spark, "mail a.b+c@x-y.example.org ip 192.168.0.1 tel +1-555-0100 end")
    assert r["red"] == "mail <EMAIL> ip <IP> tel <PHONE> end"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)


def test_redact_email_before_host_like_tokens(spark):
    # The email's domain must be swallowed by <EMAIL>, not left for the
    # later passes to mangle.
    r = _one(spark, "x user@10.0.0.1.example.com y")
    assert "<EMAIL>" in r["red"] and "10.0.0.1" not in r["red"]


def test_ip_not_reredacted_as_phone(spark):
    r = _one(spark, "addr 10.20.30.40")
    assert r["red"] == "addr <IP>"
    assert r["n_phones"] == 0


def test_clean_text_unchanged(spark):
    r = _one(spark, "no pii here at all")
    assert r["red"] == "no pii here at all"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)


def test_url_domain_extraction(spark):
    df = spark.createDataFrame(
        [Row(t="see https://sub.Example-2.com/path?q=1 more"),
         Row(t="http://plain.org"),
         Row(t="no url")]
    )
    got = [r[0] for r in df.select(cu.url_domain(F.col("t"))).collect()]
    assert got == ["sub.Example-2.com", "plain.org", ""]


def test_decontaminate_fraction_gate(spark):
    # bench doc shares all 3 shingles with doc 1, one shingle with doc 2.
    mk = lambda i, t: Row(doc_id=i, text=t)
    corpus = spark.createDataFrame(
        [mk(1, "alpha beta gamma delta epsilon"),
         mk(2, "alpha beta gamma zeta unrelated words here entirely"),
         mk(3, "totally different content altogether")]
    )
    bench = spark.createDataFrame([mk(100, "alpha beta gamma delta epsilon")])
    out = cu.decontaminate(
        dd.with_shingles(corpus), dd.with_shingles(bench), min_fraction=0.5
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert 1 in by_id and by_id[1]["contamination"] == 1.0
    assert 2 not in by_id  # 2/6 shingles < 0.5
    assert 3 not in by_id


def test_decontaminate_empty_benchmark(spark):
    corpus = spark.createDataFrame([Row(doc_id=1, text="alpha beta gamma delta")])
    bench = spark.createDataFrame([Row(doc_id=9, text="")])
    out = cu.decontaminate(
        dd.with_shingles(corpus), dd.with_shingles(bench)
    ).collect()
    assert out == []


def test_domain_blocklist_both_match_classes_fire(spark):
    """The blocklist filter must actually remove docs through BOTH match
    paths — subdomain suffix and exact host — on the fixtures (a
    vacuous filter would pass the oracle trivially)."""
    from starryskyqueryengine_spark.catalog import get_queries

    out = get_queries()["domain_blocklist_filter"](spark, "/root/testdata/sf0.001")
    kept = out.count()
    total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert kept < total  # something was blocked
    doms = {r["domain"] for r in out.select("domain").distinct().collect()}
    assert not any(d.endswith(".src40.example.com") for d in doms)
    assert "p1.src51.example.com" not in doms


def test_aho_corasick_counts_match_brute_force():
    """Automaton counting semantics pinned against brute force: every
    start position of every pattern, overlapping and nested included,
    plus failure-link stress cases."""
    import random

    from starryskyqueryengine_spark.functions.automaton import (
        ac_count,
        build_aho_corasick,
    )

    def brute(text, pats):
        return [
            sum(1 for i in range(len(text)) if text.startswith(p, i))
            for p in pats
        ]

    cases = [
        (["a", "ab", "bab", "bc", "abc"], "ababcbab"),   # classic AC paper-ish
        (["aba", "ba", "a"], "ababababa"),               # overlapping chains
        (["tab", "table", "le"], "the table tabulates"),
        (["a t", "t a"], "a t a t a"),
    ]
    rng = random.Random(11)
    for _ in range(30):
        text = "".join(rng.choice("abc ") for _ in range(200))
        pats = list({"".join(rng.choice("abc ") for _ in range(rng.randint(1, 4)))
                     for _ in range(6)})
        cases.append((pats, text))
    for pats, text in cases:
        goto, fail, out = build_aho_corasick(pats)
        assert ac_count(text, goto, fail, out, len(pats)) == brute(text, pats), (
            pats, text)


def test_ip_octets_range_checked(spark):
    # impossible addresses must NOT be redacted (999.999.999.999 is not
    # PII, and redacting it corrupts training text)
    r = _one(spark, "code 999.999.999.999 and 256.1.1.1 stay")
    assert r["red"] == "code 999.999.999.999 and 256.1.1.1 stay"
    assert r["n_ips"] == 0
    # boundary octets 0 and 255 are valid
    r = _one(spark, "hosts 0.0.0.0 and 255.255.255.255 go")
    assert r["red"] == "hosts <IP> and <IP> go"
    assert r["n_ips"] == 2


def test_ip_no_partial_match_inside_larger_number_runs(spark):
    # \b guards: no octet may be carved out of a longer digit run
    r = _one(spark, "id 1234.1.1.1 and 1.1.1.1234 stay")
    assert r["n_ips"] == 0
    assert r["red"] == "id 1234.1.1.1 and 1.1.1.1234 stay"


def test_ip_zero_padded_octets_still_redacted(spark):
    # zero-padded quads are common in log formats / sortable exports
    r = _one(spark, "from 010.001.002.003 and 192.168.001.001 end")
    assert r["red"] == "from <IP> and <IP> end"
    assert r["n_ips"] == 2


def test_multi_pattern_counts_string_id_column(spark):
    """Review r9: the output schema hardcoded a bigint id; a string id
    column (uuid-keyed corpora) must pass through the Arrow boundary
    with its own type."""
    from starryskyqueryengine_spark.functions.automaton import (
        multi_pattern_counts,
    )

    df = spark.createDataFrame(
        [("u-1", "the tab on the table"), ("u-2", "nothing here")],
        "uid string, text string",
    )
    out = {r["uid"]: (r["n_hits"], r["n_patterns"])
           for r in multi_pattern_counts(df, ["tab", "table"],
                                         id_col="uid").collect()}
    assert out == {"u-1": (3, 2), "u-2": (0, 0)}
