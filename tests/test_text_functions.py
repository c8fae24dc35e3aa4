"""Edge-behavior pins for functions/text.py, cross-checked against the
same expressions DuckDB-side (the oracle dialect) so the two engines
cannot drift on the guards."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.functions import text as tx

ROWS = [
    ("",),
    ("   ",),
    (None,),
    ("the,the the,the",),   # stopword MATCHES (4) > ws tokens (2)
    ("normal text here",),
    ("the quick brown fox jumps over the lazy dog",),
]


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(ROWS, "text string")
    return {
        r["text"]: (r["n"], r["q"])
        for r in df.select(
            "text",
            tx.ws_token_count(F.col("text")).alias("n"),
            tx.quality_score(F.col("text")).alias("q"),
        ).collect()
    }


def test_empty_and_null_text_count_zero_tokens(scored):
    """split(trim(''), '\\s+') yields [''] — without the guard, empty
    docs reported 1 token and earned a nonzero length signal."""
    assert scored[""][0] == 0
    assert scored["   "][0] == 0
    assert scored[None][0] == 0
    assert scored["normal text here"][0] == 3


def test_quality_score_stays_in_unit_interval(scored):
    """\\b-bounded stopword matches can outnumber whitespace tokens
    ('the,the the,the': 2 tokens, 4 matches) — unclamped, the score
    reached 1.072."""
    for text, (_n, q) in scored.items():
        if q is not None:
            assert 0.0 <= q <= 1.0, (text, q)
    assert scored["the,the the,the"][1] == pytest.approx(0.672)


def test_duckdb_oracle_dialect_mirrors_guards(scored):
    """The guarded expressions as they appear in the catalog oracle SQL
    produce the same values row-for-row."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [list(r) for r in ROWS])
    qpat = r"\b(" + "|".join(tx.QUALITY_STOPWORDS) + r")\b"
    ntok = ("(CASE WHEN coalesce(trim(text), '') = '' THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)")
    rows = con.execute(
        f"""
        SELECT text, {ntok} AS n,
               ROUND(
                 LEAST(1.0, len(regexp_extract_all(lower(text), '{qpat}'))
                    / GREATEST({ntok}, 1)) * 0.4
                 + LEAST(1.0, {ntok} / 50.0) * 0.3
                 + (1.0 - len(regexp_extract_all(text, '[.,!?;:]'))
                      / GREATEST(length(text), 1)) * 0.3, 4) AS q
        FROM t
        """
    ).fetchall()
    for text, n, q in rows:
        sn, sq = scored[text]
        assert sn == n, (text, sn, n)
        if sq is None:
            assert q is None, (text, q)
        else:
            assert q == pytest.approx(sq, abs=1e-9), (text, sq, q)
