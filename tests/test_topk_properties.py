"""Property suite for operators/topk.py (target #12): walking
keyset-paginated pages with the cursor the serving layer would mint
must reproduce the key's full (indexedAt DESC, cid DESC) order exactly
— every page is the next `limit` rows, no row skipped, duplicated, or
leaked from another key — under heavy timestamp ties (the tie branch is
where the reference's own OR-precedence bug lived), any page size, and
multi-key stores. cid is unique per key, the store's real contract (it
derives from the content hash); (ts, cid) is therefore a total order."""

from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.operators.topk import encode_cursor, keyset_page

# few distinct timestamps -> lots of exact ties; cid gets the row index
# appended so it is unique per key while still colliding in prefix
_row = st.tuples(
    st.sampled_from(["k1", "k2"]),
    st.integers(0, 3).map(lambda s: s * 1_000_000),
    st.sampled_from(["ca", "cb", "cc"]),
)


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(_row, min_size=1, max_size=10),
    limit=st.sampled_from([1, 2, 5]),
)
def test_keyset_walk_reproduces_full_order(spark, rows, limit):
    data = [
        (k, us, f"{cid}{i}", f"at://x/{i}") for i, (k, us, cid) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        [(k, us, cid, uri) for (k, us, cid, uri) in data],
        "key string, us long, cid string, uri string",
    ).selectExpr("key", "timestamp_micros(us) as indexedAt", "cid", "uri", "us")

    for key in ("k1", "k2"):
        want = sorted(
            [(us, cid, uri) for (k, us, cid, uri) in data if k == key],
            key=lambda r: (r[0], r[1]),
            reverse=True,
        )
        got, cursor = [], None
        for _ in range(len(data) + 1):
            page = [
                (r["us"], r["cid"], r["uri"])
                for r in keyset_page(df, key, limit, cursor).collect()
            ]
            if not page:
                break
            # each page IS the next `limit` rows of the full order
            assert page == want[len(got):len(got) + limit], (
                page, want, got, limit)
            got.extend(page)
            cursor = encode_cursor(page[-1][0], page[-1][1])
        else:
            raise AssertionError("pagination did not terminate")
        assert got == want, (got, want)
