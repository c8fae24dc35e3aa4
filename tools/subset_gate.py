"""Oracle-check a SUBSET of catalog queries (same compare as
tools/full_gate.py) — for fast verification of the queries an
optimization touched, before the full gate run.

Usage: python tools/subset_gate.py q1 q2 ... [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.compare import normalize, tolerant_rows_equal, type_drift  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from starryskyqueryengine_spark.session import get_spark  # noqa: E402
from starryskyqueryengine_spark.sources.fixtures import TABLES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = get_spark("subset-gate", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name in args.queries:
        rec = {"query": name}
        try:
            sdf = queries[name](spark, args.sf)
            spark_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                rec["result"] = f"no-oracle ({len(spark_rows)} rows)"
                print(json.dumps(rec), flush=True)
                spark.catalog.clearCache()
                continue
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            drift = type_drift(
                con.execute("DESCRIBE " + oracles[name]).fetchall(), sdf.dtypes
            )
            s_vals, s_cols = normalize(spark_rows, sdf.columns)
            d_vals, d_cols = normalize(duck_rows, duck_cols)
            ok = (
                not drift
                and len(s_vals) == len(d_vals)
                and s_cols == d_cols
                and tolerant_rows_equal(s_vals, d_vals)
            )
            rec["result"] = "PASS" if ok else "FAIL"
            rec["rows"] = [len(s_vals), len(d_vals)]
            if drift:
                rec["type_drift"] = str(drift)[:200]
            if not ok:
                n_fail += 1
        except Exception as ex:  # noqa: BLE001
            rec["result"] = f"ERROR {type(ex).__name__}: {ex}"[:300]
            n_fail += 1
        print(json.dumps(rec), flush=True)
        spark.catalog.clearCache()
    spark.stop()
    if n_fail:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
