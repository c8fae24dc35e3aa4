"""Full-catalog correctness gate at the driver's scale factor.

The external driver verifies only the FIRST 50 registered queries
(CORRECTNESS_r{N}.json); everything past the priority window is covered
by tests/test_oracle_parity.py at sf0.001.  This tool runs the SAME
compare — row count, column names, order-insensitive values, plus the
HUGEINT/DECIMAL type-drift guard — over EVERY oracle-bearing query at
sf0.01 (the driver's correctness scale) and writes the machine-readable
result to LOCAL_CORRECTNESS.json at the repo root.

Run from the repo root:  python tools/full_gate.py  [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.compare import tolerant_rows_equal  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from starryskyqueryengine_spark.session import get_spark  # noqa: E402
from starryskyqueryengine_spark.sources.fixtures import TABLES  # noqa: E402


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        return str(v)

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out), [columns[i] for i in order]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("full-gate", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    t0 = time.time()
    for name, fn in queries.items():
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "values_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(spark_rows)
            if name not in oracles:
                rec["err"] = "no-oracle (rows-only)"
                results[name] = rec
                spark.catalog.clearCache()
                continue
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            rec["oracle_rows"] = len(duck_rows)
            s_vals, s_cols = normalize(spark_rows, sdf.columns)
            d_vals, d_cols = normalize(duck_rows, duck_cols)
            rec["rows_match"] = len(s_vals) == len(d_vals)
            rec["schema_match"] = s_cols == d_cols
            rec["values_match"] = (
                rec["rows_match"]
                and rec["schema_match"]
                and tolerant_rows_equal(s_vals, d_vals)
            )
        except Exception as ex:  # noqa: BLE001 - report, don't abort the sweep
            rec["err"] = f"{type(ex).__name__}: {ex}"[:400]
        results[name] = rec
        spark.catalog.clearCache()

    n_ok = sum(1 for r in results.values() if r["values_match"])
    n_noor = sum(1 for r in results.values() if r["err"] == "no-oracle (rows-only)")
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_values_match": n_ok,
        "n_rows_only": n_noor,
        "n_fail": len(results) - n_ok - n_noor,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    out = {"summary": summary, "queries": results}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "LOCAL_CORRECTNESS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
