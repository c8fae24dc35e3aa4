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
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.compare import (  # noqa: E402
    normalize,
    tolerant_rows_equal,
    type_drift,
)

import __spark_entry__ as entrymod  # noqa: E402
from starryskyqueryengine_spark.session import get_spark  # noqa: E402
from starryskyqueryengine_spark.sources.fixtures import TABLES  # noqa: E402

# Tolerance-band value checks for inherently estimate-valued queries
# (review r11, verdict #4): engine sketches differ bit-for-bit, so no
# hash oracle can exist — but the ESTIMATE still has a published error
# bound, and |estimate - exact| <= rel_tol * exact is a real value
# assertion where "rows-only" was none.  rel_tol is 3x the configured
# relative standard deviation (rsd=0.02 in the query), the standard
# 3-sigma band for HLL++'s near-Gaussian error (Heule et al. 2013).
TOLERANCE_CHECKS: dict[str, dict] = {
    "sketch_distinct_users": {
        "exact_sql": (
            "SELECT event_type, COUNT(DISTINCT user_id) AS exact_users "
            "FROM events GROUP BY event_type"
        ),
        "key_cols": ["event_type"],
        "est_col": "approx_users",
        "exact_col": "exact_users",
        "rel_tol": 0.06,
    },
}


def tolerance_check(spark_rows, spark_cols, exact_rows, exact_cols, spec):
    """Per-key |estimate - exact| <= rel_tol * exact.  Returns (ok, err)."""
    kc, ec, tol = spec["key_cols"], spec["est_col"], spec["rel_tol"]
    s_key = [spark_cols.index(c) for c in kc]
    s_est = spark_cols.index(ec)
    # exact value located by NAME like every other column (r12 advice):
    # positional r[-1] silently compared the wrong column if a future
    # spec's exact_sql ordered its projection differently.
    x_val = exact_cols.index(spec["exact_col"])
    exact = {tuple(r[exact_cols.index(c)] for c in kc): r[x_val] for r in exact_rows}
    got = {tuple(r[i] for i in s_key): r[s_est] for r in spark_rows}
    if set(exact) != set(got):
        return False, f"key sets differ: {sorted(set(exact) ^ set(got))[:5]}"
    for k, true_n in exact.items():
        if abs(got[k] - true_n) > tol * true_n:
            return False, (
                f"estimate {got[k]} for key {k} outside "
                f"{tol:.0%} of exact {true_n}"
            )
    return True, None


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
                spec = TOLERANCE_CHECKS.get(name)
                if spec is not None:
                    res = con.execute(spec["exact_sql"])
                    exact_cols = [d[0] for d in res.description]
                    ok, terr = tolerance_check(
                        spark_rows, sdf.columns, res.fetchall(), exact_cols, spec
                    )
                    rec["values_match"] = ok
                    rec["rows_match"] = ok
                    rec["schema_match"] = True
                    rec["err"] = None if ok else f"tolerance-band: {terr}"[:400]
                    rec["check"] = f"tolerance-band (rel_tol={spec['rel_tol']})"
                else:
                    rec["err"] = "no-oracle (rows-only)"
                results[name] = rec
                spark.catalog.clearCache()
                continue
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            rec["oracle_rows"] = len(duck_rows)
            # type-drift guard (the docstring's promise): the driver's
            # value hash is TYPE-sensitive, so a HUGEINT/DECIMAL oracle
            # column that stringifies equal here would still fail there
            drift = type_drift(
                con.execute("DESCRIBE " + oracles[name]).fetchall(),
                sdf.dtypes,
            )
            rec["types_match"] = not drift
            if drift:
                rec["err"] = f"type drift: {drift}"[:400]
            s_vals, s_cols = normalize(spark_rows, sdf.columns)
            d_vals, d_cols = normalize(duck_rows, duck_cols)
            rec["rows_match"] = len(s_vals) == len(d_vals)
            rec["schema_match"] = s_cols == d_cols
            rec["values_match"] = (
                rec["rows_match"]
                and rec["schema_match"]
                and rec["types_match"]
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
    if summary["n_fail"]:
        # a gate must gate: shell chains and CI stop on failures
        raise SystemExit(1)


if __name__ == "__main__":
    main()
