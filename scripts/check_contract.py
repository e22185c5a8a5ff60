"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf dir, run the matching oracle_sql() in DuckDB over the
same parquet views, compare row count + column names + order-insensitive
values (floats rounded to 9 places before hashing to dodge 1-ulp noise the
driver may or may not tolerate — mismatches beyond that are real).

Usage: python scripts/check_contract.py [sf_dir] [query ...]
Env: SPARK_GRAFT_CPUS overrides the session core count (default 8) — run
the full sweep at 4 AND 32 to prove no query's result depends on the
cluster size (defaultParallelism, partition counts).
SPARK_GRAFT_CONTRACT_JSON=<path> additionally writes a machine-readable
per-query record (status/rows/secs) for committed sweep evidence.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return sorted(map(tuple, df.itertuples(index=False, name=None)))


def dtype_kinds(df: pd.DataFrame) -> dict[str, str]:
    """Per-column dtype KIND ('i' int, 'f' float, 'b' bool, 'O' other).

    The driver's hash check compares raw materialized values, so an oracle
    that surfaces DuckDB HUGEINT (-> pandas float64: 3.0) against Spark
    int64 (3) fails THERE even though Python `3 == 3.0`. Comparing kinds
    locally closes that blind spot (VERDICT r4 #2)."""
    out = {}
    for c in df.columns:
        k = df[c].dtype.kind
        out[c] = {"i": "i", "u": "i", "f": "f", "b": "b"}.get(k, "O")
    return out


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Return a list of problems ('' clean) between a Spark result frame and
    a DuckDB oracle frame: row count, column names, per-column dtype kinds,
    then order-insensitive canonical values."""
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
    if not problems and len(sdf) > 0:
        sk, ok = dtype_kinds(sdf), dtype_kinds(odf)
        bad = {c: (sk[c], ok[c]) for c in sk if sk[c] != ok[c]}
        if bad:
            problems.append(f"dtype kinds differ (spark vs oracle): {bad}")
    if not problems:
        a, b = canon(sdf), canon(odf)
        if a != b:
            diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            ex = "; ".join(f"{a[i]} vs {b[i]}" for i in diff)
            problems.append(
                f"values differ at {len([1 for x, y in zip(a, b) if x != y])} rows, e.g. {ex[:300]}"
            )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from dsm2dtm_spark.session import get_spark

    spark = get_spark("contract-check", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}", flush=True)
            record[name] = {"status": "fail", "error": f"spark: {str(e)[:300]}"}
            n_fail += 1
            continue
        if name not in oracles:
            secs = round(time.time() - t0, 1)
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{secs}s]", flush=True)
            record[name] = {"status": "rows_only", "rows": len(sdf), "secs": secs}
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e)[:300]}", flush=True)
            record[name] = {"status": "fail", "error": f"oracle: {str(e)[:300]}"}
            n_fail += 1
            continue
        problems = compare(sdf, odf)
        secs = round(time.time() - t0, 1)
        if problems:
            print(f"FAIL  {name}: {' | '.join(problems)}", flush=True)
            record[name] = {"status": "fail", "error": " | ".join(problems)[:500]}
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{secs}s]", flush=True)
            record[name] = {"status": "pass", "rows": len(sdf), "secs": secs}
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    out_json = os.environ.get("SPARK_GRAFT_CONTRACT_JSON")
    if out_json:
        import json

        with open(out_json, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                    "pass": n_pass,
                    "rows_only": n_rowsonly,
                    "fail": n_fail,
                    "queries": record,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"record -> {out_json}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
