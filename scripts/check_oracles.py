"""Driver-style correctness harness: run every queries() entry at sf0.01
side-by-side with its oracle_sql() DuckDB equivalent and compare
row-count + column names + order-insensitive values (the driver's check,
approximated). Usage:  python scripts/check_oracles.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            r = df[c].round(6)
            # integral floats (e.g. DuckDB SUM(BIGINT) → float64) compare as ints
            df[c] = r.astype(np.int64) if (r % 1 == 0).all() else r
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(int)
        else:
            try:
                df[c] = df[c].astype(np.int64)
            except (ValueError, TypeError, OverflowError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir="/root/testdata/sf0.01", *only):
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # sequences-domain oracles read the sf0.01 fixture by absolute path
    # (oracle_sql() takes no args — driver contract). At any other
    # sf_dir the engine query and the oracle would read DIFFERENT
    # corpora and "fail" confusingly: detect and skip those instead.
    if os.path.basename(sf_dir.rstrip("/")) != "sf0.01":
        pinned = sorted(n for n, sql in oracles.items()
                        if "seq_10000_42_8" in sql)
        if pinned:
            print(f"# sf_dir != sf0.01: skipping {len(pinned)} "
                  f"sequences-pinned oracles: {pinned}", file=sys.stderr)
            oracles = {n: s for n, s in oracles.items() if n not in pinned}

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    record = {}
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            # a typo'd name silently matching nothing would print
            # "FAILURES: none" and exit 0 — a false green
            print(f"unknown query names: {unknown}; known: {sorted(qs)}",
                  file=sys.stderr)
            return 2
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"[ERR ] {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            record[name] = {"err": f"{type(e).__name__}: {e}"}
            continue
        if name not in oracles:
            print(f"[rows] {name}: {len(mine)} rows (no oracle — rows-only)")
            record[name] = {"rows": len(mine), "err": "no_oracle"}
            continue
        try:
            oracle = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"[ERR ] {name}: oracle raised {e}")
            failures.append(name)
            record[name] = {"rows": len(mine),
                            "err": f"oracle: {type(e).__name__}: {e}"}
            continue
        ok_rows = len(mine) == len(oracle)
        ok_cols = list(mine.columns) == list(oracle.columns)
        ok_vals = ok_rows and ok_cols and mine.equals(oracle)
        status = "PASS" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        record[name] = {"rows_match": ok_rows, "schema_match": ok_cols,
                        "hash_match": bool(ok_vals), "rows": len(mine),
                        "oracle_rows": len(oracle), "err": None}
        print(f"[{status}] {name}: rows {len(mine)}/{len(oracle)} cols_ok={ok_cols} vals_ok={ok_vals}")
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows:
                neq = ~(mine == oracle).all(axis=1)
                print("  first diffs:\n", mine[neq].head(3), "\n  vs\n", oracle[neq].head(3))
            else:
                print("  mine cols:", list(mine.columns), "oracle cols:", list(oracle.columns))
    print("\nFAILURES:", failures or "none")
    out_json = os.environ.get("ORACLE_JSON")
    if out_json:
        import json

        with open(out_json, "w") as f:
            json.dump(record, f, indent=1)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
