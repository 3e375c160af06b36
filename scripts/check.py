#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
every parquet table in <sfDir> as a DuckDB view, runs each oracle SQL, and
compares against the Spark result parquet at <verifyOutDir>/<name>/.

Comparison mirrors the driver contract: columns sorted by name, rows as
emitted (queries end with ORDER BY), values compared exactly (floats via
bit-for-bit after normalization to float64; timestamps normalized to ns).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            # The DRIVER's comparator sort_values-es object columns and
            # dies on ndarrays ("unhashable type"). Mirror that contract:
            # a top-level array/map/struct column is a gate FAILURE here
            # too (round-6 lesson: tuple-izing masked a driver red).
            head = df[c].dropna().head(50)
            if head.apply(lambda v: isinstance(v, (list, np.ndarray, dict))).any():
                raise RuntimeError(
                    f"UNSORTABLE column '{c}': top-level array/map/struct "
                    "breaks the driver comparator — project a scalar "
                    "(e.g. array_join) instead")
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = os.path.join(out_dir, name)
        status = "ok"
        detail = ""
        try:
            files = glob.glob(os.path.join(spark_dir, "*.parquet"))
            if not files:
                raise RuntimeError("no spark output parquet")
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = norm(con.execute(sql).fetchdf())
            if list(got.columns) != list(want.columns):
                status, detail = "SCHEMA", f"spark={list(got.columns)} oracle={list(want.columns)}"
            elif len(got) != len(want):
                status, detail = "ROWS", f"spark={len(got)} oracle={len(want)}"
            elif len(got) == 0:
                # empty-vs-empty hash-matches trivially; a zero-row oracle
                # gate proves nothing (round-10 lesson) — flag as suspect
                status, detail = "ZERO", "oracle gate passes on zero rows"
            else:
                for c in got.columns:
                    g, w = got[c], want[c]
                    # driver hashes VALUES after dtype normalization — an
                    # int64-vs-float64 (or float-vs-int8) column pair hashes
                    # differently even when numerically equal, so flag
                    # integer/float kind mismatches as a failure here too.
                    g_f, w_f = pd.api.types.is_float_dtype(g), pd.api.types.is_float_dtype(w)
                    g_i, w_i = pd.api.types.is_integer_dtype(g), pd.api.types.is_integer_dtype(w)
                    if (g_f != w_f) or (g_i != w_i):
                        status = "DTYPE"
                        detail = f"col={c} spark={g.dtype} oracle={w.dtype}"
                        break
                    if g_f or w_f:
                        gb = g.astype(np.float64).to_numpy().view(np.uint64)
                        wb = w.astype(np.float64).to_numpy().view(np.uint64)
                        bad = gb != wb  # bitwise: catches -0.0 vs 0.0 too
                    else:
                        gs, ws = g.astype(str), w.astype(str)
                        bad = (gs != ws).to_numpy()
                    if bad.any():
                        i = int(np.argmax(bad))
                        status = "VALUES"
                        detail = f"col={c} row={i} spark={g.iloc[i]!r} oracle={w.iloc[i]!r} ({int(bad.sum())} diffs)"
                        break
        except Exception as e:
            status, detail = "ERROR", str(e)[:300]
        results[name] = (status, detail)
        if status == "ok":
            n_pass += 1
            print(f"  PASS {name}")
        else:
            n_fail += 1
            print(f"  FAIL {name} [{status}] {detail}")
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
