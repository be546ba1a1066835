#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet (our Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s tables,
sorts columns by name and rows by all columns, and compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last")
    return df.reset_index(drop=True)

def canon(df: pd.DataFrame):
    """Canonical value matrix for comparison (stringified, rounded-safe)."""
    out = []
    for col in df.columns:
        s = df[col]
        out.append([repr(v) for v in s.tolist()])
    return out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path):
            continue
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        ours = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
        # The driver's hasher canonicalizes DECIMAL columns differently
        # between Spark parquet and DuckDB (r1: 8 value-identical queries
        # hash-failed on decimal outputs alone). This local gate compares
        # values and would NOT catch that — flag decimal outputs loudly.
        dec_cols = [c for c in con.execute(
            f"DESCRIBE SELECT * FROM '{path}/*.parquet'").fetchall()
            if "DECIMAL" in c[1].upper()]
        if dec_cols:
            print(f"WARN  {name}: DECIMAL output column(s) "
                  f"{[c[0] for c in dec_cols]} — the DRIVER hash gate "
                  f"will likely fail even if values match; cast finals "
                  f"to DOUBLE (ops/Parity)")
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(ours)})"
            continue
        try:
            theirs = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = normalize(ours), normalize(theirs)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH ours={list(a.columns)} oracle={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH ours={len(a)} oracle={len(b)}"
            continue
        if canon(a) == canon(b):
            results[name] = "OK"
        else:
            # find first differing cell for debugging
            diff = None
            for c in a.columns:
                av, bv = [repr(v) for v in a[c]], [repr(v) for v in b[c]]
                if av != bv:
                    i = next(i for i in range(len(av)) if av[i] != bv[i])
                    diff = f"col={c} row={i} ours={av[i]} oracle={bv[i]}"
                    break
            results[name] = f"VALUE_MISMATCH {diff}"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else 'FAIL' if 'ROWS_ONLY' not in v else 'INFO':5} {k}: {v}")
    print(f"\n{ok}/{len([r for r in results.values() if 'ROWS_ONLY' not in r])} oracle queries match")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
