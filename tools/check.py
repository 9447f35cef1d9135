#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB against the parquet tables in
<sfDir>, canonicalizes both (columns sorted by name), and compares values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        if name not in oracle:
            print(f"ROWS {name}: rows={len(spark_df)} (no oracle)")
            continue
        try:
            duck_df = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        ok = True
        msgs = []
        if list(spark_df.columns) != list(duck_df.columns):
            ok = False
            msgs.append(f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            ok = False
            msgs.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        else:
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                try:
                    eq = (a.astype(object).where(pd.notnull(a), None) ==
                          b.astype(object).where(pd.notnull(b), None)) | (pd.isnull(a) & pd.isnull(b))
                except Exception as e:
                    ok = False; msgs.append(f"col {c} compare error {e}"); continue
                if not eq.all():
                    ok = False
                    bad = (~eq).idxmax()
                    msgs.append(f"col {c} first mismatch row {bad}: spark={a[bad]!r} duck={b[bad]!r} (n={int((~eq).sum())})")
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs)); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
