#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles and report per-query match status.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.dt.floor("us").astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_files = glob.glob(f"{qdir}/*.parquet")
        if not spark_files:
            results[name] = "NO_OUTPUT"
            continue
        sdf = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(sdf)})"
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"
        elif len(s) != len(o):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} oracle={len(o)}"
        else:
            eq = True
            detail = ""
            for c in s.columns:
                if s[c].dtype != o[c].dtype:
                    eq = False; detail = f"dtype[{c}] {s[c].dtype}!={o[c].dtype}"; break
                if not s[c].equals(o[c]):
                    # pinpoint first difference
                    neq = (s[c].astype(object) != o[c].astype(object))
                    # NaN == NaN for our purposes
                    both_na = s[c].isna() & o[c].isna()
                    neq = neq & ~both_na
                    if neq.any():
                        i = neq.idxmax()
                        eq = False
                        detail = f"value[{c}] row{i}: spark={s[c][i]!r} oracle={o[c][i]!r} (n_diff={int(neq.sum())})"
                        break
            results[name] = "MATCH" if eq else f"VALUE_MISMATCH {detail}"
    n_match = sum(1 for v in results.values() if v == "MATCH")
    n_rows_only = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        flag = "OK " if v == "MATCH" else ("ro " if v.startswith("ROWS_ONLY") else "BAD")
        print(f"{flag} {k}: {v}")
    print(f"\n{n_match} MATCH, {n_rows_only} rows-only, "
          f"{len(results)-n_match-n_rows_only} problems / {len(results)} total")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
