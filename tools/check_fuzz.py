#!/usr/bin/env python3
"""Differential-fuzz checker, DuckDB side (verdict r11 #1).

Runs every query from <outDir>/fuzz_sql.json (written by `runMain
graft.Fuzz`) through DuckDB over the same fixture parquet, and compares
against the Spark parquet dumps:

  - columns sorted by name, rows sorted by all columns (total compare,
    order-insensitive — generated queries need no ORDER BY except
    under LIMIT, where the generator pins a unique-key total order);
  - integer widths normalized to int64 (DuckDB HUGEINT sums and
    int32/int64 reads compare by value);
  - floats compared with relative tolerance 1e-9 (double aggregation
    order is partition-dependent in Spark; identical inputs can sum in
    different orders) after sorting on the EXACT columns only;
  - timestamps floored to microseconds (Spark writes micros).

Exit status 1 if any DIVERGE / error; 0 when the sweep is clean.

Usage: python3 tools/check_fuzz.py <sfDir> <fuzzOutDir>
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

REL_TOL = 1e-9
ABS_TOL = 1e-9


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.dt.floor("us").astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            # DuckDB HUGEINT / Decimal come back as objects, and Spark
            # DECIMAL outputs (a bare `1.0` literal types as decimal)
            # arrive as decimal.Decimal objects while DuckDB may
            # materialize the same value as float64 — normalize
            # numeric objects by VALUE: ints to Int64, decimals to
            # float64 (compared under the float tolerance; the
            # generator's decimals are small literals, well inside
            # float64 precision)
            import decimal as _dec
            def norm(v):
                if v is None:
                    return None
                if isinstance(v, bool):
                    return v
                if isinstance(v, int):
                    return np.int64(v)
                return v
            df[c] = df[c].map(norm)
            nn = df[c].dropna()
            if len(nn) and nn.map(
                    lambda v: isinstance(v, _dec.Decimal)).all():
                df[c] = df[c].astype("float64")
            elif df[c].map(
                    lambda v: v is None or isinstance(v, np.int64)).all():
                df[c] = df[c].astype("Int64")
    return df


def sort_rows(df: pd.DataFrame):
    """Stable row order: exact (non-float) columns first, then floats
    ROUNDED to 6dp as tie-breakers — rows tied on exact columns still
    align across engines when their floats differ only below the
    comparison tolerance. (A float pair straddling a rounding boundary
    could in principle misalign; any resulting DIVERGE is adjudicated
    by hand, and none has been a false positive so far.)"""
    exact = [c for c in df.columns
             if not pd.api.types.is_float_dtype(df[c])]
    floats = [c for c in df.columns if c not in exact]
    keyed = pd.DataFrame(index=df.index)
    for c in exact:
        keyed[c] = df[c].astype("string")  # NULL-safe total order
    for c in floats:
        keyed[c] = df[c].round(6)
    keys = exact + floats
    order = keyed.sort_values(by=keys, kind="mergesort",
                              na_position="first").index if keys else df.index
    return df.loc[order].reset_index(drop=True), exact


def float_eq(a: pd.Series, b: pd.Series) -> bool:
    an, bn = a.to_numpy(dtype="float64"), b.to_numpy(dtype="float64")
    both_nan = np.isnan(an) & np.isnan(bn)
    close = np.isclose(an, bn, rtol=REL_TOL, atol=ABS_TOL, equal_nan=False)
    return bool(np.all(close | both_nan))


GROUPING_RE = __import__("re").compile(r"ROLLUP|CUBE|GROUPING SETS", 2)


def null_or_zero_row(df, i):
    return all(pd.isna(v) or (isinstance(v, (int, float, np.integer))
                              and not isinstance(v, bool) and v == 0)
               for v in df.iloc[i])


def _top_level_find(s, token):
    """First case-insensitive index of token at paren depth 0 outside
    single quotes, or -1."""
    up, tok = s.upper(), token.upper()
    depth, q = 0, False
    for i, ch in enumerate(s):
        if ch == "'":
            q = not q
        elif not q:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and up.startswith(tok, i):
                return i
    return -1


def grouped_input_is_empty(sql, con):
    """True/False: does the grouping query's FROM/WHERE input have zero
    rows (DuckDB COUNT(*) probe)? None when the query shape can't be
    sliced (no top-level GROUP BY / FROM, or the probe errors)."""
    g = _top_level_find(sql, " GROUP BY ")
    if g < 0:
        return None
    pre = sql[:g]
    f = _top_level_find(pre, " FROM ")
    if f < 0:
        return None
    try:
        n = con.execute(
            "SELECT COUNT(*) FROM " + pre[f + len(" FROM "):]).fetchone()[0]
    except Exception:
        return None
    return n == 0


def compare(sdf: pd.DataFrame, odf: pd.DataFrame, sql: str = "",
            con=None):
    s, o = canon(sdf), canon(odf)
    if list(s.columns) != list(o.columns):
        return f"SCHEMA spark={list(s.columns)} duckdb={list(o.columns)}"
    if len(s) != len(o):
        # PINNED engine-semantics difference (found by this gate, fz0205):
        # over an EMPTY input, the SQL standard gives ROLLUP/CUBE/
        # GROUPING SETS one grand-total row for the () grouping set
        # (all keys NULL, COUNTs 0, other aggs NULL) — DuckDB and
        # Postgres do; Spark returns ZERO rows. Minimal repro:
        #   SELECT max(n_regionkey) FROM nation WHERE n_name='zzz'
        #   GROUP BY ROLLUP(n_name)        -- Spark: 0 rows, DuckDB: 1
        # Classified (not hidden): only when the query uses a grouping
        # construct, Spark returned ZERO rows (empty grouped input
        # yields no grouping sets at all in Spark — a non-empty input
        # always yields >= 1 row per set, so a dropped grand-total row
        # over NON-empty input can never land here — review r12),
        # DuckDB has exactly one all-NULL/zero row, removing it makes
        # the engines agree, AND — when a DuckDB connection is at hand
        # — a COUNT(*) probe over the query's own FROM/WHERE confirms
        # the input really is empty (a probe that can't slice the
        # query shape, or that counts > 0, vetoes the classification).
        if (GROUPING_RE.search(sql) and len(s) == 0 and len(o) == 1
                and null_or_zero_row(o, 0)):
            trimmed = odf.drop(odf.index[0]).reset_index(drop=True)
            if compare(sdf, trimmed, "") is None and (
                    con is None or grouped_input_is_empty(sql, con)):
                return ("KNOWN_DIFF empty-input grouping-sets "
                        "grand-total row (Spark omits, standard keeps)")
        return f"ROWCOUNT spark={len(s)} duckdb={len(o)}"
    s, exact = sort_rows(s)
    o, _ = sort_rows(o)
    for c in exact:
        sv = s[c].astype("string")
        ov = o[c].astype("string")
        # (sv != ov) is <NA> whenever EITHER side is NA, so a bare
        # fillna(False) would also swallow one-sided NULL-vs-value
        # mismatches — the NULL-handling divergence class this gate
        # exists to catch (review r12). Both-NA is equal; XOR of the
        # NA masks restores the one-sided case.
        neq = (sv != ov).fillna(False) | (sv.isna() ^ ov.isna())
        if neq.any():
            i = int(neq.idxmax())
            return (f"VALUE[{c}] row{i}: spark={s[c][i]!r} "
                    f"duckdb={o[c][i]!r} (n_diff={int(neq.sum())})")
    for c in s.columns:
        if c in exact:
            continue
        if not float_eq(s[c], o[c]):
            diff = (s[c] - o[c]).abs()
            i = int(diff.idxmax())
            return (f"FLOAT[{c}] row{i}: spark={s[c][i]!r} "
                    f"duckdb={o[c][i]!r}")
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sqls = json.load(open(f"{out_dir}/fuzz_sql.json"))
    spark_errors = {}
    ep = f"{out_dir}/fuzz_errors.json"
    if os.path.exists(ep):
        spark_errors = json.load(open(ep))
    n_match = 0
    n_known = 0
    known = []
    problems = []
    for name, sql in sorted(sqls.items()):
        if name in spark_errors:
            problems.append((name, f"SPARK_ERROR {spark_errors[name]}"))
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            problems.append((name, "NO_SPARK_OUTPUT"))
            continue
        sdf = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            problems.append((name, f"DUCKDB_ERROR {e}"))
            continue
        diff = compare(sdf, odf, sql, con)
        if diff is None:
            n_match += 1
        elif diff.startswith("KNOWN_DIFF"):
            n_known += 1
            known.append((name, diff))
        else:
            problems.append((name, f"DIVERGE {diff}"))
    for name, p in known:
        print(f"kd  {name}: {p}")
    for name, p in problems:
        print(f"BAD {name}: {p}")
        print(f"    sql: {sqls[name]}")
        print(f"    shrink: python3 tools/shrink_fuzz.py {sf_dir} "
              f"--from {out_dir} {name}")
    print(f"\n{n_match} MATCH, {n_known} known-diff, "
          f"{len(problems)} problems / {len(sqls)} total")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
