#!/usr/bin/env python3
"""Auto-shrinker for differential-fuzz divergences (verdict r11 #1:
"auto-shrunk repros").

Given a SQL text that DIVERGES between Spark and DuckDB over the
fixture views, greedily applies structure-preserving reductions while
the divergence persists, and prints the minimal diverging query. The
reductions are clause- and expression-level rewrites matched to the
shapes graft.fuzz.SqlFuzzer emits:

  - drop a SELECT item (keeping at least one);
  - drop WHERE / HAVING / "ORDER BY ... LIMIT ...";
  - ROLLUP/CUBE/GROUPING SETS -> plain GROUP BY;
  - drop a trailing JOIN arm;
  - replace any parenthesized sub-expression or function call with a
    neutral literal (0, 0.0, '', NULL) or with one of its inner
    column references;
  - replace the FROM table with a 1-row VALUES clause when the
    divergence is value-level (tried last - many repros need data).

Divergence is judged by the same comparator as tools/check_fuzz.py
(imported), so a shrunk query "still diverges" under exactly the
gate's own semantics (including the KNOWN_DIFF classification: a
query that shrinks INTO a known-diff class no longer counts as
diverging).

Usage:
  python3 tools/shrink_fuzz.py <sfDir> --sql "SELECT ..."
  python3 tools/shrink_fuzz.py <sfDir> --from <fuzzOutDir> <name>

Spark side runs through pyspark (driver-side tooling, same engine
version as the JVM build in this container).
"""
import sys, os, re, json

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_fuzz  # canon/compare/TABLES — the gate's own semantics

import duckdb


def spark_session():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    return s


def register(spark, con, sf_dir):
    from pyspark.sql import functions as F
    for t in check_fuzz.TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
        df = spark.read.parquet(p)
        if t == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(
                F.expr("ts div 1000")).cast("timestamp_ntz"))
        df.createOrReplaceTempView(t)


class Differ:
    def __init__(self, spark, con):
        import tempfile
        self.spark, self.con, self.runs = spark, con, 0
        self.tmp = tempfile.mkdtemp(prefix="graft_shrink_")

    def diverges(self, sql):
        """True iff the gate would report DIVERGE for this sql."""
        self.runs += 1
        try:
            # round-trip the Spark result through parquet + a DuckDB
            # read, exactly as the gate canonicalizes it (review r12:
            # toPandas normalizes nullable ints / decimals / timestamp
            # units differently, so a shrink judged on toPandas dtypes
            # can drift onto a tooling artifact the gate never saw)
            out = os.path.join(self.tmp, f"q{self.runs}")
            from pyspark.sql import functions as F
            df = self.spark.sql(sql)
            df = df.select(*[  # graft.Verify.ntzNormalized
                F.col(c).cast("timestamp_ntz").alias(c)
                if t == "timestamp" else F.col(c)
                for c, t in df.dtypes])
            df.coalesce(1).write.mode("overwrite").parquet(out)
            sdf = self.con.execute(f"SELECT * FROM '{out}/*.parquet'").df()
        except Exception:
            return False  # must stay valid on BOTH engines
        try:
            odf = self.con.execute(sql).df()
        except Exception:
            return False
        diff = check_fuzz.compare(sdf, odf, sql, self.con)
        return diff is not None and not diff.startswith("KNOWN_DIFF")


# ---- reduction candidates ----

def split_top(s, sep=","):
    """Split on sep at paren/quote depth 0."""
    out, depth, cur, q = [], 0, "", False
    for ch in s:
        if ch == "'" :
            q = not q
        if not q:
            if ch in "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == sep and depth == 0:
                out.append(cur); cur = ""
                continue
        cur += ch
    out.append(cur)
    return out


def paren_groups(s):
    """(start, end) spans of every balanced (...) group, outermost first."""
    spans, stack, q = [], [], False
    for i, ch in enumerate(s):
        if ch == "'":
            q = not q
        if q:
            continue
        if ch == "(":
            stack.append(i)
        elif ch == ")" and stack:
            spans.append((stack.pop(), i))
    spans.sort(key=lambda se: se[0] - se[1])  # widest first
    return spans


def split_top_setop(sql):
    """Split on UNION/INTERSECT/EXCEPT at paren depth 0."""
    out, depth, cur, q, i = [], 0, "", False, 0
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            q = not q
        if not q:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if depth == 0:
                m = SETOP.match(sql, i)
                if m:
                    out.append(cur)
                    cur = ""
                    i = m.end()
                    continue
        cur += ch
        i += 1
    out.append(cur)
    return out


COLREF = re.compile(r"\b[a-z]\w*_\w+\b")  # fixture columns: x_yyy
NEUTRALS = ["0", "NULL", "''", "0.0", "1"]


SETOP = re.compile(r"\b(UNION ALL|UNION|INTERSECT|EXCEPT)\b")


def candidates(sql):
    """Yield reduced variants, most-aggressive first."""
    # set-op: try each branch alone (a diverging value usually lives
    # in one branch; per-branch SELECT-item drops are schema-locked
    # until the set-op is gone)
    parts = split_top_setop(sql)
    if len(parts) > 1:
        for p in parts:
            yield p.strip()
    # clause drops
    m = re.search(r"\s+ORDER BY .*$", sql, re.S)
    if m:
        yield sql[:m.start()]
    m = re.search(r"\s+HAVING .*$", sql, re.S)
    if m:
        yield sql[:m.start()]
    for w in re.finditer(r"\bWHERE\b", sql):
        # drop this WHERE up to the next clause keyword at depth 0
        rest = sql[w.start():]
        m = re.search(r"\s+(GROUP BY|ORDER BY|HAVING|UNION|INTERSECT|"
                      r"EXCEPT|LIMIT)\b|$", rest, re.S)
        yield sql[:w.start()] + rest[m.start():]
    # grouping analytics -> plain keys
    for pat in (r"ROLLUP\(([^)]*)\)", r"CUBE\(([^)]*)\)"):
        m = re.search(pat, sql)
        if m:
            yield sql[:m.start()] + m.group(1) + sql[m.end():]
    m = re.search(r"GROUPING SETS \(\((.*?)\)\s*,.*?\)(?=\s|$)", sql, re.S)
    if m:
        yield sql[:m.start()] + m.group(1) + sql[m.end():]
    # drop a trailing JOIN arm (incl. its ON)
    for jm in list(re.finditer(r"\s+(LEFT |RIGHT |FULL )?JOIN\s+\w+\s+ON\s+"
                               r"\w+\s*=\s*\w+", sql))[::-1]:
        yield sql[:jm.start()] + sql[jm.end():]
    # drop SELECT items
    m = re.match(r"^(SELECT\s+)(.*?)(\s+FROM\s.*)$", sql, re.S)
    if m:
        items = split_top(m.group(2))
        if len(items) > 1:
            for i in range(len(items)):
                rest = items[:i] + items[i + 1:]
                yield m.group(1) + ", ".join(x.strip() for x in rest) + m.group(3)
    # replace parenthesized groups / calls with neutral literals or a
    # contained column ref
    for (a, b) in paren_groups(sql):
        # include a preceding function name if present
        fm = re.search(r"[A-Za-z_][A-Za-z_0-9]*\s*$", sql[:a])
        start = fm.start() if fm else a
        inner = sql[a + 1:b]
        reps = [c for c in COLREF.findall(inner)][:2] + NEUTRALS
        for rep in reps:
            yield sql[:start] + rep + sql[b + 1:]


def shrink(sql, differ, max_rounds=200):
    assert differ.diverges(sql), "input does not diverge - nothing to shrink"
    cur = re.sub(r"\s+", " ", sql).strip()
    improved = True
    rounds = 0
    while improved and rounds < max_rounds:
        improved = False
        rounds += 1
        for cand in candidates(cur):
            cand = re.sub(r"\s+", " ", cand).strip()
            if len(cand) >= len(cur):
                continue
            if differ.diverges(cand):
                cur = cand
                improved = True
                break
    return cur


def main():
    sf_dir = sys.argv[1]
    if sys.argv[2] == "--sql":
        sql = sys.argv[3]
    else:
        out_dir, name = sys.argv[3], sys.argv[4]
        sql = json.load(open(f"{out_dir}/fuzz_sql.json"))[name]
    spark = spark_session()
    con = duckdb.connect()
    register(spark, con, sf_dir)
    d = Differ(spark, con)
    print(f"original ({len(sql)} chars):\n  {sql}\n")
    small = shrink(sql, d)
    print(f"shrunk ({len(small)} chars, {d.runs} engine-pair runs):\n  {small}")
    try:
        print(f"  spark : {spark.sql(small).collect()[:3]}")
        print(f"  duckdb: {con.execute(small).fetchall()[:3]}")
    except Exception as e:
        print(f"  (result print failed: {e})")
    spark.stop()


if __name__ == "__main__":
    main()
