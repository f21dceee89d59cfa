package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (beyond-parity): each check reduces
  * a table to ONE row (check_name, n_violations), and [[report]]
  * unions them into the quality table a pipeline gates on — the
  * dbt-test / Deequ-style surface, kept exact so an independent SQL
  * engine can verify every number.
  *
  * Scale shape: every check is a single partial-aggregated pass (the
  * shuffle carries one partial count per task), except [[referential]]
  * which is a left-anti join on the key — Spark picks broadcast or
  * shuffled-hash automatically by parent size. The report union
  * combines 1-row frames; cost is the sum of its checks, each
  * independently parallel.
  */
object DataQuality {

  /** Rows where `c` is null. */
  def notNull(df: DataFrame, c: String): DataFrame =
    df.agg(count(when(col(c).isNull, 1)).as("n_violations"))
      .select(lit(s"not_null:$c").as("check_name"), col("n_violations"))

  /** Excess rows beyond one per distinct key tuple (0 = key is
    * unique). */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("n_violations"))
      .select(lit(s"unique:${keys.mkString(",")}").as("check_name"),
        col("n_violations"))

  /** Orphaned child rows: non-null child keys with no matching parent
    * (SQL FK semantics — null FKs are not violations). The parent key
    * is renamed before the join so same-named child/parent key
    * columns (the common FK shape) do not collide. */
  def referential(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    var pk = "__graft_pk"
    while (child.columns.contains(pk)) pk += "_"
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(pk)), col(childKey) === col(pk),
        "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"fk:$childKey->$parentKey").as("check_name"),
        col("n_violations"))
  }

  /** Non-null values outside the accepted set. */
  def acceptedValues(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.agg(count(when(col(c).isNotNull && !col(c).isInCollection(values), 1))
        .as("n_violations"))
      .select(lit(s"accepted:$c").as("check_name"), col("n_violations"))

  /** Non-null values outside [lo, hi]. */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    df.agg(count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1))
        .as("n_violations"))
      .select(lit(s"range:$c").as("check_name"), col("n_violations"))

  /** Union the per-check rows into one quality table. */
  def report(checks: DataFrame*): DataFrame =
    checks.reduce(_.unionByName(_))

  /** Tukey-fence outlier detection per group: rows whose `valueCol`
    * falls strictly outside [q1 - k·IQR, q3 + k·IQR] of their group's
    * distribution. Quartiles are EXACT (`percentile`, the pct1-proven
    * kernel) in one aggregate pass; the per-group fences broadcast
    * back onto the scan (group count is small by construction — one
    * fence row per group), so the data passes twice and shuffles only
    * into the quartile aggregate. Appends rounded `lo_fence` /
    * `hi_fence` columns to the surviving rows. */
  def outliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double = 1.5): DataFrame = {
    require(groupCols.nonEmpty, "outliers needs at least one group column")
    val v = col(valueCol)
    val fences = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(0.25)).as("__q1"),
        percentile(v, lit(0.75)).as("__q3"))
      .select(groupCols.map(c => col(c).as(s"__g_$c")) ++ Seq(
        (col("__q1") - (col("__q3") - col("__q1")) * k).as("__lo"),
        (col("__q3") + (col("__q3") - col("__q1")) * k).as("__hi")): _*)
    // null-SAFE join: a NULL group still has a fence row (groupBy
    // emits one), and an equi-join would silently drop exactly the
    // dirty null-keyed rows a quality check must not lose
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(broadcast(fences), cond)
      .filter(v < col("__lo") || v > col("__hi"))
      .withColumn("lo_fence", round(col("__lo"), 4))
      .withColumn("hi_fence", round(col("__hi"), 4))
      .drop(groupCols.map(c => s"__g_$c") ++ Seq("__lo", "__hi"): _*)
  }

  /** Winsorize: clamp `valueCol` to its [loP, hiP] exact percentiles
    * — the robust-stats tamer for heavy-tailed metrics (a handful of
    * pathological rows otherwise own every mean and every z-score).
    * ONE percentile aggregate; the two cutoffs ride back as a
    * broadcast 1-row frame; the clamp is a row-local projection.
    * Exact percentiles so the cutoffs are engine-verifiable (dq3);
    * swap approx_percentile into the same shape for monitoring-grade
    * use at 100 TB. */
  def winsorize(df: DataFrame, valueCol: String, loP: Double = 0.05,
      hiP: Double = 0.95, outCol: String = ""): DataFrame = {
    require(loP >= 0 && hiP <= 1 && loP < hiP, s"bad percentiles [$loP, $hiP]")
    val out = if (outCol.nonEmpty) outCol else valueCol + "_w"
    val v = col(valueCol)
    val cuts = df.agg(percentile(v, lit(loP)).as("__lo"),
      percentile(v, lit(hiP)).as("__hi"))
    // greatest/least skip nulls, which would rewrite a missing value to
    // the low cutoff — keep null in, null out
    df.crossJoin(broadcast(cuts))
      .withColumn(out, when(v.isNotNull,
        round(least(greatest(v, col("__lo")), col("__hi")), 4)))
      .drop("__lo", "__hi")
  }

  /** Table diff — what changed between two versions of a keyed table
    * (the data-audit primitive behind every "why did the metric
    * move" investigation and every cautious backfill). Emits ONLY
    * differing rows: change_type added/removed/changed plus
    * `changed_cols`, the comma-joined names of the value columns
    * that differ (null-safe compare, so NULL→value and value→NULL
    * both count). Unchanged rows — the overwhelming majority at
    * scale — never leave the join.
    *
    * Scale shape: one full outer join hash-partitioned on the key;
    * the per-column compares are row-local projections inside it.
    * Both sides must share the schema (audit the same table across
    * versions; project first if they drifted — or let [[diff]]'s
    * failure on mismatched columns tell you they did). */
  def diff(before: DataFrame, after: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs key columns")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schema drift between sides: ${before.columns.sorted.mkString(",")} vs " +
        after.columns.sorted.mkString(","))
    val valueCols = before.columns.filterNot(keys.contains).toSeq
    val b = before.select(before.columns.map(c => col(c).as(s"__b_$c")) :+
      lit(1).as("__b_present"): _*)
    val a = after.select(after.columns.map(c => col(c).as(s"__a_$c")) :+
      lit(1).as("__a_present"): _*)
    val cond = keys.map(k => col(s"__b_$k") <=> col(s"__a_$k")).reduce(_ && _)
    // presence markers, not key nullability: a legitimately null key
    // must not read as an absent row
    val inB = col("__b_present").isNotNull
    val inA = col("__a_present").isNotNull
    val changedCols = concat_ws(",", valueCols.sorted.map(c =>
      when(col(s"__b_$c") <=> col(s"__a_$c"), lit(null: String))
        .otherwise(lit(c))): _*)
    b.join(a, cond, "full_outer")
      .withColumn("change_type",
        when(!inB, lit("added"))
          .when(!inA, lit("removed"))
          .otherwise(lit("changed")))
      .withColumn("changed_cols",
        when(col("change_type") === "changed", changedCols).otherwise(lit("")))
      .filter(col("change_type") =!= "changed" || col("changed_cols") =!= "")
      .select(keys.map(k => coalesce(col(s"__b_$k"), col(s"__a_$k")).as(k)) ++
        Seq(col("change_type"), col("changed_cols")): _*)
  }

  // ---- fused single-pass form --------------------------------------

  /** Violation predicates for [[rowChecks]] — same contracts as the
    * standalone checks above. */
  def isNullViolation(c: String): Column = col(c).isNull
  def acceptedViolation(c: String, values: Seq[String]): Column =
    col(c).isNotNull && !col(c).isInCollection(values)
  def rangeViolation(c: String, lo: Double, hi: Double): Column =
    col(c).isNotNull && (col(c) < lo || col(c) > hi)

  /** Benford first-digit conformance — the classic fabricated-data
    * screen for financial columns: observed share of each leading
    * digit 1–9 vs the Benford expectation log₁₀(1 + 1/d), with the
    * per-digit chi-square term (n·(obs − exp)²/exp; sum them for the
    * 8-df statistic). Rows with |value| < 1 are excluded (no leading
    * digit). One map-side-combined aggregate to 9 counter rows; the
    * expected shares are compile-time literals, so the readout
    * replays exactly in any engine.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    // floor before stringifying: a rounding cast would turn 1.5's
    // leading digit into 2
    val digit = substring(floor(abs(col(valueCol))).cast("long")
      .cast("string"), 1, 1).cast("int")
    val counts = df.filter(abs(col(valueCol)) >= 1)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"),
        log10(lit(1.0) + lit(1.0) / col("id").cast("double")).as("__exp"))
    val tot = broadcast(counts.agg(sum("n").as("__t")))
    // broadcast the RIGHT side: a left-outer join cannot build on the
    // preserved side, so a broadcast(spine) hint would be ignored
    spine.join(broadcast(counts), Seq("digit"), "left")
      .crossJoin(tot)
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("n"), lit(0L)).cast("double") /
          col("__t").cast("double"), 6).as("obs_share"),
        round(col("__exp"), 6).as("exp_share"),
        round({
          val o = coalesce(col("n"), lit(0L)).cast("double")
          val e = col("__exp") * col("__t").cast("double")
          (o - e) * (o - e) / e
        }, 6).as("chi2_term"))
  }

  /** Attach the row-local checks to a DataFrame as OBSERVED metrics
    * (`Dataset.observe`): violation counts are accumulated DURING
    * whatever action the caller runs next — zero extra scans, and the
    * same call works on a streaming DataFrame (metrics per
    * micro-batch via the progress/listener surfaces). The relational
    * forms above are for when the report IS the output; this is for
    * monitoring a pipeline you were going to run anyway. Read the
    * counts with [[MetricsListener]] (batch) or
    * `StreamingQueryProgress.observedMetrics` (streaming).
    */
  def observed(df: DataFrame, metricName: String,
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty)
    val exprs = checks.map { case (name, pred) =>
      count(when(pred, 1)).as(name)
    }
    df.observe(metricName, exprs.head, exprs.tail: _*)
  }

  /** Captures observed metrics from completed batch actions.
    * Register with `spark.listenerManager.register(listener)`; after
    * an action on an [[observed]] frame, [[metricsFor]] polls the
    * asynchronously-delivered result. */
  class MetricsListener extends org.apache.spark.sql.util.QueryExecutionListener {
    private val seen =
      new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()

    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (k, v) => seen.put(k, v) }

    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = ()

    /** Poll for a metric row (listener delivery is async). */
    def metricsFor(name: String, timeoutMs: Long = 10000): Option[org.apache.spark.sql.Row] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (System.nanoTime() < deadline) {
        val r = seen.get(name)
        if (r != null) return Some(r)
        Thread.sleep(20)
      }
      Option(seen.get(name))
    }
  }

  /** ALL row-local checks in ONE aggregate pass over the table: at
    * 100 TB the difference between one scan and one scan per check is
    * the whole cost of the quality gate. Takes (check_name ->
    * violation predicate) pairs; returns the same (check_name,
    * n_violations) rows as running each check separately (exactly —
    * dq1 keeps its oracle after switching to this form). Key-level
    * checks ([[unique]]) and cross-table checks ([[referential]])
    * need their own shuffle/join and stay standalone.
    */
  /** Population-stability-index (PSI) distribution drift between two
    * versions of a numeric column — the monitoring rule behind "did
    * this week's data shift against the reference?": both frames
    * histogram onto the SAME fixed bin edges ([[Profiling.histogram]]
    * — under/overflow buckets included, so tail drift is never
    * silent), proportions are add-one smoothed over nBuckets + 2
    * cells (an empty bucket must not produce ln 0), and each bucket
    * reports its term `(p - q) ln(p / q)`; total PSI = sum of terms
    * (conventional alarms: > 0.1 moderate, > 0.25 major).
    *
    * Scale shape: two single-pass histogram aggregates; everything
    * after operates on the (nBuckets + 2)-row frames — the totals
    * window runs over bucket rows, never data. */
  def psiDrift(reference: DataFrame, current: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    val r = Profiling.histogram(reference, valueCol, lo, hi, nBuckets)
      .select(col("bucket"), col("n").as("n_ref"))
    val c = Profiling.histogram(current, valueCol, lo, hi, nBuckets)
      .select(col("bucket"), col("n").as("n_cur"))
    val cells = nBuckets + 2
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val withTot = r.join(c, "bucket")
      .withColumn("__tr", sum("n_ref").over(w))
      .withColumn("__tc", sum("n_cur").over(w))
    val p = (col("n_cur") + 1).cast("double") / (col("__tc") + cells)
    val q = (col("n_ref") + 1).cast("double") / (col("__tr") + cells)
    withTot.withColumn("psi_term", round((p - q) * log(p / q), 6))
      .select("bucket", "n_ref", "n_cur", "psi_term")
  }

  /** Two-sample Kolmogorov-Smirnov drift test: the supremum distance
    * between the samples' empirical CDFs, with the value where it
    * occurs — the UNBINNED companion to [[psiDrift]] (no lo/hi/bucket
    * choices to tune, and sensitive to shifts PSI's coarse bins
    * smear). Returns ONE row (ks_stat, at_value, n_ref, n_cur).
    *
    * Exactness: counts are integers, each ECDF value is one IEEE
    * division, the statistic is a max — no floating sums anywhere, so
    * an independent engine reproduces it bit-for-bit (tie on the max
    * resolved toward the larger value by the struct ordering).
    *
    * Scale shape: per-value counts for BOTH sides in one shuffle,
    * then the global running ECDF via [[Packing.cumulativeMulti]] —
    * the range-bucketed distributed prefix sum (one window pass for
    * both counters, never a SinglePartition sort), totals as a
    * broadcast 1-row frame, one final max aggregate. Cost is
    * O(distinct values) after the first aggregate.
    */
  def ksDrift(reference: DataFrame, current: DataFrame,
      valueCol: String, buckets: Int = 64): DataFrame = {
    def counts(df: DataFrame, mine: String, other: String) = df
      .select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as(mine))
      .withColumn(other, lit(0L))
    // distinct-value-sized (bounded); materialized once — four
    // consumers otherwise replay the two input scans each (the
    // quantile probe, the bucket-totals collect, the broadcast
    // totals, and the final pass)
    val merged = counts(reference, "ca", "cb")
      .unionByName(counts(current, "cb", "ca"))
      .groupBy("v").agg(sum("ca").as("ca"), sum("cb").as("cb"))
      .localCheckpoint()
    val totals = merged.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val cum = Packing.cumulativeMulti(merged, "v", Seq("ca", "cb"), buckets)
    cum.crossJoin(broadcast(totals))
      .withColumn("__diff", abs(
        col("cum_ca").cast("double") / col("na") -
          col("cum_cb").cast("double") / col("nb")))
      .agg(max(struct(col("__diff").as("d"), col("v").as("v"))).as("s"),
        first(col("na")).as("na"), first(col("nb")).as("nb"))
      .select(round(col("s.d"), 6).as("ks_stat"), col("s.v").as("at_value"),
        col("na").cast("long").as("n_ref"), col("nb").cast("long").as("n_cur"))
  }

  /** Chunk-level table checksum (pt-table-checksum shape): rows hash
    * row-locally into a 60-bit MD5-derived digest, chunks (pk ranges)
    * XOR them order-independently — so validating a replicated table
    * moves ONE digest row per chunk across the wire, never data. The
    * digest is engine-portable by construction (MD5 of a canonical
    * 0x01-for-NULL, 0x1f-separated string; XOR has no overflow and no
    * ordering), which is the whole point: the sink database computes
    * the same digests in its own SQL dialect and only mismatched
    * chunks are re-replicated or row-diffed (see [[diff]] for the
    * co-located row-level form).
    *
    * `cols` should render identically via CAST-to-string in every
    * engine involved (integers, strings, fixed-decimal doubles);
    * include the PK so duplicate rows cannot XOR-cancel.
    * Returns (chunk, n_rows, digest).
    */
  /** The canonical engine-portable row digest (ONE definition, shared
    * by [[tableChecksum]] and `Profiling.shardManifest` so dq7 and
    * man1 digests can never drift apart): 0x1f-separated CAST-to-
    * string rendering with 0x01 for NULL, 60 bits of MD5 as a long. */
  private[operators] def rowDigest(cols: Seq[Column]): Column = {
    val canon = concat_ws("\u001f",
      cols.map(c => coalesce(c.cast("string"), lit("\u0001"))): _*)
    conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
  }

  def tableChecksum(df: DataFrame, chunkCol: String, chunkSize: Long,
      cols: Seq[String]): DataFrame = {
    require(chunkSize >= 1, s"chunkSize=$chunkSize")
    require(cols.nonEmpty, "need at least one column to checksum")
    val rowHash = rowDigest(cols.map(col))
    df.select(floor(col(chunkCol) / chunkSize).cast("long").as("chunk"),
        rowHash.as("__h"))
      .groupBy("chunk")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("digest"))
  }

  /** Compare two [[tableChecksum]] outputs: one row per chunk present
    * on either side, with count and digest verdicts — the replication
    * validation report. Missing chunks report zero rows and a null
    * digest; `chunk_ok` is true only when counts AND digests agree.
    */
  def checksumCompare(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = src.select(col("chunk"), col("n_rows").as("n_src"),
      col("digest").as("digest_src"))
    val d = dst.select(col("chunk"), col("n_rows").as("n_dst"),
      col("digest").as("digest_dst"))
    s.join(d, Seq("chunk"), "full_outer")
      .select(col("chunk"),
        coalesce(col("n_src"), lit(0L)).as("n_src"),
        coalesce(col("n_dst"), lit(0L)).as("n_dst"),
        (coalesce(col("n_src"), lit(0L)) === coalesce(col("n_dst"), lit(0L)) &&
          col("digest_src") <=> col("digest_dst")).as("chunk_ok"))
  }

  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty)
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      count(when(pred, 1)).as(s"__v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check_name"), col(s"__v_$i").as("n_violations"))
    }
    one.select(explode(array(stacked: _*)).as("c")).select("c.*")
  }

  /** Approximate functional-dependency profiling: for each candidate
    * FD det → dep, how far the data is from satisfying it. A
    * determinant group VIOLATES when it maps to more than one
    * dependent value; the violation count is the g3 measure — the
    * minimum number of rows to delete so the FD holds exactly
    * (rows − Σ per-group majority count). NULLs count as a value
    * (SQL grouping semantics, both engines agree).
    *
    * The majority dependent per group is elected deterministically:
    * largest count, ties broken by smallest dependent value — a
    * min(struct(-cnt, dep)) aggregate, no window.
    *
    * Scale shape, per candidate FD: groupBy(det, dep) collapses the
    * table to its distinct mapping pairs (map-side combined), then
    * groupBy(det) reduces those to one counter row per determinant —
    * two partial-agg shuffles over DISTINCT-pair cardinality, never
    * the raw table twice. Candidates run independently and union.
    *
    * Output: one row per FD — (determinant, dependent, n_rows,
    * n_groups, violating_groups, violating_rows, violation_rate
    * rounded to 6; holds = violating_rows == 0). */
  def fdProfile(df: DataFrame, fds: Seq[(String, String)]): DataFrame = {
    require(fds.nonEmpty, "need at least one candidate FD")
    val results = fds.map { case (det, dep) =>
      val pairs = df.groupBy(
          col(det).cast("string").as("__det"),
          col(dep).cast("string").as("__dep"))
        .agg(count(lit(1)).as("__n"))
      val groups = pairs.groupBy("__det")
        .agg(sum("__n").as("__gn"),
          count(lit(1)).as("__vals"),
          min(struct((-col("__n")).as("negn"), col("__dep").as("dep")))
            .as("__maj"))
        .select(col("__gn"), col("__vals"),
          (col("__gn") + col("__maj.negn")).as("__viol"))
      groups.agg(
          sum("__gn").as("n_rows"),
          count(lit(1)).as("n_groups"),
          sum(when(col("__vals") > 1, 1L).otherwise(0L)).as("violating_groups"),
          sum("__viol").as("violating_rows"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_rows"), col("n_groups"), col("violating_groups"),
          col("violating_rows"),
          round(col("violating_rows").cast("double") /
            col("n_rows").cast("double"), 6).as("violation_rate"),
          (col("violating_rows") === 0L).as("holds"))
    }
    results.reduce(_.union(_))
  }

  /** Candidate-key / uniqueness profiling — [[fdProfile]]'s sibling
    * for the OTHER schema question ("which column sets identify a
    * row?"): per candidate column set, the exact distinct-combination
    * count, the uniqueness ratio, and the is_key verdict. NULL
    * combinations count as values (grouping semantics, consistent
    * with fdProfile), so a "key" with NULLs is only a key if the
    * NULL row is unique too.
    *
    * Scale shape per candidate: one map-side-combined groupBy over
    * the combination, one 1-row reduce — exact, never a sketch;
    * swap in HLL ([[graft.operators.Profiling]]) for monitoring-grade
    * cardinality at lower cost. */
  def keyProfile(df: DataFrame, candidates: Seq[Seq[String]]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate column set")
    val results = candidates.map { cols0 =>
      require(cols0.nonEmpty, "empty candidate column set")
      val grouped = df.groupBy(
          cols0.map(c => col(c).cast("string").as(s"__k_$c")): _*)
        .agg(count(lit(1)).as("__n"))
      grouped.agg(sum("__n").as("n_rows"), count(lit(1)).as("n_distinct"))
        .select(lit(cols0.mkString(",")).as("columns"),
          col("n_rows"), col("n_distinct"),
          round(col("n_distinct").cast("double") /
            col("n_rows").cast("double"), 6).as("uniqueness"),
          (col("n_distinct") === col("n_rows")).as("is_key"))
    }
    results.reduce(_.union(_))
  }
}
