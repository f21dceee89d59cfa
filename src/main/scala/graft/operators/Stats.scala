package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment statistics (beyond-parity): the A/B-test readouts every
  * product-analytics stack computes over its event store — Welch's
  * unequal-variance t-test per metric slice, the 2×2 chi-square test
  * of independence for conversion, and closed-form OLS regression per
  * group. The reference engine has no statistics surface; these are
  * the standard companions to its aggregation queries.
  *
  * Exactness contract (what makes these oracle-MATCHable): callers
  * pass INTEGER-valued metric columns (scale fixed-decimal inputs,
  * e.g. `round(value * 100)`). Every aggregation is then an exact
  * LongType sum — no float summation-order drift — and the final
  * statistics are computed from those exact per-group scalars with a
  * fixed double-precision expression tree, so any engine replaying
  * the same algebra reproduces them bit-for-bit (outputs still
  * rounded to 6 places as a guard).
  *
  * Scale shape: one map-side-combined aggregate per call — conditional
  * sums collapse each group to a single row of counters (no pivot, no
  * second pass, no driver math). Groups ≪ rows, so the shuffle carries
  * counter rows only.
  */
object Stats {

  /** Welch's two-sample t-test of `valueCol` between `armCol` = 0 and
    * `armCol` = 1, per `groupCols` slice: arm sizes and means, the t
    * statistic, and the Welch–Satterthwaite degrees of freedom.
    * `valueCol` must be integral (see exactness contract); `scale` is
    * the fixed-point divisor that converts sums back to metric units
    * (e.g. 100.0 for a cents-scaled metric).
    */
  def welchTTest(df: DataFrame, groupCols: Seq[String], armCol: Column,
      valueCol: Column, scale: Double = 1.0): DataFrame = {
    val v = valueCol.cast("long")
    val arm0 = armCol === 0
    // two-arm contract, enforced not assumed: rows outside arms {0,1}
    // drop (matching chiSquare2x2) instead of silently merging into
    // arm B
    val twoArm = df.filter(arm0 || armCol === 1)
    val agg = twoArm.groupBy(groupCols.map(col): _*).agg(
      sum(when(arm0, lit(1L)).otherwise(0L)).as("__n0"),
      sum(when(!arm0, lit(1L)).otherwise(0L)).as("__n1"),
      sum(when(arm0, v).otherwise(0L)).as("__s0"),
      sum(when(!arm0, v).otherwise(0L)).as("__s1"),
      sum(when(arm0, v * v).otherwise(0L)).as("__q0"),
      sum(when(!arm0, v * v).otherwise(0L)).as("__q1"))
    // All doubles below derive from exact integer scalars through one
    // fixed expression tree — engine-reproducible (see scaladoc).
    val n0 = col("__n0").cast("double"); val n1 = col("__n1").cast("double")
    val s0 = col("__s0").cast("double"); val s1 = col("__s1").cast("double")
    val q0 = col("__q0").cast("double"); val q1 = col("__q1").cast("double")
    val m0 = s0 / n0 / scale
    val m1 = s1 / n1 / scale
    // var_samp in metric units: (Σv² − (Σv)²/n) / (n−1) / scale²
    val v0 = (q0 - s0 * s0 / n0) / (n0 - 1.0) / (scale * scale)
    val v1 = (q1 - s1 * s1 / n1) / (n1 - 1.0) / (scale * scale)
    val se0 = v0 / n0
    val se1 = v1 / n1
    // squares via explicit multiply, not pow(): IEEE *, / and sqrt are
    // correctly rounded everywhere; libm pow() is not.
    // Degenerate slices (an arm below 2 observations, or both arms
    // constant so the pooled standard error is 0) emit NULL — under
    // ANSI mode the unguarded division would abort the whole query
    val defined = col("__n0") >= 2 && col("__n1") >= 2
    val tStat = (m0 - m1) / sqrt(se0 + se1)
    val dfW = (se0 + se1) * (se0 + se1) /
      (se0 * se0 / (n0 - 1.0) + se1 * se1 / (n1 - 1.0))
    // nested when, not a fused &&: the count check must decide BEFORE
    // se0/se1 (which divide by n0/n1) are ever evaluated
    def guard(c: Column): Column =
      when(defined, when(se0 + se1 > 0.0, c)).cast("double")
    agg.select(
      groupCols.map(col) ++ Seq(
        col("__n0").as("n_a"), col("__n1").as("n_b"),
        round(when(col("__n0") >= 1, m0).cast("double"), 6).as("mean_a"),
        round(when(col("__n1") >= 1, m1).cast("double"), 6).as("mean_b"),
        round(guard(tStat), 6).as("t_stat"),
        round(guard(dfW), 6).as("df_welch")): _*)
  }

  /** 2×2 chi-square test of independence between a binary `armCol`
    * (0/1) and a binary `outcomeCol` (0/1), per `groupCols` slice
    * (global when empty): the four cell counts and the chi-square
    * statistic N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)), 1 df. Cell
    * products stay inside exact-integer double range for any
    * realistic slice (cells < 2^26). */
  def chiSquare2x2(df: DataFrame, groupCols: Seq[String], armCol: Column,
      outcomeCol: Column): DataFrame = {
    val cell = (a: Int, o: Int) =>
      sum(when(armCol === a && outcomeCol === o, 1L).otherwise(0L))
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      cell(0, 1).as("__a"), cell(0, 0).as("__b"),
      cell(1, 1).as("__c"), cell(1, 0).as("__d"))
    val a = col("__a").cast("double"); val b = col("__b").cast("double")
    val c = col("__c").cast("double"); val d = col("__d").cast("double")
    val n = a + b + c + d
    val det = a * d - b * c
    val denom = (a + b) * (c + d) * (a + c) * (b + d)
    // a zero marginal makes the statistic undefined (and would raise
    // under ANSI division) — emit NULL, the conventional readout
    val chi2 = when(denom === 0.0, lit(null).cast("double"))
      .otherwise(n * det * det / denom)
    agg.select(
      groupCols.map(col) ++ Seq(
        col("__a").as("conv_a"), col("__b").as("noconv_a"),
        col("__c").as("conv_b"), col("__d").as("noconv_b"),
        round(chi2, 6).as("chi2")): _*)
  }

  /** Exact lower weighted median per group: the smallest value v with
    * cumulative weight(≤ v) ≥ half the total — "the price at which
    * half the QUANTITY sold", which a plain median over rows gets
    * wrong whenever weights vary. Values collapse to DISTINCT (group,
    * value) weight sums first, so the per-group window walks distinct
    * values (bounded by value cardinality, not row count) and ties
    * need no tiebreak. `weightCol` must be integral (class exactness
    * contract) — 2·cum ≥ total compares exact integers, no epsilon. */
  def weightedMedian(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: Column): DataFrame = {
    val agg = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(sum(weightCol.cast("long")).as("__w"))
    val win = Window
      .partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
    val tot = Window.partitionBy(groupCols.map(col): _*)
    agg
      .withColumn("__cum", sum("__w").over(win))
      .withColumn("__tot", sum("__w").over(tot))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(valueCol)).as("weighted_median"),
        max(col("__tot")).as("total_weight"))
  }

  /** Exact proportional allocation by largest remainder (Hamilton
    * method): split each group's integer `totalCol` across its rows
    * in proportion to integer `weightCol`, with NO residue — floor
    * shares first, then one extra unit to the rows with the largest
    * fractional remainders (ties by id so the split is
    * engine-stable). The invoice/budget/credit splitter: naive
    * rounding leaves cents on the floor or mints them.
    *
    * Exactness: share = total·w (exact integer product) divided by
    * the group weight — floor and remainder both integer ops;
    * remainder ranking compares the exact integer `total·w mod W`,
    * never a float. One per-group window pass. Products must stay
    * inside int64: require total·max(w) < 2^63 (loud at runtime via
    * ANSI overflow). */
  def allocateProportional(df: DataFrame, groupCols: Seq[String],
      idCol: String, weightCol: Column, totalCol: Column): DataFrame = {
    val w = weightCol.cast("long"); val t = totalCol.cast("long")
    val winG = Window.partitionBy(groupCols.map(col): _*)
    // `div` (IntegralDivide), NOT `/`: long / long is a DOUBLE divide
    // in Spark and silently loses exactness past 2^53
    val staged = df
      .withColumn("__w", w).withColumn("__t", t)
      .withColumn("__sw", sum(col("__w")).over(winG))
      .withColumn("__prod", col("__t") * col("__w"))
      .withColumn("__base", expr("__prod div __sw"))
      .withColumn("__rem", pmod(col("__prod"), col("__sw")))
    val short = col("__t") - sum(col("__base")).over(winG)
    val rk = row_number().over(
      Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col("__rem").desc, col(idCol).asc))
    staged.select(groupCols.map(col) ++ Seq(col(idCol),
      col("__w").as("weight"),
      (col("__base") + when(rk <= short, 1L).otherwise(0L))
        .as("allocated")): _*)
  }

  /** CUPED variance reduction (controlled-experiment using
    * pre-experiment data): adjust each arm's post-period mean by the
    * pooled regression of post metric `yCol` on pre-period covariate
    * `xCol` — ȳ'ₐ = ȳₐ − θ(x̄ₐ − x̄), θ = cov(x,y)/var(x). Randomized
    * arms have equal x̄ in expectation, so the adjustment removes
    * pre-existing-behavior variance (a fraction ρ² of it, reported)
    * without biasing the contrast. Input is one row per experiment
    * UNIT (already collapsed to its pre/post totals — the caller owns
    * the unit-of-randomization aggregation); x and y must be integral
    * (class exactness contract), `scale` converts back to metric
    * units.
    *
    * Scale shape: one pooled-moment aggregate (1 row, broadcast) +
    * one per-arm aggregate — two map-side-combined passes over unit
    * rows, no joins on data, no driver math. */
  def cuped(df: DataFrame, armCol: Column, xCol: Column, yCol: Column,
      scale: Double = 1.0): DataFrame = {
    val x = xCol.cast("long"); val y = yCol.cast("long")
    val pooled = broadcast(df.agg(
      count(lit(1)).as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(x * y).as("__sxy"),
      sum(y * y).as("__syy")))
    val perArm = df.groupBy(armCol.as("arm")).agg(
      count(lit(1)).as("__na"),
      sum(x).as("__sxa"), sum(y).as("__sya"))
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val sxy = col("__sxy").cast("double")
    val syy = col("__syy").cast("double")
    val cxx = sxx - sx * sx / n
    val cxy = sxy - sx * sy / n
    val cyy = syy - sy * sy / n
    // constant covariate (cxx = 0) -> no adjustment is possible; emit
    // the raw mean with NULL theta/rho2 instead of an ANSI divide error
    val theta = when(cxx > 0.0, cxy / cxx)
    val rho2 = when(cxx > 0.0 && cyy > 0.0, cxy * cxy / (cxx * cyy))
    val na = col("__na").cast("double")
    val meanY = col("__sya").cast("double") / na / scale
    val meanYAdj = (col("__sya").cast("double") / na -
      theta * (col("__sxa").cast("double") / na - sx / n)) / scale
    perArm.crossJoin(pooled).select(
      col("arm"), col("__na").as("n"),
      round(meanY, 6).as("mean_y"),
      round(coalesce(meanYAdj, meanY), 6).as("mean_y_adj"),
      round(theta, 6).cast("double").as("theta"),
      round(rho2, 6).cast("double").as("rho2"))
  }

  /** Pairwise Pearson correlation matrix over `inputs` (name →
    * integral column), upper triangle only: ONE aggregate pass
    * collects every sum / square / cross product (k columns → k(k+3)/2
    * exact-integer counters in a single 1-row frame), then each
    * pair's correlation derives from those scalars — never k² passes
    * over the data, no driver math. Correlation is scale-invariant,
    * so fixed-point inputs change nothing mathematically while
    * keeping the sums exact (see the class exactness contract). */
  def corrMatrix(df: DataFrame, inputs: Seq[(String, Column)]): DataFrame = {
    require(inputs.size >= 2, "corrMatrix needs at least two columns")
    val names = inputs.map(_._1)
    require(names.distinct.size == names.size, "duplicate input names")
    val vs = inputs.map { case (n, c) => n -> c.cast("long") }.toMap
    val sumAggs = names.map(n => sum(vs(n)).as(s"__s_$n"))
    val crossAggs = for {
      i <- names.indices; j <- i until names.length
    } yield sum(vs(names(i)) * vs(names(j))).as(s"__p_${names(i)}_${names(j)}")
    val agg = df.agg(count(lit(1)).as("__n"),
      (sumAggs ++ crossAggs): _*)
    val n = col("__n").cast("double")
    def s(a: String) = col(s"__s_$a").cast("double")
    def p(a: String, b: String) = col(s"__p_${a}_$b").cast("double")
    def cmoment(a: String, b: String) = p(a, b) - s(a) * s(b) / n
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.length
    } yield struct(
      lit(names(i)).as("col_x"), lit(names(j)).as("col_y"),
      // a constant column has zero variance: its correlations are
      // undefined -> NULL, and must not ANSI-abort the other pairs
      round(when(
        cmoment(names(i), names(i)) > 0.0 && cmoment(names(j), names(j)) > 0.0,
        cmoment(names(i), names(j)) /
          sqrt(cmoment(names(i), names(i)) * cmoment(names(j), names(j)))), 6)
        .cast("double").as("corr"))
    agg.select(col("__n").as("n"), explode(array(pairs: _*)).as("pr"))
      .select(col("pr.col_x").as("col_x"), col("pr.col_y").as("col_y"),
        col("n"), col("pr.corr").as("corr"))
  }

  /** Closed-form simple OLS of `yCol` on `xCol` per `groupCols`:
    * slope, intercept, and r² from centered second moments. Inputs
    * must be integral (exactness contract); `xScale`/`yScale` convert
    * the fixed-point sums back to metric units. Centered form (two
    * exact sums + means, then Σ(x−x̄)(y−ȳ) algebra on exact scalars)
    * avoids the catastrophic cancellation of n·Σxy − Σx·Σy at scale.
    * One aggregate pass: the raw sums are exact integers, and the
    * centering happens in the final scalar algebra, not per row. */
  def olsFit(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column, xScale: Double = 1.0, yScale: Double = 1.0): DataFrame = {
    val x = xCol.cast("long"); val y = yCol.cast("long")
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
      sum(x * y).as("__sxy"))
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val syy = col("__syy").cast("double")
    val sxy = col("__sxy").cast("double")
    // Centered moments from exact sums: Sxx_c = Σx² − (Σx)²/n etc.
    val cxx = sxx - sx * sx / n
    val cyy = syy - sy * sy / n
    val cxy = sxy - sx * sy / n
    // constant x (cxx = 0): the line is vertical/undefined -> NULL
    // row values rather than an ANSI divide error; constant y makes
    // r2 undefined the same way
    val slope = when(cxx > 0.0, cxy / cxx * (xScale / yScale))
    val meanX = sx / n / xScale
    val meanY = sy / n / yScale
    val intercept = meanY - slope * meanX
    val r2 = when(cxx > 0.0 && cyy > 0.0, cxy * cxy / (cxx * cyy))
    agg.select(
      groupCols.map(col) ++ Seq(
        col("__n").as("n"),
        round(slope, 6).cast("double").as("slope"),
        round(intercept, 6).cast("double").as("intercept"),
        round(r2, 6).cast("double").as("r2")): _*)
  }

  /** Cohen's kappa — chance-corrected agreement between two raters
    * (label-quality QA for annotated training data):
    * κ = (p_o − p_e)/(1 − p_e) with p_o the observed agreement rate
    * and p_e = Σ_k (n_{1k}/n)(n_{2k}/n) the marginal chance
    * agreement. Rows where either rating is NULL are excluded (the
    * unrated case). Every count is an exact integer (p_e's numerator
    * is Σ n1·n2, a long), so the three final divides are a fixed
    * double tree. Constant-agreement degenerate case (p_e = 1) emits
    * NULL κ rather than an ANSI fault.
    *
    * Scale shape: one row-level aggregate (n, agreements) + two
    * marginal aggregates over CATEGORY cardinality + one category
    * join — never a rater×rater matrix materialization. The exact
    * p_e numerator Σ n1·n2 is bounded by n², so n must stay below
    * ~3·10⁹ rated rows (annotation sets are); past that, scale the
    * marginals to doubles and accept the ulp. */
  def cohensKappa(df: DataFrame, r1: Column, r2: Column): DataFrame = {
    val base = df.select(r1.cast("string").as("__r1"),
        r2.cast("string").as("__r2"))
      .filter(col("__r1").isNotNull && col("__r2").isNotNull)
      .localCheckpoint()
    val tot = base.agg(count(lit(1)).as("n"),
      sum(when(col("__r1") === col("__r2"), 1L).otherwise(0L)).as("n_agree"))
    val m1 = base.groupBy(col("__r1").as("cat")).agg(count(lit(1)).as("__n1"))
    val m2 = base.groupBy(col("__r2").as("cat")).agg(count(lit(1)).as("__n2"))
    val peNum = m1.join(m2, "cat")
      .agg(coalesce(sum(col("__n1") * col("__n2")), lit(0L)).as("__pe_num"))
    val po = col("n_agree").cast("double") / col("n").cast("double")
    val pe = col("__pe_num").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    tot.crossJoin(broadcast(peNum))
      .select(col("n"), col("n_agree"),
        round(po, 6).as("p_observed"),
        round(pe, 6).as("p_expected"),
        when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** 2-D Pareto frontier (skyline): every input row not dominated in
    * the MAXIMIZE-both sense — no other row has xCol >= x AND
    * yCol >= y with at least one strict. Minimize a dimension by
    * negating it at the call site. Exact duplicates of a frontier
    * point are all on the frontier (neither strictly beats the
    * other), matching the NOT EXISTS dominance definition the sf
    * oracle replays quadratically.
    *
    * The classic answer is a single global sort with a running max —
    * a SinglePartition bottleneck at scale. This runs DISTRIBUTED:
    * (1) one groupBy on x collapses the data to T(x) = max y per
    * distinct x; (2) that table is range-bucketed on x
    * (approxQuantile boundaries balance it; exactness never depends
    * on them) and a per-bucket DESC window computes the
    * within-bucket exclusive running max; (3) per-bucket maxima —
    * <= `buckets` rows — collect to the driver, turn into exclusive
    * cross-bucket prefix maxima, and broadcast back, giving
    * M(x) = max{T(x') : x' > x} with no global sort; (4) a row is on
    * the frontier iff y = T(x) and y > M(x). Shuffles: the groupBy,
    * the bucket window, one broadcast join back to the input — all
    * on the distinct-x table, never a cartesian.
    */
  def paretoFront(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val spark = df.sparkSession
    val pts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    // the distinct-x aggregate feeds three consumers (quantile probe,
    // bucket window, bucket-max collect) — checkpoint once so the
    // groupBy over the full input runs once, not three times
    val top = pts.groupBy(x.as("__x")).agg(max(y).as("__ty")).localCheckpoint()
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val boundaries =
      if (probs.isEmpty) Array.empty[Double]
      else top.stat.approxQuantile("__x", probs, 0.001)
    val bucket: Column = boundaries.distinct.foldLeft(lit(0)) {
      case (acc, b) => acc + when(col("__x") > b, 1).otherwise(0)
    }
    val local = top.withColumn("__bucket", bucket)
    val w = Window.partitionBy("__bucket").orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = local.withColumn("__ml",
      coalesce(max(col("__ty")).over(w), lit(Double.NegativeInfinity)))
    // per-bucket maxima: <= `buckets` rows by construction
    val bucketMax = local.groupBy("__bucket").agg(max("__ty").as("__bm"))
      .orderBy(col("__bucket").desc).collect()
    var acc = Double.NegativeInfinity
    val offsetRows = bucketMax.map { r =>
      // exclusive prefix from HIGHER buckets (x sorts ascending into
      // buckets, dominance comes from larger x)
      val row = org.apache.spark.sql.Row(r.getInt(0), acc)
      acc = math.max(acc, r.getDouble(1))
      row
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__bucket",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__off",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), offSchema)
    val frontier = withLocal.join(broadcast(offsets), "__bucket")
      .withColumn("__my", greatest(col("__ml"), col("__off")))
      .filter(col("__ty") > col("__my"))
      .select(col("__x"), col("__ty"))
    // equi-join back on (x, y); the frontier is typically tiny (AQE
    // broadcasts it) but CAN be O(distinct x) adversarially, so the
    // broadcast is not forced
    pts.join(frontier, x === col("__x") && y === col("__ty"))
      .drop("__x", "__ty")
  }
}
