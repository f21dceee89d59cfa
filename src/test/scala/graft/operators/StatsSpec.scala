package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AnalyticsShapesSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("transitions: exact counts and row-normalized probabilities") {
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "B"))
      .toDF("u", "ord", "t")
    val out = Sequences.transitions(ev, "u", Seq("ord"), "t")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("A", "B")) == ((3L, 1.0)))   // A always goes to B
    assert(out(("B", "A")) == ((1L, 1.0)))   // the only closed B pair
    assert(out.size == 2)                    // trailing events pair with nothing
  }

  test("benford: digit extraction floors, excludes sub-1, fills empty digits") {
    val df = Seq(1.5, 19.0, 100.0, 2.5, 0.5, -35.0).toDF("v")
    val out = DataQuality.benford(df, "v")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.size == 9)                     // full spine 1..9
    assert(out(1).getAs[Long]("n") == 3L)     // 1.5, 19, 100
    assert(out(2).getAs[Long]("n") == 1L)     // 2.5 floors to 2, not 3
    assert(out(3).getAs[Long]("n") == 1L)     // |-35| = 35
    assert(out(4).getAs[Long]("n") == 0L)
    assert(out(1).getAs[Double]("obs_share") == 0.6)
    assert(out(1).getAs[Double]("exp_share") == 0.30103)
    // chi2 terms are non-negative and zero only when obs == exp
    assert(out.values.forall(_.getAs[Double]("chi2_term") >= 0.0))
  }

  test("wilson interval brackets the rate and shrinks with n") {
    // direct formula check at n=100, k=50, z=1.96
    val z = 1.96; val n = 100.0; val p = 0.5
    val denom = 1.0 + z * z / n
    val center = (p + z * z / (2 * n)) / denom
    val half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert(math.abs((center - half) - 0.40383) < 1e-4)
    assert(math.abs((center + half) - 0.59617) < 1e-4)
    assert(center - half > 0.0 && center + half < 1.0)
  }

  test("entropy: uniform hits ln k, constant hits zero") {
    val df = (1 to 40).map(i => ("u", s"v${i % 4}")) ++
      (1 to 10).map(_ => ("c", "only"))
    val out = Profiling.entropy(df.toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("u").getAs[Long]("n_distinct") == 4L)
    assert(math.abs(out("u").getAs[Double]("entropy_nats") - math.log(4)) < 1e-6)
    assert(out("c").getAs[Double]("entropy_nats") == 0.0)
  }
}

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("allocateProportional: zero residue, largest remainders win") {
    // 100 across weights 1/1/1: floors 33 each, 1 leftover -> all
    // remainders tie at 1/3, smallest id gets the extra cent
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L),
      ("h", 1L, 3L), ("h", 2L, 7L)) // 100 by 3:7 -> 30/70 exact
      .toDF("grp", "id", "w").withColumn("total", lit(100L))
    val out = Stats.allocateProportional(df, Seq("grp"), "id",
      col("w"), col("total"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Long]("allocated")).toMap
    assert(out(("g", 1L)) == 34L && out(("g", 2L)) == 33L
      && out(("g", 3L)) == 33L)
    assert(out(("h", 1L)) == 30L && out(("h", 2L)) == 70L)
    // invariant: allocations tile the total exactly for every group
    assert(out.toSeq.groupBy(_._1._1).forall(_._2.map(_._2).sum == 100L))
  }

  test("weightedMedian follows the weight mass, lower-median on ties") {
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 10L),
      ("h", 1.0, 1L), ("h", 2.0, 1L)).toDF("g", "v", "w")
    val out = Stats.weightedMedian(df, Seq("g"), "v", col("w"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out("g") == ((3.0, 12L))) // 10 of 12 units sit at 3.0
    assert(out("h") == ((1.0, 2L)))  // lower median on the even split
  }

  test("purgeKeys erases, audits zero for never-present keys") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
      .toDF("uid", "x")
    val (purged, manifest) = Modes.purgeKeys(df, "uid",
      Seq(1L, 9L).toDF("uid"))
    assert(purged.select("uid").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val m = manifest.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 2L, 9L -> 0L))
    intercept[IllegalArgumentException](
      Modes.purgeKeys(df, "uid", Seq((1L, 2L)).toDF("a", "b")))
  }

  test("welchTTest matches the hand-computed statistic on a tiny fixture") {
    // arm0 = [1,2,3] (mean 2, var 1), arm1 = [2,4,6,8] (mean 5, var 20/3)
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 2L), (1, 4L), (1, 6L), (1, 8L))
      .toDF("arm", "v").withColumn("g", lit("m"))
    val r = Stats.welchTTest(df, Seq("g"), col("arm"), col("v")).collect()(0)
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 4L)
    assert(r.getAs[Double]("mean_a") === 2.0)
    assert(r.getAs[Double]("mean_b") === 5.0)
    // t = (2-5)/sqrt(1/3 + (20/3)/4) = -3/sqrt(2)
    assert(math.abs(r.getAs[Double]("t_stat") - (-3.0 / math.sqrt(2.0))) < 1e-6)
    // Welch–Satterthwaite: 2^2 / ((1/3)^2/2 + (5/3)^2/3) = 4.075471...
    assert(math.abs(r.getAs[Double]("df_welch") - 4.075472) < 1e-6)
  }

  test("welchTTest scale divides sums back to metric units") {
    val df = Seq((0, 100L), (0, 300L), (1, 200L), (1, 600L))
      .toDF("arm", "v").withColumn("g", lit("m"))
    val r = Stats.welchTTest(df, Seq("g"), col("arm"), col("v"),
      scale = 100.0).collect()(0)
    assert(r.getAs[Double]("mean_a") === 2.0 && r.getAs[Double]("mean_b") === 4.0)
  }

  test("chiSquare2x2 matches the closed form and counts cells correctly") {
    // a=10 (arm0 conv), b=20, c=20, d=10 -> chi2 = 60*300^2/30^4 = 20/3
    val rows = Seq.fill(10)((0, 1)) ++ Seq.fill(20)((0, 0)) ++
      Seq.fill(20)((1, 1)) ++ Seq.fill(10)((1, 0))
    val r = Stats.chiSquare2x2(rows.toDF("arm", "out"), Seq.empty,
      col("arm"), col("out")).collect()(0)
    assert(r.getAs[Long]("conv_a") === 10L && r.getAs[Long]("noconv_a") === 20L)
    assert(r.getAs[Long]("conv_b") === 20L && r.getAs[Long]("noconv_b") === 10L)
    assert(math.abs(r.getAs[Double]("chi2") - 20.0 / 3.0) < 1e-6)
  }

  test("chiSquare2x2 emits NULL on a zero marginal instead of raising") {
    val rows = Seq.fill(5)((0, 1)) ++ Seq.fill(5)((1, 1)) // nobody unconverted
    val r = Stats.chiSquare2x2(rows.toDF("arm", "out"), Seq.empty,
      col("arm"), col("out")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("welchTTest: degenerate slices emit NULL, off-arm rows drop") {
    val df = Seq(
      // group "solo": arm 1 has a single observation -> t/df undefined
      ("solo", 0, 1L), ("solo", 0, 3L), ("solo", 1, 7L),
      // group "const": both arms constant -> zero pooled SE
      ("const", 0, 5L), ("const", 0, 5L), ("const", 1, 5L), ("const", 1, 5L),
      // group "third": arm 2 must NOT merge into arm B
      ("third", 0, 1L), ("third", 0, 2L), ("third", 1, 8L), ("third", 1, 9L),
      ("third", 2, 1000L))
      .toDF("g", "arm", "v")
    val out = Stats.welchTTest(df, Seq("g"), col("arm"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("solo").isNullAt(out("solo").fieldIndex("t_stat")))
    assert(out("solo").getAs[Double]("mean_b") === 7.0)
    assert(out("const").isNullAt(out("const").fieldIndex("t_stat")))
    assert(out("const").isNullAt(out("const").fieldIndex("df_welch")))
    assert(out("third").getAs[Long]("n_b") === 2L) // arm 2 excluded
    assert(out("third").getAs[Double]("mean_b") === 8.5)
  }

  test("corrMatrix/olsFit: constant columns yield NULL, not a query abort") {
    val df = (1L to 10L).map(x => (x, 2 * x, 7L)).toDF("x", "y", "k")
    val corr = Stats.corrMatrix(df, Seq(
      "x" -> col("x"), "y" -> col("y"), "k" -> col("k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(corr(("x", "y")).contains(1.0)) // healthy pair unaffected
    assert(corr(("x", "k")).isEmpty && corr(("y", "k")).isEmpty)
    val ols = Stats.olsFit(df.withColumn("g", lit("g")), Seq("g"),
      col("k"), col("y")).collect()(0) // constant x
    assert(ols.isNullAt(ols.fieldIndex("slope")))
    assert(ols.isNullAt(ols.fieldIndex("r2")))
  }

  test("cuped: constant covariate falls back to the raw mean, NULL theta") {
    val units = Seq((0L, 5L, 10L), (0L, 5L, 14L), (1L, 5L, 20L), (1L, 5L, 22L))
      .toDF("arm", "x", "y")
    val out = Stats.cuped(units, col("arm"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).isNullAt(out(0L).fieldIndex("theta")))
    assert(out(0L).getAs[Double]("mean_y_adj") === 12.0)
    assert(out(1L).getAs[Double]("mean_y_adj") === 21.0)
  }

  test("cuped: theta recovers the pooled slope; balanced arms unadjusted") {
    // y = 2x + 10 + 10*arm, identical x across arms -> theta = 2 and
    // the adjustment is a no-op (x̄ₐ == x̄), raw contrast preserved
    val units = (1L to 5L).flatMap(x =>
      Seq((0L, x, 2 * x + 10), (1L, x, 2 * x + 20))).toDF("arm", "x", "y")
    val out = Stats.cuped(units, col("arm"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Double]("theta") === 2.0)
    assert(out(0L).getAs[Double]("mean_y") === 16.0)
    assert(out(0L).getAs[Double]("mean_y_adj") === 16.0)
    assert(out(1L).getAs[Double]("mean_y_adj") === 26.0)
  }

  test("cuped removes a pure pre-period imbalance entirely") {
    // y == x (no treatment effect) but arm 1 starts with bigger x:
    // raw means differ by 3, adjusted means are both x̄ exactly
    val units = ((1L to 5L).map(x => (0L, x, x)) ++
      (4L to 8L).map(x => (1L, x, x))).toDF("arm", "x", "y")
    val out = Stats.cuped(units, col("arm"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Double]("theta") === 1.0)
    assert(out(0L).getAs[Double]("rho2") === 1.0)
    assert(out(0L).getAs[Double]("mean_y") === 3.0)
    assert(out(1L).getAs[Double]("mean_y") === 6.0)
    assert(out(0L).getAs[Double]("mean_y_adj") === 4.5) // pooled x̄
    assert(out(1L).getAs[Double]("mean_y_adj") === 4.5)
  }

  test("corrMatrix: one pass, exact ±1 on linear columns") {
    val df = (1L to 10L).map(x => (x, 2 * x, 11 - x, x * x))
      .toDF("x", "y", "z", "q")
    val out = Stats.corrMatrix(df, Seq(
      "x" -> col("x"), "y" -> col("y"), "z" -> col("z"), "q" -> col("q")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr"))
      .toMap
    assert(out.size === 6)
    assert(out(("x", "y")) === 1.0)   // y = 2x
    assert(out(("x", "z")) === -1.0)  // z = 11 - x
    assert(out(("y", "z")) === -1.0)
    // x vs x² on 1..10: strong but not perfect
    assert(out(("x", "q")) > 0.9 && out(("x", "q")) < 1.0)
  }

  test("olsFit recovers an exact linear relationship") {
    val df = (1L to 50L).map(x => ("g", x, 2 * x + 1)).toDF("g", "x", "y")
    val r = Stats.olsFit(df, Seq("g"), col("x"), col("y")).collect()(0)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 1.0)
    assert(r.getAs[Double]("r2") === 1.0)
  }

  test("olsFit scales fixed-point inputs back to metric units") {
    // y stored in cents of 2x+1 -> slope/intercept in units after yScale
    val df = (1L to 50L).map(x => ("g", x, (2 * x + 1) * 100))
      .toDF("g", "x", "y")
    val r = Stats.olsFit(df, Seq("g"), col("x"), col("y"),
      yScale = 100.0).collect()(0)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 1.0)
  }

  test("cohensKappa: textbook table, null ratings out, degenerate pe=1") {
    // cells: (a,a)x4 (a,b)x1 (b,b)x3 (b,a)x2 -> po=0.7,
    // marginals m1(a)=5 m1(b)=5, m2(a)=6 m2(b)=4 -> pe=0.5, kappa=0.4
    val rows = Seq.fill(4)(("a", "a")) ++ Seq(("a", "b")) ++
      Seq.fill(3)(("b", "b")) ++ Seq.fill(2)(("b", "a")) ++
      Seq((null, "a"), ("a", null))          // unrated rows excluded
    val r = Stats.cohensKappa(rows.toDF("r1", "r2"), col("r1"), col("r2"))
      .collect()(0)
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("n_agree") == 7L)
    assert(r.getAs[Double]("p_observed") == 0.7)
    assert(r.getAs[Double]("p_expected") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4)
    // constant raters: pe = 1 -> NULL kappa, not a divide fault
    val const = Stats.cohensKappa(
      Seq(("x", "x"), ("x", "x")).toDF("r1", "r2"), col("r1"), col("r2"))
      .collect()(0)
    assert(const.isNullAt(const.fieldIndex("kappa")))
  }

  test("paretoFront == quadratic dominance on a planted set, any bucket count") {
    // deterministic pseudo-random points plus planted structure:
    // duplicates of a frontier point, a same-x dominated point, nulls
    val pts = (1L to 200L).map { i =>
      val x = (i * 37 % 101).toDouble
      val y = (i * 53 % 97).toDouble
      (i, x, y)
    } ++ Seq((201L, 100.0, 96.0), (202L, 100.0, 96.0), // frontier twins
      (203L, 100.0, 1.0),                              // same-x dominated
      (204L, Double.MaxValue, -1.0))                   // extreme corner
    val df = pts.toDF("id", "x", "y")
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y) }
    }.map(_._1).toSet
    for (b <- Seq(1, 4, 64)) {
      val got = Stats.paretoFront(df, "x", "y", buckets = b)
        .collect().map(_.getLong(0)).toSet
      assert(got == brute, s"buckets=$b")
    }
    // both duplicate frontier rows survive; the dominated same-x row dies
    assert(brute.contains(201L) && brute.contains(202L) && !brute.contains(203L))
  }

  test("paretoFront drops null coordinates, keeps original columns") {
    val df = Seq((1L, Some(1.0), Some(1.0), "keep"),
      (2L, None, Some(9.0), "nullx"),
      (3L, Some(9.0), None, "nully"))
      .toDF("id", "x", "y", "tag")
    val out = Stats.paretoFront(df, "x", "y").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out(0).getAs[String]("tag") == "keep")
  }
}
