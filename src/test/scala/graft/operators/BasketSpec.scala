package graft.operators

import graft.SparkTestBase

class BasketSpec extends SparkTestBase {
  import spark.implicits._

  test("associationRules counts pairs, margins, and ratios exactly") {
    // b1={x,y,z}, b2={x,y}, b3={x} (duplicate row collapses)
    val df = Seq(("b1", "x"), ("b1", "y"), ("b1", "z"),
      ("b2", "x"), ("b2", "y"), ("b3", "x"), ("b3", "x"))
      .toDF("basket", "item")
    val out = Basket.associationRules(df, "basket", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size === 3)
    val xy = out(("x", "y"))
    assert(xy.getAs[Long]("n_pair") === 2L)
    assert(xy.getAs[Long]("n_a") === 3L && xy.getAs[Long]("n_b") === 2L)
    assert(xy.getAs[Double]("support") === 0.666667)
    assert(xy.getAs[Double]("conf_a_b") === 0.666667) // 2/3
    assert(xy.getAs[Double]("conf_b_a") === 1.0)      // 2/2
    assert(xy.getAs[Double]("lift") === 1.0)          // 3*2/(3*2)
    assert(out(("y", "z")).getAs[Long]("n_pair") === 1L)
  }

  test("baskets above the size cap are dropped entirely") {
    val big = (1 to 4).map(i => ("big", s"i$i"))
    val df = (Seq(("b1", "x"), ("b1", "y")) ++ big).toDF("basket", "item")
    val out = Basket.associationRules(df, "basket", "item",
      maxBasketSize = 3)
    val pairs = out.collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSet === Set(("x", "y"))) // none of big's 6 pairs
    // and the dropped basket doesn't inflate the support denominator
    assert(out.collect()(0).getAs[Double]("support") === 1.0)
  }

  test("minSupport prunes rare pairs") {
    val df = Seq(("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "y"),
      ("b2", "z")).toDF("basket", "item")
    val out = Basket.associationRules(df, "basket", "item", minSupport = 2L)
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSet
      === Set(("x", "y")))
  }
}
