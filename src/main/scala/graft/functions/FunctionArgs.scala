package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Constant-argument extraction for SQL-registered functions.
  *
  * SQL function builders receive raw `Expression`s; parameters like
  * `kll_sketch(x, k)`'s `k` must be compile-time constants. A bare
  * `eval().asInstanceOf[Int]` breaks two ways (review r11): a BIGINT
  * or SMALLINT literal (`200L`, `CAST(200 AS SMALLINT)`) raises
  * ClassCastException, and a non-foldable or NULL argument surfaces
  * as an opaque planner error instead of naming the function and the
  * rule it violated. This helper accepts any foldable integral
  * expression and fails analysis with a usable message otherwise.
  */
object FunctionArgs {

  private def fail(fn: String, arg: String, detail: String): Nothing =
    throw new AnalysisException(
      s"$fn: argument '$arg' must be a constant integer - $detail",
      None, None, None, None, Map.empty[String, String],
      Array.empty[org.apache.spark.QueryContext])

  /** The value of a foldable integral argument, or a clear
    * AnalysisException naming the function and argument. */
  def constInt(fn: String, arg: String, e: Expression): Int = {
    e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other =>
        fail(fn, arg, s"got type ${other.catalogString}")
    }
    if (!e.foldable)
      fail(fn, arg, s"got the non-constant expression ${e.sql}")
    e.eval(InternalRow.empty) match {
      case null => fail(fn, arg, "got NULL")
      case n: java.lang.Number =>
        val v = n.longValue()
        if (v < Int.MinValue || v > Int.MaxValue)
          fail(fn, arg, s"value $v overflows an integer")
        v.toInt
      case other => fail(fn, arg, s"got ${other.getClass.getSimpleName}")
    }
  }
}
