package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-backed predicate expressions.
  *
  * Spark's own `BloomFilterMightContain` is planner-internal (injected
  * by the runtime-filter rule, not registered in the SQL function
  * registry), so membership tests against a prebuilt filter need a
  * user-level expression. This one wraps the public
  * `org.apache.spark.util.sketch.BloomFilter` and participates in
  * whole-stage codegen: the filter is deserialized ONCE on the driver
  * and shipped as a referenced object — per-row cost is the pure
  * `mightContainLong` probe, no allocation, no fallback.
  */
object SketchExpressions {

  /** `mightContainLong(child)` against a serialized BloomFilter.
    *
    * The filter bytes ride the serialized expression into each task
    * (same delivery as a broadcast for plan-embedded literals). At a
    * 1% fpp a filter for 10M items is ~12 MB — acceptable plan
    * payload; for sketches an order larger, move to a broadcast
    * variable + mapPartitions instead of growing the plan.
    *
    * False positives only — callers MUST re-verify hits exactly
    * (e.g. a semi-join) when exact results are required; false
    * negatives are impossible, so the filter is a safe prefilter.
    */
  case class BloomMightContainLong(filterBytes: Array[Byte], child: Expression)
      extends UnaryExpression with Predicate {

    @transient private lazy val filter: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bloom_might_contain_long"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case LongType | IntegerType | ShortType | ByteType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain_long requires an integral column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Number].longValue())

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // one deserialized filter per codegen'd operator instance,
      // referenced directly from generated code
      val bf = ctx.addReferenceObj("graftBloom", filter,
        classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong((long) $c);")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
      copy(child = newChild)
  }

  /** Build a BloomFilter over a LongType column with Spark's native
    * `stat.bloomFilter` (a treeAggregate — partition-local inserts,
    * merged log-depth on the way to the driver: one pass, no shuffle).
    */
  def buildLongBloom(df: DataFrame, colName: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = df.stat.bloomFilter(colName, expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def bloom_might_contain_long(filterBytes: Array[Byte], c: Column): Column =
    ExpressionUtils.column(BloomMightContainLong(filterBytes,
      ExpressionUtils.expression(c)))
}
