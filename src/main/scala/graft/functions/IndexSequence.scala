package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** `index_sequence(n)` — a native Catalyst [[Generator]] (table-valued
  * function): each input row fans out to `n` rows `idx = 0 .. n-1`.
  *
  * This is the genuine UDTF extension point, complementing the composed
  * form (`explode(sequence(...))`, see `udtf_generate`): the planner wraps
  * it in a `Generate` node exactly like the built-in `explode`, so the
  * fan-out happens per-partition on executors with no shuffle and no
  * driver involvement — the shape a row-expansion UDTF must have at
  * 100 TB. Evaluation is interpreted ([[CodegenFallback]]); generators sit
  * at a codegen boundary in Spark's own built-ins too (`Generate` feeds
  * consumers row-at-a-time), so nothing is lost joining them.
  */
case class IndexSequence(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral argument, got ${t.catalogString}")
  }

  override def elementSchema: StructType =
    StructType(Seq(StructField("idx", IntegerType, nullable = false)))

  override def prettyName: String = "index_sequence"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val n = v match {
        case i: java.lang.Integer => i.intValue()
        // refuse to truncate: a BIGINT count past Int.MaxValue would
        // silently wrap to a wrong (possibly zero) row count
        case l: java.lang.Long => Math.toIntExact(l.longValue())
      }
      if (n <= 0) Nil else (0 until n).map(i => InternalRow(i))
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): IndexSequence = copy(child = newChild)
}

object IndexSequence {
  /** Register `index_sequence(n)` for SQL/`expr(...)` use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "index_sequence",
      (exprs: Seq[Expression]) => IndexSequence(exprs.head),
      "built-in")
}
