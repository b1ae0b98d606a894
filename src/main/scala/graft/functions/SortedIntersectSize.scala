package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `sorted_intersect_size(a, b)` — |a ∩ b| for two ascending-sorted,
  * duplicate-free `array<string>` columns, as a native codegen'd merge scan.
  *
  * This is the hot kernel of the set-similarity operators
  * (`llm_jaccard_pairs`, `llm_ngram_jaccard`): a blocked candidate join
  * evaluates an intersection per *candidate pair*, so at corpus scale the
  * kernel runs billions of times. Spark's built-in `array_intersect`
  * allocates and populates a hash set per invocation; a two-pointer merge
  * over pre-sorted arrays (sorted ONCE per document, upstream of the join)
  * is allocation-free, branch-predictable, and stays inside whole-stage
  * codegen.
  *
  * PRECONDITION (caller-owned, not checked): both arrays sorted ascending
  * by UTF8String binary order — i.e. produced by
  * `sort_array(array_distinct(...))` — with no NULL elements. Unsorted
  * input yields an undercount, the same contract as any merge-join.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case _ => StringType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(t: DataType): Option[DataType] = t match {
      case ArrayType(e @ (StringType | LongType), _) => Some(e)
      case _ => None
    }
    // compare element types only — containsNull may differ between a
    // split()-derived array and one read from parquet, and the no-null-
    // element precondition is the caller's contract either way
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> or two array<bigint> " +
          s"arguments, got ${left.dataType.catalogString} / " +
          s"${right.dataType.catalogString}")
    }
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val isLong = elemType == LongType
    var i = 0; var j = 0; var n = 0
    while (i < nx && j < ny) {
      val c =
        if (isLong) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val cmp =
        if (elemType == LongType)
          s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $cmp;
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Register `sorted_intersect_size(a, b)` for SQL/`expr(...)` use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_size",
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs(0), exprs(1)),
      "built-in")
}
