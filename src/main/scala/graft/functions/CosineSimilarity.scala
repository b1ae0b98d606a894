package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** §2.K `expr_native_cosine` — cosine similarity of two float vectors as a
  * native Catalyst expression with whole-stage codegen.
  *
  * Compared to the `aggregate(zip_with(...))` HOF form this removes the
  * per-element lambda-function call overhead and stays inside the fused
  * codegen pipeline (no `CodegenFallback`), which is the hot-loop shape a
  * 100 TB ANN scoring pass needs. Arithmetic is element-ordered
  * float→double like the HOF form and DuckDB's `list_dot_product`, so all
  * three agree bit-for-bit.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  // One toFloatArray()/toDoubleArray() bulk copy per row, then a loop
  // over the PRIMITIVE array — instead of a virtual ArrayData.getFloat
  // per element. ArrayData is polymorphic (Unsafe/Generic/Columnar), so
  // a per-element call site in a 384-wide loop is both slower and
  // vulnerable to JIT type-profile pollution once other array-heavy
  // queries have run in the JVM (measured in-sweep: llm_embedding_lsh
  // ~2× its isolated time with the per-element form). The bulk copy is
  // a single dispatch + memcpy; the loop body then compiles to
  // monomorphic primitive-array machine code regardless of JVM history.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0; var na = 0.0; var nb = 0.0
    if (isFloat(left) && isFloat(right)) {
      val xs = x.toFloatArray(); val ys = y.toFloatArray()
      val n = math.min(xs.length, ys.length)
      var i = 0
      while (i < n) {
        val xi = xs(i).toDouble; val yi = ys(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
    } else {
      val xs = if (isFloat(left)) {
        val f = x.toFloatArray(); Array.tabulate(f.length)(f(_).toDouble)
      } else x.toDoubleArray()
      val ys = if (isFloat(right)) {
        val f = y.toFloatArray(); Array.tabulate(f.length)(f(_).toDouble)
      } else y.toDoubleArray()
      val n = math.min(xs.length, ys.length)
      var i = 0
      while (i < n) {
        dot += xs(i) * ys(i); na += xs(i) * xs(i); nb += ys(i) * ys(i)
        i += 1
      }
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val (xTy, xCopy) = if (isFloat(left)) ("float[]", "toFloatArray")
                         else ("double[]", "toDoubleArray")
      val (yTy, yCopy) = if (isFloat(right)) ("float[]", "toFloatArray")
                         else ("double[]", "toDoubleArray")
      s"""
         |$xTy $xs = $a.$xCopy();
         |$yTy $ys = $b.$yCopy();
         |int $n = java.lang.Math.min($xs.length, $ys.length);
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $xs[$i];
         |  double $yi = (double) $ys[$i];
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Register `cosine_sim(a, b)` for SQL/`expr(...)` use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
}
