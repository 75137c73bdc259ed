package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.round
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two
  * `array<double>` columns in ONE fused whole-stage-codegen loop
  * (dot + both norms, no intermediate array allocation).
  *
  * This is the §4.2 promotion path of SURVEY.md: the higher-order
  * `zip_with`+`aggregate` formulation allocates a 64-element array per
  * pair and folds three times (or carries pre-computed norms through
  * the join); on the ANN verify stage — millions of candidate pairs —
  * the fused loop is the difference between the verify dominating the
  * query and it being a rounding error. Bit-compatible with the HOF
  * version and the DuckDB oracle: same left-to-right folds, then
  * `dot / (sqrt(nx) * sqrt(ny))` in the same order — INCLUDING the
  * null semantics: mismatched array lengths and null elements yield
  * NULL here exactly as they do under `zip_with`/`aggregate` (where a
  * null-padded or null element poisons the fold), so the optimizer
  * rewrite [[graft.plans.ReplaceHofCosine]] is semantics-preserving
  * for every input, not just the clean fixed-dim case.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  // NULL on length mismatch / null elements, even for non-null inputs
  override def nullable: Boolean = true

  /** Element null checks are emitted only when an input's array type
    * can actually hold nulls — the fixed-dim embedding hot path
    * (containsNull=false after the cast) keeps the branch-free loop. */
  private def mayHaveNullElements: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = mayHaveNullElements
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, nx, ny, i, xi, yi) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("nx"), ctx.freshName("ny"), ctx.freshName("i"),
        ctx.freshName("xi"), ctx.freshName("yi"))
      val nullElementCheck =
        if (mayHaveNullElements)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElementCheck
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** cos(x, y) rounded to 6 decimals — drop-in for Vectors.cosine,
    * backed by the fused codegen loop. */
  def cosine(x: Column, y: Column): Column =
    round(graftbridge.column(
      CosineSim(graftbridge.expression(x), graftbridge.expression(y))), 6)
}
