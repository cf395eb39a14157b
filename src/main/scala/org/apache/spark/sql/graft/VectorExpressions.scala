// Hosted under org.apache.spark.sql so the private[sql] pieces the
// expression API needs (AbstractDataType for ImplicitCastInputTypes,
// classic.ExpressionUtils for Expression↔Column bridging) are in scope —
// the standard packaging for third-party Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * Why not `functions.aggregate`/`zip_with`: higher-order functions are
  * evaluated interpreted (they never enter whole-stage codegen), and in
  * `VectorOps.bruteForceTopK` the similarity sits inside a |queries| ×
  * |corpus| broadcast nested-loop join — the single hottest loop in the
  * engine at scale. These expressions generate a tight primitive Java
  * loop over the Tungsten array format instead (`doGenCode`), keeping
  * the whole join stage inside one codegen'd span; the interpreted
  * `nullSafeEval` path remains for completeness.
  *
  * Numerical contract: double-precision accumulation in index order —
  * bit-identical to the previous fold-based formulation and to the
  * DuckDB oracle's list_cosine_similarity on the same data. Null
  * ARRAY elements are not supported (embeddings are dense); a NULL
  * array yields NULL, and cosine of a zero-norm vector yields NULL.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
}

case class DotProductFloat(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance over float arrays in double precision — the PQ
  * sub-distance metric. Accumulation is the same sequential
  * ((double)a[i] − (double)b[i])² loop the DuckDB oracle writes as
  * list_sum over generate_series, so distances compare bit-for-bit. */
case class SquaredL2Float(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  ${ev.value}Acc += $d * $d;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CosineSimilarityFloat(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullable: Boolean = true // zero-norm input → NULL

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ColBERT-style MaxSim late-interaction score (Khattab & Zaharia,
  * SIGIR'20 §3.1): both flat d-dim arrays are treated as `tokens`
  * contiguous slices of d/tokens dims, and the score is
  * Σ_t max_j dot(q_t, c_j) — each query token matched to its best
  * corpus token. PURE DOTS by design: normalize slices upstream
  * (once per row, ColBERT's own factoring — encoders emit unit token
  * vectors) so the pair hot loop never divides; this expression sits
  * inside the |queries| × |corpus| broadcast join, so like the
  * others it generates a tight primitive loop (d²/tokens multiplies
  * per pair). Accumulation: dots in index order, max exact, token
  * sum in t order — engine-portable, the oracle replays it. */
case class MaxSimDotFloat(left: Expression, right: Expression, tokens: Int)
    extends VectorBinaryExpression {
  require(tokens > 0, s"tokens must be positive, got $tokens")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // loud failure, matching sliceNormalize's contract: the SQL
    // vector_maxsim caller has no Scala-side guard, and mismatched or
    // non-multiple lengths would silently misalign the longer array's
    // token slices into garbage scores
    if (x.numElements() != y.numElements() || x.numElements() % tokens != 0)
      throw new IllegalArgumentException(
        s"vector_maxsim: array lengths ${x.numElements()} and " +
          s"${y.numElements()} must be equal and a multiple of tokens=$tokens")
    val n = x.numElements()
    val sub = n / tokens
    var score = 0.0
    var t = 0
    while (t < tokens) {
      var best = Double.NegativeInfinity
      var j = 0
      while (j < tokens) {
        var dot = 0.0
        var i = 0
        while (i < sub) {
          dot += x.getFloat(t * sub + i).toDouble * y.getFloat(j * sub + i)
          i += 1
        }
        if (dot > best) best = dot
        j += 1
      }
      score += best
      t += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (t, j, i) = (ctx.freshName("t"), ctx.freshName("j"), ctx.freshName("i"))
      val (n, sub) = (ctx.freshName("n"), ctx.freshName("sub"))
      val (best, dot) = (ctx.freshName("best"), ctx.freshName("dot"))
      s"""
         |if ($a.numElements() != $b.numElements() ||
         |    $a.numElements() % $tokens != 0) {
         |  throw new IllegalArgumentException(
         |    "vector_maxsim: array lengths " + $a.numElements() + " and " +
         |    $b.numElements() + " must be equal and a multiple of tokens=$tokens");
         |}
         |int $n = $a.numElements();
         |int $sub = $n / $tokens;
         |double ${ev.value}Acc = 0.0;
         |for (int $t = 0; $t < $tokens; $t++) {
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $tokens; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      $dot += (double) $a.getFloat($t * $sub + $i)
         |            * (double) $b.getFloat($j * $sub + $i);
         |    }
         |    if ($dot > $best) $best = $dot;
         |  }
         |  ${ev.value}Acc += $best;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductFloat(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def maxSimDot(a: Column, b: Column, tokens: Int): Column =
    ExpressionUtils.column(MaxSimDotFloat(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), tokens))

  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarityFloat(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sqDist(a: Column, b: Column): Column =
    ExpressionUtils.column(SquaredL2Float(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Public Expression↔Column bridge for packages outside
    * org.apache.spark.sql (ExpressionUtils is private[sql]): lets the
    * function registry expose COMPOSED column laws as SQL functions
    * without a UDF detour. */
  def toColumn(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column = ExpressionUtils.column(e)
  // EAGER node→expression conversion (ColumnNodeToExpressionConverter),
  // not ExpressionUtils.expression's lazy ColumnNodeExpression wrapper:
  // an injected SQL function must hand the analyzer a real Catalyst
  // tree — the lazy wrapper only converts on the Dataset API path and
  // dies in codegen when reached through the function registry.
  def toExpression(c: Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
