// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions: the Expression↔Column bridge lives in
// org.apache.spark.sql.classic.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native product-quantization kernels.
  *
  * The compositional forms — `array(argmin-structs per centroid)` per
  * subspace for the encoder, `array(sqDist per centroid)` per subspace
  * for the lookup tables — are correct but expand to m × ksub separate
  * Catalyst expression trees (512 at the bench shape of 16 × 32). The
  * EXECUTION cost of those trees is trivial; the cost that shows on the
  * book is per-invocation PLANNING: analyzing, optimizing, and
  * codegen-compiling a 512-expression projection measured ~1 s of
  * driver time per call (BENCH_NOTES round 10). One native expression
  * per kernel keeps the projection at one tree and the generated code
  * at one tight primitive loop.
  *
  * Numerical contract (oracle-pinned): per-subspace squared L2 in
  * double precision, accumulated in element order over the flat vector
  * — identical arithmetic to SquaredL2Float over a slice, so codes and
  * distances match the DuckDB oracle bit-for-bit. Encode ties resolve
  * to the smaller code (strict-less argmin), the array_min-over-structs
  * convention. A wrong-dimension or NULL input RAISES (the dimChecked
  * contract: silently-garbage codes are the guarded failure mode); both
  * kernels carry the calling operator's name for the error message.
  */
abstract class PqKernelExpression extends UnaryExpression with ImplicitCastInputTypes {
  def codebooks: Seq[Seq[Seq[Float]]]
  def fn: String

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = false

  // lazy: executor-side Java deserialization constructs the instance
  // before its fields are populated, so eager vals would read a null
  // codebooks during readObject
  protected lazy val m: Int = codebooks.length
  protected lazy val dsub: Int = codebooks.head.head.length
  protected lazy val dim: Int = m * dsub

  /** (j)(c)(i) → centroid component — plain JVM arrays for the loops;
    * also the codegen reference object. */
  @transient protected lazy val books: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  // NULL raises instead of propagating — override the null-skipping
  // default eval path (codegen handles it in its own prologue).
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null)
      throw new IllegalArgumentException(s"$fn: vector must not be NULL")
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"$fn: vector dimension must be $dim (m*dsub), got " +
          arr.numElements())
    // NULL ELEMENTS raise too: ArrayData.getFloat on a null slot reads
    // 0.0, which would encode/score silently-garbage values — the exact
    // failure mode the dimChecked contract exists to prevent.
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"$fn: vector must not contain NULL elements (element $i)")
      i += 1
    }
    compute(arr)
  }

  protected def compute(vec: ArrayData): Any

  /** Codegen prologue shared by both kernels: child eval + NULL /
    * dimension / null-element raises. */
  protected def genGuards(ctx: CodegenContext, childGen: ExprCode): String = {
    val i = ctx.freshName("guardIdx")
    s"""
       |if (${childGen.isNull}) {
       |  throw new IllegalArgumentException("$fn: vector must not be NULL");
       |}
       |if (${childGen.value}.numElements() != $dim) {
       |  throw new IllegalArgumentException(
       |    "$fn: vector dimension must be $dim (m*dsub), got " +
       |    ${childGen.value}.numElements());
       |}
       |for (int $i = 0; $i < $dim; $i++) {
       |  if (${childGen.value}.isNullAt($i)) {
       |    throw new IllegalArgumentException(
       |      "$fn: vector must not contain NULL elements (element " + $i + ")");
       |  }
       |}
     """.stripMargin
  }
}

/** PQ ENCODE: nearest codebook centroid id per subspace →
  * array<int> of m codes. One expression replaces the m × ksub
  * argmin-struct trees of the compositional encoder. */
case class PqEncodeCodes(child: Expression, codebooks: Seq[Seq[Seq[Float]]],
                         fn: String = "pqEncode") extends PqKernelExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def compute(vec: ArrayData): Any = {
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val base = j * dsub
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = vec.getFloat(base + i).toDouble - cent(i)
          acc += d * d
          i += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val booksRef = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    val codes = ctx.freshName("codes")
    val j = ctx.freshName("j"); val c = ctx.freshName("c")
    val i = ctx.freshName("i"); val base = ctx.freshName("base")
    val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
    val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
    val book = ctx.freshName("book"); val cent = ctx.freshName("cent")
    val javaCode =
      s"""
         |${genGuards(ctx, childGen)}
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  float[][] $book = $booksRef[$j];
         |  int $base = $j * $dsub;
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    float[] $cent = $book[$c];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $d = (double) ${childGen.value}.getFloat($base + $i) - (double) $cent[$i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $best) { $best = $acc; $bestC = $c; }
         |  }
         |  $codes[$j] = $bestC;
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    ev.copy(
      code = childGen.code + code"$javaCode",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ LOOKUP TABLES: squared L2 from each subspace's sub-vector to
  * every centroid of that subspace's codebook → array<array<double>>
  * (m × ksub). One expression replaces the m × ksub sqDist trees of
  * the compositional LUT projection; ADC scoring then reads
  * element_at(element_at(luts, j+1), code+1). */
case class PqLookupTables(child: Expression, codebooks: Seq[Seq[Seq[Float]]],
                          fn: String = "pqLuts") extends PqKernelExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override protected def compute(vec: ArrayData): Any = {
    val luts = new Array[Any](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val base = j * dsub
      val row = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = vec.getFloat(base + i).toDouble - cent(i)
          acc += d * d
          i += 1
        }
        row(c) = acc
        c += 1
      }
      luts(j) = UnsafeArrayData.fromPrimitiveArray(row)
      j += 1
    }
    new GenericArrayData(luts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val booksRef = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    val luts = ctx.freshName("luts")
    val row = ctx.freshName("row")
    val j = ctx.freshName("j"); val c = ctx.freshName("c")
    val i = ctx.freshName("i"); val base = ctx.freshName("base")
    val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
    val book = ctx.freshName("book"); val cent = ctx.freshName("cent")
    val javaCode =
      s"""
         |${genGuards(ctx, childGen)}
         |org.apache.spark.sql.catalyst.util.ArrayData[] $luts =
         |  new org.apache.spark.sql.catalyst.util.ArrayData[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  float[][] $book = $booksRef[$j];
         |  int $base = $j * $dsub;
         |  double[] $row = new double[$book.length];
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    float[] $cent = $book[$c];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $d = (double) ${childGen.value}.getFloat($base + $i) - (double) $cent[$i];
         |      $acc += $d * $d;
         |    }
         |    $row[$c] = $acc;
         |  }
         |  $luts[$j] = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($row);
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $luts);
       """.stripMargin
    ev.copy(
      code = childGen.code + code"$javaCode",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqExpressions {
  def encodeCodes(vec: Column, codebooks: Seq[Seq[Seq[Float]]],
                  fn: String = "pqEncode"): Column =
    ExpressionUtils.column(PqEncodeCodes(
      ExpressionUtils.expression(vec), codebooks, fn))

  def lookupTables(vec: Column, codebooks: Seq[Seq[Seq[Float]]],
                   fn: String = "pqLuts"): Column =
    ExpressionUtils.column(PqLookupTables(
      ExpressionUtils.expression(vec), codebooks, fn))
}
