// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions: the Expression↔Column bridge is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextSplit

/** M1+J1 fused as a native Catalyst Generator: the reference's
  * `CROSS JOIN UNNEST(ML_CHARACTER_TEXT_SPLITTER(...))` emits one row per
  * chunk; `explode(udf(...))` does the same but materializes the full
  * chunk array per row first and pays UDF serialization. A Generator
  * yields rows directly into the Generate operator — no intermediate
  * array, no UDF wrapper — the preferred Spark shape for a table
  * function. Output: (chunk_idx INT, chunk STRING), chunk_idx 0-based
  * like posexplode.
  *
  * Evaluation is CodegenFallback (generators with imperative bodies
  * don't codegen), but the surrounding Generate stage still fuses with
  * its children.
  */
case class SplitTextGenerator(child: Expression, size: Int, overlap: Int,
                              sep: String, isRegex: Boolean = false,
                              keepSeparator: Boolean = false,
                              trimChunks: Boolean = true,
                              sepPosition: String = "START")
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = new StructType()
    .add("chunk_idx", IntegerType, nullable = false)
    .add("chunk", StringType, nullable = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"split_text_gen needs a STRING input, got ${child.dataType.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else TextSplit.splitText(t.toString, size, overlap, sep, trimChunks,
        isRegex, keepSeparator, sepPosition)
      .iterator.zipWithIndex
      .map { case (c, i) => InternalRow(i, UTF8String.fromString(c)) }
      .toSeq
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Splitter-as-generator column; use in `df.select(cols..., this)` —
    * adds (chunk_idx, chunk) rows like a lateral table function. */
  def splitTextGen(text: Column, size: Int = 200, overlap: Int = 20,
                   sep: String = "###", isRegex: Boolean = false,
                   keepSeparator: Boolean = false, trimChunks: Boolean = true,
                   sepPosition: String = "START"): Column =
    ExpressionUtils.column(
      SplitTextGenerator(ExpressionUtils.expression(text), size, overlap, sep,
        isRegex, keepSeparator, trimChunks, sepPosition))
}
