// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions: the Expression↔Column bridge is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType, StructType}
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

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003) as a native Generator: canonicalize the input (lowercase,
  * strip non-alphanumerics, collapse spaces — INSIDE the generator, so
  * the SQL spelling `winnow_gen(text, k, w)` and the DataFrame path
  * fingerprint identically by construction), hash every k-gram, slide
  * a w-window over the hash sequence, emit each window's minimum —
  * computed PARTITION-LOCALLY per row with a monotonic deque (O(n) per
  * document), where the former relational form exploded every gram
  * position through a doc-keyed exchange to run three window functions
  * (r7 verdict efficiency note).
  *
  * Selection key order matches the relational form's
  * `md5(gram) || ':' || lpad(pos, 8, '0')` string min exactly: hashes
  * are fixed 32 lowercase-hex chars, so comparing (hash, position)
  * lexicographically is the same total order — leftmost-position
  * tie-break included. Consecutive windows selecting the same key are
  * one emission (selections of one key form a contiguous run, so
  * consecutive-dedup IS distinct). Documents with fewer than w full
  * windows (canonical length < k + w - 1) emit nothing.
  *
  * Output: (fp_pos INT 1-based, fp_hash STRING md5 hex) — identical to
  * the DuckDB oracle's DISTINCT selection set. */
case class WinnowGenerator(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k > 0 && w > 0, s"invalid k=$k w=$w")

  override def elementSchema: StructType = new StructType()
    .add("fp_pos", IntegerType, nullable = false)
    .add("fp_hash", StringType, nullable = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_gen needs a STRING input, got ${child.dataType.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val p = WinnowGenerator.canonicalize(t.asInstanceOf[UTF8String])
    val n = p.length - k + 1 // gram count
    if (n < w) return Nil
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[String](n)
    var i = 0
    while (i < n) {
      val d = md.digest(
        p.substring(i, i + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < d.length) {
        sb.append(Character.forDigit((d(j) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(d(j) & 0xf, 16))
        j += 1
      }
      hashes(i) = sb.toString
      md.reset()
      i += 1
    }
    // (hash, index) total order == the relational key-string order
    def beats(a: Int, b: Int): Boolean = {
      val c = hashes(a).compareTo(hashes(b))
      c < 0 || (c == 0 && a < b)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val deque = new java.util.ArrayDeque[Integer]()
    var prevSel = -1
    var hi = 0
    var s = 0
    while (s + w <= n) { // window is grams [s, s+w)
      while (hi < s + w) { // admit new indices, keep deque increasing
        while (!deque.isEmpty && beats(hi, deque.peekLast)) deque.pollLast()
        deque.addLast(hi)
        hi += 1
      }
      while (deque.peekFirst < s) deque.pollFirst() // expire left of window
      val sel = deque.peekFirst.intValue
      if (sel != prevSel) {
        out += InternalRow(sel + 1, UTF8String.fromString(hashes(sel)))
        prevSel = sel
      }
      s += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowGenerator {
  /** Mirrors TextAnalysis.canonical (the DuckDB oracle's formulation)
    * exactly: Spark's lower (UTF8String.toLowerCase), `[^a-z0-9 ]`→' ',
    * collapse space runs, trim — both engines run Java regex, and after
    * the replaces every char is [a-z0-9 ], so Java's `trim` (≤U+0020)
    * equals Spark's space-only trim here. Idempotent, so feeding
    * already-canonical text is harmless. */
  def canonicalize(s: UTF8String): String =
    s.toLowerCase.toString
      .replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ")
      .trim
}

/** Per-row [a-z0-9] histogram + Shannon entropy, shared by the
  * interpreted and generated paths of [[CharEntropy]]. Counting runs
  * over the lowercased UTF-8 bytes: every byte of a multi-byte
  * sequence is >= 0x80, so the ASCII ranges match exactly the
  * characters `[a-z0-9]` matches on the lowercased string — same
  * counts as the former `lower → regexp_extract_all → explode`
  * pipeline, without materializing one row per character. */
object CharEntropyUtil {
  def compute(s: UTF8String): java.lang.Double = {
    val bytes = s.toLowerCase.getBytes
    val bins = new Array[Long](36)
    var t = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') { bins(b - 'a') += 1; t += 1 }
      else if (b >= '0' && b <= '9') { bins(26 + (b - '0')) += 1; t += 1 }
      i += 1
    }
    if (t == 0L) null
    else {
      var acc = 0.0
      var j = 0
      while (j < 36) {
        val c = bins(j)
        if (c > 0L) { val p = c.toDouble / t; acc += p * math.log(p) }
        j += 1
      }
      // single-symbol doc: acc == 0.0 and -acc would be IEEE -0.0
      java.lang.Double.valueOf(if (acc == 0.0) 0.0 else -acc)
    }
  }
}

/** Character-distribution Shannon entropy (nats) over [a-z0-9] of the
  * lowercased input — the per-row scalar behind `text_char_entropy`.
  * A document's entropy depends only on its own text, so this is a
  * zero-shuffle map; the former formulation exploded one row per
  * character through three exchanges (~10¹⁴ rows at the 100 TB design
  * point) for the same value. NULL when the input is NULL or contains
  * no [a-z0-9] characters (matching the explode form, which emitted
  * no row for such documents).
  *
  * Codegen'd via a static call into [[CharEntropyUtil]] so the
  * surrounding projection stays inside whole-stage codegen. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // no [a-z0-9] chars → NULL

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy needs a STRING input, got ${child.dataType.sql}")
  }

  override protected def nullSafeEval(t: Any): Any =
    CharEntropyUtil.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("entropy")
      s"""
         |java.lang.Double $r =
         |  org.apache.spark.sql.graft.CharEntropyUtil.compute($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

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

  /** Per-row [a-z0-9] Shannon entropy in nats; NULL for NULL input or
    * text with no [a-z0-9] characters. Unrounded — round at the call
    * site for oracle parity. */
  def charEntropy(text: Column): Column =
    ExpressionUtils.column(CharEntropy(ExpressionUtils.expression(text)))

  /** Winnowing selections as a generator column: adds
    * (fp_pos, fp_hash) rows per input row. Takes RAW text — the
    * generator canonicalizes internally, so every surface (DataFrame,
    * SQL) fingerprints identically. */
  def winnowGen(text: Column, k: Int = 8, w: Int = 4): Column =
    ExpressionUtils.column(
      WinnowGenerator(ExpressionUtils.expression(text), k, w))
}
