package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character text splitter — reimplements the semantics of the reference's
  * ML_CHARACTER_TEXT_SPLITTER(document_text, 200, 20, '###', false, false,
  * true, 'START') (reference generate_personalized_commands.sh:316-327):
  * split on a separator, greedily merge pieces into chunks of at most
  * `chunkSize` characters with `overlap` characters carried between
  * consecutive chunks, trimming whitespace.
  *
  * Two forms:
  *  - [[splitText]]: the full separator-aware splitter (pure Scala, exposed
  *    as a UDF) — faithful to the reference semantics, unit-tested.
  *  - [[chunkFixedCol]]: a fixed-stride chunker built entirely from
  *    catalyst `functions._` (sequence/transform/substring) so it stays
  *    inside whole-stage codegen and is expressible in ANSI SQL for the
  *    DuckDB oracle. This is the scale path: no UDF, no serialization, and
  *    explode keeps everything distributed.
  */
object TextSplit {

  /** Separator-aware character chunker.
    * @param chunkSize max characters per chunk (reference: 200)
    * @param overlap   characters of overlap between chunks (reference: 20)
    * @param sep       separator to prefer splitting at (reference: "###")
    * @param trimChunks trim whitespace from each chunk (reference: true)
    */
  def splitText(text: String, chunkSize: Int = 200, overlap: Int = 20,
                sep: String = "###", trimChunks: Boolean = true): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"invalid chunkSize=$chunkSize overlap=$overlap")

    // 1. split on separator (separator is dropped: keep_separator=false)
    val pieces0 =
      if (sep.nonEmpty && text.contains(sep)) text.split(java.util.regex.Pattern.quote(sep), -1).toSeq
      else Seq(text)
    val pieces = pieces0.map(p => if (trimChunks) p.trim else p).filter(_.nonEmpty)

    // 2. hard-wrap any piece longer than chunkSize with stride size-overlap
    val stride = chunkSize - overlap
    val wrapped = pieces.flatMap { p =>
      if (p.length <= chunkSize) Seq(p)
      else (0 until p.length by stride).takeWhile(s => s == 0 || s + overlap < p.length)
        .map(s => p.substring(s, math.min(s + chunkSize, p.length)))
    }

    // 3. greedily merge adjacent small pieces up to chunkSize (joined by a
    //    single space), so many tiny separator-delimited sections don't each
    //    become an embedding call.
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = new StringBuilder
    wrapped.foreach { p =>
      if (cur.isEmpty) cur.append(p)
      else if (cur.length + 1 + p.length <= chunkSize) { cur.append(' '); cur.append(p) }
      else { out += cur.toString; cur = new StringBuilder(p) }
    }
    if (cur.nonEmpty) out += cur.toString
    val res = out.toSeq.map(c => if (trimChunks) c.trim else c).filter(_.nonEmpty)
    res
  }

  /** Fixed-stride chunk column: substrings of length `size` starting every
    * `stride` characters (1-based positions 1, 1+stride, 1+2*stride, ...).
    * Pure catalyst expressions → codegen'd, oracle-expressible:
    * DuckDB equivalent:
    *   SELECT substring(text, s, size) FROM t, generate_series(1, greatest(length(text),1), stride) g(s)
    * Returns ARRAY<STRING>; explode() it for one row per chunk.
    */
  def chunkFixedCol(text: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0)
    transform(
      sequence(lit(1), greatest(length(text), lit(1)), lit(stride)),
      s => text.substr(s, lit(size)))
  }
}
