package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character text splitter — reimplements the full semantics of the
  * reference's ML_CHARACTER_TEXT_SPLITTER(input, chunk_size, chunk_overlap,
  * separator, is_separator_regex, keep_separator, trim_whitespace,
  * keep_separator_position) (invoked in the reference as
  * `ML_CHARACTER_TEXT_SPLITTER(document_text, 200, 20, '###', false,
  * false, true, 'START')`, generate_personalized_commands.sh:322-326):
  * split on a separator (literal or regex), optionally keep the matched
  * separator attached to the START of the following piece or the END of
  * the preceding one, greedily merge pieces into chunks of at most
  * `chunkSize` characters with `overlap` characters carried between
  * consecutive chunks, trimming whitespace.
  *
  * Two forms:
  *  - [[splitText]]: the full separator-aware splitter (pure Scala, exposed
  *    as the `split_text` SQL function) — faithful to the reference
  *    semantics, unit-tested per flag combination.
  *  - [[chunkFixedCol]]: a fixed-stride chunker built entirely from
  *    catalyst `functions._` (sequence/transform/substring) so it stays
  *    inside whole-stage codegen and is expressible in ANSI SQL for the
  *    DuckDB oracle. This is the scale path: no UDF, no serialization, and
  *    explode keeps everything distributed.
  */
object TextSplit {

  /** Separator-aware character chunker.
    *
    * Scala parameter order keeps the original 5-arg form source-compatible;
    * the SQL registration (`Sessions.registerUdfs`) exposes the reference's
    * 8-arg positional order.
    *
    * @param chunkSize max characters per chunk (reference: 200)
    * @param overlap   characters of overlap between chunks (reference: 20)
    * @param sep       separator to prefer splitting at (reference: "###")
    * @param trimChunks trim whitespace from each chunk (reference: true)
    * @param isRegex   treat `sep` as a regex pattern, not a literal
    * @param keepSeparator keep each matched separator in the output instead
    *                      of dropping it
    * @param sepPosition with keepSeparator: "START" attaches the separator
    *                    to the beginning of the piece that follows it,
    *                    "END" to the end of the piece that precedes it
    */
  def splitText(text: String, chunkSize: Int = 200, overlap: Int = 20,
                sep: String = "###", trimChunks: Boolean = true,
                isRegex: Boolean = false, keepSeparator: Boolean = false,
                sepPosition: String = "START"): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"invalid chunkSize=$chunkSize overlap=$overlap")
    require(sepPosition == "START" || sepPosition == "END",
      s"sepPosition must be START or END, got '$sepPosition'")

    // 1. split on separator, attaching matched separators per the flags
    val pieces0 = splitWithSep(text, sep, isRegex, keepSeparator, sepPosition)
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

  /** Separator pass: pieces of `text` between matches of `sep`, with each
    * matched separator dropped (keep=false) or attached to the following
    * (START) / preceding (END) piece. Zero-width regex matches are skipped
    * (a separator that matches nothing splits nothing). */
  private def splitWithSep(text: String, sep: String, isRegex: Boolean,
                           keep: Boolean, position: String): Seq[String] = {
    if (sep == null || sep.isEmpty) return Seq(text)
    val pattern = java.util.regex.Pattern.compile(
      if (isRegex) sep else java.util.regex.Pattern.quote(sep))
    val m = pattern.matcher(text)
    // collect non-zero-width matches left to right
    val matches = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var from = 0
    while (from <= text.length && m.find(from)) {
      if (m.end > m.start) { matches += ((m.start, m.end, m.group)); from = m.end }
      else from = m.start + 1
    }
    if (matches.isEmpty) return Seq(text)
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var last = 0
    var carried = "" // separator waiting to prefix the next piece (START)
    matches.foreach { case (s, e, sepText) =>
      val piece = text.substring(last, s)
      if (!keep) pieces += piece
      else if (position == "END") pieces += piece + sepText
      else { pieces += carried + piece; carried = sepText }
      last = e
    }
    val tail = text.substring(last)
    pieces += (if (keep && position == "START") carried + tail else tail)
    pieces.toSeq
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
