package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) tokenizer TRAINING — the actual
  * learned-merges algorithm (Sennrich et al. 2016, arXiv:1508.07909),
  * not the regex approximation `text_token_count` budgets with. A
  * training-data pipeline trains the tokenizer ON the corpus it curates,
  * so the trainer has to run at corpus scale:
  *
  *  - The corpus first collapses to a (word, freq) table — one
  *    partial-agg shuffle; every later round runs over DISTINCT words
  *    weighted by frequency (the standard trick, and the distributed
  *    shape: 100 TB of text is ~10⁷ distinct words).
  *  - Each round counts adjacent symbol pairs (explode + one
  *    partial-agg shuffle) and collects exactly ONE row — the argmax
  *    pair — to the driver. k merges = k bounded rounds; the words
  *    frame carries the applied merges forward via one `replace`
  *    column expression per round (codegen'd, no UDF).
  *  - Applying a trained vocabulary to the corpus is a per-word chain
  *    of k `replace` expressions — embarrassingly parallel, zero
  *    driver involvement.
  *
  * Symbol representation: each symbol is PREFIXED by a marker char
  * ('_' — safe because words are [a-z0-9]+ runs), no separators
  * between: "the" → "_t_h_e", merge (t,h) → "_th_e". The prefix form
  * makes `replace("_a_b" → "_ab")` exactly the BPE merge pass: a
  * marker can never be consumed by a neighbouring match (the
  * space-separated form fails on "a a a a", where the shared boundary
  * space makes plain replace merge only alternate pairs), and a
  * symbol's tail can never false-match a pattern (every symbol start
  * is marked). The merge pass = leftmost non-overlapping replacement,
  * which is `replace`'s contract in Spark, Java, and DuckDB alike — so
  * the exact-SQL oracle replays training verbatim.
  *
  * Word extraction matches the repo's text convention: lowercased
  * [a-z0-9]+ runs. No end-of-word marker (merges never cross words by
  * construction, and the symbol count per word is the marker count).
  */
object Bpe {

  val Marker = "_"

  /** (word, freq) over the corpus — the one corpus-wide shuffle. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Marker-prefixed initial symbol string: "the" → "_t_h_e". */
  def toSymbols(word: Column): Column =
    regexp_replace(word, "(.)", s"$Marker$$1")

  /** Adjacent-pair frequencies of a (syms, freq) frame: one explode +
    * one partial-agg shuffle. Symbols are recovered by splitting on the
    * marker (dropping the leading empty slot). */
  def pairCounts(words: DataFrame, symsCol: String = "syms",
                 freqCol: String = "freq"): DataFrame = {
    val arr = expr(s"slice(split($symsCol, '$Marker'), 2, " +
      s"size(split($symsCol, '$Marker')) - 1)")
    words
      .select(col(freqCol), arr.as("a"))
      .filter(size(col("a")) >= 2)
      .select(col(freqCol), explode(
        zip_with(slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), size(col("a")) - 1),
          (x, y) => struct(x.as("l"), y.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col(freqCol)).as("cnt"))
  }

  /** The round's merge: max count, ties to the lexicographically
    * smallest (l, r) — fully deterministic, and exactly the ORDER BY
    * the SQL oracle states. None when no pair remains. */
  def topMerge(pairs: DataFrame): Option[(String, String)] =
    pairs.orderBy(col("cnt").desc, col("l").asc, col("r").asc)
      .limit(1).collect().headOption
      .map(r => (r.getString(0), r.getString(1)))

  /** One merge applied to a symbol-string column: the codegen'd
    * leftmost-non-overlapping replace that IS the BPE merge pass under
    * the marker-prefix representation. */
  def applyMerge(syms: Column, l: String, r: String): Column =
    regexp_replace(syms, // literal replace via built-in `replace`
      lit(java.util.regex.Pattern.quote(s"$Marker$l$Marker$r")),
      lit(s"$Marker$l$r"))

  /** Train `steps` merges over the corpus. Returns the ordered merge
    * table; only `steps` single-row collects cross the driver. The
    * words frame is re-persisted per round so round k+1 does not
    * recompute rounds 1..k's replaces over the corpus. */
  def train(df: DataFrame, textCol: String, steps: Int): Seq[(String, String)] = {
    // ONE persisted frame for the whole run: each round folds the
    // merges learned so far into a chained codegen'd replace expression
    // over the base symbols instead of persisting + counting a new
    // frame per round — the vocab table is read k times either way, but
    // the per-round materialization job, block writes and cache churn
    // are gone (one job per round: the pair-count argmax)
    val base = wordFreq(df, textCol)
      .select(toSymbols(col("word")).as("syms"), col("freq"))
      .persist()
    base.count() // materialize before the base frame goes cold
    val merges = Seq.newBuilder[(String, String)]
    try {
      var symsExpr: Column = col("syms")
      var i = 0
      var exhausted = false
      while (i < steps && !exhausted) {
        val words = base.select(symsExpr.as("syms"), col("freq"))
        topMerge(pairCounts(words)) match {
          case Some((l, r)) =>
            merges += ((l, r))
            symsExpr = applyMerge(symsExpr, l, r)
          case None => exhausted = true
        }
        i += 1
      }
    } finally base.unpersist()
    merges.result()
  }

  /** Symbol count of a fully-merged word = its marker count. */
  private def symbolCount(syms: Column): Column =
    length(syms) - length(regexp_replace(syms, s"[$Marker]", ""))

  /** Per-document token count under a trained vocabulary: explode
    * words, chain the k merge replaces (one codegen'd expression, no
    * UDF), count markers, one doc-keyed shuffle. Docs with no words
    * keep a 0 row (left join back). */
  def withTokenCounts(df: DataFrame, idCol: String, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(col(idCol),
      explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("word"))
    val merged = merges.foldLeft(toSymbols(col("word"))) {
      case (c, (l, r)) => applyMerge(c, l, r)
    }
    val counts = words
      .select(col(idCol), symbolCount(merged).as("n"))
      .groupBy(idCol).agg(sum(col("n")).as("n_bpe"))
    df.select(col(idCol)).distinct()
      .join(counts, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bpe"), lit(0L)).as("n_bpe"))
  }
}
