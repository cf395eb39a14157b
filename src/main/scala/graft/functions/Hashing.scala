package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-family primitives for near-duplicate detection at corpus scale:
  * word shingles, MinHash signatures, LSH band keys, and SimHash.
  *
  * Engine-portability design decision: every hash is derived from md5 hex
  * strings, because md5 is bit-identical in Spark and DuckDB — which makes
  * each operator oracle-checkable end-to-end. A lexicographic MIN over
  * fixed-width lowercase hex equals the numeric MIN of the underlying
  * 128-bit value, so MinHash = min(md5(seed || shingle)) needs no hex→int
  * conversion at all.
  *
  * Scale: shingling is a per-row map + explode (no shuffle); signatures are
  * one hash-partitioned groupBy(doc); LSH banding turns the O(n²) pair
  * search into an equi-join on band keys — the canonical web-scale
  * dedup plan (one shuffle on band key, skew-bounded by band width).
  */
object Hashing {

  /** Word-level shingles (n consecutive lowercase tokens joined by a
    * space), distinct per document. Tokenization = runs of alphanumerics,
    * matching TextAnalysis.tokenCount and the oracle. */
  def shingles(text: Column, n: Int): Column = {
    val toks = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    val nShingles = greatest(size(toks) - lit(n - 1), lit(0))
    array_distinct(transform(
      sequence(lit(1), nShingles, lit(1)),
      i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** One MinHash value (as a 32-hex-char string) for a shingle array under
    * seed `i`: min over shingles of md5(i:shingle). Null when no shingles. */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(seed + ":"), s))))

  /** LSH band keys: `bands` keys, each the concat of `rowsPerBand`
    * consecutive MinHashes. Docs sharing any band key are candidate
    * near-duplicates. */
  def lshBandKeys(shingleCol: Column, bands: Int, rowsPerBand: Int): Column = {
    val keys = (0 until bands).map { b =>
      val mhs = (0 until rowsPerBand).map(r => minhash(shingleCol, b * rowsPerBand + r))
      concat(lit(b + ":") +: mhs.flatMap(m => Seq(m, lit("|"))): _*)
    }
    array(keys: _*)
  }

  /** SimHash over hex-derived bits: each token contributes ±1 to `bits`
    * bit positions; bit j of the signature is 1 iff the sum is positive.
    * Bit j of a token = 1 iff hex digit j of md5(token) >= '8' (the top
    * bit of the nibble) — a pure string comparison, so the oracle SQL is a
    * substring test in both engines. Returns a `bits`-char '0'/'1' string.
    * bits <= 32 (md5 hex length). */
  def simhash(text: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 32)
    val toks = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    // md5 evaluated once per token (transform), then folded into a
    // `bits`-wide vote vector in a single pass.
    val votes = aggregate(
      transform(toks, t => md5(t)),
      array_repeat(lit(0), bits),
      (acc, h) => zip_with(acc, sequence(lit(1), lit(bits)),
        (a, j) => a + when(h.substr(j, lit(1)) >= "8", 1).otherwise(-1)))
    array_join(transform(votes, v => when(v > 0, lit("1")).otherwise(lit("0"))), "")
  }
}
