package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT> embedding columns, built from catalyst
  * higher-order functions (zip_with / aggregate) so the hot path stays
  * codegen-friendly and fully distributed — no UDFs, no driver loops.
  *
  * Re-expresses the reference's VECTOR_SEARCH cosine semantics
  * (reference generate_personalized_commands.sh:377-384: k=3 cosine over a
  * 1536-dim index) as Spark-native expressions.
  */
object VectorOps {

  /** Dot product in double precision, sequential (index-order) fold —
    * deterministic across runs and engines. */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dotD(a, a)

  /** Cosine similarity in double precision. Null/zero-norm safe: returns
    * null when either norm is 0 (matches DuckDB list_cosine_similarity NaN
    * avoidance by construction of our test data — vectors are non-zero). */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Brute-force top-k cosine neighbors of each query vector against a
    * corpus. Returns (qidName, nidName, rank, sim).
    *
    * Physical shape: the corpus side is broadcast (it is the smaller /
    * bounded side at reference scale: a knowledge index of chunks), the
    * query stream stays partitioned — so the "join" is a
    * BroadcastNestedLoopJoin with no shuffle of the big side, followed by a
    * per-query-key window top-k. At 100 TB the query side is the huge one
    * and this plan still holds: corpus broadcast once per executor,
    * queries never leave their partitions until the final per-key rank
    * (hash-partitioned by query id, combinable).
    *
    * For corpora too big to broadcast, see operators.SimilaritySearch.lsh*
    * (bucketed ANN) — this method is the exact oracle baseline.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String, qVec: String, cId: String, cVec: String,
                     broadcastCorpus: Boolean = true): DataFrame = {
    val c = if (broadcastCorpus) broadcast(corpus) else corpus
    val joined = queries.crossJoin(c)
      .withColumn("sim", cosine(col(qVec), col(cVec)))
    // rank: best similarity first; deterministic tiebreak on neighbor id
    val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId).asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("rank"), col("sim"))
  }
}
