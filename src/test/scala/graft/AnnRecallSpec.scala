package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.SimilaritySearch

/** Quantified retrieval quality for the ANN scale paths: recall@k of the
  * LSH and IVF operators against exact brute force over the real
  * embeddings table — so a future change to plane/table/probe counts that
  * silently destroys retrieval quality fails here instead of shipping.
  *
  * Measured on this corpus (weakly-clustered embeddings — the hard case):
  * a single 8-bit SRP signature retrieves essentially nothing (~0.0
  * recall@5), a single 4-bit one ~0.2 — which is exactly why the
  * multi-table operator exists; 8 tables × 4 bits lands well above 0.6.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val k = 5

  private lazy val emb = graft.core.Tables.load(spark, dir, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 20)
    .select(col("vec_id"), col("embedding"))
  // corpus disjoint from both the queries and the 32 plane vectors
  private lazy val corpus = emb.filter(col("vec_id") >= 32)
    .select(col("vec_id"), col("embedding"))

  private lazy val planes32 = emb.filter(col("vec_id") < 32).orderBy(col("vec_id"))
    .select(col("embedding")).collect().map(_.getSeq[Float](0).toSeq).toSeq
  private lazy val centroids = emb.filter(col("vec_id") < 4).orderBy(col("vec_id"))
    .select(col("embedding")).collect().map(_.getSeq[Float](0).toSeq).toSeq

  private lazy val exactTopK: Map[Long, Set[Long]] =
    VectorOps.bruteForceTopK(
        queries.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        corpus.select(col("vec_id").as("nid"), col("embedding").as("nvec")),
        k, "qid", "qvec", "nid", "nvec")
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  /** Mean per-query fraction of the exact top-k that the ANN result
    * retrieved (queries the ANN missed entirely count as recall 0). */
  private def recallAt(ann: DataFrame): Double = {
    val got = ann.select(col("qid"), col("nid")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val per = exactTopK.map { case (q, truth) =>
      got.getOrElse(q, Set.empty[Long]).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("multi-table LSH (8×4 bits) recall@5 ≥ 0.6, and beats every single table") {
    val multi = recallAt(SimilaritySearch.lshTopKMultiTable(
      queries, corpus, planes32, bitsPerTable = 4, k))
    val single4 = recallAt(SimilaritySearch.lshTopK(
      queries, corpus, planes32.take(4), k))
    val single8 = recallAt(SimilaritySearch.lshTopK(
      queries, corpus, planes32.take(8), k))
    info(f"recall@$k: multi(8×4)=$multi%.3f single(4)=$single4%.3f single(8)=$single8%.3f")
    multi should be >= 0.6
    multi should be > single4
    multi should be > single8
    // longer single signatures can only shrink buckets → recall monotone down
    single8 should be <= single4
  }

  test("sample-train → full-assign keeps the recall floor (the 100 TB recipe)") {
    // train on a 1-in-3 deterministic sample, search the FULL corpus with
    // the trained centroids — recall must hold even though Lloyd never
    // saw 2/3 of the vectors, and probing everything is still exact.
    val sample = corpus.filter(col("vec_id") % 3 === 0)
    val trained = SimilaritySearch.ivfTrain(sample, centroids, iters = 2)
    trained should have length centroids.length
    val r2 = recallAt(SimilaritySearch.ivfTopK(queries, corpus, trained, k, nProbe = 2))
    val rAll = recallAt(SimilaritySearch.ivfTopK(queries, corpus, trained, k,
      nProbe = trained.length))
    info(f"sampled-train ivf recall@$k nProbe=2: $r2%.3f, nProbe=all: $rAll%.3f")
    r2 should be >= 0.6
    rAll shouldBe 1.0 +- 1e-9
  }

  test("ivfTopK recall@5 at nProbe=2 of 4 clusters, and probing monotonicity") {
    val r1 = recallAt(SimilaritySearch.ivfTopK(queries, corpus, centroids, k, nProbe = 1))
    val r2 = recallAt(SimilaritySearch.ivfTopK(queries, corpus, centroids, k, nProbe = 2))
    val r4 = recallAt(SimilaritySearch.ivfTopK(queries, corpus, centroids, k, nProbe = 4))
    info(f"ivf recall@$k nProbe 1/2/4 = $r1%.3f / $r2%.3f / $r4%.3f")
    r2 should be >= r1
    r4 should be >= r2
    r4 shouldBe 1.0 +- 1e-9 // probing every cluster IS exact search
    r2 should be >= 0.6
  }
}
