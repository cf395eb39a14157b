package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Persisted IVFADC index: write → meta round-trip → pruned search
  * parity with the in-memory operator. */
class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("index round-trips exactly; pruned search equals in-memory IVFADC") {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val cbRows = SimilaritySearch.ivfResiduals(
        emb.filter(col("vec_id") >= 4 && col("vec_id") < 36), centroids)
      .orderBy(col("vec_id")).select(col("rvec")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val books = (0 until 16).map(j => cbRows.map(_.slice(j * 4, j * 4 + 4)))
    val corpus = emb.filter(col("vec_id") >= 36)
    val queries = emb.filter(col("vec_id") < 5)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-index")
      .toString

    SimilaritySearch.writeIvfPqIndex(corpus, centroids, books, path)
    // sidecar artifacts round-trip bit-exactly (parquet floats)
    val (rCents, rBooks) = SimilaritySearch.readIvfPqIndexMeta(spark, path)
    rCents shouldBe centroids
    rBooks shouldBe books

    val fromIndex = SimilaritySearch.searchIvfPqIndex(spark, path, queries,
      k = 5, nProbe = 2)
    val inMem = SimilaritySearch.ivfPqAdcTopK(queries, corpus, centroids,
      books, k = 5, nProbe = 2)
    fromIndex.as[(Long, Long, Int)].collect().sorted shouldBe
      inMem.as[(Long, Long, Int)].collect().sorted

    // probe pruning reaches the DISK scan: the codes read carries a
    // partition filter on the coarse cell, so unprobed cells' files are
    // never touched — the point of partitioning the index by cluster
    val plan = fromIndex.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("cluster")

    // a stored index must also serve a DIFFERENT query batch (no
    // residual coupling to the batch that built it)
    val q2 = emb.filter(col("vec_id") >= 5 && col("vec_id") < 9)
    val fromIndex2 = SimilaritySearch.searchIvfPqIndex(spark, path, q2,
      k = 3, nProbe = 1)
    val inMem2 = SimilaritySearch.ivfPqAdcTopK(q2, corpus, centroids,
      books, k = 3, nProbe = 1)
    fromIndex2.as[(Long, Long, Int)].collect().sorted shouldBe
      inMem2.as[(Long, Long, Int)].collect().sorted
  }
}
