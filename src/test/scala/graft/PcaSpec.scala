package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** PCA training + projection: the eigenbasis invariants (orthonormal
  * components, descending eigenvalues, per-component projected variance
  * = its eigenvalue), whitening's unit-variance contract, the ragged
  * raise, and determinism — all on the real embeddings table, so every
  * claim is pinned against fixed data. The projection ARITHMETIC is
  * oracle-checked by emb_pca_project's DuckDB sidecar replay; this spec
  * owns what SQL cannot express (the eigensolve). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = graft.core.Tables.load(spark, dir, "embeddings")

  test("components are orthonormal and eigenvalues descend") {
    val m = Pca.pcaTrain(emb, "embedding", r = 8)
    m.d shouldBe 64
    m.r shouldBe 8
    for (a <- 0 until 8; b <- 0 until 8) {
      val dot = (0 until m.d).map(i => m.components(i)(a) * m.components(i)(b)).sum
      dot shouldBe (if (a == b) 1.0 else 0.0) +- 1e-9
    }
    m.eigVals.foreach(_ should be >= 0.0)
    m.eigVals.sliding(2).foreach { case Array(hi, lo) =>
      hi should be >= lo - 1e-12
    }
  }

  test("projected coordinate c has sample variance = eigenvalue c; whitening makes it ~1") {
    val m = Pca.pcaTrain(emb, "embedding", r = 4)
    def vars(whiten: Boolean): Seq[Double] = {
      Pca.project(emb, "embedding", m, "y", whiten = whiten)
        .select(posexplode(col("y")).as(Seq("c", "x")))
        .groupBy(col("c"))
        // sample variance, n-1 divisor — the covariance the model used
        .agg(((sum(col("x") * col("x")) -
          sum(col("x")) * sum(col("x")) / count(lit(1))) /
          (count(lit(1)) - 1)).as("v"))
        .orderBy(col("c")).as[(Int, Double)].collect().map(_._2).toSeq
    }
    val raw = vars(whiten = false)
    raw.indices.foreach { c =>
      // float-projected data vs double eigenvalue: loose relative bound
      raw(c) shouldBe m.eigVals(c) +- math.max(1e-4, m.eigVals(c) * 1e-3)
    }
    vars(whiten = true).foreach(_ shouldBe 1.0 +- 1e-3)
  }

  test("training is deterministic and the projection matches a driver-side replay") {
    val m1 = Pca.pcaTrain(emb, "embedding", r = 3)
    val m2 = Pca.pcaTrain(emb.repartition(7), "embedding", r = 3)
    // per-partition partials are summed on the driver in collect order —
    // determinism holds for a FIXED partitioning (the repartitioned
    // frame may differ in the last float ulp); same input → identical
    m1.components shouldBe Pca.pcaTrain(emb, "embedding", r = 3).components
    // and across partitionings the basis agrees to numerical tolerance
    for (c <- 0 until 3) {
      val dot = (0 until m1.d)
        .map(i => m1.components(i)(c) * m2.components(i)(c)).sum
      math.abs(dot) shouldBe 1.0 +- 1e-6 // same direction up to sign
    }
    val one = emb.filter(col("vec_id") === 5)
    val v = one.select(col("embedding")).as[Seq[Float]].head()
    val y = Pca.project(one, "embedding", m1, "y")
      .select(col("y")).as[Seq[Float]].head()
    y.length shouldBe 3
    for (c <- 0 until 3) {
      var acc = 0.0
      for (i <- 0 until m1.d)
        acc += m1.components(i)(c) * (v(i).toDouble - m1.mean(i))
      y(c) shouldBe acc.toFloat
    }
  }

  test("retrieval in PCA space: full-rank uncentered is an exact isometry, recall degrades gracefully with rank, centering breaks the isometry") {
    import graft.functions.VectorOps
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 32)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    def topk(q: org.apache.spark.sql.DataFrame,
             c: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      VectorOps.bruteForceTopK(q, c, 5, "qid", "qvec", "nid", "nvec")
        .select("qid", "nid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(queries, corpus)
    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        got.getOrElse(q, Set.empty[Long]).intersect(truth).size.toDouble /
          truth.size
      }
      per.sum / per.size
    }
    def pcaRecall(r: Int, center: Boolean): Double = {
      val m = Pca.pcaTrain(corpus, "nvec", r = r, center = center)
      recall(topk(
        Pca.project(queries, "qvec", m, "p")
          .select(col("qid"), col("p").as("qvec")),
        Pca.project(corpus, "nvec", m, "p")
          .select(col("nid"), col("p").as("nvec"))))
    }
    val (u16, u32, u64, c64) = (pcaRecall(16, center = false),
      pcaRecall(32, center = false), pcaRecall(64, center = false),
      pcaRecall(64, center = true))
    info(f"recall@5: uncentered r=16 $u16%.3f r=32 $u32%.3f " +
      f"r=64 $u64%.3f; centered r=64 $c64%.3f")
    u64 shouldBe 1.0 // full-rank uncentered = orthonormal isometry
    c64 should be < u64 // centering shifts the origin: NOT an isometry
    u32 should be >= u16 // graceful degradation as r shrinks
    u16 should be > 0.1
  }

  test("ragged vectors raise in training and projection; rank bounds enforced") {
    val mixed = Seq((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(1f, 2f)))
      .toDF("vec_id", "embedding")
    an[Exception] should be thrownBy Pca.pcaTrain(mixed, "embedding", r = 2)
    val ok = Seq((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(4f, 3f, 2f, 1f)),
      (3L, Seq(0f, 1f, 0f, 2f))).toDF("vec_id", "embedding")
    val m = Pca.pcaTrain(ok, "embedding", r = 2)
    an[Exception] should be thrownBy
      Pca.project(Seq((9L, Seq(1f, 2f))).toDF("vec_id", "embedding"),
        "embedding", m, "y").collect()
    an[Exception] should be thrownBy Pca.pcaTrain(ok, "embedding", r = 5)
    an[Exception] should be thrownBy Pca.pcaTrain(ok, "embedding", r = 0)
  }
}
