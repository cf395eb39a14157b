package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** OPQ-lite rotation (PCA + eigenvalue-balanced allocation): the
  * eigensolver, the orthonormality/distance-preservation invariants,
  * the balanced-variance objective, and the measured ADC recall win on
  * the real embeddings table — all deterministic (fixed data, fixed
  * sweep order), so the improvement is pinned, not hoped for. */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = graft.core.Tables.load(spark, dir, "embeddings")

  test("jacobiEigen solves a known symmetric system") {
    val (vals, vecs) = SimilaritySearch.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    vals(0) shouldBe 3.0 +- 1e-9
    vals(1) shouldBe 1.0 +- 1e-9
    // eigenvector of 3 is (1,1)/sqrt(2) up to sign
    math.abs(vecs(0)(0)) shouldBe (1.0 / math.sqrt(2)) +- 1e-9
    (vecs(0)(0) * vecs(1)(0)) should be > 0.0  // same sign components
    (vecs(0)(1) * vecs(1)(1)) should be < 0.0  // opposite for eigenvalue 1
  }

  test("trained rotation is orthonormal and preserves pairwise L2 distances") {
    val r = SimilaritySearch.opqTrainRotation(
      emb.filter(col("vec_id") >= 32), "embedding", m = 16)
    val d = r.length
    // R^T R = I (columns orthonormal)
    for (a <- Seq(0, 7, 31, d - 1); b <- Seq(0, 7, 31, d - 1)) {
      val dot = (0 until d).map(i => r(i)(a) * r(i)(b)).sum
      dot shouldBe (if (a == b) 1.0 else 0.0) +- 1e-9
    }
    // distances survive the rotation (isometry)
    val two = emb.filter(col("vec_id").isin(40, 41))
    val rot = SimilaritySearch.rotateVectors(two, "embedding", r, "rvec")
      .select(col("vec_id"), col("embedding"), col("rvec"))
      .as[(Long, Seq[Float], Seq[Float])].collect().sortBy(_._1)
    def sq(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    sq(rot(0)._3, rot(1)._3) shouldBe sq(rot(0)._2, rot(1)._2) +- 1e-3
  }

  test("allocation balances per-subspace variance PRODUCTS (the OPQ criterion) vs naive sequential order") {
    // the quantization distortion of a dsub-dim codebook scales with the
    // PRODUCT of its directions' variances (the paper's balanced
    // criterion) — so the allocation must balance per-subspace
    // log-eigenvalue LOADS, and must beat the naive "first dsub
    // eigen-dims to subspace 0" order by a wide margin
    val corpus = emb.filter(col("vec_id") >= 32)
    val r = SimilaritySearch.opqTrainRotation(corpus, "embedding", m = 16)
    val rotated = SimilaritySearch.rotateVectors(corpus, "embedding", r, "rvec")
      .select(col("rvec")).as[Seq[Float]].collect()
    val d = rotated.head.length; val dsub = d / 16
    // per-DIMENSION variance of the rotated data = the (permuted)
    // eigenvalues; subspace load = sum of log variances
    val dimVar = (0 until d).map { i =>
      val xs = rotated.map(_(i).toDouble)
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
    }
    def loads(order: Seq[Int]): Seq[Double] =
      (0 until 16).map(j =>
        (j * dsub until (j + 1) * dsub).map(i => math.log(dimVar(order(i)))).sum)
    val balanced = loads(0 until d)
    // naive order: the same variances sorted descending, sliced
    // sequentially — what allocation-free PCA would do
    val naive = loads((0 until d).sortBy(i => -dimVar(i)))
    def spread(vs: Seq[Double]): Double = vs.max - vs.min
    info(f"log-variance load spread: balanced ${spread(balanced)}%.4f vs naive ${spread(naive)}%.4f")
    spread(balanced) should be < spread(naive) / 2
  }

  test("allocation is scale-invariant: uniformly scaled data trains the identical rotation") {
    // scaling multiplies every eigenvalue by a constant = adds a
    // constant to every log — the shift-invariant greedy must produce
    // the same permutation, and eigenvectors are scale-free, so R is
    // identical. (A load-only greedy silently flips to the naive
    // slicing once eigenvalues cross 1.0 — this pins the regression.)
    // x * 32 is EXACT in float32 (pure exponent shift), so the scaled
    // covariance is bit-for-bit 1024x the original and Jacobi's
    // ratio-driven rotations reproduce R exactly
    val corpus = emb.filter(col("vec_id") >= 32)
    val scaled = corpus.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(32.0f)).as("embedding"))
    val r1 = SimilaritySearch.opqTrainRotation(corpus, "embedding", m = 16)
    val r2 = SimilaritySearch.opqTrainRotation(scaled, "embedding", m = 16)
    r1.zip(r2).foreach { case (row1, row2) =>
      row1.zip(row2).foreach { case (a, b) => a shouldBe b +- 1e-6 }
    }
  }

  test("ragged or mismatched dimensions raise instead of silently skewing") {
    val mixed = Seq((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(1f, 2f)))
      .toDF("vec_id", "embedding")
    an[Exception] should be thrownBy
      SimilaritySearch.opqTrainRotation(mixed, "embedding", m = 2)
    val r = SimilaritySearch.opqTrainRotation(
      Seq((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(4f, 3f, 2f, 1f)),
        (3L, Seq(0f, 1f, 0f, 2f))).toDF("vec_id", "embedding"),
      "embedding", m = 2)
    an[Exception] should be thrownBy
      SimilaritySearch.rotateVectors(
        Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding"),
        "embedding", r, "rvec").collect()
  }

  test("the rotation buys ADC recall at the same code budget (deterministic A/B)") {
    val k = 5
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 32)
      .select(col("vec_id"), col("embedding"))
    val r = SimilaritySearch.opqTrainRotation(corpus, "embedding", m = 16)

    def recallOf(q: org.apache.spark.sql.DataFrame,
                 c: org.apache.spark.sql.DataFrame): Double = {
      // codebook seeds: sub-vectors of the first 32 corpus rows of the
      // SAME space (raw seeds for raw, rotated seeds for rotated), then
      // one Lloyd round — identical recipe both arms
      val cbRows = c.orderBy(col("vec_id")).limit(32)
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toSeq).toSeq
      val seeds = (0 until 16).map(j => cbRows.map(_.slice(j * 4, j * 4 + 4)))
      val books = SimilaritySearch.pqTrain(c, seeds, iters = 1,
        vecCol = "embedding")
      def sqd(a: Seq[Float], b: Seq[Float]) =
        a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
      val qv = q.as[(Long, Seq[Float])].collect()
      val cv = c.as[(Long, Seq[Float])].collect()
      val exact = qv.map { case (qid, v) =>
        qid -> cv.sortBy { case (nid, w) => (sqd(v, w), nid) }
          .take(k).map(_._1).toSet
      }.toMap
      val ann = SimilaritySearch.pqAdcTopK(q, c, books, k)
        .select(col("qid"), col("nid")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (qid, truth) =>
        ann.getOrElse(qid, Set.empty[Long]).intersect(truth).size.toDouble / k
      }.sum / exact.size
    }

    val raw = recallOf(queries, corpus)
    val rq = SimilaritySearch.rotateVectors(queries, "embedding", r, "rvec")
      .select(col("vec_id"), col("rvec").as("embedding"))
    val rc = SimilaritySearch.rotateVectors(corpus, "embedding", r, "rvec")
      .select(col("vec_id"), col("rvec").as("embedding"))
    val rotated = recallOf(rq, rc)
    info(f"ADC recall@$k: raw $raw%.3f -> rotated $rotated%.3f (m=16, ksub=32)")
    // deterministic fixture: the win is a pinned measurement, not luck
    rotated should be > raw
  }
}
