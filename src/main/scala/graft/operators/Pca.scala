package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis for embedding columns — the standard
  * pre-indexing step (dim reduction / whitening before IVF or
  * quantization; Jégou et al. TPAMI'11 §V.C train PQ on PCA-rotated
  * vectors, and OPQ's parametric solution IS PCA + a permutation).
  * The reference's pipeline embeds at a fixed provider dimension
  * (confluentinc/flink-sql-ai-meetingcoach-azure
  * generate_personalized_commands.sh:294-307); a training-data engine
  * additionally needs to RESHAPE that space — this operator is the
  * public-knowledge recipe for it.
  *
  * Distributed shape: training is ONE mapPartitions pass producing
  * (count, Σx, upper(Σxxᵀ)) partials — d + d(d+1)/2 doubles per
  * partition collected to the driver (the Lloyd-means transfer bound,
  * d=64 → ~18 KB/partition), then a driver-side d×d cyclic-Jacobi
  * eigensolve ([[SimilaritySearch.jacobiEigen]], deterministic). At
  * 100 TB the pass is embarrassingly row-parallel and the transfer is
  * per-PARTITION, not per-row. Projection is a broadcast-closure UDF:
  * r double multiply-adds per output component, no shuffle. */
object Pca {

  /** Trained model: `mean` (d), `components` d×r with COLUMN c = the
    * c-th principal direction (descending eigenvalue), `eigVals` the
    * top-r sample-covariance eigenvalues. */
  final case class PcaModel(mean: Array[Double],
                            components: Seq[Seq[Double]],
                            eigVals: Array[Double]) {
    def d: Int = mean.length
    def r: Int = eigVals.length
  }

  /** One-pass moment statistics of a vector column: (n, Σx as `sum`,
    * sample covariance). Shared by PCA and OPQ training so the partials
    * recipe (upper-triangle accumulation, ragged-vector raise, bounded
    * driver transfer) exists exactly once. A ragged vector RAISES: a
    * silently truncated or zero-padded row would bias the covariance
    * with no diagnostic. */
  private[graft] def momentStats(df: DataFrame, vecCol: String)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    // partials carry the PACKED upper triangle — d(d+1)/2 doubles, not
    // d², so the per-partition driver transfer matches the documented
    // bound; row i starts at i*d − i(i−1)/2 − i in packed space, i.e.
    // entry (i, j≥i) lives at tri(i) + (j − i)
    def triBase(i: Int, d: Int): Int = i * d - i * (i - 1) / 2 - i
    val partials = df.select(col(vecCol)).as[Seq[Float]].mapPartitions { it =>
      var n = 0L
      var dim = -1
      var sum: Array[Double] = null
      var upper: Array[Double] = null
      it.foreach { v =>
        if (dim < 0) {
          dim = v.length
          sum = new Array[Double](dim)
          upper = new Array[Double](dim * (dim + 1) / 2)
        }
        require(v.length == dim,
          s"momentStats: vector of dim ${v.length} in a dim-$dim corpus")
        n += 1
        var i = 0
        while (i < dim) {
          val xi = v(i).toDouble
          sum(i) += xi
          val base = triBase(i, dim)
          var j = i
          while (j < dim) { upper(base + j) += xi * v(j); j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty else Iterator((n, sum.toSeq, upper.toSeq))
    }.collect()
    require(partials.nonEmpty, "momentStats: empty input")
    val d = partials.head._2.length
    require(partials.forall(_._2.length == d),
      "momentStats: partitions disagree on the vector dim")
    val n = partials.map(_._1).sum
    require(n > 1, "momentStats: need at least 2 vectors")
    val sum = new Array[Double](d)
    val outer = new Array[Double](d * (d + 1) / 2)
    partials.foreach { case (_, s, o) =>
      var i = 0
      while (i < d) { sum(i) += s(i); i += 1 }
      i = 0
      while (i < outer.length) { outer(i) += o(i); i += 1 }
    }
    // covariance (sample, n-1 divisor): (Σxxᵀ − n·μμᵀ) / (n−1), the
    // packed triangle read symmetrically
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      (outer(triBase(lo, d) + hi) - sum(i) * sum(j) / n) / (n - 1)
    }
    (n, sum.map(_ / n), cov)
  }

  /** Train a rank-`r` PCA model on `vecCol`. Deterministic: the moment
    * pass is order-independent per partial and the Jacobi sweep order
    * is fixed, so the same data yields the bit-identical model (sign of
    * each component included).
    *
    * `center` picks WHICH structure the subspace preserves, and using
    * the wrong one silently degrades the downstream task:
    *  - `true` (classic PCA, covariance eigenbasis + mean subtraction):
    *    feature-space variance — drift profiling, whitening, feature
    *    extraction.
    *  - `false` (second-moment eigenbasis, no subtraction — truncated
    *    SVD): DOT-PRODUCT structure, ⟨Px,Py⟩ ≈ ⟨x,y⟩ — the reduction
    *    for cosine/IP retrieval. At FULL rank it is an orthonormal
    *    isometry (recall exactly 1.0), where the centered projection is
    *    not (origin shift; measured 0.96 at r=d on the test
    *    embeddings) — PcaSpec pins both, plus graceful recall
    *    degradation as r shrinks. The model's `mean` is zeroed so
    *    [[project]] applies no shift. */
  def pcaTrain(df: DataFrame, vecCol: String, r: Int,
               center: Boolean = true): PcaModel = {
    val (n, mean, cov) = momentStats(df, vecCol)
    val d = mean.length
    require(r >= 1 && r <= d, s"pcaTrain: rank $r outside 1..$d")
    // uncentered second moment from the same pass:
    // Σxxᵀ/(n−1) = cov + n/(n−1)·μμᵀ
    val basis =
      if (center) cov
      else Array.tabulate(d, d)((i, j) =>
        cov(i)(j) + n.toDouble / (n - 1) * mean(i) * mean(j))
    val (eigVals, eigVecs) = SimilaritySearch.jacobiEigen(basis)
    PcaModel(if (center) mean else new Array[Double](d),
      Seq.tabulate(d)(i => Seq.tabulate(r)(c => eigVecs(i)(c))),
      eigVals.take(r))
  }

  /** Project `vecCol` onto the model's components:
    * y[c] = Σ_i comp(i)(c)·(x(i) − μ(i)), accumulated in index order in
    * doubles and cast to float — the exact arithmetic the SQL oracle
    * replays from the exported sidecar (the opq_rotation convention).
    * With `whiten` each component is scaled by 1/√max(λc, 1e-12) so the
    * projected coordinates have ~unit variance (the whitening PQ/IVF
    * preconditioner). Null vectors stay null; a ragged vector raises
    * (same contract as [[SimilaritySearch.rotateVectors]]). */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
              outCol: String, whiten: Boolean = false): DataFrame = {
    val comp = model.components.map(_.toArray).toArray
    val mean = model.mean
    val scale =
      if (whiten) model.eigVals.map(l => 1.0 / math.sqrt(math.max(l, 1e-12)))
      else Array.fill(model.r)(1.0)
    val proj = udf((v: Seq[Float]) =>
      if (v == null) null
      else {
        require(v.length == mean.length,
          s"Pca.project: vector of dim ${v.length} vs model dim ${mean.length}")
        Array.tabulate(scale.length) { c =>
          var acc = 0.0
          var i = 0
          while (i < mean.length) {
            acc += comp(i)(c) * (v(i).toDouble - mean(i)); i += 1
          }
          (acc * scale(c)).toFloat
        }.toSeq
      })
    df.withColumn(outCol, proj(col(vecCol)))
  }
}
