package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening over an embedding column — the linear
  * front-end of embedding curation (decorrelate + variance-normalize
  * before cosine thresholds, IVF cells, or SemDeDup-style pruning;
  * public SemDeDup/ANN practice, no reference analogue — the reference
  * stops at SQL transforms).
  *
  * Scale split, like [[Cluster]]: the CORPUS work is one typed
  * partial-aggregate pass collecting the d-vector sum and the packed
  * d(d+1)/2 upper-triangular second-moment matrix — O(tasks · d²)
  * summary bytes shuffle, never rows. The d×d eigenproblem then runs
  * ON THE DRIVER (cyclic Jacobi, public textbook algorithm): at
  * embedding dims (64-1024) that is microseconds to milliseconds and
  * independent of corpus size — distributing it would be engineering
  * theater. Projection embeds the k components as plan literals and
  * runs through the native codegen [[graft.functions.GraftFunctions.dot]]
  * — per-row, zero Exchange, the assignCells discipline.
  *
  * Determinism: the moment sums are the one order-sensitive stage
  * (double addition); the sound driver gate therefore plants
  * integer-valued one-hot vectors whose products and sums are exact in
  * IEEE doubles at ANY aggregation order, making the whole pipeline —
  * moments, (trivially converged) Jacobi, projection — bit-stable and
  * DuckDB-checkable. On real float data the model is deterministic
  * per plan but, like every distributed float sum, not bit-pinned
  * across partitionings; PcaSpec gates those runs structurally
  * (orthonormality, variance ordering, planted-axis recovery).
  */
object Pca {

  /** mean is all-zeros when fitted with center=false; components are
    * row-major k×d, ordered by explained variance desc (ties broken
    * by original coordinate order via the stable sort). */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
                      variances: Array[Double]) {
    require(components.nonEmpty && variances.length == components.length)
    def d: Int = mean.length
    def k: Int = components.length
  }

  private[graft] case class Moments(sum: Seq[Double], m2: Seq[Double], n: Long)

  /** One-pass sum + packed-upper-triangle second moments. */
  private[graft] class MomentAgg
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Float], Moments, Moments] {
    override def zero: Moments = Moments(Nil, Nil, 0L)
    private def alloc(d: Int) = (new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    override def reduce(b: Moments, v: Seq[Float]): Moments = {
      val d = v.length
      val (s, m) = if (b.n == 0L) alloc(d) else (b.sum.toArray, b.m2.toArray)
      var i = 0; var p = 0
      while (i < d) {
        val vi = v(i).toDouble
        s(i) += vi
        var j = i
        while (j < d) { m(p) += vi * v(j); j += 1; p += 1 }
        i += 1
      }
      Moments(s.toSeq, m.toSeq, b.n + 1)
    }
    override def merge(x: Moments, y: Moments): Moments =
      if (x.n == 0L) y
      else if (y.n == 0L) x
      else {
        val s = x.sum.toArray; val m = x.m2.toArray
        var i = 0
        while (i < s.length) { s(i) += y.sum(i); i += 1 }
        i = 0
        while (i < m.length) { m(i) += y.m2(i); i += 1 }
        Moments(s.toSeq, m.toSeq, x.n + y.n)
      }
    override def finish(r: Moments): Moments = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Moments] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Moments]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Moments] = bufferEncoder
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (public
    * textbook algorithm — Golub & Van Loan §8.5): returns
    * (eigenvalues, eigenvectors as COLUMNS). Deterministic: fixed
    * (p,q) sweep order, fixed rotation formulas. A diagonal input
    * converges in ZERO rotations and returns the exact identity —
    * the property the sound gate leans on. */
  private[graft] def jacobiEigen(in: Array[Array[Double]],
                                 maxSweeps: Int = 64,
                                 tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = in.length
    val a = in.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm > tol * tol) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = if (theta >= 0.0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                    else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Fit a k-component model in ONE corpus pass. `center = false`
    * diagonalizes the raw second-moment matrix instead of the
    * covariance — the standard choice for L2-normalized embeddings
    * (mean subtraction breaks the unit sphere) and the exact-arithmetic
    * path the sound gate uses. */
  def fit(vectors: DataFrame, vecCol: String, k: Int,
          center: Boolean = true): PcaModel = {
    import vectors.sparkSession.implicits._
    val m = vectors.select(col(vecCol)).as[Seq[Float]]
      .select(new MomentAgg().toColumn).head()
    require(m.n > 0, "cannot fit PCA on an empty corpus")
    val d = m.sum.length
    require(k >= 1 && k <= d, s"k out of [1,$d]: $k")
    val n = m.n.toDouble
    val mean = if (center) m.sum.toArray.map(_ / n) else new Array[Double](d)
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var p = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = m.m2(p) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; p += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    // stable: equal variances keep original coordinate order
    val order = (0 until d).sortBy(c => -vals(c)).take(k)
    PcaModel(mean,
             order.map(c => Array.tabulate(d)(r => vecs(r)(c))).toArray,
             order.map(vals).toArray)
  }

  /** Project onto the model's components; `whiten = true` divides each
    * output coordinate by √variance (degenerate ≤0-variance components
    * pass through unscaled rather than exploding). Output: input
    * columns + `proj` (array<double>, length k). Per-row native-dot
    * codegen against literal components — zero Exchange. */
  def project(vectors: DataFrame, vecCol: String, model: PcaModel,
              whiten: Boolean = false): DataFrame = {
    val centered: Column =
      if (model.mean.forall(_ == 0.0)) col(vecCol)
      else zip_with(col(vecCol), typedLit(model.mean.toSeq),
                    (a, b) => a.cast("double") - b)
    val outs = model.components.zipWithIndex.map { case (comp, j) =>
      val raw = graft.functions.GraftFunctions.dot(
        centered, typedLit(comp.toSeq))
      if (whiten && model.variances(j) > 0.0)
        raw / lit(math.sqrt(model.variances(j))) else raw
    }
    vectors.withColumn("proj", array(outs: _*))
  }
}
