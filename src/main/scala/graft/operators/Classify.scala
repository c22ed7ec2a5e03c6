package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear quality classifier — the fastText/logistic-style
  * document filter the big web-corpus pipelines train against a
  * trusted reference slice (GPT-3's CommonCrawl filter, CCNet's LM
  * gate are this shape: cheap per-doc features, a linear separator,
  * keep what scores above threshold).
  *
  * The trainer is a synchronous BATCH perceptron: per epoch ONE corpus
  * scan computes Σ yᵢ·xᵢ over the currently-misclassified rows as a
  * single d+1-column global aggregate (map-side partial sums — shuffle
  * bytes are O(tasks·d), never rows), and the driver applies
  * w ← w + lr·Σ. That is the same iterative discipline as
  * [[Pca.fit]]/[[Dsir.fit]]: corpus work stays scan-shaped, model
  * state is a plan literal, NOTHING corpus-sized shuffles. Scoring is
  * a codegen'd in-row dot product with a fixed association order, so
  * given weights score identically on any engine (one multiply-add
  * chain per feature — IEEE-exact, no libm).
  *
  * Perceptron, not logistic: the update needs no exp/sigmoid, so with
  * integer-valued planted features EVERY weight, margin, and
  * misclassification test is exact integer arithmetic in doubles —
  * the driver oracle unrolls whole epochs in SQL and matches
  * bit-for-bit (`perceptron_sound`). Real-featured fits ride the
  * identical plan (floats make epoch sums order-sensitive, hence
  * rows-only there — the Pca/Dsir precedent).
  *
  * Reference evidence: quality gating over the documents table
  * (`/root/reference/mnt/dags/02datalake_to_datawarehouse.py:59-74`
  * derives per-row signals and drops columns/rows by rule, and
  * `scripts/product_to_demand.py:8` hard-codes the row-level
  * derivation); this operator learns the filter instead of
  * hard-coding it.
  */
object Classify {

  /** Weights after each epoch; `weights(e)` is the vector AFTER epoch
    * e+1 (bias last). */
  final case class PerceptronModel(features: Seq[String],
                                   history: Seq[Array[Double]]) {
    def weights: Array[Double] = history.last
    /** AVERAGED weights — the mean of the post-epoch vectors (batch
      * form of Freund & Schapire's averaged perceptron): late epochs
      * oscillate around the separator and the average is the stable
      * estimator a shipped filter wants. Arithmetic is the
      * left-to-right epoch sum divided once by the epoch count, so
      * with integer planted features the result is one exact integer
      * division — identical IEEE in any engine (the sound-gate
      * discipline of the plain weights carries over). */
    def averagedWeights: Array[Double] = {
      val d = history.head.length
      Array.tabulate(d) { i =>
        history.map(_(i)).reduceLeft(_ + _) / history.size
      }
    }
    /** (epoch, feature, weight) rows — scalar, driver-compare-safe. */
    def historyRows: Seq[(Int, String, Double)] =
      history.zipWithIndex.flatMap { case (w, e) =>
        (features :+ "__bias").zip(w.toSeq).map { case (f, v) =>
          (e + 1, f, v)
        }
      }
  }

  /** Fit by synchronous batch updates: epoch t computes
    * m = Σ_{i : yᵢ·(w·xᵢ + b) <= 0} yᵢ·[xᵢ, 1] in one scan and sets
    * w ← w + lr·m. `labelCol` must be ±1. Deterministic for integer
    * features at any partitioning (sums of exact integers); for real
    * features deterministic per plan. */
  def fitPerceptron(df: DataFrame, featureCols: Seq[String],
                    labelCol: String, epochs: Int,
                    lr: Double = 1.0): PerceptronModel = {
    require(featureCols.nonEmpty && featureCols.size <= 256,
      s"feature count out of [1, 256]: ${featureCols.size}")
    require(epochs >= 1 && epochs <= 64, s"epochs out of [1, 64]: $epochs")
    val d = featureCols.size
    var w = Array.fill(d + 1)(0.0)
    val hist = Vector.newBuilder[Array[Double]]
    for (_ <- 0 until epochs) {
      val margin = dot(featureCols.map(col), w)
      val mis = (col(labelCol) * margin) <= lit(0.0)
      val sums = featureCols.map(f =>
        sum(when(mis, col(labelCol) * col(f)).otherwise(lit(0.0)))) :+
        sum(when(mis, col(labelCol).cast("double")).otherwise(lit(0.0)))
      val row = df.agg(sums.head, sums.tail: _*).head() // d+1 doubles
      w = w.zipWithIndex.map { case (v, i) =>
        v + lr * (if (row.isNullAt(i)) 0.0 else row.getDouble(i))
      }
      hist += w
    }
    PerceptronModel(featureCols, hist.result())
  }

  /** In-row dot with the bias folded in, fixed left-to-right
    * association: ((f₀·w₀ + f₁·w₁) + …) + b — the order the oracle
    * SQL spells out. */
  private def dot(features: Seq[Column], w: Array[Double]): Column =
    features.zipWithIndex
      .map { case (f, i) => f * lit(w(i)) }
      .reduceLeft(_ + _) + lit(w.last)

  /** Margin + ±1 prediction per row under fixed weights — pure
    * codegen scan, zero exchange. */
  def score(df: DataFrame, model: PerceptronModel): DataFrame = {
    val margin = dot(model.features.map(col), model.weights)
    df.withColumn("margin", margin)
      .withColumn("predicted",
        when(col("margin") > 0.0, 1).otherwise(-1))
  }

  /** Keep rows the classifier accepts (margin > 0). */
  def filter(df: DataFrame, model: PerceptronModel): DataFrame =
    score(df, model).where(col("margin") > 0.0)
      .drop("margin", "predicted")

  // ------------------------------------------- calibrated probabilities

  /** Engine-exact sigmoid link: p = 1/2 + m / (2·(1 + |m|)) — the
    * "fast sigmoid" squash (x/(1+|x|) shifted into (0, 1)). Monotone
    * in the margin, 0.5 at the boundary, saturating toward 0/1 — the
    * calibration SHAPE of the logistic — but built from +, /, abs
    * only, so two engines produce bit-identical probabilities from
    * the same margin (Math.exp and another engine's exp may differ in
    * the last ulp, which a hash gate cannot tolerate). Use this when
    * the probability itself is part of a reproducibility contract:
    * deterministic quality-weighted sampling, audit dumps, the driver
    * oracle. */
  def probabilityExact(margin: Column): Column =
    lit(0.5) + margin / (lit(2.0) * (lit(1.0) + abs(margin)))

  /** Logistic link p = 1 / (1 + e^(-m/T)) — the standard calibrated
    * keep-probability (CCNet / GPT-3-style filters emit this, feeding
    * downstream importance sampling). `temperature` rescales
    * confidence (T > 1 softens, T < 1 sharpens — one-parameter
    * temperature scaling). Exp's last ulp is libm-specific; rankings
    * and thresholds are stable, exact cross-engine replay is what
    * [[probabilityExact]] is for. */
  def probabilityLogistic(margin: Column, temperature: Double = 1.0): Column = {
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    lit(1.0) / (lit(1.0) + exp(-margin / lit(temperature)))
  }

  /** Margin under the AVERAGED weights plus a calibrated
    * keep-probability — the production scoring path of the upgraded
    * classifier: the averaged separator scores, the link turns the
    * margin into the [0, 1] keep-probability that quality-weighted
    * sampling consumes directly (`p_keep` against a uniform
    * [[Sampling.bucket65536]] draw — the sampleByQuality shape with a
    * LEARNED score). Pure codegen scan, zero exchange. */
  def scoreCalibrated(df: DataFrame, model: PerceptronModel,
                      exact: Boolean = true,
                      temperature: Double = 1.0): DataFrame = {
    val margin = dot(model.features.map(col), model.averagedWeights)
    val p = if (exact) probabilityExact(col("margin"))
            else probabilityLogistic(col("margin"), temperature)
    df.withColumn("margin", margin).withColumn("p_keep", p)
  }
}
