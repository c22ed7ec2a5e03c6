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
}
