package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Batch perceptron: hand-checked single-epoch update, convergence on
  * a linearly separable plant, partitioning-invariance on integer
  * features, and score/filter consistency. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  test("one epoch from zero weights sums y*x over every row (hand check)") {
    // w=0 -> margin 0 -> y*0 <= 0 -> ALL rows count as misclassified
    val df = Seq((1.0, 2.0, 1.0), (3.0, -1.0, -1.0), (0.5, 0.5, 1.0))
      .toDF("f1", "f2", "y")
    val m = Classify.fitPerceptron(df, Seq("f1", "f2"), "y", epochs = 1)
    // sum(y*f1) = 1 - 3 + 0.5 = -1.5; sum(y*f2) = 2 + 1 + 0.5 = 3.5; bias = 1
    assert(m.weights.toSeq === Seq(-1.5, 3.5, 1.0))
  }

  test("separable plant converges: zero misclassified after few epochs") {
    // y = sign(f1 - f2) with a wide margin
    val rows = (0 until 200).map { i =>
      val f1 = (i % 20).toDouble
      val f2 = ((i * 7) % 20).toDouble
      if (f1 == f2) (f1, f2 + 5.0, -1.0) else (f1, f2, if (f1 > f2) 1.0 else -1.0)
    }
    val df = rows.toDF("f1", "f2", "y")
    val m = Classify.fitPerceptron(df, Seq("f1", "f2"), "y", epochs = 30, lr = 0.25)
    val wrong = Classify.score(df, m)
      .where(col("predicted") =!= col("y").cast("int")).count()
    assert(wrong === 0L, s"$wrong misclassified after 30 epochs; w=${m.weights.toSeq}")
  }

  test("integer-featured fit is bit-identical under repartition") {
    val df = Tables.documents(spark, sfDir).select(
      expr("CAST(doc_id % 5 - 2 AS DOUBLE)").as("f1"),
      expr("CAST(doc_id % 7 - 3 AS DOUBLE)").as("f2"),
      expr("CAST(IF(doc_id % 3 = 0, 1, -1) AS DOUBLE)").as("y"))
    val a = Classify.fitPerceptron(df, Seq("f1", "f2"), "y", epochs = 3)
    val b = Classify.fitPerceptron(df.repartition(13), Seq("f1", "f2"), "y", epochs = 3)
    assert(a.history.map(_.toSeq) === b.history.map(_.toSeq))
  }

  test("historyRows flattens every epoch, filter keeps exactly margin > 0") {
    val df = Seq((1.0, 1.0), (-1.0, -1.0)).toDF("f1", "y")
    val m = Classify.fitPerceptron(df, Seq("f1"), "y", epochs = 2)
    assert(m.historyRows.map(r => (r._1, r._2)) ===
      Seq((1, "f1"), (1, "__bias"), (2, "f1"), (2, "__bias")))
    val scored = Classify.score(df, m)
    val kept = Classify.filter(df, m).count()
    assert(kept === scored.where(col("margin") > 0.0).count())
  }

  test("fit rejects out-of-range epochs and feature counts") {
    val df = Seq((1.0, 1.0)).toDF("f1", "y")
    intercept[IllegalArgumentException](
      Classify.fitPerceptron(df, Seq("f1"), "y", epochs = 0))
    intercept[IllegalArgumentException](
      Classify.fitPerceptron(df, Seq.empty, "y", epochs = 1))
  }

  test("averagedWeights is the per-coordinate mean of the epoch history") {
    val df = Seq((1.0, 2.0, 1.0), (3.0, -1.0, -1.0)).toDF("f1", "f2", "y")
    val m = Classify.fitPerceptron(df, Seq("f1", "f2"), "y", epochs = 3)
    val expect = m.history.transpose.map(ws => ws.sum / 3)
    assert(m.averagedWeights.toSeq === expect.toSeq)
  }

  test("calibrated probabilities: both links are monotone sigmoids around 0.5") {
    val margins = Seq(-10.0, -1.0, -0.1, 0.0, 0.1, 1.0, 10.0)
    val df = margins.toDF("m")
    val ps = df.select(
        Classify.probabilityExact(col("m")).as("pe"),
        Classify.probabilityLogistic(col("m")).as("pl"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // in (0, 1), 0.5 exactly at the boundary, strictly increasing,
    // and both links RANK margins identically
    assert(ps.forall { case (a, b) => a > 0 && a < 1 && b > 0 && b < 1 })
    assert(ps(3) === ((0.5, 0.5)))
    assert(ps.map(_._1).toSeq === ps.map(_._1).sorted.toSeq)
    assert(ps.map(_._2).toSeq === ps.map(_._2).sorted.toSeq)
    // exact link reproduces its closed form bit-for-bit
    for ((m, (pe, _)) <- margins.zip(ps))
      assert(pe === 0.5 + m / (2.0 * (1.0 + math.abs(m))))
  }

  test("calibrated scores compose with quality-weighted sampling") {
    import graft.operators.Sampling
    // the composition sample_by_classifier registers: averaged-model
    // margin -> exact keep-probability -> bucket draw. Fit on the
    // planted separable data so p_keep is informative.
    val rows = (0 until 400).map { i =>
      val f1 = (i % 20).toDouble
      val f2 = ((i * 7) % 20).toDouble
      (i.toLong, f1, f2, if (f1 > f2) 1.0 else -1.0)
    }
    val df = rows.toDF("doc_id", "f1", "f2", "y")
    val m = Classify.fitPerceptron(df, Seq("f1", "f2"), "y",
      epochs = 10, lr = 0.25)
    val scored = Classify.scoreCalibrated(df, m)
    val kept = scored
      .where(Sampling.bucket65536(col("doc_id")) <
             floor(col("p_keep") * 65536).cast("long"))
    // deterministic: same rows on a re-run with different partitioning
    val a = kept.select("doc_id").as[Long].collect().toSet
    val b = Classify.scoreCalibrated(df.repartition(13), m)
      .where(Sampling.bucket65536(col("doc_id")) <
             floor(col("p_keep") * 65536).cast("long"))
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    // the sampler favors the classifier's keeps: the kept rate among
    // high-p docs must dominate the rate among low-p docs
    val hi = scored.where(col("p_keep") > 0.8)
    val lo = scored.where(col("p_keep") < 0.2)
    if (hi.count() > 20 && lo.count() > 20) {
      val hiRate = hi.where(Sampling.bucket65536(col("doc_id")) <
        floor(col("p_keep") * 65536).cast("long")).count().toDouble / hi.count()
      val loRate = lo.where(Sampling.bucket65536(col("doc_id")) <
        floor(col("p_keep") * 65536).cast("long")).count().toDouble / lo.count()
      assert(hiRate > loRate,
        s"high-p kept rate $hiRate not above low-p $loRate")
    }
  }
}
