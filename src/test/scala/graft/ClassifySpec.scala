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
}
