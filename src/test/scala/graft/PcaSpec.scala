package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random in [-1, 1): md5-derived, no RNG state
  private def h(seed: Long, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val b = md.digest(s"$seed:$dim".getBytes("UTF-8"))
    (((b(0) & 0xff) << 16) | ((b(1) & 0xff) << 8) | (b(2) & 0xff)) / 8388608.0 - 1.0
  }

  test("jacobiEigen matches the closed-form 2x2 and leaves diagonals exact") {
    // [[2,1],[1,2]] → eigvals 3,1; eigvecs (1,1)/√2 and (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    val big = if (vals(0) > vals(1)) 0 else 1
    assert(math.abs(math.abs(vecs(0)(big)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(vecs(0)(big) - vecs(1)(big)) < 1e-12) // same sign, equal
    // exactly-diagonal input: zero rotations, exact identity back
    val (dv, id) = Pca.jacobiEigen(Array(Array(5.0, 0.0), Array(0.0, 7.0)))
    assert(dv.toSeq === Seq(5.0, 7.0))
    assert(id(0)(0) === 1.0 && id(1)(1) === 1.0 && id(0)(1) === 0.0 && id(1)(0) === 0.0)
  }

  test("fit recovers a planted dominant axis and orders variances") {
    val d = 8
    // variance ~9 along axis 2, ~0.08 elsewhere: axis 2 must dominate
    val rows = (0L until 600L).map { i =>
      (i, Seq.tabulate(d) { j =>
        val noise = 0.5 * h(i, j)
        (if (j == 2) 6.0 * h(i, 100) + noise else noise).toFloat
      })
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", k = 3)
    assert(m.variances(0) > m.variances(1) && m.variances(1) >= m.variances(2))
    // dominant component is ±e2 up to noise
    assert(math.abs(m.components(0)(2)) > 0.99, m.components(0).toSeq.toString)
    // components orthonormal
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = (0 until d).map(i => m.components(a)(i) * m.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"($a,$b) -> $dot")
    }
  }

  test("moments equal a driver-side brute force (fit is one corpus pass)") {
    val d = 4
    val rows = (0L until 50L).map(i => (i, Seq.tabulate(d)(j => h(i, j).toFloat)))
    val df = rows.toDF("vec_id", "embedding").repartition(7) // any layout
    val m = Pca.fit(df, "embedding", k = d)
    // brute-force covariance in driver doubles
    val xs = rows.map(_._2.map(_.toDouble))
    val n = xs.size.toDouble
    val mean = (0 until d).map(j => xs.map(_(j)).sum / n)
    // Σ_k var_k == trace(cov): eigenvalue sum preserved by Jacobi
    val trace = (0 until d).map(i =>
      xs.map(x => (x(i) - mean(i)) * (x(i) - mean(i))).sum / n).sum
    assert(math.abs(m.variances.sum - trace) < 1e-9)
    (0 until d).foreach(j => assert(math.abs(m.mean(j) - mean(j)) < 1e-9))
  }

  test("whitened projection has unit variance per component") {
    val d = 6
    val rows = (0L until 800L).map { i =>
      (i, Seq.tabulate(d)(j => ((j + 1) * h(i, j)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", k = 4)
    val proj = Pca.project(df, "embedding", m, whiten = true)
      .select(explode(expr(
        "transform(sequence(0, 3), j -> struct(j AS j, element_at(proj, j + 1) AS y))")))
      .select(col("col.j").as("j"), col("col.y").as("y"))
    val stats = proj.groupBy("j")
      .agg(avg(col("y")).as("mu"), avg(col("y") * col("y")).as("m2"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    stats.foreach { case (j, mu, m2) =>
      assert(math.abs(m2 - mu * mu - 1.0) < 1e-6, s"component $j variance")
    }
    // and the plan is exchange-free up to the final collect: per-row only
    val p = Pca.project(df, "embedding", m).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }
}
