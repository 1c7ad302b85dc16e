package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeans
import graft.sources.Tables

class KMeansSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos6(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else r6(dot / den)
  }

  /** Independent spherical k-means: same seeds, 6dp scores with
    * lowest-cell ties, 6dp-through-FLOAT member-mean updates,
    * micro-unit inertia. */
  private def replicate(vecs: Array[(Long, Array[Double])], k: Int,
      iters: Int): Seq[(Int, Long, Long)] = {
    val sorted = vecs.sortBy(_._1)
    val dim = sorted.head._2.length
    var cent: Map[Int, Array[Double]] =
      sorted.take(k).zipWithIndex.map { case ((_, v), i) => (i, v) }.toMap
    (1 to iters).map { it =>
      val assign = sorted.map { case (id, v) =>
        val best = cent.toSeq
          .map { case (c, cv) => (c, cos6(v, cv)) }
          .maxBy { case (c, s) => (s, -c) }
        (id, best._1, best._2, v)
      }
      val inertia = assign.map(a => BigDecimal((1.0 - a._3) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      val nCells = assign.map(_._2).distinct.length.toLong
      cent = assign.groupBy(_._2).map { case (c, ms) =>
        c -> (0 until dim).map { i =>
          r6(ms.map(_._4(i)).sum / ms.length).toFloat.toDouble
        }.toArray
      }
      (it, nCells, inertia)
    }
  }

  test("kmeans reconciles against an independent plain-Scala " +
    "spherical k-means on the corpus") {
    val vecs = t.embeddings.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val expected = replicate(vecs, KMeans.kmeansK, KMeans.kmeansIters)
    val got = KMeans.kmeans(t).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // the convergence property the row exists to expose
    val inertias = got.map(_._3)
    assert(inertias.zip(inertias.tail).forall { case (a, b) => b <= a },
      s"inertia not non-increasing: $inertias")
  }

  test("planted duplicate blobs: ties collapse to the lowest cell, " +
    "inertia is exactly zero from the first step") {
    import spark.implicits._
    val a = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val b = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    // first 8 ids alternate blobs (they become the seeds), then 32
    // more members of each
    val rows = (0L until 40L).map { id =>
      (id, if (id % 2 == 0) a else b)
    }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = KMeans.kmeansOn(spark, df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    got.foreach { case (_, nCells, inertia) =>
      assert(nCells === 2L, "identical-score ties must collapse to the lowest cell per blob")
      assert(inertia === 0L)
    }
    assert(got.length === KMeans.kmeansIters)
  }
}
