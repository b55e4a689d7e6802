package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

class ClusteringSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private lazy val emb = Tables(spark, sfDir(), "embeddings")

  test("iters=1 assignment equals the driver-side brute-force argmax") {
    val centroids = Clustering.initCentroids(emb, "vec_id", "embedding", 8)
    val got = Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 8, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    vecs.foreach { case (id, v) =>
      // argmax by (cos, list): ties resolve to the HIGHER list index,
      // matching array_max over (cos, list) structs
      val want = centroids.zipWithIndex
        .map { case (c, i) => (cos(v, c.toSeq), i) }.max._2
      assert(got(id) === want, s"vec $id")
    }
  }

  test("assignment is deterministic under repartitioning") {
    val a = Clustering.kmeansAssign(emb, "vec_id", "embedding", 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Clustering.kmeansAssign(emb.repartition(7, col("vec_id")),
        "vec_id", "embedding", 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  test("Lloyd iterations never degrade the mean within-cluster cosine") {
    def meanCos(iters: Int): Double =
      Clustering.kmeansAssign(emb, "vec_id", "embedding", 8, iters)
        .agg(avg("cos")).head.getDouble(0)
    val m1 = meanCos(1); val m2 = meanCos(2); val m3 = meanCos(3)
    assert(m2 >= m1 - 1e-9, s"iter2 $m2 < iter1 $m1")
    assert(m3 >= m2 - 1e-9, s"iter3 $m3 < iter2 $m2")
  }

  test("every vector is assigned to exactly one of k clusters") {
    val out = Clustering.kmeansAssign(emb, "vec_id", "embedding", 8, iters = 2)
    assert(out.count() === emb.count())
    val lists = out.select("list").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(lists.subsetOf((0 until 8).toSet), lists.toString)
  }
}
