package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an `array<float>` embedding column.
  *
  * Scale story: the query set is the SMALL side — it is broadcast, so the
  * corpus is scanned exactly once, partition-local, no shuffle of the corpus
  * ever happens. Top-k per query runs as a partial (per-partition) top-k
  * before the final per-query merge, so the shuffle carries at most
  * k·partitions·queries rows, not the corpus.
  */
object Similarity {

  /** Brute-force cosine top-k: exact baseline. `queries` must be small
    * (broadcast). Returns (query_id, neighbor_id, cos) — self-matches
    * excluded, ties broken by neighbor id.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(F.broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("cv").cast("array<double>"), col("qv").cast("array<double>"))
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "cos", "rnk")
  }

  /** Deterministic Rademacher (±1) hyperplanes for sign-LSH. */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Random-hyperplane signature: bit p = sign(v · r_p). Collision
    * probability of two vectors = 1 - θ/π per bit, so equal 16-bit
    * signatures ⇒ small angle. Constant-folded plane literals, one pass.
    */
  def lshSignature(vecCol: String, nPlanes: Int = 16, dim: Int = 64,
                   seed: Long = 7L): org.apache.spark.sql.Column = {
    val planes = hyperplanes(nPlanes, dim, seed)
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      acc.bitwiseOR(
        when(dotConst(col(vecCol), p) >= 0.0d, lit(1L << i)).otherwise(lit(0L)))
    }
  }

  /** LSH-bucketed approximate top-k: corpus and queries hashed to 16-bit
    * sign signatures; candidates = same bucket (plus multi-probe on the
    * `probes` lowest-bit flips to lift recall); exact cosine rerank inside
    * buckets only. The corpus-side shuffle is keyed on the 16-bit bucket —
    * at 100 TB this is the difference between a bucket-join and an
    * impossible cross product.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int = 10, nPlanes: Int = 16, dim: Int = 64,
              probes: Int = 2, seed: Long = 7L): DataFrame = {
    val sig = lshSignature(vecCol, nPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      sig.as("bucket"))
    // multi-probe: each query also probes buckets with one of the lowest
    // `probes` bits flipped
    val probeSigs = (0 until probes).foldLeft(Seq(sig)) { (acc, b) =>
      acc :+ sig.bitwiseXOR(lit(1L << b))
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(array_distinct(array(probeSigs: _*))).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("cv").cast("array<double>"), col("qv").cast("array<double>"))
          .as("cos"))
      .groupBy("query_id", "neighbor_id").agg(max("cos").as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "cos", "rnk")
  }

  /** Embedding-cosine near-duplicate pairs: LSH buckets → exact cosine ≥
    * threshold. Returns (id_a, id_b, cos).
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double = 0.95, nPlanes: Int = 16,
                            dim: Int = 64, seed: Long = 7L): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshSignature(vecCol, nPlanes, dim, seed).as("bucket"))
    val left = keyed.select(col("bucket"), col("id").as("id_a"),
      col("v").as("v_a"))
    val right = keyed.select(col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"))
    left.join(right, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("v_a").cast("array<double>"), col("v_b").cast("array<double>"))
          .as("cos"))
      .where(col("cos") >= threshold)
      .groupBy("id_a", "id_b").agg(round(max("cos"), 6).as("cos"))
  }
}
