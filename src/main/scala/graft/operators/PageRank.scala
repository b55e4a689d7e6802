package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank over a link graph — the graph-centrality pass crawl-curation
  * pipelines run to weight domains/documents by link authority (the
  * CommonCrawl "harmonic/PageRank domain ranking" shape; cf. Page et al.
  * 1999, public). Declarative Spark iterations, no GraphX dependency:
  * rank state is a (node, double) frame advanced by one equi-join + one
  * keyed aggregate per iteration.
  *
  * Scale shape: the edge list — the corpus-sized side — is repartitioned
  * on its JOIN key (`src`) and persisted ONCE; every iteration's
  * rank-to-edge join then reuses that cached partitioning, so only the
  * node-sized rank frame moves per round (the c13 loop contract). The
  * per-iteration aggregate shuffles edge contributions keyed on `dst` —
  * the irreducible PageRank exchange. No driver-side state beyond the
  * node count; persist handles rotate each round.
  *
  * Semantics: the classic damped update
  * `r'(v) = (1-d)/n + d * Σ_{u→v} r(u)/outDeg(u)`, iterated a fixed
  * `iters` times from the uniform start. Nodes without out-edges leak
  * their mass (the non-normalized textbook variant — documented, and
  * replayed identically by the oracle); nodes without in-edges settle at
  * `(1-d)/n`.
  */
object PageRank {

  /** @param nodes one row per node (idCol); edges may reference any subset
    * @return (idCol, rank) — one row per node, Σ rank ≤ 1
    */
  def pagerank(nodes: DataFrame, edges: DataFrame, idCol: String,
               srcCol: String, dstCol: String, iters: Int = 3,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val n = nodes.count()
    require(n > 0, "pagerank: empty node set")
    val base = (1.0 - damping) / n

    val outDeg = edges.groupBy(col(srcCol).as("src"))
      .agg(count(lit(1)).cast("double").as("od"))
    // corpus-sized state, shuffled once for the whole loop
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .join(outDeg, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val ids = nodes.select(col(idCol).as("id"))
    var persisted: DataFrame = null
    var ranks = ids.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .select(col("dst"), (col("r") / col("od")).as("w"))
      val sums = contrib.groupBy(col("dst").as("id"))
        .agg(sum("w").as("in_mass"))
      val next = ids.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) * coalesce(col("in_mass"), lit(0.0)))
            .as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before releasing the previous round
      if (persisted != null) persisted.unpersist()
      persisted = next
      ranks = next
    }
    e.unpersist()
    ranks.select(col("id").as(idCol), col("r").as("rank"))
  }
}
