package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.util.sketch.CountMinSketch

/** Streaming heavy hitters — the B22 count-min sketch maintained as
  * STREAMING state (D12). The batch CMS answers "what was heavy"; this
  * answers "what is heavy so far" on an unbounded stream whose key space
  * would blow up D3-style per-key state.
  *
  * Shape: keys are sharded by hash into `nShards` groups and each group's
  * `GroupState` holds ONE count-min sketch — so total state is
  * nShards × (depth × width) counters, a CONSTANT independent of key
  * cardinality (per-key streaming state is O(distinct keys) and dies on
  * high-cardinality streams). Sharding keeps sketch building parallel
  * across executors; count-min counters are additive, so the shard
  * sketches merge into the sketch of the whole stream — and merge
  * BYTE-IDENTICALLY to the batch `count_min_sketch` aggregate over the
  * same rows (same eps/confidence/seed ⇒ same grid; addition commutes),
  * which is exactly what the spec locks.
  */
object SketchStream {

  /** Shard projection shared by the batch twin and the stream: rows become
    * (shard, key-as-long); null keys are outside the sketch contract on
    * both paths (the batch agg skips them).
    */
  private def sharded(events: DataFrame, key: Column, nShards: Int): DataFrame =
    events.select(pmod(hash(key), lit(nShards)).as("shard"),
        key.cast("long").as("k"))
      .where(col("k").isNotNull)

  /** Batch twin: one CMS + row count per shard, via the built-in mergeable
    * `count_min_sketch` aggregate (map-side partials, one shard-keyed
    * exchange of constant-size sketches).
    */
  def cmsShards(events: DataFrame, key: Column, nShards: Int,
                eps: Double = 0.001, confidence: Double = 0.999,
                seed: Int = 42): DataFrame =
    sharded(events, key, nShards)
      .groupBy("shard")
      .agg(count_min_sketch(col("k"), lit(eps), lit(confidence),
        lit(seed)).as("cms"), count(col("k")).as("n"))

  /** Streaming form: `mapGroupsWithState` keyed by shard, state = the
    * shard's serialized sketch + row count. Update mode — each trigger
    * re-emits the refreshed (shard, cms, n); the LATEST emission per
    * shard (largest n — n is monotone) is the stream-so-far sketch.
    */
  def cmsShardsStream(events: DataFrame, key: Column, nShards: Int,
                      eps: Double = 0.001, confidence: Double = 0.999,
                      seed: Int = 42): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    sharded(events, key, nShards)
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[(Int, Long)],
         state: GroupState[(Array[Byte], Long)]) => {
          val cms = state.getOption.map { case (b, _) =>
            CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
          }.getOrElse(CountMinSketch.create(eps, confidence, seed))
          var n = state.getOption.map(_._2).getOrElse(0L)
          rows.foreach { r => cms.add(r._2); n += 1 }
          val bos = new java.io.ByteArrayOutputStream()
          cms.writeTo(bos)
          val bytes = bos.toByteArray
          state.update((bytes, n))
          (shard, bytes, n)
        })
      .toDF("shard", "cms", "n")
  }

  /** D13 — streaming QUANTILES with the same sharded-state layout: each
    * shard's GroupState holds one mergeable t-digest (KB-bounded,
    * [[graft.operators.TDigest]]). Unlike count-min counters, t-digest
    * centroid layout depends on insertion order, so stream and batch
    * digests are NOT byte-identical — the locked contract is the b20 one:
    * merged-estimate rank error ≤ 2%, total weight exactly the row count.
    */
  private def shardedValues(df: DataFrame, value: Column,
                            nShards: Int): DataFrame =
    df.select(pmod(hash(value), lit(nShards)).as("shard"),
        value.cast("double").as("v"))
      .where(col("v").isNotNull)

  /** Batch twin: one t-digest + row count per shard. */
  def tdigestShards(df: DataFrame, value: Column, nShards: Int,
                    compression: Int = 200): DataFrame =
    shardedValues(df, value, nShards)
      .groupBy("shard")
      .agg(graft.operators.Sketches.tdigestSketch(col("v"), compression)
        .as("td"), count(col("v")).as("n"))

  /** Streaming form: mapGroupsWithState, state = serialized digest + n. */
  def tdigestShardsStream(df: DataFrame, value: Column, nShards: Int,
                          compression: Int = 200): DataFrame = {
    import graft.operators.TDigest
    val spark = df.sparkSession
    import spark.implicits._
    shardedValues(df, value, nShards)
      .as[(Int, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[(Int, Double)],
         state: GroupState[(Array[Byte], Long)]) => {
          val td = state.getOption.map(b => TDigest.deserialize(b._1))
            .getOrElse(new TDigest(compression))
          var n = state.getOption.map(_._2).getOrElse(0L)
          rows.foreach { r => td.add(r._2); n += 1 }
          val bytes = td.serialize()
          state.update((bytes, n))
          (shard, bytes, n)
        })
      .toDF("shard", "td", "n")
  }

  /** Merge per-shard digest rows into one digest (bounded collect). */
  def mergedDigest(shards: DataFrame,
                   compression: Int = 200): (graft.operators.TDigest, Long) = {
    import graft.operators.TDigest
    val rows = shards.select(col("td"), col("n")).collect()
    var td = new TDigest(compression)
    var n = 0L
    rows.foreach { r =>
      td = td.merge(TDigest.deserialize(r.getAs[Array[Byte]](0)))
      n += r.getLong(1)
    }
    (td, n)
  }

  /** Collapse per-shard sketch rows into the sketch of the whole stream.
    * Bounded collect by construction: nShards rows of constant size.
    */
  def mergedSketch(shards: DataFrame, eps: Double = 0.001,
                   confidence: Double = 0.999,
                   seed: Int = 42): (CountMinSketch, Long) = {
    val rows = shards.select(col("cms"), col("n")).collect()
    val cms = CountMinSketch.create(eps, confidence, seed)
    var n = 0L
    rows.foreach { r =>
      cms.mergeInPlace(CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
      n += r.getLong(1)
    }
    (cms, n)
  }
}
