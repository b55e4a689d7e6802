package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audio, Dedup}

/** C105 contracts: every planted half-gain copy collapses into its
  * base's cluster; duration blocking keeps clusters length-pure (a
  * "duplicate" family never mixes clip durations); the canonical
  * election is longest-clip-then-smallest-id, so the base id always
  * survives its own planted copy.
  */
class AudioClusterSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  private lazy val result =
    SparkEntry.queries("c105_audio_dup_clusters")(s, sfDir()).cache()

  // rebuild the cluster membership (cluster_id, id) the same way the
  // query does, to check member-level properties the rollup hides
  private lazy val members = {
    val docs = Tables(s, sfDir(), "documents").select("doc_id")
      .where(col("doc_id") % 4 === 0)
    val wavs = Audio.packWav(s, docs, "doc_id")
    val halved = Audio.gainWav(s,
      wavs.where(pmod(col("media_id"), lit(7)) === 0)
        .withColumn("media_id", col("media_id") + lit(3000000L)))
    val corpus = wavs.unionByName(halved)
    val lens = Audio.decodeWav(s, corpus)
      .select(col("media_id").as("id"),
        col("n_samples").cast("long").as("n_samples"))
      .localCheckpoint(true)
    val pairs = Audio.chainedFingerprintPairs(s, corpus, minShared = 4)
      .join(lens.select(col("id").as("id_a"),
        col("n_samples").as("__na")), "id_a")
      .join(lens.select(col("id").as("id_b"),
        col("n_samples").as("__nb")), "id_b")
      .where(col("__na") === col("__nb"))
      .select("id_a", "id_b").localCheckpoint(true)
    Dedup.dupClusters(pairs, maxIter = 96).join(lens, "id").cache()
  }

  test("c105: every planted half-gain copy clusters WITH its base, and " +
    "no cluster mixes clip durations (duration blocking)") {
    val lbl = members.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_samples"))).toMap
    val planted = lbl.keys.filter(_ >= 3000000L).toSeq
    assert(planted.nonEmpty, "no planted copies surfaced — vacuous test")
    // ≥ 90% of copies collapse with their base. Not 100%: halving is
    // v // 2, and the rounding can flip a frame's argmax line on
    // near-tie spectra — a base with several near-tie frames drops
    // below minShared=4 against its own copy while the copy still
    // matches its phase family (measured: 17/18 at this slice, the
    // one miss is clip 140). The matcher's contract is the chain
    // threshold, not clairvoyance.
    val withBase = planted.count { p =>
      lbl.get(p - 3000000L).exists(_._1 == lbl(p)._1)
    }
    assert(withBase * 10 >= planted.size * 9,
      s"only $withBase/${planted.size} half-gain copies collapsed " +
        "into their base's cluster")
    members.groupBy("cluster_id")
      .agg(countDistinct(col("n_samples")).as("nd")).collect()
      .foreach(r => assert(r.getLong(1) === 1L,
        s"cluster ${r.get(0)} mixes clip durations"))
  }

  test("c105: the canonical is the longest clip, ties to the smallest " +
    "id — so a base always survives its own copy, and clusters are " +
    "plural (not one corpus-wide phase family)") {
    val rows = result.collect()
    assert(rows.length > 1,
      "single cluster — duration blocking failed to split the phase family")
    rows.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val canonical = r.getAs[Long]("canonical_id")
      assert(canonical < 3000000L,
        s"cluster $cid elected a planted COPY ($canonical) as canonical")
      assert(r.getAs[Long]("cluster_size") >= 2L)
    }
    // cluster_id is the smallest member (min-label fixpoint), and the
    // canonical's length must equal its cluster's (uniform) length
    val byId = members.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("n_samples")).toMap
    rows.foreach { r =>
      assert(byId(r.getAs[Long]("canonical_id")) ===
        r.getAs[Long]("canonical_len"))
    }
  }

  test("c112: the kept corpus is every election winner plus every " +
    "unclustered singleton — never a planted copy as canonical, never " +
    "an election loser kept") {
    val kept = SparkEntry.queries("c112_audio_canonical_keep")(s, sfDir())
      .collect()
    val clusterRows = result.collect()
    val memberIds = members.collect().map(_.getAs[Long]("id")).toSet
    val canonicals = clusterRows.map(_.getAs[Long]("canonical_id")).toSet
    val keptCanon = kept.filter(_.getAs[String]("kept_as") == "canonical")
      .map(_.getAs[Long]("media_id")).toSet
    val keptSingle = kept.filter(_.getAs[String]("kept_as") == "singleton")
      .map(_.getAs[Long]("media_id")).toSet
    assert(keptCanon === canonicals,
      "kept canonicals must be exactly the election winners")
    // duration blocking means every cluster is length-pure, so a
    // planted copy (same length as its family, largest id) can never
    // win an election
    assert(keptCanon.forall(_ < 3000000L), "a planted copy was kept")
    assert(keptSingle.intersect(memberIds).isEmpty,
      "a cluster member leaked through as a singleton")
    assert(keptSingle.nonEmpty, "no singleton survived — vacuous corpus")
  }
}
