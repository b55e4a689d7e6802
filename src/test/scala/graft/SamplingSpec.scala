package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.TypedDocs
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("hashSplit is content-deterministic and order-invariant") {
    val docs = Tables(spark, sfDir(), "documents")
    val a = Sampling.hashSplit(docs, "text")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same rows, different order and partitioning → identical assignment
    val b = Sampling.hashSplit(docs.orderBy(desc("doc_id")).repartition(7), "text")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // roughly 80/10/10 (binomial tolerance on 500 docs)
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes("train") > 350 && sizes("train") < 450, sizes.toString)
    assert(sizes.getOrElse("val", 0) + sizes.getOrElse("test", 0) ===
      500 - sizes("train"))
  }

  test("null keys route to train, never contaminating eval splits") {
    val df = Seq(Some("some text"), None, Some("other"), None).toDF("text")
    val out = graft.operators.Sampling.hashSplit(df, "text")
      .where(col("text").isNull).select("split").collect().map(_.getString(0))
    assert(out.length === 2 && out.forall(_ == "train"))
  }

  test("growing the corpus never reassigns existing documents") {
    val docs = Tables(spark, sfDir(), "documents")
    val half = docs.where(col("doc_id") < 250)
    val fromHalf = Sampling.hashSplit(half, "text")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fromFull = Sampling.hashSplit(docs, "text")
      .where(col("doc_id") < 250)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fromHalf === fromFull)
  }

  test("mixSources: kept token mass tracks the target weights") {
    import graft.functions.TextFunctions
    import graft.operators.Sampling
    // sf0.1: 250 docs per source — the hash filter's doc-granularity
    // noise at 25 docs/source would swamp a meaningful tolerance
    val docs = Tables(spark, sfDir("sf0.1"), "documents")
    val w = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.15, "src3" -> 0.10)
    val nt = TextFunctions.tokenCount(col("text"))
    val kept = Sampling.mixSources(docs, "source", "text", nt, w)
      .groupBy("source").agg(sum(nt).as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val total = kept.values.sum
    // the scarcest-relative-to-weight source keeps ALL its tokens
    val totals = docs.groupBy("source").agg(sum(nt).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val scarcest = w.keys.minBy(s => totals(s) / w(s))
    assert(kept(scarcest) === totals(scarcest),
      s"$scarcest must keep everything")
    // achieved proportions within doc-granularity tolerance of targets
    w.foreach { case (s, target) =>
      val got = kept(s) / total
      assert(math.abs(got - target) < 0.05,
        s"source $s: got $got of token mass, want $target")
    }
    // unknown sources are dropped entirely
    val sources = Sampling.mixSources(docs, "source", "text", nt, w)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(sources === w.keySet)
  }

  test("mixSources: unknown strata in weights fail loudly") {
    import graft.functions.TextFunctions
    import graft.operators.Sampling
    val docs = Tables(spark, sfDir(), "documents")
    val ex = intercept[IllegalArgumentException] {
      Sampling.mixSources(docs, "source", "text",
        TextFunctions.tokenCount(col("text")), Map("no_such_source" -> 1.0))
    }
    assert(ex.getMessage.contains("no tokens"))
  }

  test("mixSources: high-cardinality strata column stays driver-bounded; " +
       "oversized weights map fails loudly") {
    import graft.functions.TextFunctions
    import graft.operators.Sampling
    val docs = Tables(spark, sfDir(), "documents")
    // strata column = doc_id string (500 distinct values): the totals
    // aggregate must be restricted to the weights keys BEFORE the collect,
    // so this runs in bounded driver memory and only the named strata survive
    val byId = docs.withColumn("k", col("doc_id").cast("string"))
    val nt = TextFunctions.tokenCount(col("text"))
    val kept = Sampling.mixSources(byId, "k", "text", nt,
      Map("1" -> 0.5, "2" -> 0.5))
    assert(kept.select("k").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("1", "2")))
    // the scarcest stratum keeps everything → at least one of the two ids
    assert(kept.count() >= 1)
    // a weights map the size of the corpus is a mis-use: fail before any job
    val ex = intercept[IllegalArgumentException] {
      Sampling.mixSources(byId, "k", "text", nt,
        (0 until 50).map(i => i.toString -> 1.0).toMap, maxStrata = 10)
    }
    assert(ex.getMessage.contains("maxStrata"))
  }

  test("seededShuffle: a true permutation, partition-invariant, " +
       "seed-sensitive") {
    val ids = (1L to 500L).toDF("id")
    val sh = Sampling.seededShuffle(ids, "id", "s1", 4)
      .select("id", "shard", "pos")
    val rows = sh.as[(Long, Int, Long)].collect()
    // every row exactly once, shards in range, pos dense 0..n-1 per shard
    assert(rows.map(_._1).sorted.toSeq === (1L to 500L))
    assert(rows.forall(r => r._2 >= 0 && r._2 < 4))
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq === (0L until g.length).toSeq)
    }
    // identical assignment no matter how the input arrives
    val scrambled = Sampling
      .seededShuffle(ids.repartition(7).orderBy(desc("id")), "id", "s1", 4)
      .select("id", "shard", "pos")
    assert(sh.exceptAll(scrambled).isEmpty && scrambled.exceptAll(sh).isEmpty)
    // a different seed is a genuinely different permutation
    val reseeded = Sampling.seededShuffle(ids, "id", "s2", 4)
      .select("id", "shard", "pos")
    assert(!sh.exceptAll(reseeded).isEmpty, "seed change must reshuffle")
  }

  test("TypedDocs: case-class pipeline keeps values consistent with columns") {
    val docs = Tables(spark, sfDir(), "documents").limit(50)
      .select("doc_id", "text", "lang").as[TypedDocs.Document]
    val scored = TypedDocs.score(docs)
    val kept = TypedDocs.keepQuality(scored, 0.5)
    val rows = scored.collect()
    assert(rows.length === 50)
    assert(rows.forall(r => r.quality >= 0.0 && r.quality <= 1.0))
    assert(rows.forall(r => Set("train", "val", "test").contains(r.split)))
    assert(kept.collect().forall(_.quality >= 0.5))
    // the typed filter must remain a column predicate (pushdown-friendly):
    // no DeserializeToObject / mapelements in the plan
    val plan = kept.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("deserializetoobject"), plan.take(400))
  }

  test("quotaCap: at most cap per group, order-invariant selection, " +
    "and the rank is planner-rewritten to WindowGroupLimit") {
    val docs = Tables(spark, sfDir(), "documents").select("doc_id", "source")
    val capped = Sampling.quotaCap(docs, "source", "doc_id", cap = 10)
    val perGroup = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.nonEmpty && perGroup.values.forall(_ <= 10L))
    // every source had 25 docs — the cap binds everywhere
    assert(perGroup.values.forall(_ === 10L))
    // selection is a function of content, not order or partitioning
    val a = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.quotaCap(docs.orderBy(desc("doc_id")).repartition(7),
        "source", "doc_id", cap = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // scale shape: rank<=cap must plan as WindowGroupLimit (map-side
    // cap-sized heaps before the exchange), never a full per-group sort
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("corpusDrift: identical snapshots report zero drift; a vanished " +
    "stratum surfaces as a flagged 0-volume row, never an absent one") {
    import graft.operators.Drift
    val docs = Tables(spark, sfDir(), "documents")
      .select("doc_id", "source", "text")
    val toks = graft.functions.TextFunctions.tokenCount(col("text"))
    // identical snapshots: every share delta is exactly 0
    val same = Drift.corpusDrift(docs, docs, "source", toks).collect()
    assert(same.length === 20)
    same.foreach { r =>
      assert(r.getAs[Long]("drift_ppm") === 0L, r.getAs[String]("stratum"))
      assert(!r.getAs[Boolean]("drifted"))
      assert(r.getAs[Long]("docs_old") === r.getAs[Long]("docs_new"))
    }
    // shares are truncating-integer ppm: they sum to at most 1e6 and
    // within 20 of it (one truncation step per stratum)
    val shareSum = same.map(_.getAs[Long]("share_new_ppm")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - 20L)
    // a source missing from the NEW snapshot entirely still gets a row —
    // 0 docs, 0 tokens, full-share drift, flagged
    val gone = Drift.corpusDrift(docs,
      docs.where(col("source") =!= "src4"), "source", toks)
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    assert(gone.size === 20, "vanished stratum must keep its row")
    val g = gone("src4")
    assert(g.getAs[Long]("docs_new") === 0L &&
      g.getAs[Long]("toks_new") === 0L)
    assert(g.getAs[Boolean]("drifted") &&
      g.getAs[Long]("drift_ppm") === g.getAs[Long]("share_old_ppm"))
  }

  test("driftGateSink (d24): epoch reports ≡ the batch twin, replay is " +
    "bit-identical, and the wired stream delivers the same report") {
    import graft.operators.Drift
    import graft.streaming.{DriftStream, EventStreams}
    val docs = Tables(spark, sfDir(), "documents")
      .select("doc_id", "source", "text")
    val toks = graft.functions.TextFunctions.tokenCount(col("text"))
    val e0 = docs.where(col("doc_id") % 2 === 0)
    val e1 = docs.where(col("source") =!= "src4")
    val dir = java.nio.file.Files.createTempDirectory("graft_d24").toString
    def report(b: org.apache.spark.sql.DataFrame) =
      DriftStream.driftEpoch(docs, b, "source", toks, 5000L)
    EventStreams.epochIdempotentSink(report(e0), 0L, dir)
    EventStreams.epochIdempotentSink(report(e1), 1L, dir)
    EventStreams.epochIdempotentSink(report(e0), 0L, dir) // replayed epoch
    val got = spark.read.parquet(dir)
    // replay left exactly two epochs; each report equals its batch twin
    val cols = report(e0).columns.toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(rows(got.where(col("__epoch") === 0)) === rows(report(e0)))
    assert(rows(got.where(col("__epoch") === 1)) === rows(report(e1)))
    // the epoch that lost src4 flags it as a vanished stratum
    val src4 = got.where(col("__epoch") === 1 && col("stratum") === "src4")
      .collect().head
    assert(src4.getAs[Long]("docs_new") === 0L &&
      src4.getAs[Boolean]("drifted"))

    // end-to-end wiring: a real streaming query delivers the same report
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val batchRows = Seq((1L, "src0", "hello world one"),
      (2L, "src1", "two more words here"), (3L, "src0", "and a third"))
    input.addData(batchRows: _*)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_d24_q").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_d24_ck").toString
    val q = DriftStream.driftGateSink(
      input.toDF().toDF("doc_id", "source", "text"),
      docs, "source", toks, 5000L, outDir, ckpt)
    try q.awaitTermination(60000) finally q.stop()
    val streamed = spark.read.parquet(outDir)
    val twin = report(batchRows.toDF("doc_id", "source", "text"))
    assert(rows(streamed) === rows(twin))
  }

  test("splitRouterSink (d30): streamed docs land in exactly one sink " +
    "with the batch split's verdicts; a replayed epoch changes nothing") {
    import graft.streaming.{EventStreams, SplitStream}
    val docs = Tables(spark, sfDir(), "documents")
      .select("doc_id", "text")
    val e0 = docs.where(col("doc_id") % 2 === 0)
    val e1 = docs.where(col("doc_id") % 2 === 1)
    val out = java.nio.file.Files.createTempDirectory("graft_d30")
    val dirs = Seq("train", "val", "test").map(s => s -> out.resolve(s).toString)
    // drive the sink function manually per epoch + replay (the D8 rule)
    def deliver(b: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val routed = graft.operators.Sampling.hashSplit(b, "text")
      dirs.foreach { case (s, d) =>
        EventStreams.epochIdempotentSink(
          routed.where(col("split") === s).drop("split"), id, d)
      }
    }
    deliver(e0, 0L); deliver(e1, 1L); deliver(e0, 0L) // replay epoch 0
    val landed = dirs.map { case (s, d) =>
      s -> spark.read.parquet(d).select("doc_id").collect()
        .map(_.getLong(0)).toSeq
    }.toMap
    // every doc exactly once across the three sinks, despite the replay
    val allIds = landed.values.flatten.toSeq
    assert(allIds.length === allIds.distinct.length, "no doc lands twice")
    assert(allIds.toSet === docs.collect().map(_.getLong(0)).toSet)
    // verdicts ≡ the batch split over the full corpus
    val batch = graft.operators.Sampling.hashSplit(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    landed.foreach { case (s, ids) =>
      ids.foreach(id => assert(batch(id) === s, s"doc $id routed to $s"))
    }
    // end-to-end: the wired streaming query delivers the same routing
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData((901L, "routed through the live query"),
      (902L, "second streamed document here"))
    val out2 = java.nio.file.Files.createTempDirectory("graft_d30_q")
    val q = SplitStream.splitRouterSink(
      input.toDF().toDF("doc_id", "text"), "text",
      out2.resolve("train").toString, out2.resolve("val").toString,
      out2.resolve("test").toString, out2.resolve("ck").toString)
    try q.awaitTermination(60000) finally q.stop()
    def hasParquet(f: java.io.File): Boolean =
      f.exists() && {
        val kids = Option(f.listFiles()).getOrElse(Array.empty)
        kids.exists(k => k.getName.endsWith(".parquet")) ||
          kids.filter(_.isDirectory).exists(hasParquet)
      }
    val streamed = Seq("train", "val", "test").flatMap { s =>
      val d = new java.io.File(out2.resolve(s).toString)
      if (!hasParquet(d)) Nil
      else spark.read.parquet(d.toString).select("doc_id").collect()
        .map(r => r.getLong(0) -> s)
    }.toMap
    val twin = graft.operators.Sampling.hashSplit(
      Seq((901L, "routed through the live query"),
        (902L, "second streamed document here")).toDF("doc_id", "text"),
      "text").collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(streamed === twin)
  }

  test("leakProofSplit: cluster members inherit the representative's " +
    "split through multi-hop components; singletons match splitCol") {
    val docs = Tables(spark, sfDir(), "documents").select("doc_id")
    // chains d — d+1M — d+2M for d % 6 == 0; pairs d — d+1M for d % 3
    val corpus = docs
      .unionByName(docs.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id")))
      .unionByName(docs.where(col("doc_id") % 6 === 0)
        .select((col("doc_id") + lit(2000000L)).as("doc_id")))
    val pairs = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("id_a"),
        (col("doc_id") + lit(1000000L)).as("id_b"))
      .unionByName(docs.where(col("doc_id") % 6 === 0)
        .select((col("doc_id") + lit(1000000L)).as("id_a"),
          (col("doc_id") + lit(2000000L)).as("id_b")))
    val split = Sampling.leakProofSplit(corpus, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.size === corpus.count())
    // every member of a planted component shares the root's split —
    // including the 2-hop member that only CC can attach
    split.keys.filter(id => id < 1000000L && id % 3 == 0).foreach { d =>
      assert(split(d + 1000000L) === split(d), s"1-hop member of $d")
      if (d % 6 == 0)
        assert(split(d + 2000000L) === split(d), s"2-hop member of $d")
    }
    // singletons key on their own id — identical to plain splitCol
    val plain = docs.where(col("doc_id") % 3 =!= 0)
      .withColumn("split", Sampling.splitCol(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    plain.foreach { case (id, sp) => assert(split(id) === sp) }
    // all three splits actually occur (the gate isn't vacuous)
    assert(split.values.toSet === Set("train", "val", "test"))
  }

  test("c92 budget threshold sweep: hand-checkable bins, cumulative " +
    "totals, the highest-bin-reaching-budget rule, and the " +
    "under-filled fallback") {
    // margins chosen so bins are obvious at width 10: bin 2 (25, 20),
    // bin 1 (15), bin 0 (5), bin -1 (-5: truncating div -> 0... no,
    // -5 div 10 = 0 — mixed-sign margins share bin 0 by the documented
    // truncation rule), bin -2 (-15 div 10 = -1)
    val scored = Seq(
      (1L, 25L, 100L), (2L, 20L, 50L), (3L, 15L, 200L),
      (4L, 5L, 40L), (5L, -5L, 60L), (6L, -15L, 30L))
      .toDF("doc_id", "margin", "tokens")
    val sweep = Sampling.budgetThresholdSweep(scored, "margin", "tokens",
        budgetTokens = 300L, binWidth = 10L)
      .orderBy(col("bin").desc).collect()
    // bins: 2 -> docs {1,2} tokens 150; 1 -> {3} 200; 0 -> {4,5} 100
    // (truncation: both 5 and -5 land in bin 0); -1 -> {6} 30
    assert(sweep.map(_.getLong(0)).toSeq === Seq(2L, 1L, 0L, -1L))
    assert(sweep.map(_.getLong(2)).toSeq === Seq(150L, 200L, 100L, 30L))
    assert(sweep.map(_.getLong(4)).toSeq === Seq(150L, 350L, 450L, 480L))
    // budget 300: bin 2 cum 150 < 300, bin 1 cum 350 >= 300 -> the
    // HIGHEST bin reaching the budget is 1 (keep margin >= 10)
    assert(sweep.map(r => r.getLong(0) -> r.getBoolean(5)).toMap ===
      Map(2L -> false, 1L -> true, 0L -> false, -1L -> false))
    // under-filled: a budget beyond the corpus selects the LOWEST bin
    // (keep everything), and cum_tokens < budget tells the caller
    val under = Sampling.budgetThresholdSweep(scored, "margin", "tokens",
        budgetTokens = 10000L, binWidth = 10L)
      .where(col("selected")).collect()
    assert(under.length === 1 && under.head.getLong(0) === -1L)
    assert(under.head.getLong(4) === 480L)
    // tiny budget: the TOP bin alone satisfies it
    val tiny = Sampling.budgetThresholdSweep(scored, "margin", "tokens",
        budgetTokens = 1L, binWidth = 10L)
      .where(col("selected")).collect()
    assert(tiny.length === 1 && tiny.head.getLong(0) === 2L)
  }
}
