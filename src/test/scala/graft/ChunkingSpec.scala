package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunking

class ChunkingSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("hand-checkable windows: size 4, overlap 1 over 10 tokens") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = Chunking.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        "text", chunkSize = 4, overlap = 1)
      .orderBy("chunk_idx")
      .select("chunk_text").collect().map(_.getString(0))
    assert(out.toSeq === Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
  }

  test("short and empty documents: one chunk / no chunk") {
    val df = Seq((1L, "a b c"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(df, "text", chunkSize = 4, overlap = 1)
      .select("doc_id", "chunk_text").collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L && out.head.getString(1) === "a b c")
  }

  test("every token is covered; consecutive chunks overlap exactly") {
    val docs = Tables(spark, sfDir(), "documents").limit(50)
    val chunked = Chunking.chunkTokens(docs.select("doc_id", "text"), "text",
      chunkSize = 32, overlap = 8).collect()
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    chunked.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val toks = texts(id).trim.split("\\s+").toSeq
      val chunks = rows.sortBy(_.getInt(2))
        .map(_.getString(3).split(" ").toSeq)
      // reconstruction: first chunk + the post-overlap tail of the rest
      val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(8))
      assert(rebuilt === toks, s"doc $id")
      chunks.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0).takeRight(8) === pair(1).take(8), s"doc $id")
      }
    }
  }

  test("packSequences: a document packs where it starts") {
    val docs = Seq((1L, "x", 300), (2L, "x", 300), (3L, "x", 300),
      (4L, "y", 600)).toDF("doc_id", "lang", "nt")
    val out = Chunking.packSequences(docs, "doc_id", "nt", "lang", 512L)
      .select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shard x offsets: 0, 300, 600 → packs 0, 0, 1; shard y restarts at 0
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("packSequences invariants on real data: starts fall inside the pack") {
    val toks = Tables(spark, sfDir(), "documents").select(col("doc_id"),
      col("lang"), graft.functions.TextFunctions.tokenCount(col("text")).as("nt"))
    val packed = Chunking.packSequences(toks, "doc_id", "nt", "lang", 512L)
    assert(packed.count() === toks.count(), "packing must not drop documents")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bad = packed
      .withColumn("start", coalesce(sum("nt").over(w), lit(0L)))
      .where(col("start") < col("pack_id") * 512 ||
        col("start") >= (col("pack_id") + 1) * 512)
    assert(bad.count() === 0L)
  }

  test("c47 CDC chunks partition the token stream and are " +
       "insertion-stable where fixed windows are not") {
    val s2 = spark
    import s2.implicits._
    // deterministic 400-word doc; edit = 3 words inserted near the front
    val words = (0 until 400).map(i => s"w${(i * 7919) % 997}")
    val original = words.mkString(" ")
    val edited = (words.take(40) ++ Seq("xx", "yy", "zz") ++
      words.drop(40)).mkString(" ")
    val df = Seq((1L, original), (2L, edited)).toDF("doc_id", "text")
    val chunks = graft.operators.Chunking
      .cdcChunks(df, "doc_id", "text", w = 8, modulus = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3)))
    val c1 = chunks.filter(_._1 == 1L); val c2 = chunks.filter(_._1 == 2L)
    // chunks partition the stream: token counts sum to n
    assert(c1.map(_._3).sum === 400 && c2.map(_._3).sum === 403)
    assert(c1.length > 3, s"modulus 16 should cut a 400-token doc: $c1")
    // CDC property: every chunk fully past the edit neighborhood is
    // byte-identical between the two docs (fixed windows would shift
    // all of them); only the chunk(s) containing the edit may differ
    val shared = c1.map(_._4).toSet.intersect(c2.map(_._4).toSet)
    assert(shared.size >= c1.length - 2,
      s"expected all but the edited chunk shared, got ${shared.size} " +
        s"of ${c1.length}")
    // the LAST chunks (far after the edit) are identical
    assert(c1.maxBy(_._2)._4 === c2.maxBy(_._2)._4)
  }

  test("c47 auto-modulus: power of two near target−w+1, pulled down for " +
       "short corpora, deterministic, and the tuned chunks land near " +
       "the target") {
    val s2 = spark
    import s2.implicits._
    val longDocs = (1L to 30L).map(i =>
      (i, (0 until 600).map(j => s"t${(i * 31 + j * 7919) % 1997}")
        .mkString(" "))).toDF("doc_id", "text")
    val m = graft.operators.Chunking.cdcAutoModulus(
      longDocs, "text", targetTokens = 64, w = 8)
    // target−w+1 = 57 → nearest power of two is 64
    assert(m === 64)
    assert(m === graft.operators.Chunking.cdcAutoModulus(
      longDocs, "text", targetTokens = 64, w = 8)) // deterministic
    // median-length guard: 40-token docs can't chunk at 64 — the target
    // drops to median/2 = 20 → modulus 2^round(log2(13)) = 16
    val shortDocs = (1L to 30L).map(i =>
      (i, (0 until 40).map(j => s"s${(i + j) % 97}").mkString(" ")))
      .toDF("doc_id", "text")
    val mShort = graft.operators.Chunking.cdcAutoModulus(
      shortDocs, "text", targetTokens = 64, w = 8)
    assert(mShort === 16, s"short-corpus modulus: $mShort")
    // end to end: tuned mean chunk length within 2x of the target band
    val chunks = graft.operators.Chunking
      .cdcChunksAuto(longDocs, "doc_id", "text", targetTokens = 64, w = 8)
    val mean = chunks.agg(avg("n_tokens")).head.getDouble(0)
    assert(mean > 16 && mean < 256, s"mean tuned chunk length: $mean")
  }

  test("c106 BFD hand example: fullest-fits election packs 6 docs into " +
       "3 full-ish bins where NFD needs 4") {
    val s2 = spark
    import s2.implicits._
    // one (source, band) shard: ids = 0 mod 4, budget 100
    val docs = Seq((4L, 60L), (8L, 55L), (12L, 50L), (16L, 45L),
      (20L, 40L), (24L, 35L)).toDF("doc_id", "tk")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val bfd = graft.operators.Chunking.packWholeDocsBounded(
      docs, "doc_id", "tk", "source", nBands = 4, budget = 100L,
      openBins = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin"))
      .toMap
    // trace: 60->b0; 55->b1; 50->b2; 45 fits b1(100)/b2(95), fullest=b1;
    // 40 fits b0(100)/b2(90), fullest=b0; 35 fits b2 only -> b2(85)
    assert(bfd === Map(4L -> 0L, 8L -> 1L, 12L -> 2L, 16L -> 1L,
      20L -> 0L, 24L -> 2L))
    val nfdBins = graft.operators.Chunking.packWholeDocs(
      docs, "doc_id", "tk", "source", nBands = 4, budget = 100L)
      .select("bin").distinct().count()
    assert(nfdBins === 4L, s"NFD should need 4 bins here, got $nfdBins")
  }

  test("c106 k=1 degenerates to NFD exactly (a single open slot evicts " +
       "on every miss — next-fit by construction)") {
    val s2 = spark
    import s2.implicits._
    val docs = Tables(s2, sfDir(), "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        graft.functions.TextFunctions.tokenCount(
          org.apache.spark.sql.functions.col("text"))
          .cast("long").as("tk"))
      .limit(300)
    val bfd1 = graft.operators.Chunking.packWholeDocsBounded(
      docs, "doc_id", "tk", "source", nBands = 4, budget = 256L,
      openBins = 1)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("band"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("bin")).toMap
    val nfd = graft.operators.Chunking.packWholeDocs(
      docs, "doc_id", "tk", "source", nBands = 4, budget = 256L)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("band"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("bin")).toMap
    assert(bfd1 === nfd)
  }

  test("c106 oversized docs take their own immediately-closed bin and " +
       "never waste an open slot") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq((4L, 150L), (8L, 90L), (12L, 80L), (16L, 10L))
      .toDF("doc_id", "tk")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val out = graft.operators.Chunking.packWholeDocsBounded(
      docs, "doc_id", "tk", "source", nBands = 4, budget = 100L,
      openBins = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin"))
      .toMap
    // 150 oversized -> own bin 0 (closed, no slot); 90 -> bin 1;
    // 80 -> bin 2; 10 best-fits the fuller open bin (90) -> bin 1
    assert(out === Map(4L -> 0L, 8L -> 1L, 12L -> 2L, 16L -> 1L))
  }

  test("c111 FFD election: oldest-fits vs c106's fullest-fits diverge " +
       "exactly where headroom matters, and k=1 FFD also equals NFD") {
    val s2 = spark
    import s2.implicits._
    // under a DECREASING sort the two elections coincide until bins
    // refill out of age order, so a hand example is fragile — assert
    // the measured divergence on the real corpus instead: same doc
    // set, at least one assignment differs
    val docs = Tables(s2, sfDir(), "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        graft.functions.TextFunctions.tokenCount(
          org.apache.spark.sql.functions.col("text"))
          .cast("long").as("tk"))
      .limit(300)
    def bins(firstFit: Boolean) = graft.operators.Chunking
      .packWholeDocsBounded(docs, "doc_id", "tk", "source", 4, 256L, 3,
        firstFit)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("band"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("bin")).toMap
    val bfd = bins(firstFit = false)
    val ffd = bins(firstFit = true)
    assert(bfd.keySet === ffd.keySet)
    assert(bfd !== ffd,
      "BFD and FFD agreed on every assignment — the A/B is vacuous here")
    // k=1: with a single slot both elections are the same bin -> NFD
    val ffd1 = graft.operators.Chunking
      .packWholeDocsBounded(docs, "doc_id", "tk", "source", 4, 256L, 1,
        firstFit = true)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("band"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("bin")).toMap
    val nfd = graft.operators.Chunking
      .packWholeDocs(docs, "doc_id", "tk", "source", 4, 256L)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("band"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("bin")).toMap
    assert(ffd1 === nfd)
  }

  test("c113 per-source budgets: each shard packs against its OWN " +
       "budget in one job, and a source carrying two budgets is " +
       "refused loudly") {
    val s2 = spark
    import s2.implicits._
    // source a: budget 50; source b: budget 100 — same doc sizes
    val docs = Seq(
      ("a", 4L, 40L, 50L), ("a", 8L, 30L, 50L), ("a", 12L, 20L, 50L),
      ("b", 16L, 40L, 100L), ("b", 20L, 30L, 100L), ("b", 24L, 20L, 100L))
      .toDF("source", "doc_id", "tk", "bg")
    val out = graft.operators.Chunking.packWholeDocsBudgeted(
      docs, "doc_id", "tk", "source", "bg", nBands = 4, openBins = 3)
      .collect()
    val byShard = out.groupBy(r => r.getAs[String]("source"))
    // a@50: 40 | 30+20 -> 2 bins; b@100: 40+30+20 -> 1 bin
    assert(byShard("a").map(_.getAs[Long]("bin")).distinct.length === 2)
    assert(byShard("b").map(_.getAs[Long]("bin")).distinct.length === 1)
    out.foreach { r =>
      assert(r.getAs[Long]("budget") ===
        (if (r.getAs[String]("source") == "a") 50L else 100L))
    }
    // contract violation: one source, two budgets — refused UP FRONT
    // (the r14-advice global check: driver-side, before any fold runs)
    val torn = Seq(("a", 4L, 40L, 50L), ("a", 8L, 30L, 60L))
      .toDF("source", "doc_id", "tk", "bg")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Chunking.packWholeDocsBudgeted(
        torn, "doc_id", "tk", "source", "bg", 4, 3).collect()
    }
    assert(ex.getMessage.contains("more than one budget"))
    // the case the in-fold require could NOT see (r14 advice): the two
    // budgets land in DIFFERENT bands of the same source (ids 4 and 5
    // at nBands = 4), so no single shard ever observes both — the
    // global check must still refuse loudly instead of silently
    // diverging from the oracle's DISTINCT(source, budget) join
    val cross = Seq(("a", 4L, 40L, 50L), ("a", 5L, 30L, 60L))
      .toDF("source", "doc_id", "tk", "bg")
    val ex2 = intercept[IllegalArgumentException] {
      graft.operators.Chunking.packWholeDocsBudgeted(
        cross, "doc_id", "tk", "source", "bg", 4, 3).collect()
    }
    assert(ex2.getMessage.contains("more than one budget"))
  }
}
