package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{QualityFilters, TextFunctions}
import graft.operators.{AsofJoin, BalancedRepartition, Chunking, Clustering, Dedup, Multimodal, Recode, Similarity}
import graft.pipeline.CensoPipeline
import graft.sources.{CatalogTables, SchemaCsv}
import graft.streaming.EventStreams

/** Driver contract — one `queries` entry per operator in SURVEY.md §2, with
  * a DuckDB-equivalent `oracleSql` wherever the semantics are
  * SQL-expressible. Column names and row order are made to match the oracle
  * exactly (aliases identical on both sides; every checked query totally
  * ordered; doubles rounded so .01-grained money sums are order-insensitive).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Flagship: 5-way star join with broadcast dims (sf0.001). */
  def entry(spark: SparkSession): DataFrame =
    q5StarJoin(spark, "/root/testdata/sf0.001")

  // ----------------------------------------------------------- B: queries

  private def revenue = round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)

  /** Two-level distinct aggregate (the r8 ask): a direct
    * `countDistinct(o_orderkey)` next to `sum(...)` makes Catalyst plan
    * an Expand (every lineitem row doubled — one copy per aggregate
    * group) and shuffle the doubled fact table. Grouping by
    * (r, n, o_orderkey) FIRST collapses lineitem map-side (lineitem
    * files are clustered by orderkey, so the partial agg combines ~4
    * rows per order before the exchange), then the order-grain rows —
    * already distinct — re-aggregate on the dim keys with a plain
    * count. Same answer by construction (an order belongs to exactly
    * one customer→nation→region), half the shuffled volume, no Expand;
    * the 100x probe row is the evidence this is the survivable plan.
    */
  private def q5StarJoin(s: SparkSession, dir: String): DataFrame =
    F.broadcast(t(s, dir, "region"))
      .join(F.broadcast(t(s, dir, "nation")),
        col("n_regionkey") === col("r_regionkey"))
      .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("r_name", "n_name", "o_orderkey")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("__order_rev"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("__order_rev")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")

  /** c45's per-query lexical term sets; lexical query i's vector twin is
    * embeddings vec_id = i. Shared by the query and its generated oracle.
    */
  private val hybridTermSets: Seq[Seq[String]] = Seq(
    Seq("hash", "vector", "stream"),
    Seq("join", "sort", "merge"),
    Seq("spark", "batch", "window"))

  /** The committed langid MODEL ARTIFACT, trained-and-published at most
    * ONCE per corpus dir per JVM (the r11 ask: c79b/c92 serving paths
    * must LOAD the deployed model, not retrain inline — a quality
    * filter that must be retrained to be consulted isn't deployed).
    * Training depth is EXACTLY what the c79b/c92 oracles replay
    * (5 classes, nBuckets=128, epochs=1, nBatches=2, lrDiv=64); the
    * integer-grid weights round-trip parquet bit-exactly, so
    * score-from-load ≡ score-from-train and the oracles gate the loaded
    * path unchanged. Bench.maybePrewarm calls [[prewarmLangidModel]]
    * before any phase that times c79b/c92, so probe rows time serving,
    * not the one-time publish.
    */
  private val clfModelRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def langidModelRoot(s: SparkSession, dir: String): String =
    clfModelRoots.computeIfAbsent(dir, _ => {
      import graft.operators.ClassifierTrain
      import org.apache.hadoop.fs.Path
      // the scratch name carries a hash of the FULL corpus path, not just
      // its basename: two dirs sharing a basename in one JVM would
      // otherwise train into the same root — the second publish would
      // overwrite the first's store while the first's cached root kept
      // serving it (cache key and storage location must not diverge)
      val root = Tables.scratch("clf_langid_" +
        new java.io.File(dir).getName + "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val classes = Seq("de", "en", "es", "fr", "zh")
      val feats = ClassifierTrain.featurizeMulti(
        t(s, dir, "documents"), "text", "doc_id", "lang", 128, 2).persist()
      try {
        val model = ClassifierTrain
          .trainMulticlass(feats, classes, 128, 1, 2, 64L)
          .map { case (c, res) => (c, res.weights) }
        val rep = graft.sources.ModelStore.publishModel(
          s, root, model, trainedAtEpoch = 1L)
        require(rep.committed, s"langid model publish failed: ${rep.failures}")
      } finally { feats.unpersist(); () }
      root
    })

  /** Bench hook: pay the one-time train+publish OUTSIDE a timed probe. */
  def prewarmLangidModel(s: SparkSession, dir: String): Unit = {
    langidModelRoot(s, dir); ()
  }

  private val imgCodeRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The C104 stored-code root for `dir`: decode + publish ONCE per
    * (JVM, corpus) — the spec version, then the blockhash codes in two
    * ingest epochs (even / odd media ids) with epoch 1 REPLAYED
    * (at-least-once delivery; the D8 partition rule makes it
    * exactly-once). Every serving query reads the stored table; the
    * decode pass is paid here, per NEW image — never per query.
    */
  private def imageCodesRoot(s: SparkSession, dir: String): String =
    imgCodeRoots.computeIfAbsent(dir, _ => {
      import graft.operators.ImageDedup
      import graft.sources.ImageCodeStore
      import org.apache.hadoop.fs.Path
      // full-path hash in the scratch name (the langidModelRoot rule):
      // two dirs sharing a basename must not share a store
      val root = Tables.scratch("img_codes_" +
        new java.io.File(dir).getName + "_" +
        java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val rep = ImageCodeStore.publishSpec(s, root, "blockhash",
        grid = 8, bands = 4)
      require(rep.committed, s"img code spec publish failed: ${rep.failures}")
      val v = ImageCodeStore.committedSpecVersion(s, root)
      val packed = ImageDedup.packImageVariants(s,
        t(s, dir, "documents"), "doc_id")
      // persist: the two epoch filters below would otherwise decode the
      // corpus twice — the decode is exactly the cost this store exists
      // to pay once
      val codes = ImageDedup.blockhashCodes(s, packed).persist()
      try {
        ImageCodeStore.appendCodesEpoch(
          codes.where(pmod(col("media_id"), lit(2)) === 0), root, v, 0L)
        ImageCodeStore.appendCodesEpoch(
          codes.where(pmod(col("media_id"), lit(2)) === 1), root, v, 1L)
        // at-least-once delivery: epoch 1 redelivered — the D8 rule
        // overwrites its own partition with bit-identical rows
        ImageCodeStore.appendCodesEpoch(
          codes.where(pmod(col("media_id"), lit(2)) === 1), root, v, 1L)
      } finally { codes.unpersist(); () }
      root
    })

  /** Bench hook: pay the one-time decode+publish OUTSIDE a timed probe
    * (the c95 prewarm discipline on the image-code store).
    */
  def prewarmImageCodes(s: SparkSession, dir: String): Unit = {
    imageCodesRoot(s, dir); ()
  }

  /** The c105/c112/c115 audio-dedup corpus: every doc_id % 4 == 0 doc
    * as a REAL WAV clip, plus a half-gain re-master of every
    * media_id % 7 == 0 clip at +3e6 — the amplitude-shifted duplicates
    * the chained-landmark matcher exists to find.
    */
  private def audioDupCorpus(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Audio
    val docs = t(s, dir, "documents").select("doc_id")
      .where(col("doc_id") % 4 === 0)
    val wavs = Audio.packWav(s, docs, "doc_id")
    val halved = Audio.gainWav(s,
      wavs.where(pmod(col("media_id"), lit(7)) === 0)
        .withColumn("media_id", col("media_id") + lit(3000000L)))
    wavs.unionByName(halved)
  }

  private val audioCodeRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The C115 stored-code root for `dir`: decode + publish ONCE per
    * (JVM, corpus) — the spec version, then the chained-landmark rows
    * in two ingest epochs (even / odd media ids) with epoch 1 REPLAYED
    * (at-least-once delivery; the D8 partition rule makes it
    * exactly-once). Every serving query reads the stored table; the
    * WAV-decode + WHT chain is paid here, per NEW clip — never per
    * query (the imageCodesRoot discipline on the audio surface).
    */
  private def audioCodesRoot(s: SparkSession, dir: String): String =
    audioCodeRoots.computeIfAbsent(dir, _ => {
      import graft.operators.Audio
      import graft.sources.AudioCodeStore
      import org.apache.hadoop.fs.Path
      // full-path hash in the scratch name (the langidModelRoot rule):
      // two dirs sharing a basename must not share a store
      val root = Tables.scratch("audio_codes_" +
        new java.io.File(dir).getName + "_" +
        java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val rep = AudioCodeStore.publishSpec(s, root, "chained_landmark",
        frame = 128)
      require(rep.committed, s"audio code spec publish failed: ${rep.failures}")
      val v = AudioCodeStore.committedSpecVersion(s, root)
      // persist: the two epoch filters below would otherwise decode the
      // corpus twice — the decode+WHT chain is exactly the cost this
      // store exists to pay once
      val rows = Audio.chainedLandmarkRows(s, audioDupCorpus(s, dir))
        .persist()
      try {
        AudioCodeStore.appendCodesEpoch(
          rows.where(pmod(col("media_id"), lit(2)) === 0), root, v, 0L)
        AudioCodeStore.appendCodesEpoch(
          rows.where(pmod(col("media_id"), lit(2)) === 1), root, v, 1L)
        // at-least-once delivery: epoch 1 redelivered — the D8 rule
        // overwrites its own partition with bit-identical rows
        AudioCodeStore.appendCodesEpoch(
          rows.where(pmod(col("media_id"), lit(2)) === 1), root, v, 1L)
      } finally { rows.unpersist(); () }
      root
    })

  /** Bench hook: pay the one-time decode+publish OUTSIDE a timed probe
    * (the c104 prewarm discipline on the audio-code store).
    */
  def prewarmAudioCodes(s: SparkSession, dir: String): Unit = {
    audioCodesRoot(s, dir); ()
  }

  /** The c119/c121 text-dedup corpus: every document plus one exact
    * re-crawl copy at +1e6 — the c2 construction verbatim, so the c2
    * planted oracle gates the stored-signature serving paths unchanged.
    */
  private def textSigCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
  }

  private val textSigRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The C119 stored-signature root for `dir`: tokenize + minhash +
    * publish ONCE per (JVM, corpus) — the spec version, then the
    * MinHash signature rows in two ingest epochs (even / odd doc ids)
    * with epoch 1 REPLAYED (at-least-once delivery; the D8 partition
    * rule makes it exactly-once). Every serving query reads the stored
    * table; the full-corpus MinHashSigExpr pass is paid here, per NEW
    * document — never per query (the imageCodesRoot discipline on the
    * text surface, where at 100 TB the tokenize pass IS the query
    * cost).
    */
  private def textSigsRoot(s: SparkSession, dir: String): String =
    textSigRoots.computeIfAbsent(dir, _ => {
      import graft.operators.Dedup
      import graft.sources.TextSigStore
      import org.apache.hadoop.fs.Path
      // full-path hash in the scratch name (the langidModelRoot rule):
      // two dirs sharing a basename must not share a store
      val root = Tables.scratch("text_sigs_" +
        new java.io.File(dir).getName + "_" +
        java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val rep = TextSigStore.publishSpec(s, root, "minhash",
        k = 64, bands = 16, shingleW = 3)
      require(rep.committed, s"text sig spec publish failed: ${rep.failures}")
      val v = TextSigStore.committedSpecVersion(s, root)
      // persist: the two epoch filters below would otherwise tokenize
      // the corpus twice — the signature pass is exactly the cost this
      // store exists to pay once
      val sigs = Dedup.minhashSigRows(textSigCorpus(s, dir), "text",
        "doc_id").persist()
      try {
        TextSigStore.appendSigsEpoch(
          sigs.where(pmod(col("doc_id"), lit(2)) === 0), root, v, 0L)
        TextSigStore.appendSigsEpoch(
          sigs.where(pmod(col("doc_id"), lit(2)) === 1), root, v, 1L)
        // at-least-once delivery: epoch 1 redelivered — the D8 rule
        // overwrites its own partition with bit-identical rows
        TextSigStore.appendSigsEpoch(
          sigs.where(pmod(col("doc_id"), lit(2)) === 1), root, v, 1L)
      } finally { sigs.unpersist(); () }
      root
    })

  /** Bench hook: pay the one-time tokenize+publish OUTSIDE a timed
    * probe (the c104 prewarm discipline on the text-signature store).
    */
  def prewarmTextSigs(s: SparkSession, dir: String): Unit = {
    textSigsRoot(s, dir); ()
  }

  /** The c27/c76/c125 span-dedup corpus: every document plus a re-crawl
    * copy of the ≡0 mod 10 slice at +1e6 — the planted whole-document
    * duplication the span ladder must flag at every level.
    */
  private def spanDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.unionByName(
      docs.where(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
  }

  private val spanDigestRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The C125 stored-digest root for `dir`: tokenize + digest + publish
    * ONCE per (JVM, corpus) — the spec (the c76 width ladder 8/16/32),
    * then per level the span-digest rows in two ingest epochs (even /
    * odd doc ids) with epoch 1 REPLAYED (at-least-once delivery; the
    * D8 partition rule makes it exactly-once). Every serving query
    * reads the stored tables; the tokenize+digest map passes — the
    * measured majority of the c76 quiet 100x profile — are paid here,
    * per NEW document, never per query.
    */
  private def spanDigestsRoot(s: SparkSession, dir: String): String =
    spanDigestRoots.computeIfAbsent(dir, _ => {
      import graft.operators.Dedup
      import graft.sources.SpanStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("span_digests_" +
        new java.io.File(dir).getName + "_" +
        java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val widths = Seq(8, 16, 32)
      val rep = SpanStore.publishSpec(s, root, "span_md5", widths)
      require(rep.committed, s"span spec publish failed: ${rep.failures}")
      val v = SpanStore.committedSpecVersion(s, root)
      val corpus = spanDupCorpus(s, dir)
      widths.foreach { w =>
        // per level: one digest pass, split into two epochs by parity
        // with epoch 1 redelivered (the D8 rule converges it)
        val rows = Dedup.spanDigestRows(corpus, "text", "doc_id", w)
          .persist()
        try {
          SpanStore.appendDigestsEpoch(
            rows.where(pmod(col("id"), lit(2)) === 0), root, v, w, 0L)
          SpanStore.appendDigestsEpoch(
            rows.where(pmod(col("id"), lit(2)) === 1), root, v, w, 1L)
          SpanStore.appendDigestsEpoch(
            rows.where(pmod(col("id"), lit(2)) === 1), root, v, w, 1L)
        } finally { rows.unpersist(); () }
      }
      root
    })

  /** Bench hook: pay the one-time digest+publish OUTSIDE a timed probe
    * (the c104 prewarm discipline on the span-digest store).
    */
  def prewarmSpanDigests(s: SparkSession, dir: String): Unit = {
    spanDigestsRoot(s, dir); ()
  }

  private val spanLedgerRootsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The C137 fired-window LEDGER root for `dir` — the spanDigestsRoot
    * discipline carried to the incremental-pair arc: the c76 corpus
    * arrives in two ingest epochs (by doc-id parity, so the planted
    * +1e6 re-crawl copies land WITH their originals — the within-delta
    * case — while the corpus's natural cross-document repetitions
    * exercise the ref-side 1→2 transitions), epoch 1 is REPLAYED after
    * landing (D8 convergence), every width's ledger is FOLDED
    * (LedgerFold's crash-safe swap), and epoch 1 re-lands once more as
    * a post-compaction straggler the serving sweep must absorb. Every
    * serving query reads stored fired windows only; the digest, count,
    * and flag-join passes — what c132 still paid per query — are paid
    * here, per epoch, never per question.
    */
  private def spanLedgerRoot(s: SparkSession, dir: String): String =
    spanLedgerRootsMemo.computeIfAbsent(dir, _ => {
      import graft.sources.{SpanLedger, SpanStore}
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("span_ledger_" +
        new java.io.File(dir).getName + "_" +
        java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val widths = Seq(8, 16, 32)
      val rep = SpanStore.publishSpec(s, s"$root/store", "span_md5",
        widths)
      require(rep.committed,
        s"c137 span spec publish failed: ${rep.failures}")
      val corpus = spanDupCorpus(s, dir)
      def ingest(e: Long): Unit = SpanLedger.ingestEpoch(s,
        s"$root/store", 1, s"$root/ledger",
        corpus.where(pmod(col("doc_id"), lit(2)) === e),
        "text", "doc_id", e)
      ingest(0L); ingest(1L)
      ingest(1L) // at-least-once redelivery — the D8 rule converges it
      widths.foreach { w =>
        val r = SpanLedger.compactEpochs(s, s"$root/ledger", w, 1L)
        require(r.into < 0L && r.folded == Seq(0L, 1L),
          s"c137 fold failed at w$w: $r")
      }
      ingest(1L) // post-compaction straggler: absorbed by the sweep,
      // retired by the next fold — the C135 replay contract
      root
    })

  /** Bench hook for the c137 serving path. */
  def prewarmSpanLedger(s: SparkSession, dir: String): Unit = {
    spanLedgerRoot(s, dir); ()
  }

  /** The c87 corpus: every ≡0 mod 10 original DEGRADED with a junk
    * tail while its +1e6 re-crawl copy stays clean — the planted
    * direction that makes quality decisive in the canonical election.
    */
  private def spanQualityCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 0,
          concat(col("text"), lit(" 00 11 22 !!! ???")))
          .otherwise(col("text")))
      .unionByName(docs.where(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
  }

  private val spanQualityDigestRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The C87 stored-digest root: the [[spanDigestsRoot]] discipline on
    * the QUALITY corpus (a corpus variant is its own store — the
    * degraded tails change every window digest of the degraded docs).
    * Single-level spec ({16} — the strip family's width), two ingest
    * epochs by parity with epoch 1 replayed (the D8 rule).
    */
  private def spanQualityDigestsRoot(s: SparkSession, dir: String): String =
    spanQualityDigestRoots.computeIfAbsent(dir, _ => {
      import graft.operators.Dedup
      import graft.sources.SpanStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("span_qdigests_" +
        new java.io.File(dir).getName + "_" +
        java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val rep = SpanStore.publishSpec(s, root, "span_md5", Seq(16))
      require(rep.committed,
        s"quality span spec publish failed: ${rep.failures}")
      val v = SpanStore.committedSpecVersion(s, root)
      val rows = Dedup.spanDigestRows(spanQualityCorpus(s, dir), "text",
        "doc_id", 16).persist()
      try {
        SpanStore.appendDigestsEpoch(
          rows.where(pmod(col("id"), lit(2)) === 0), root, v, 16, 0L)
        SpanStore.appendDigestsEpoch(
          rows.where(pmod(col("id"), lit(2)) === 1), root, v, 16, 1L)
        SpanStore.appendDigestsEpoch(
          rows.where(pmod(col("id"), lit(2)) === 1), root, v, 16, 1L)
      } finally { rows.unpersist(); () }
      root
    })

  /** Bench hook for the c87 serving path. */
  def prewarmSpanQualityDigests(s: SparkSession, dir: String): Unit = {
    spanQualityDigestsRoot(s, dir); ()
  }

  /** Bench-only serve-phase gate (the r15 verdict's ask #1a): the five
    * spec-rollover / store-lifecycle keys (c117/c122/c126/c127/c130)
    * spend ~35 s per bench run re-running their backfill+flip+vacuum
    * lifecycles inside every timed sample, yet the thing a bench row
    * should measure is SERVING — lifecycle correctness is already
    * oracle-gated by Verify (which never sets this flag, so the full
    * delete + backfill + flip + asserted vacuum runs cold there every
    * time). When graft.Bench sets `graft.bench.serveOnly` (in-process)
    * or SPARK_GRAFT_SERVE_ONLY=1 (forked phase JVMs), the lifecycle
    * body runs ONCE per (JVM, corpus) — the maybePrewarm invocation —
    * and every subsequent timed sample in that JVM skips straight to
    * the serve expression against the already-committed store. In-JVM
    * memoization (the imageCodesRoot discipline) means no on-disk
    * marker can ever go stale across code changes or rounds.
    */
  private def serveOnlyBench: Boolean =
    sys.props.get("graft.bench.serveOnly").contains("1") ||
      sys.env.get("SPARK_GRAFT_SERVE_ONLY").contains("1")
  private val lifecyclesDone =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def lifecycleOncePerBenchJvm(key: String)(body: => Unit): Unit =
    if (serveOnlyBench) {
      // un-memoize on failure: a lifecycle that died partway (it starts
      // by deleting its store root) must RETRY on the next invocation,
      // not silently serve a half-built store for the rest of the JVM
      if (lifecyclesDone.add(key))
        try body
        catch { case e: Throwable => lifecyclesDone.remove(key); throw e }
    } else body

  /** Stage the single-file events table into a scratch DIRECTORY —
    * Spark's file streaming source requires a directory basePath. One
    * copy per (JVM, corpus); the copy is file-sized and untimed
    * relative to any stream the caller runs over it.
    */
  private val eventsStaged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stageEventsDir(s: SparkSession, dir: String): String =
    eventsStaged.computeIfAbsent(dir, { d =>
      val stage = Tables.scratch("events_dir_" +
        new java.io.File(d).getName + "_" +
        java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(d)))
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(stage))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        java.nio.file.Paths.get(s"$stage/events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      stage
    })

  /** Loud replay-visibility gate shared by the stored-signature serving
    * paths: exactly one signature row per doc — epoch duplication would
    * be invisible to the pair DISTINCT downstream, so it must fail HERE.
    */
  private def requireOneSigPerDoc(sigs: DataFrame): DataFrame = {
    val dup = sigs.groupBy("doc_id").agg(count(lit(1)).as("__c"))
      .where(col("__c") > 1).count()
    require(dup == 0,
      s"$dup doc ids stored more than once — epoch replay broke the " +
        "D8 partition rule")
    sigs
  }

  /** The c105 question answered from a STORED landmark table: the
    * replay-visibility gate (exactly one meta row per clip — epoch
    * duplication would be invisible to the pair groupBy), the
    * duration-blocked pair set (stored n_samples, no decode), the CC
    * resolution, and the longest-clip election — shared by c115
    * (serve) and c116 (post-vacuum serve), both gated by the c105
    * oracle verbatim.
    */
  private def audioClustersFromStored(s: SparkSession,
                                      stored: DataFrame): DataFrame = {
    import graft.operators.{Audio, Dedup}
    val meta = stored.where(col("anchor") === -1)
    val dup = meta.groupBy("media_id").agg(count(lit(1)).as("__c"))
      .where(col("__c") > 1).count()
    require(dup == 0,
      s"$dup media ids stored more than once — epoch replay broke " +
        "the D8 partition rule")
    val lens = meta.select(col("media_id").as("id"),
        col("n_samples").cast("long").as("n_samples"))
      .localCheckpoint(true)
    // duration blocking + checkpoint before the propagation loop —
    // the exact c105 shape, minus the decode the store prepaid
    val pairs = Audio.chainedPairsFromCodes(stored, minShared = 4)
      .join(lens.select(col("id").as("id_a"),
        col("n_samples").as("__na")), "id_a")
      .join(lens.select(col("id").as("id_b"),
        col("n_samples").as("__nb")), "id_b")
      .where(col("__na") === col("__nb"))
      .select("id_a", "id_b").localCheckpoint(true)
    val labels = Dedup.dupClusters(pairs, maxIter = 96)
    labels.join(lens, "id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"),
        max(struct(col("n_samples"), (-col("id")).as("__nid")))
          .as("__m"),
        md5(concat_ws(",", transform(
          sort_array(collect_list(col("id"))),
          x => x.cast("string")))).as("members_fp"))
      .select(col("cluster_id"), col("cluster_size"),
        (-col("__m.__nid")).as("canonical_id"),
        col("__m.n_samples").as("canonical_len"), col("members_fp"))
      .orderBy("cluster_id")
  }

  // --------------------------------------------------------------- map

  /** The c123/c130 verdict frame: all three modality pair sets
    * (text MinHash, stored-code image, stored-landmark audio) joined
    * over per-modality doc↔media links into one result-sized
    * per-doc verdict — shared by the c123 query and the c130
    * versioned publish.
    */
  private def trimodalVerdicts(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Audio, CrossModal, Dedup, ImageDedup}
    import graft.sources.{AudioCodeStore, ImageCodeStore}
    val docs = t(s, dir, "documents")
    // text side: the c2 construction on the ≡1 mod 3 slice
    val withCopies = docs.unionByName(
      docs.where(pmod(col("doc_id"), lit(3)) === 1)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
    val textDup = Dedup.minhashDedupPairs(withCopies, "text", "doc_id")
      .where(col("id_b") - col("id_a") === 1000000L)
      .select(col("id_a").as("doc_id")).distinct()
    // image side: stored-code pairs over the shared link table
    val iroot = imageCodesRoot(s, dir)
    val ip = ImageDedup.perceptualPairs(
        ImageCodeStore.readCodes(s, iroot,
          ImageCodeStore.committedSpecVersion(s, iroot)),
        maxHamming = 3, hotBucketCap = 64)
      .select("id_a", "id_b")
    val ids = docs.select(col("doc_id"))
    val imgDup = CrossModal.crossDocDups(ip, CrossModal.imageLinks(ids))
    // audio side: stored landmarks, duration-blocked pairs (the c105
    // contract), cross-doc via the narration link
    val aroot = audioCodesRoot(s, dir)
    val stored = AudioCodeStore.readCodes(s, aroot,
      AudioCodeStore.committedSpecVersion(s, aroot))
    val meta = stored.where(col("anchor") === -1)
      .select("media_id", "n_samples")
    val ap = Audio.chainedPairsFromCodes(stored, minShared = 4)
      .join(meta.select(col("media_id").as("id_a"),
        col("n_samples").as("__na")), "id_a")
      .join(meta.select(col("media_id").as("id_b"),
        col("n_samples").as("__nb")), "id_b")
      .where(col("__na") === col("__nb"))
      .select("id_a", "id_b")
    val audDup = CrossModal.crossDocDups(ap, CrossModal.audioLinks(ids))
    CrossModal.verdictTable(textDup, imgDup, audDup).orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ===== A: reference ETL surface =====

    "a1_csv_schema_read" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("qty"), col("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"))
      val path = Tables.scratch("a1_csv_" + new java.io.File(dir).getName)
      li.write.mode("overwrite")
        .options(Map("header" -> "true", "delimiter" -> "|")).csv(path)
      val schema = SchemaCsv.schemaFromJson(
        """{"type":"struct","fields":[
          |{"name":"l_orderkey","type":"long","nullable":true,"metadata":{}},
          |{"name":"l_linenumber","type":"integer","nullable":true,"metadata":{}},
          |{"name":"qty","type":"integer","nullable":true,"metadata":{}},
          |{"name":"l_returnflag","type":"string","nullable":true,"metadata":{}},
          |{"name":"ship","type":"string","nullable":true,"metadata":{}}]}""".stripMargin)
      SchemaCsv.read(s, path, schema)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), sum("qty").as("sum_qty"),
          min("ship").as("min_ship"))
        .orderBy("l_returnflag")
    }),

    "a2_recode_map" -> ((s, dir) => {
      val recoded = Recode.recodeWithMap(
        t(s, dir, "lineitem"), "l_returnflag", CensoPipeline.retMap)
      recoded.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    "a3_recode_bool" -> ((s, dir) => {
      val flagged = t(s, dir, "orders").withColumn("IN_OPEN",
        when(col("o_orderstatus") === "O", "1").otherwise("0"))
      Recode.recodeBoolean(flagged, Seq("IN_OPEN"))
        .groupBy("IN_OPEN").agg(count(lit(1)).as("cnt")).orderBy("IN_OPEN")
    }),

    "a4_cast_int" -> ((s, dir) => {
      val stringly = t(s, dir, "lineitem").withColumn("NU_QTY",
        col("l_quantity").cast("int").cast("string"))
      Recode.castInts(stringly, _.startsWith("NU"))
        .groupBy("l_returnflag").agg(sum("NU_QTY").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    "a5_parse_date" -> ((s, dir) => {
      val strs = t(s, dir, "lineitem").select(
        date_format(col("l_shipdate"), "dd/MM/yyyy").as("s1"),
        concat(upper(date_format(col("l_shipdate"), "ddMMMyyyy")),
          lit(":00:00:00")).as("s2"))
      val p1 = Recode.parseDateFlex(strs, "s1", year = 2020)   // modern form
      val p2 = Recode.parseDateFlex(p1, "s2", year = 2011)     // SAS form
      p2.groupBy(year(col("s1")).as("yr"))
        .agg(count(lit(1)).as("cnt"),
          count(when(col("s1") === col("s2"), 1)).as("n_match"))
        .orderBy("yr")
    }),

    "a6_derive_or" -> ((s, dir) => {
      val df0 = t(s, dir, "lineitem").select(col("l_orderkey"),
        when(col("l_quantity") > 25, "1").otherwise("0").as("IN_HEAVY"),
        when(col("l_discount") > 0.05, "1").otherwise("0").as("IN_DISC"))
      val b = Recode.recodeBoolean(df0, Seq("IN_HEAVY", "IN_DISC"))
      Recode.deriveOr(b, "IN_EITHER", "IN_HEAVY", "IN_DISC")
        .groupBy("IN_EITHER").agg(count(lit(1)).as("cnt")).orderBy("IN_EITHER")
    }),

    "a7_prefix_cols" -> ((s, dir) =>
      Recode.withPrefix(t(s, dir, "nation"), "dim")
        .select("dim_n_nationkey", "dim_n_name")
        .orderBy("dim_n_nationkey")),

    "a8_union_regions" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val shards = (0 until 3).map { r =>
        val sh = li.where(pmod(col("l_orderkey"), lit(3)) === r)
        // reverse one shard's column order: unionByName must realign
        if (r == 1) sh.select(sh.columns.reverse.map(col).toSeq: _*) else sh
      }
      Recode.unionAll(shards)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("int")).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Row-invariance through the salted repartition (no row lost or
    // duplicated, per key) — the exact invariant the reference's replayable
    // salt bug violated. The balance bound (max (key, salt) group size)
    // is asserted in BalancedRepartitionSpec.
    "a9_balanced_repartition" -> ((s, dir) => {
      val rep = BalancedRepartition(t(s, dir, "lineitem"),
        Seq("l_returnflag"), rowsPerFile = 1000L)
      rep.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    "a10_partitioned_sink" -> ((s, dir) => {
      val path = Tables.scratch("a10_sink_" + new java.io.File(dir).getName)
      SchemaCsv.writePartitioned(
        t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_quantity").cast("int").as("qty"), col("l_returnflag")),
        path, Seq("l_returnflag"))
      SchemaCsv.readPartitioned(s, path)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), sum("qty").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    "a11_censo_pipeline" -> ((s, dir) => {
      val out = CensoPipeline.run(
        CensoPipeline.censoLike(t(s, dir, "lineitem")), year = 2020)
      out.groupBy(col("TP_RETURN"), year(col("DT_SHIP")).as("yr"), col("IN_ANY"))
        .agg(count(lit(1)).as("cnt"), sum("NU_QTY").as("sum_qty"))
        .orderBy("TP_RETURN", "yr", "IN_ANY")
    }),

    // A12: partitioned sink → catalog registration (DROP + CREATE + MSCK)
    // → SQL over the registered table with a partition-pruned filter.
    "a12_catalog_table" -> ((s, dir) => {
      val path = Tables.scratch("a12_catalog_" + new java.io.File(dir).getName)
      SchemaCsv.writePartitioned(
        t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_quantity").cast("int").as("qty"), col("l_returnflag")),
        path, Seq("l_returnflag"))
      CatalogTables.registerExternal(s, "graft_lineitem_ext", path,
        Seq("l_returnflag"))
      s.sql("""SELECT l_returnflag, count(*) AS cnt, sum(qty) AS sum_qty
              |FROM graft_lineitem_ext WHERE l_returnflag <> 'N'
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    "a16_profile" -> ((s, dir) =>
      graft.operators.Profile.profile(t(s, dir, "lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
        .orderBy("column")),

    // ===== B: query engine =====

    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          revenue.as("sum_disc_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q3_join_topk" -> ((s, dir) =>
      t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
        .where(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"))
        .agg(revenue.as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)),

    "q5_star_join" -> ((s, dir) => q5StarJoin(s, dir)),

    "b4_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          row_number().over(w).as("rn"),
          round(sum("o_totalprice").over(ws), 2).as("run_sum"))
        .where(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    "b5_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "b6_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("int")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // B40 CUBE — all 2^n grouping combinations in one pass (rollup B6
    // covers the hierarchy prefix only); gid = the grouping bit vector,
    // computed as an explicit grouping() formula so both engines state
    // the same bit order rather than trusting grouping_id() conventions
    "b40_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("int")).as("sum_qty"),
          (grouping(col("l_returnflag")) * 2 +
            grouping(col("l_linestatus"))).cast("int").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // B41 windowed DISTINCT aggregation — running distinct-type count
    // per user in event-time order. Spark has no DISTINCT window
    // aggregates; the engine phrasing is size(collect_set() OVER w) —
    // set state is bounded by the type cardinality per user, and the
    // frame sort never leaves the user partition (one keyed exchange)
    "b41_window_distinct" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events").select(col("event_id"), col("user_id"),
          size(collect_set("event_type").over(w)).as("n_types_seen"))
        .orderBy("event_id")
    }),

    // B43 trailing-window median (median-filter smoothing, the robust
    // running statistic d15's mean/stddev can't give): exact
    // interpolated percentile over a 100-row trailing frame per type.
    // The frame is ROWS-bounded so the window state is O(frame), and
    // the (ts, event_id) order key makes frame contents — hence the
    // median — engine-independent; midpoints of 2-decimal values are
    // ≥1e-3 off the 1e-4 rounding boundaries, so round(4) is fp-safe.
    // the exact-small-frame tool, now behind ExactWindows' guard: the
    // operator refuses frame × hottest-key-rows products that would
    // serialize at scale, pointing to D13's t-digest (the guard's one
    // key-sized pre-agg is part of the benched cost — honesty over speed)
    "b43_window_median" -> ((s, dir) =>
      graft.operators.ExactWindows.trailingMedian(
          t(s, dir, "events").select("event_id", "event_type", "ts", "value"),
          "event_type", Seq(col("ts"), col("event_id")), col("value"),
          frameRows = 100)
        .select(col("event_id"), col("event_type"), col("med"))
        .orderBy("event_id")),

    "b7_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"), count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    "b8_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
          count(when(col("o_orderpriority") === "5-LOW", 1)).as("n_low"),
          round(sum(when(col("o_orderpriority") === "1-URGENT",
            col("o_totalprice")).otherwise(0)), 2).as("urgent_value"))
        .orderBy("o_orderstatus")),

    // B44 native relational pivot — the Dataset.pivot operator proper
    // (b8 keeps the conditional-agg phrasing; B29 unpivot is the
    // inverse). The value list is EXPLICIT, which is the scale rule:
    // without it Spark runs a values-discovery job over the fact table
    // before it can even plan. Multi-agg per cell exercises the
    // column-explosion naming (val_agg).
    "b44_pivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 2).as("qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    "b9_exists" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val avgDf = cust.agg(avg("c_acctbal").as("avg_bal"))
      cust
        .join(t(s, dir, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .crossJoin(F.broadcast(avgDf))
        .where(col("c_acctbal") > col("avg_bal"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_rich"))
        .orderBy("c_nationkey")
    }),

    "b11_grouping_sets" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // percentile_disc, not interpolated percentile: discrete quantiles
    // return an ACTUAL data element, so both engines agree bit-for-bit —
    // linear interpolation rounds differently at ULP boundaries (found as
    // a 0.01 flake at sf0.001)
    "b12_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("graft_b12_li")
      s.sql("""SELECT l_returnflag,
              |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
              |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
              |  percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75
              |FROM graft_b12_li GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    "b14_lead_lag" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      // ntile scoped per order-priority: an UNpartitioned ranking window
      // is a single-task global sort — the one shape that cannot scale
      val wq = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"),
            lag("o_orderdate", 1).over(w)).as("days_since_prev"),
          ntile(4).over(wq).as("price_quartile"))
        .where(col("days_since_prev").isNotNull)
        .orderBy("o_custkey", "o_orderkey")
    }),

    "b15_set_ops" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      def custsWith(status: String) =
        orders.where(col("o_orderstatus") === status).select("o_custkey")
      custsWith("O").intersect(custsWith("F"))
        .except(custsWith("P"))
        .orderBy("o_custkey")
    }),

    // B47 BAG-semantics set operations — INTERSECT ALL / EXCEPT ALL
    // keep multiplicities (b15's set forms collapse them): with
    // duplicate custkeys on both sides, intersectAll keeps min(m, n)
    // copies and exceptAll keeps m − n — genuinely different answers
    // from the set forms on any key appearing twice. Aggregated so the
    // multiplicities themselves are what the oracle hashes.
    "b47_bag_set_ops" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      def custs(status: String) =
        orders.where(col("o_orderstatus") === status).select("o_custkey")
      val inter = custs("O").intersectAll(custs("F"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n_inter"))
      val exc = custs("O").exceptAll(custs("F"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n_except"))
      inter.join(exc, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"),
          coalesce(col("n_except"), lit(0L)).as("n_except"))
        .orderBy("o_custkey")
    }),

    // Time-RANGE window frame (B27): trailing-90-day order count and
    // revenue per customer — a VALUE-based frame (rangeBetween on epoch
    // days), not a row count: gaps and same-day peer rows behave
    // completely differently from b4/b14's ROWS frames, and peers all
    // share one frame in both engines. Partitioned by customer — a
    // range frame still sorts only within its key partition.
    "b27_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("days")
        .rangeBetween(-90, 0)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unix_date(col("o_orderdate").cast("date")).as("days"),
          col("o_totalprice"))
        .select(col("o_orderkey"), col("o_custkey"), col("days"),
          count(lit(1)).over(w).as("cnt_90"),
          round(sum(col("o_totalprice")).over(w), 2).as("sum_90"))
        .orderBy("o_orderkey")
    }),

    // VARIANT semi-structured extraction (B30): Spark 4's schema-on-read
    // path for JSON that from_json's fixed StructType (b16) can't serve
    // — payload parsed ONCE into the binary VARIANT encoding, typed
    // paths (nested field, array index) extracted lazily. The payloads
    // are built from order columns, so the oracle aggregates the raw
    // columns directly: every extracted value must round-trip
    // build→parse→path-extract bit-exactly or the hash breaks.
    "b30_variant" -> ((s, dir) => {
      val j = t(s, dir, "orders").select(
        to_json(struct(
          col("o_orderstatus").as("status"),
          struct(col("o_totalprice").as("total"),
            col("o_orderpriority").as("prio")).as("meta"),
          array(col("o_custkey"), col("o_orderkey")).as("ids")))
          .as("payload"))
      j.select(parse_json(col("payload")).as("v"))
        .select(
          expr("variant_get(v, '$.status', 'string')").as("status"),
          expr("variant_get(v, '$.meta.total', 'double')").as("total"),
          expr("variant_get(v, '$.ids[0]', 'bigint')").as("cust"),
          expr("variant_get(v, '$.meta.prio', 'string')").as("prio"))
        .groupBy("status")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("total")), 2).as("sum_total"),
          sum(col("cust")).as("sum_cust"),
          countDistinct(col("prio")).as("n_prio"))
        .orderBy("status")
    }),

    // UNPIVOT / melt (B29): wide-to-long reshaping via the native
    // Dataset.unpivot — the inverse of b8's pivot; the oracle rebuilds
    // the long form with explicit UNION ALL branches, so value routing
    // (each measure to its own row, names preserved) is hash-checked.
    "b29_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("qty"),
          round(sum("l_extendedprice"), 2).as("price"),
          round(sum("l_discount"), 2).as("disc"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    }),

    // Recursive CTE (B28): iterative graph expansion INSIDE the SQL
    // surface (Spark 4's WITH RECURSIVE) — a synthetic bill-of-materials
    // closure over part (binary-tree containment: part p contains 2p and
    // 2p+1), per-root component counts and rolled-up prices. The same
    // recursion c13's loop hand-drives, expressed declaratively; the
    // depth guard bounds runaway recursion, and roots start at 1 so the
    // 0→0 self-loop never enters the closure. The edge table is
    // INVERTED (child carries parent = pk div 2) so each recursive step
    // is a hash EQUI-join — the natural `p_partkey IN (2·pk, 2·pk+1)`
    // phrasing runs every iteration as a nested-loop join (measured 9.3 s
    // vs 0.6 s at sf0.1), the one shape that cannot scale. DuckDB runs
    // the identical recursion as the oracle.
    "b28_recursive_cte" -> ((s, dir) => {
      t(s, dir, "part").select("p_partkey", "p_retailprice")
        .createOrReplaceTempView("graft_part_b28")
      s.sql(
        """WITH RECURSIVE edges AS (
          |  SELECT p_partkey, p_partkey div 2 AS parent
          |  FROM graft_part_b28 WHERE p_partkey >= 2),
          |bom(root, pk, depth) AS (
          |  SELECT p_partkey, p_partkey, 0 FROM graft_part_b28
          |  WHERE p_partkey BETWEEN 1 AND 8
          |  UNION ALL
          |  SELECT b.root, e.p_partkey, b.depth + 1
          |  FROM bom b JOIN edges e ON e.parent = b.pk
          |  WHERE b.depth < 20)
          |SELECT b.root, count(*) AS n_parts, max(b.depth) AS max_depth,
          |       round(sum(p.p_retailprice), 2) AS sum_price
          |FROM bom b JOIN graft_part_b28 p ON p.p_partkey = b.pk
          |GROUP BY b.root ORDER BY b.root""".stripMargin)
    }),

    // B34 time-series densification (the bucket-level complement of
    // B33's row-level fill): every (hour, event_type) cell of the
    // observed time range exists in the output, zero-filled where no
    // events landed — dashboards and window models need the empty
    // buckets. The hour grid is sequence(min, max, 1 hour) × the
    // distinct-type dim (both dim-sized), left-joined to the hourly agg;
    // bounds come from one 2-value agg collect.
    "b34_densify" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val hourly = ev
        .select(date_trunc("hour", col("ts")).as("hour"),
          col("event_type"), col("value"))
        .groupBy("hour", "event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"))
      val b = hourly.agg(min("hour"), max("hour")).head()
      val (lo, hi) = (b.getTimestamp(0), b.getTimestamp(1))
      val hoursDf = s.range(1).select(explode(
        sequence(lit(lo), lit(hi), expr("interval 1 hour"))).as("hour"))
      val grid = hoursDf.crossJoin(ev.select("event_type").distinct())
      grid.join(hourly, Seq("hour", "event_type"), "left")
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // B38 distribution-position window functions (percent_rank /
    // cume_dist / partition-constant nth_value): where does each row sit
    // inside its group's distribution — the ranking surface b4/b14 don't
    // cover. The window sort never leaves the key partition; the sampled
    // output filter runs AFTER the window (position is over the FULL
    // partition, then rows are thinned — order matters and both engines
    // do it in that order). Tie-proof: the sort key is unique.
    "b38_window_stats" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("o_totalprice"), 3).over(wFull).as("third_lowest"))
        .where(col("o_orderkey") % 101 === 0)
        .orderBy("o_orderkey")
    }),

    // B39 array aggregation (the BigQuery ARRAY_AGG surface): per-group
    // top-5 values materialized as an ARRAY inside the engine —
    // collect_list is order-free, so the contract is sort_array + slice
    // (deterministic regardless of partitioning); money goes through
    // exact integer cents and the array leaves as a joined string so the
    // gate is representation-proof. One keyed exchange, map-side
    // combined collect.
    "b39_array_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          slice(sort_array(collect_list(
            round(col("o_totalprice") * 100).cast("long")), asc = false),
            1, 5).as("top5"),
          count(lit(1)).as("n_orders"))
        .select(col("o_orderpriority"),
          concat_ws(",", col("top5")).as("top5_cents"),
          col("n_orders"))
        .orderBy("o_orderpriority")),

    // B35 event funnel (signup → purchase conversion cohorts): the
    // product-analytics shape BigQuery users express with correlated
    // min() subqueries. Per user, the first purchase strictly after the
    // first signup; conversion = within 24 h. Both sides of the join are
    // keyed dim-sized aggregates of the event stream (one keyed exchange
    // each), never an event×event self-join; hour arithmetic is exact
    // integer micros diffed then divided, so both engines see identical
    // doubles.
    "b35_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val signup = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min("ts").as("signup_ts"))
      val purch = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      val first = signup
        .join(purch,
          col("p_user") === col("user_id") && col("p_ts") > col("signup_ts"),
          "left")
        .groupBy("user_id", "signup_ts")
        .agg(min("p_ts").as("first_purch"))
      val conv = col("first_purch").isNotNull &&
        col("first_purch") <= col("signup_ts") + expr("interval 24 hours")
      first.groupBy(to_date(col("signup_ts")).as("cohort_day"))
        .agg(count(lit(1)).as("n_signups"),
          count(when(conv, 1)).as("n_conv_24h"),
          round(avg(when(conv,
            (unix_micros(col("first_purch")) - unix_micros(col("signup_ts")))
              / lit(3.6e9))), 4).as("avg_hours"))
        .orderBy("cohort_day")
    }),

    // B36 statistical aggregates (corr / covariance / variance / OLS
    // regression) — the profiling surface analysts reach for before any
    // model. All are one-pass mergeable co-moment aggregates (map-side
    // combined, one tiny exchange); definitions are the textbook ones
    // both engines share. Moments beyond 2nd (skewness/kurtosis) are
    // deliberately excluded: Spark reports population g1/g2 while DuckDB
    // applies sample bias correction — same name, different estimator.
    "b36_stats" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
          round(covar_samp("l_quantity", "l_discount"), 6).as("covar_qty_disc"),
          round(stddev_samp("l_extendedprice"), 4).as("sd_price"),
          round(var_samp("l_quantity"), 6).as("var_qty"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope_price_on_qty"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
            .as("r2_price_on_qty"))
        .orderBy("l_returnflag")),

    // B37 sliding-window aggregation (2 h windows sliding every 1 h):
    // unlike b10/b34's tumbling buckets each event lands in
    // window/slide = 2 grid cells. Spark's window() expands to that
    // small constant fan-out before the keyed agg — cost is 2× the
    // event scan, never event×window; the DuckDB replica builds the
    // same two aligned starts per event explicitly.
    "b37_sliding_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          round(sum("value"), 2).as("sum_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("n_events"), col("n_users"), col("sum_value"))
        .orderBy("win_start")),

    // B33 forward-fill / gap-fill (time-series imputation): per-user
    // last non-null reading carried forward in event-time order —
    // last_value(IGNORE NULLS) over an unbounded-preceding frame. The
    // sort never leaves the user partition (one keyed exchange, no
    // global sort); nulls are planted deterministically so both engines
    // fill the same gaps. Ties on ts are broken by event_id in BOTH the
    // frame order and the output order.
    "b33_gap_fill" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("reading",
          when(col("event_id") % 3 === 0, col("value")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("user_id"), col("event_id"),
          round(coalesce(last("reading", ignoreNulls = true).over(w),
            lit(0.0)), 2).as("filled"))
        .orderBy("user_id", "event_id")
    }),

    // B32 exact Jaccard set-similarity self-join (prefix filtering —
    // lossless blocking, so the oracle is the full O(n²) cross-join
    // Jaccard pair set; one missed or phantom pair anywhere breaks it)
    "b32_jaccard_join" -> ((s, dir) => {
      graft.operators.SetSimJoin.jaccardSelfJoin(
          t(s, dir, "part"), "p_partkey", "p_name", theta = 0.6)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b")
    }),

    // B31 correlated LATERAL subquery join — the declarative "top-N per
    // outer row" shape. Spark 4 decorrelates the per-nation ORDER BY +
    // LIMIT into WindowGroupLimit (a map-side partial top-k BELOW the
    // exchange — each task forwards at most N rows per group) plus one
    // broadcast hash join; never a per-row re-execution, never a
    // nested loop. Plan-audited in PlanAuditSpec; DuckDB runs the
    // identical LATERAL SQL. Ties at the LIMIT boundary are broken by
    // name, so the row set is engine-independent.
    "b31_lateral_topn" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("graft_nation_b31")
      t(s, dir, "customer").createOrReplaceTempView("graft_customer_b31")
      s.sql(
        """SELECT n.n_name, t.c_name, t.c_acctbal
          |FROM graft_nation_b31 n,
          |LATERAL (
          |  SELECT c_name, c_acctbal FROM graft_customer_b31 c
          |  WHERE c.c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_name
          |  LIMIT 3) t
          |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
    }),

    // typed JSON path: from_json to a struct (columnar, prunable), not
    // per-field get_json_object string probing (that's b10's variant)
    "b16_json_struct" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"))
        .groupBy("event_type")
        .agg(count(col("p.k")).as("n_k"), sum("p.k").as("sum_k"),
          round(avg("p.k"), 4).as("avg_k"))
        .orderBy("event_type")),

    // Salted skew join: correctness contract is exact row multiplicity —
    // the aggregate must match a plain join bit-for-bit.
    "b13_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumnRenamed("l_orderkey", "orderkey")
      val ords = t(s, dir, "orders")
        .select(col("o_orderkey").as("orderkey"), col("o_orderpriority"))
      graft.operators.SkewJoin.saltedInnerJoin(li, ords, "orderkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), revenue.as("revenue"))
        .orderBy("o_orderpriority")
    }),

    "b10_events_window" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    // Relational upsert: price revisions for open orders + a batch of new
    // rows, merged into the snapshot by key (replace-else-insert).
    "a17_upsert" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val revisions = o.where(col("o_orderstatus") === "O")
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      val inserts = o.where(col("o_orderstatus") === "F")
        .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"))
      graft.operators.Upsert
        .upsert(o, revisions.unionByName(inserts), Seq("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // Merge with change data feed (A23): one merge emits the snapshot AND
    // the delta-CDF diff (insert / update_preimage / update_postimage /
    // delete). The batch mixes changed rows, NO-OP rows (matched but
    // identical — must emit nothing), brand-new keys, and deletes; the
    // result aggregates the feed per change kind plus the merged
    // snapshot, and the oracle rebuilds the same classification
    // relationally in DuckDB.
    "a23_cdf_merge" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val changed = o.where(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      val noop = o.where(col("o_orderkey") % 89 === 0 &&
        col("o_orderkey") % 97 =!= 0)
      val inserts = o.where(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
      val deletes = o.where(col("o_orderkey") % 103 === 0 &&
          col("o_orderkey") % 97 =!= 0 && col("o_orderkey") % 89 =!= 0)
        .select("o_orderkey")
      val res = graft.operators.Upsert.upsertWithChanges(o,
        changed.unionByName(noop).unionByName(inserts),
        Seq("o_orderkey"), Some(deletes))
      val feed = res.changes.groupBy(col("_change_type").as("kind"))
        .agg(count(lit(1)).as("cnt"), sum("o_orderkey").as("sum_keys"),
          round(sum("o_totalprice"), 2).as("sum_price"))
      val snap = res.merged.agg(count(lit(1)).as("cnt"),
          sum("o_orderkey").as("sum_keys"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .select(lit("merged_snapshot").as("kind"), col("cnt"),
          col("sum_keys"), col("sum_price"))
      feed.unionByName(snap).orderBy("kind")
    }),

    // A24: SCD2 dimension history — customer segment (order priority)
    // versioned by order date. Applied in TWO batches (pre/post 1997) to
    // exercise the history-merge path; batch-vs-one-shot equivalence is
    // the UpsertSpec lock. Timestamps stringified so both engines hash
    // the same representation.
    "a24_scd2" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def ev(f: org.apache.spark.sql.DataFrame) = f.select(
        col("o_custkey"), col("o_orderpriority").as("segment"),
        col("o_orderdate"))
      val hist0 = graft.operators.Upsert.scd2Apply(None,
        ev(o.where(year(col("o_orderdate")) < 1997)),
        Seq("o_custkey"), "o_orderdate", Seq("segment"))
      val fin = graft.operators.Upsert.scd2Apply(Some(hist0),
        ev(o.where(year(col("o_orderdate")) >= 1997)),
        Seq("o_custkey"), "o_orderdate", Seq("segment"))
      fin.select(col("o_custkey"), col("segment"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("is_current"))
        .orderBy("o_custkey", "valid_from")
    }),

    // Incremental materialized-view maintenance (B26): a grouped
    // count/sum view advanced by the A23 change feed ALONE — no base
    // rescan. The batch moves %97 orders into a brand-new 'Z' status
    // group (cross-group movement: the pre-image decrements the old
    // group while the post-image opens the new one), %101 keys insert,
    // %103 delete. incr_ok proves in-plan that the maintained view
    // EXACTLY equals a rebuild from the merged snapshot (decimal sums —
    // equality, not float tolerance); the oracle rebuilds the merged
    // snapshot relationally and aggregates it.
    "b26_incremental_mv" -> ((s, dir) => {
      import graft.operators.MaterializedView
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val changed = o.where(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .withColumn("o_orderstatus", lit("Z"))
      val noop = o.where(col("o_orderkey") % 89 === 0 &&
        col("o_orderkey") % 97 =!= 0)
      val inserts = o.where(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
      val deletes = o.where(col("o_orderkey") % 103 === 0 &&
          col("o_orderkey") % 97 =!= 0 && col("o_orderkey") % 89 =!= 0)
        .select("o_orderkey")
      val res = graft.operators.Upsert.upsertWithChanges(o,
        changed.unionByName(noop).unionByName(inserts),
        Seq("o_orderkey"), Some(deletes))
      val grp = Seq("o_orderstatus")
      val ms = Seq("o_totalprice")
      // both views are group-cardinality frames (a handful of rows);
      // persisting them keeps the bidirectional exceptAll identity from
      // re-running the whole merge pipeline once per comparison side
      // (4 evaluations → 1 each, measured 5.6 → ~2 s at sf0.1)
      val inc = MaterializedView.applyChanges(
        MaterializedView.build(o, grp, ms), res.changes, grp, ms).persist()
      val rebuilt = MaterializedView.build(res.merged, grp, ms).persist()
      val ok = inc.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(inc).isEmpty
      inc.select(col("o_orderstatus"), col("__mv_n").as("cnt"),
          round(col("__mv_sum_o_totalprice"), 2).cast("double")
            .as("sum_price"),
          lit(ok).as("incr_ok"))
        .orderBy("o_orderstatus")
    }),

    // Bucketed range join: quantity deciles + one full-width band (spans
    // all 5 buckets — exercises the interval explosion) joined to
    // lineitem as an equi-join on bucket id, residual BETWEEN exact.
    "b19_range_join" -> ((s, dir) => {
      val bands = s.range(5).select(col("id").cast("int").as("band_id"),
          (col("id") * 10 + 1).as("lo"), (col("id") * 10 + 10).as("hi"))
        .unionByName(s.range(1).select(lit(9).as("band_id"),
          lit(1L).as("lo"), lit(50L).as("hi")))
      graft.operators.RangeJoin.pointInInterval(
          t(s, dir, "lineitem"), bands, "l_quantity", "lo", "hi",
          bucketWidth = 10L)
        .groupBy("band_id")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("int")).as("sum_qty"))
        .orderBy("band_id")
    }),

    // Sharded JSONL export (A19): the interchange format training
    // pipelines actually consume. Size-balanced shards via
    // BalancedRepartition, gzip text JSON lines; the gate reads the
    // export BACK through Spark's JSON reader and aggregates against the
    // SOURCE table in DuckDB — field fidelity (ids, chars, text bytes via
    // md5) must survive the round trip.
    "a19_jsonl_export" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select("doc_id", "lang", "text", "n_chars")
      val base = Tables.scratch("a19_" + new java.io.File(dir).getName)
      graft.operators.BalancedRepartition(docs, Seq("lang"), 1000L)
        .write.mode("overwrite").option("compression", "gzip")
        .partitionBy("lang").json(base)
      s.read.json(base)
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"),
          sum("doc_id").as("sum_ids"),
          sum("n_chars").as("sum_chars"),
          sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
            .as("md5_probe"))
        .orderBy("lang")
    }),

    // Small-file compaction (A18): fragment documents into 7 files per
    // lang partition, compact to target-sized files, verify content
    // survives (per-lang counts + key/char sums vs the SOURCE table in
    // DuckDB) and that the pass is idempotent (second run rewrites
    // nothing) — the delta-OPTIMIZE maintenance half of the reference's
    // write-time file sizing.
    "a18_compaction" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = Tables.scratch("a18_" + new java.io.File(dir).getName)
      docs.repartition(7).write.partitionBy("lang").mode("overwrite")
        .parquet(base)
      val r1 = graft.sources.Compaction.compactPartitioned(
        s, base, "lang", targetFileBytes = 64L << 20)
      val r2 = graft.sources.Compaction.compactPartitioned(
        s, base, "lang", targetFileBytes = 64L << 20)
      val ok = r1.nonEmpty && r1.forall(_.rewritten) && r2.forall(!_.rewritten)
      s.read.parquet(base).groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum("doc_id").as("sum_ids"),
          sum("n_chars").as("sum_chars"))
        .select(col("lang"), col("cnt"), col("sum_ids"), col("sum_chars"),
          lit(ok).as("compact_ok"))
        .orderBy("lang")
    }),

    // Zone-map data skipping (A22): the stats half of a transaction log,
    // lifted once from parquet FOOTERS only (no data scan) into a
    // queryable manifest. A date-clustered copy of lineitem is manifested,
    // then one quarter's revenue is computed through the pruned read.
    // Gates: skip_ok proves pruning actually excluded files yet read at
    // least one, in-plan; the aggregate must equal DuckDB's full-scan
    // answer — skipping may change cost, never results.
    "a22_data_skipping" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate").cast("date").as("ship"),
          col("l_extendedprice"), col("l_discount"), col("l_quantity"))
      val base = Tables.scratch("a22_" + new java.io.File(dir).getName)
      li.repartitionByRange(8, col("ship")).sortWithinPartitions("ship")
        .write.mode("overwrite").parquet(base)
      val stats = graft.sources.DataSkipping.collectStats(s, base,
        Seq("ship"))
      val pr = graft.sources.DataSkipping.readPrunedDate(s, base,
        stats.toDF, "ship", java.sql.Date.valueOf("1996-01-01"),
        java.sql.Date.valueOf("1996-03-31"))
      val skipOk = pr.report.filesSkipped > 0 &&
        pr.report.filesRead < pr.report.filesTotal &&
        pr.report.filesRead > 0
      pr.df.where(col("ship").between("1996-01-01", "1996-03-31"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
            2).as("revenue"))
        .select(col("cnt"), col("sum_qty"), col("revenue"),
          lit(skipOk).as("skip_ok"))
    }),

    // Z-order clustering (A27): the multi-dimensional completion of A22 —
    // the same lineitem projection written twice, linear (sorted by ship
    // day) and z-ordered over (shipdays, price); both manifested, both
    // pruned under the same ~25% x ~25% two-column predicate. Gates,
    // in-plan: zskip_ok (the z layout actually skipped files yet read
    // some) and beats_linear (the z layout reads STRICTLY fewer files —
    // in the date-sorted layout every file spans the whole price domain,
    // so the second conjunct prunes nothing there). The aggregate must
    // equal DuckDB's full scan: layout and pruning change cost, never
    // results.
    "a27_zorder" -> ((s, dir) => {
      import graft.sources.{DataSkipping, ZOrder}
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"),
        unix_date(col("l_shipdate").cast("date")).as("shipdays"),
        col("l_extendedprice").as("price"),
        col("l_quantity"))
      val tag = new java.io.File(dir).getName
      val linBase = Tables.scratch("a27lin_" + tag)
      val zBase = Tables.scratch("a27z_" + tag)
      li.repartitionByRange(16, col("shipdays"))
        .sortWithinPartitions("shipdays")
        .write.mode("overwrite").parquet(linBase)
      ZOrder.clusteredWrite(li, Seq("shipdays", "price"), zBase,
        numFiles = 16)
      val zoneCols = Seq("shipdays", "price")
      val statsLin = DataSkipping.collectStats(s, linBase, zoneCols).toDF
      val statsZ = DataSkipping.collectStats(s, zBase, zoneCols).toDF
      val dLo = java.time.LocalDate.parse("1996-01-01").toEpochDay
      val dHi = java.time.LocalDate.parse("1997-08-31").toEpochDay
      val ranges = Seq(
        DataSkipping.LongRange("shipdays", dLo, dHi),
        DataSkipping.DoubleRange("price", 26000.0, 52000.0))
      val prZ = DataSkipping.readPrunedMulti(s, zBase, statsZ, ranges)
      val zOk = prZ.report.filesSkipped > 0 && prZ.report.filesRead > 0
      // beats_linear isolates the z-curve's payoff: on the NON-LEADING
      // column the date-sorted layout can prune nothing (every file
      // spans the full price domain); the z layout skips on it
      val priceOnly = Seq(ranges(1))
      val pLin = DataSkipping.readPrunedMulti(s, linBase, statsLin,
        priceOnly)
      val pZ = DataSkipping.readPrunedMulti(s, zBase, statsZ, priceOnly)
      val beats = pZ.report.filesRead < pLin.report.filesRead
      prZ.df.where(col("shipdays").between(dLo, dHi) &&
          col("price").between(26000.0, 52000.0))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("price")), 2).as("sum_price"))
        .select(col("cnt"), col("sum_qty"), col("sum_price"),
          lit(zOk).as("zskip_ok"), lit(beats).as("beats_linear"))
    }),

    // REAL BPE tokenizer (C23): merges trained driver-side on a bounded
    // deterministic sample (orderBy + limit — the same contract as c19's
    // centroid literals: KB-scale driver state, never data), applied
    // distributed via the codegen'd BpeTokensExpr. The gate checks the
    // tokenizer CONTRACT per document, in-plan: losslessness (token
    // concatenation reproduces the text minus whitespace — the invariant
    // a real vocab must keep) and count bounds (n_words ≤ n_tokens ≤
    // n_non-space chars). Exact token arrays are spec-locked against an
    // independent reference implementation in BpeSpec.
    "c23_bpe_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // sample/merge bounds are ARGUMENTS of the training entry point
      // (driver-memory contract documented there); 100×200 keeps the gate
      // cheap — BpeSpec proves the same contract at 1000 docs/500 merges
      val merges = graft.functions.Bpe.trainFromCorpus(
        docs, "text", "doc_id", sampleDocs = 100, numMerges = 200)
      val noWs = regexp_replace(col("text"), "\\s+", "")
      docs.select(col("doc_id"),
          graft.functions.Bpe.tokens(col("text"), merges).as("toks"),
          col("text"))
        .select(col("doc_id"),
          (concat_ws("", col("toks")) === noWs).as("lossless_ok"),
          (size(col("toks")) <= length(noWs) &&
            size(col("toks")) >= size(split(trim(col("text")), "\\s+")))
            .as("bounds_ok"))
        .orderBy("doc_id")
    }),

    // REAL image codec (C12, full path): deterministic PNGs are encoded
    // executor-side (javax.imageio), decoded back through the batched
    // decode, and the decoded mean-RGB features are oracle-checked — the
    // DuckDB side recomputes the same means from the pixel FORMULA, so a
    // codec that lied about a single pixel would hash-mismatch. PNG is
    // lossless and the sums are exact-integer, so equality is bit-exact.
    "c12_image_codec" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val imgs = Multimodal.packImages(s, docs, "doc_id")
      Multimodal.decodeImages(s, imgs)
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(element_at(col("features"), 1), 6).as("mean_r"),
          round(element_at(col("features"), 2), 6).as("mean_g"),
          round(element_at(col("features"), 3), 6).as("mean_b"))
        .orderBy("media_id")
    }),

    // batched-codec transport variant: same pixels, same features, same
    // oracle — the per-image ImageIO overhead (temp-file cache, per-call
    // reader/writer instantiation, per-pixel color-model conversion) is
    // amortized per partition instead (MultimodalSpec locks payload
    // byte-equality between the two paths)
    "c12b_image_codec_batched" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val imgs = Multimodal.packImagesBatched(s, docs, "doc_id")
      Multimodal.decodeImagesBatched(s, imgs)
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(element_at(col("features"), 1), 6).as("mean_r"),
          round(element_at(col("features"), 2), 6).as("mean_g"),
          round(element_at(col("features"), 3), 6).as("mean_b"))
        .orderBy("media_id")
    }),

    // columnar-transport decode (c12c): the custom columnar SparkPlan
    // (DecodeImagesExec) replaces the mapPartitions row loop — payload
    // bytes travel as ColumnarBatch vectors end to end (vectorized
    // parquet reader → codec → one ColumnarToRow above). Same pixels,
    // same ImageDecoder code object, same oracle as c12/c12b.
    "c12c_image_codec_columnar" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val imgs = Multimodal.packImagesBatched(s, docs, "doc_id")
      Multimodal.decodeImagesColumnar(s, imgs)
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(element_at(col("features"), 1), 6).as("mean_r"),
          round(element_at(col("features"), 2), 6).as("mean_g"),
          round(element_at(col("features"), 3), 6).as("mean_b"))
        .orderBy("media_id")
    }),

    // Multi-frame media (c12e): REAL animated GIFs through ImageIO's
    // sequence writer/reader — the "video" surface: container-reported
    // frame counts, every 2nd frame decoded (frame sampling against a
    // real container, not byte slicing). Frames draw from an exact
    // 8-color palette so the GIF round trip is LOSSLESS and per-frame
    // mean-RGB is formula-replicable by the oracle (the JPEG rule in
    // reverse: palettized GIF ≤256 colors never quantizes).
    "c12e_gif_frames" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val gifs = Multimodal.packAnimatedGifs(s, docs, "doc_id")
      Multimodal.decodeGifFrames(s, gifs, stride = 2)
        .select(col("media_id"), col("n_frames"), col("frame_idx"),
          col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
        .orderBy("media_id", "frame_idx")
    }),

    // Frame-difference features (c12f): pixel-wise mean absolute
    // difference between consecutive KEPT frames — the motion signal a
    // video curation pipeline filters on. The GIF palette construction
    // keeps every |Δ| sum an exact integer, so the oracle recomputes
    // the MADs from the color formula with no tolerance (only clips
    // with ≥2 kept frames under stride 2 — nf ∈ {3,4} — emit rows).
    "c12f_frame_deltas" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val gifs = Multimodal.packAnimatedGifs(s, docs, "doc_id")
      Multimodal.gifFrameDeltas(s, gifs, stride = 2)
        .select(col("media_id"), col("n_frames"), col("prev_idx"),
          col("frame_idx"), col("width"), col("height"),
          round(col("mad_r"), 6).as("mad_r"),
          round(col("mad_g"), 6).as("mad_g"),
          round(col("mad_b"), 6).as("mad_b"))
        .orderBy("media_id", "frame_idx")
    }),

    // Audio spectral features (c12g): Walsh–Hadamard sequency power
    // spectrum over the first 128 PCM samples + whole-clip zero-crossing
    // rate. The WHT is integer-exact (±sums of 16-bit samples), so
    // centroid/crest/argmax are exact-integer ratios the oracle
    // recomputes directly from the popcount formula — bit-identical, no
    // tolerance (flatness, which needs exp/ln, is spec-locked in
    // AudioSpec instead and projected out here).
    "c12g_audio_spectral" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val wavs = graft.operators.Audio.packWav(s, docs, "doc_id")
      graft.operators.Audio.spectralFeatures(s, wavs)
        .select(col("media_id"), col("n_samples"), col("zcr"),
          round(col("seq_centroid"), 6).as("seq_centroid"),
          round(col("seq_crest"), 6).as("seq_crest"),
          col("dominant_seq"))
        .orderBy("media_id")
    }),

    // Audio near-dup via spectral landmark codes (c12k): the dedup
    // family's audio member — every 7th clip gets a byte-identical copy
    // under a shifted id; clips sharing ≥5 (frame, dominant line, exact
    // power) codes pair up — C1's exact-dedup contract at the AUDIO
    // level (identical PCM matches across container rewraps a byte md5
    // would miss). Integer-exact end to end; the oracle replays grid,
    // argmax, join, and threshold.
    "c12k_audio_neardup" -> ((s, dir) => {
      // every 4th clip: the one-LCG-waveform corpus is one giant
      // phase-coincident near-dup family, so the TRUE pair set is
      // quadratic in corpus size (420k pairs at sf0.1 unsliced — result
      // volume, not operator cost; the b32 rule). The slice keeps the
      // gate meaningful and the bench measuring the operator.
      val docs = t(s, dir, "documents").select("doc_id")
        .where(col("doc_id") % 4 === 0)
      val wavs = graft.operators.Audio.packWav(s, docs, "doc_id")
      val corpus = wavs.unionByName(
        wavs.where(pmod(col("media_id"), lit(7)) === 0)
          .withColumn("media_id", col("media_id") + lit(1000000L)))
      // `planted` separates the byte-identical copies from the
      // phase-coincident families the synthetic corpus also contains
      // (all clips are shifts of one LCG waveform — the fingerprint
      // CORRECTLY groups them; a real corpus has no such families)
      graft.operators.Audio.fingerprintPairs(s, corpus, minShared = 5)
        .withColumn("planted", col("id_b") - col("id_a") === 1000000L)
        .orderBy("id_a", "id_b")
    }),

    // Robust audio matching (c12m): every 7th clip gets a DITHERED copy —
    // re-encoded through the real codec with a ±1 LSB perturbation that
    // moves every sequency line's power, so c12k's exact-power landmarks
    // no longer match it (spec-locked in AudioSpec). The quantized-
    // magnitude landmark (dominant line + power bit-length, ±1 bucket
    // tolerance as candidate-key expansion — still a hash equi-join)
    // recovers the pair. The oracle replays synthesis, clamp(v+δ), WHT,
    // argmax, bit-length, band join, and threshold — integer-exact.
    "c12m_audio_robust_match" -> ((s, dir) => {
      // same %4 slice as c12k (the ±1 qmag band makes the family pair
      // set even denser than the exact matcher's — 5.9M rows at sf0.1
      // unsliced, all of it true phase-family signal the gate's
      // `planted` flag separates)
      val docs = t(s, dir, "documents").select("doc_id")
        .where(col("doc_id") % 4 === 0)
      val wavs = graft.operators.Audio.packWav(s, docs, "doc_id")
      val dithered = graft.operators.Audio.ditherWav(s,
        wavs.where(pmod(col("media_id"), lit(7)) === 0)
          .withColumn("media_id", col("media_id") + lit(2000000L)))
      graft.operators.Audio
        .robustFingerprintPairs(s, wavs.unionByName(dithered), minShared = 5)
        .withColumn("planted", col("id_b") - col("id_a") === 2000000L)
        .orderBy("id_a", "id_b")
    }),

    // Amplitude-invariant chained-landmark matching (c12n): every 7th
    // sliced clip gets a HALF-GAIN copy (re-mastered volume — the
    // transform that moves every qmag by 2 buckets and defeats BOTH
    // magnitude matchers, spec-locked). The Shazam-style chained code
    // (anchor, line_a, line_{a+1}) carries no amplitude, so the lines
    // survive the gain change and the copy pairs up. The oracle replays
    // synthesis, truncating halving (// 2 ≡ Java /), per-frame argmax,
    // the chain join, and the threshold — integer-exact.
    "c12n_audio_chained_match" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
        .where(col("doc_id") % 4 === 0)
      val wavs = graft.operators.Audio.packWav(s, docs, "doc_id")
      val halved = graft.operators.Audio.gainWav(s,
        wavs.where(pmod(col("media_id"), lit(7)) === 0)
          .withColumn("media_id", col("media_id") + lit(3000000L)))
      graft.operators.Audio
        .chainedFingerprintPairs(s, wavs.unionByName(halved), minShared = 4)
        .withColumn("planted", col("id_b") - col("id_a") === 3000000L)
        .orderBy("id_a", "id_b")
    }),

    // Overlapping-hop WHT spectrogram (c12l): the STFT convention —
    // hop = frame/2, so consecutive frames share half their samples and
    // a transient on a frame boundary is fully inside some frame. Same
    // integer-exact cell contract as c12j; the oracle's sample CTE is
    // hop-indexed (sample i of frame f is f·64 + ii). Every even-id clip
    // (half the corpus bounds the oracle's popcount grid).
    "c12l_audio_spectrogram_hop" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
        .where(col("doc_id") % 2 === 0)
      val wavs = graft.operators.Audio.packWav(s, docs, "doc_id")
      graft.operators.Audio.spectrogram(s, wavs, hop = 64)
        .select(col("media_id"), col("frame_idx"), col("band"),
          col("band_energy"), round(col("frac"), 6).as("frac"))
        .orderBy("media_id", "frame_idx", "band")
    }),

    // WHT spectrogram (c12j): the full time × sequency-band grid — the
    // c12i frame axis × the c12h band axis, every cell an exact integer
    // band energy + exact-ratio fraction, recomputed by the oracle from
    // the popcount formula with no tolerance.
    "c12j_audio_spectrogram" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val wavs = graft.operators.Audio.packWav(s, docs, "doc_id")
      graft.operators.Audio.spectrogram(s, wavs)
        .select(col("media_id"), col("frame_idx"), col("band"),
          col("band_energy"), round(col("frac"), 6).as("frac"))
        .orderBy("media_id", "frame_idx", "band")
    }),

    // Frame-level activity profile (c12i): the VAD/silence envelope —
    // non-overlapping 128-sample frames, each reporting exact integer
    // energy / within-frame zero crossings / peak. Zero floating point;
    // the oracle recomputes every row from the synthesis formula.
    "c12i_audio_activity" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val wavs = graft.operators.Audio.packWav(s, docs, "doc_id")
      graft.operators.Audio.activityFrames(s, wavs)
        .orderBy("media_id", "frame_idx")
    }),

    // Audio band energies (c12h): the dyadic equalizer profile over the
    // c12g sequency spectrum — band sums are EXACT BIGINTs (no floating
    // point at all), fracs exact-integer ratios; the oracle recomputes
    // the whole spectrum from the popcount formula and re-bands it.
    "c12h_audio_bands" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val wavs = graft.operators.Audio.packWav(s, docs, "doc_id")
      graft.operators.Audio.bandEnergies(s, wavs)
        .select(col("media_id"), col("band"), col("band_energy"),
          round(col("frac"), 6).as("frac"))
        .orderBy("media_id", "band")
    }),

    // WAV audio codec (c12d): the audio twin of c12's image codec — REAL
    // RIFF/PCM payloads through the JDK's sampled-audio stack both ways
    // (AudioSystem.write encodes the container, getAudioInputStream
    // parses it back). Every feature is bit-identical to the oracle's
    // integer-formula recomputation: Σs² fits a long exactly, n and the
    // 16 kHz rate are powers-of-two-friendly so duration/rms divisions
    // are the same doubles on both engines (Audio.scala contract).
    "c12d_audio_codec" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val wavs = graft.operators.Audio.packWav(s, docs, "doc_id")
      graft.operators.Audio.decodeWav(s, wavs)
        .select(col("media_id"), col("n_samples"), col("sample_rate"),
          col("duration_ms"), round(col("rms"), 6).as("rms"), col("peak"))
        .orderBy("media_id")
    }),

    // Mergeable t-digest quantile sketch (B20/B22): per-group digests built
    // map-side, merged associatively, interrogated for 3 quantiles. The
    // gate is the sketch's CONTRACT — rank error ≤ 0.02 at δ=200 — checked
    // in-plan: each estimate is joined back against the group's rows to
    // measure its true rank; only the bound booleans are hash-compared
    // (estimates themselves legitimately vary with distributed merge order
    // WITHIN the bound; bit-exactness would gate on shuffle scheduling).
    "b20_quantile_sketch" -> ((s, dir) => {
      val qsArr = Seq(0.1, 0.5, 0.9)
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val sk = li.groupBy("l_returnflag")
        .agg(graft.operators.Sketches
            .tdigestQuantiles(col("l_extendedprice"), qsArr, 200).as("est_q"),
          count(lit(1)).as("n"))
      val est = sk.select(col("l_returnflag"), col("n"),
        posexplode(col("est_q")).as(Seq("qi", "est")))
      val target = element_at(array(qsArr.map(lit): _*), col("qi") + 1)
      est.join(li, Seq("l_returnflag"))
        .groupBy("l_returnflag", "qi", "n", "est")
        .agg(sum(when(col("l_extendedprice") <= col("est"), 1L)
          .otherwise(0L)).as("rk"))
        .select(col("l_returnflag"), col("qi").cast("long").as("qi"),
          (abs(col("rk") / col("n") - target) <= lit(0.02)).as("rank_ok"))
        .orderBy("l_returnflag", "qi")
    }),

    // B22: heavy hitters over a skewed long key via the built-in mergeable
    // count-min sketch. The key plants one hot value (-1 for every 4th
    // order's lineitems, ~25% of rows) over a 50-value background; at
    // minShare=0.01 all 51 keys are heavy. Gate = CMS contract booleans
    // (never undercounts; overcount ≤ eps·N) + exact counts; the oracle
    // computes the same heavy set exactly and expects TRUE booleans.
    "b22_heavy_hitters" -> ((s, dir) => {
      val keyed = t(s, dir, "lineitem").select(
        when(pmod(col("l_orderkey"), lit(4)) === 0, lit(-1L))
          .otherwise(pmod(col("l_partkey"), lit(50)).cast("long")).as("hh_key"))
      graft.operators.CmsHeavyHitters(keyed, "hh_key", minShare = 0.01)
        .orderBy("item")
    }),

    // B24: HLL sketch surfaces (DataSketches-backed): per-group sketch
    // build, cross-group union, scalar estimate extraction — the
    // store/merge/extract triple that lets 100 TB distinct counts
    // re-aggregate from per-shard partials without raw data. Gate: every
    // estimate (per group, merged-union, direct-global) sits within the
    // lgK=12 error bound of the exact distinct count. Merged and direct
    // are NOT required equal: a union materializes the dense
    // max-register form while a directly-built sketch may still be in
    // its exact coupon-list range, so their estimators legitimately
    // differ within the bound (measured here: 2000 exact, both paths
    // within ±5%+10 but not bit-equal).
    "b24_hll_sketch" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val perGroup = li.groupBy("l_returnflag")
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"),
          countDistinct(col("l_partkey")).as("n_exact"))
      val est = perGroup.select(col("l_returnflag"), col("n_exact"),
        (abs(hll_sketch_estimate(col("sk")) - col("n_exact")) <=
          col("n_exact") * 0.05 + lit(10.0)).as("within_bound"))
      val allRow = perGroup.agg(hll_union_agg(col("sk")).as("sk_m"))
        .crossJoin(li.agg(hll_sketch_agg(col("l_partkey")).as("sk_d"),
          countDistinct(col("l_partkey")).as("n_exact")))
        .select(lit("ALL").as("l_returnflag"), col("n_exact"),
          (abs(hll_sketch_estimate(col("sk_m")) - col("n_exact")) <=
              col("n_exact") * 0.05 + lit(10.0) &&
            abs(hll_sketch_estimate(col("sk_d")) - col("n_exact")) <=
              col("n_exact") * 0.05 + lit(10.0)).as("within_bound"))
      est.unionByName(allRow).orderBy("l_returnflag")
    }),

    // B25: edit-distance similarity self-join on customer names
    // (deletion-neighborhood blocking + exact levenshtein verify — never
    // a cross join). Output aggregated per left id so its size stays
    // bounded by n; the oracle is an O(n²) brute-force levenshtein join,
    // which the operator must reproduce EXACTLY (the blocking is
    // lossless, so this is an equality gate, not a recall gate).
    "b25_fuzzy_join" -> ((s, dir) =>
      graft.operators.FuzzyJoin.editDistanceSelfJoin(
          t(s, dir, "customer"), "c_custkey", "c_name", maxDist = 1)
        .groupBy("id_a")
        .agg(count(lit(1)).as("n_matches"),
          sum("id_b").as("sum_ids"),
          max("dist").as("max_dist"))
        .orderBy("id_a")),

    // B46 entity-resolution best match — the full ER pipeline composed:
    // SymSpell blocking + exact levenshtein verify (B25) generate the
    // candidate pairs, Jaro-Winkler (B45) RANKS them, and a per-record
    // window keeps the single best match (jw desc, id asc — the
    // deterministic production rule). Candidates are pair-set-sized by
    // the time ranking runs; the oracle replays the whole chain with
    // DuckDB's native levenshtein + jaro_winkler_similarity from the
    // brute-force pair set.
    "b46_er_best_match" -> ((s, dir) => {
      import graft.functions.GraftExpressions
      val pairs = graft.operators.FuzzyJoin.editDistanceSelfJoin(
        t(s, dir, "customer"), "c_custkey", "c_name", maxDist = 1)
      val both = pairs.select(col("id_a").as("id"), col("id_b").as("cand"),
          col("str_a").as("s"), col("str_b").as("cs"), col("dist"))
        .unionByName(pairs.select(col("id_b").as("id"),
          col("id_a").as("cand"), col("str_b").as("s"),
          col("str_a").as("cs"), col("dist")))
        .withColumn("jw",
          GraftExpressions.jaroWinkler(col("s"), col("cs")))
      val w = Window.partitionBy("id").orderBy(desc("jw"), col("cand"))
      both.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("id"), col("cand").as("best_id"), col("dist"),
          col("jw"))
        .orderBy("id")
    }),

    // A25: source-format parity — the same frame written to ORC and
    // JSON-lines, read back, and aggregated identically; the oracle
    // computes the same aggregate from the parquet original, so any
    // format round-trip corruption (types, encoding, nulls) breaks the
    // hash compare.
    "a25_format_roundtrip" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_returnflag"), col("l_quantity").cast("int").as("qty"))
      val tag = new java.io.File(dir).getName
      val orcPath = Tables.scratch(s"a25_orc_$tag")
      val jsonPath = Tables.scratch(s"a25_json_$tag")
      li.write.mode("overwrite").orc(orcPath)
      li.write.mode("overwrite").json(jsonPath)
      val orc = s.read.orc(orcPath)
      val json = s.read.schema(li.schema).json(jsonPath)
      def agg(f: org.apache.spark.sql.DataFrame, suffix: String) =
        f.groupBy("l_returnflag").agg(
          count(lit(1)).as(s"cnt_$suffix"),
          sum(col("qty")).as(s"sum_$suffix"),
          sum(col("l_orderkey")).as(s"keys_$suffix"))
      agg(orc, "orc").join(agg(json, "json"), "l_returnflag")
        .orderBy("l_returnflag")
    }),

    // Schema-evolution read (A28): two parquet generations under one
    // root — v1 lacks l_extendedprice, v2 added it — read back through
    // mergeSchema into the union schema (old rows null-fill the new
    // column). evolve_ok locks the read to the frame-level twin
    // (unionByName allowMissingColumns) row-for-row; the oracle
    // recomputes the generational split from lineitem, so a dropped or
    // double-read generation fails the hash.
    "a28_schema_evolution" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      val v1 = li.where(col("l_orderkey") % 2 === 0)
        .drop("l_extendedprice")
      val v2 = li.where(col("l_orderkey") % 2 =!= 0)
      val tag = new java.io.File(dir).getName
      val root = Tables.scratch(s"a28_$tag")
      v1.write.mode("overwrite").parquet(s"$root/gen=1")
      v2.write.mode("overwrite").parquet(s"$root/gen=2")
      val merged = s.read.option("mergeSchema", "true")
        .parquet(s"$root/gen=1", s"$root/gen=2")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      val twin = v1.unionByName(v2, allowMissingColumns = true)
        .select(merged.columns.map(col): _*)
      val ok = merged.exceptAll(twin).isEmpty && twin.exceptAll(merged).isEmpty
      merged.agg(count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          count(col("l_extendedprice")).as("priced_rows"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .select(col("cnt"), col("sum_qty"), col("priced_rows"),
          col("sum_price"), lit(ok).as("evolve_ok"))
    }),

    // As-of join: each event picks up the most recent order of the same
    // customer at or before the event time (inclusive). The right side is
    // first reduced to one row per (custkey, orderdate) — max-orderkey row
    // wins — because as-of semantics are tie-ambiguous otherwise; the
    // DuckDB oracle applies the identical reduction before its native
    // ASOF LEFT JOIN.
    "b18_asof_join" -> ((s, dir) => {
      val ro = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("k"), col("o_orderdate"))
        .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
        .select(col("k"), col("o_orderdate"),
          col("m.o_orderkey").as("o_orderkey"),
          col("m.o_totalprice").as("o_totalprice"))
      val ev = t(s, dir, "events")
        .select(col("user_id").as("k"), col("ts"), col("event_type"))
      AsofJoin.asof(ev, ro, Seq("k"), "ts", "o_orderdate",
          Seq("o_orderkey", "o_totalprice"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("o_orderkey")).as("n_matched"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("event_type")
    }),

    // B45 Jaro-Winkler similarity scoring (the ranking complement of
    // b25's boolean edit-distance match — entity resolution orders
    // candidates by JW): custom codegen JaroWinklerExpr (Spark has no
    // built-in), map-only scalar pass; the near probe exercises the
    // prefix boost, the far probe the no-boost jaro path. DuckDB's
    // NATIVE jaro_winkler_similarity is the oracle — parity measured
    // bit-exact over the whole name domain, so values ship unrounded.
    "b45_jaro_winkler" -> ((s, dir) => {
      import graft.functions.GraftExpressions
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          GraftExpressions.jaroWinkler(col("c_name"),
            lit("Customer#000000777")).as("jw_near"),
          GraftExpressions.jaroWinkler(col("c_name"),
            lit("Supplier Number 9")).as("jw_far"))
        .orderBy("c_custkey")
    }),

    // B48 SQL surface for the engine's custom codegen expressions: the
    // engine side here IS a `spark.sql(...)` string — GraftExtensions
    // registers jaro_winkler / normalize_text (and the rest of the
    // graft function family) in the session FunctionRegistry, so the
    // SQL-first user the reference serves (load_external_tables.sql's
    // BigQuery SELECT surface) reaches the custom operators without the
    // Column API. normalize_text's NFC path is exercised with a
    // DECOMPOSED e + combining acute (U+0301, a Scala \u escape — the
    // oracle builds the same two codepoints with chr(769) and
    // recomposes via nfc_normalize); its space-collapse path with
    // planted doubles. The filter runs the same custom expression a
    // second time in a WHERE.
    // Parity of the remaining SQL-only registrations (minhash_signature,
    // zvalue, span_md5s, char_ngram_hashes, plane_sign_buckets) against
    // the Column API is locked in SqlSurfaceSpec.
    "b48_sql_surface" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("b48_customer")
      val acute = "\u0301" // combining acute, decomposed on purpose
      s.sql(s"""
        SELECT c_custkey,
               jaro_winkler(c_name, 'Customer#000000777') AS jw,
               normalize_text(concat(' ', c_name, '  e$acute ')) AS norm
        FROM b48_customer
        WHERE jaro_winkler(c_name, 'Customer#000000777') > 0.75
        ORDER BY c_custkey
      """)
    }),

    // B42 forward as-of: the NEXT order on/after each event's time per
    // user (the b18 backward lookup mirrored); same one-exchange
    // union-and-carry, carry direction reversed. Same right-side
    // (key, time) uniqueness reduction; DuckDB's native ASOF with the
    // inequality flipped is the oracle.
    "b42_asof_forward" -> ((s, dir) => {
      val ro = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("k"), col("o_orderdate"))
        .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
        .select(col("k"), col("o_orderdate"),
          col("m.o_orderkey").as("o_orderkey"),
          col("m.o_totalprice").as("o_totalprice"))
      val ev = t(s, dir, "events")
        .select(col("user_id").as("k"), col("ts"), col("event_type"))
      AsofJoin.asofForward(ev, ro, Seq("k"), "ts", "o_orderdate",
          Seq("o_orderkey", "o_totalprice"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("o_orderkey")).as("n_matched"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("event_type")
    }),

    // Bucketed co-located join (B17): both sides bucketed on the join key
    // at write time, so the join itself runs with NO shuffle exchange —
    // verified in-plan (colocated_ok) with broadcast disabled, values
    // verified against a plain DuckDB join of the source tables.
    "b17_bucketed_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val ords = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      CatalogTables.writeBucketed(li, "graft_b17_li", "l_orderkey", 8)
      CatalogTables.writeBucketed(ords, "graft_b17_ord", "l_orderkey", 8)
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = s.table("graft_b17_li")
          .join(s.table("graft_b17_ord"), "l_orderkey")
        val colocated = !joined.queryExecution.executedPlan.toString
          .contains("Exchange hashpartitioning")
        joined.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast("int")).as("sum_qty"))
          .withColumn("colocated_ok", lit(colocated))
          .orderBy("o_orderpriority")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }),

    // skew-proof as-of variant against the SAME DuckDB ASOF oracle as
    // b18 — proving the (key, time-bucket) carry + boundary handoff is
    // semantics-identical on real data, not just on the spec fixtures
    // (weekly buckets split the order/event history many times per key)
    "b18b_asof_bucketed" -> ((s, dir) => {
      val ro = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("k"), col("o_orderdate"))
        .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
        .select(col("k"), col("o_orderdate"),
          col("m.o_orderkey").as("o_orderkey"),
          col("m.o_totalprice").as("o_totalprice"))
      val ev = t(s, dir, "events")
        .select(col("user_id").as("k"), col("ts"), col("event_type"))
      AsofJoin.asofBucketed(ev, ro, Seq("k"), "ts", "o_orderdate",
          Seq("o_orderkey", "o_totalprice"),
          c => (unix_timestamp(c) / 604800L).cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("o_orderkey")).as("n_matched"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("event_type")
    }),

    // auto-dispatched range join (broadcast path for this dim-sized band
    // table) against b19's oracle — same rows as the bucketed form
    "b19b_range_join_auto" -> ((s, dir) => {
      val bands = s.range(5).select(col("id").cast("int").as("band_id"),
          (col("id") * 10 + 1).as("lo"), (col("id") * 10 + 10).as("hi"))
        .unionByName(s.range(1).select(lit(9).as("band_id"),
          lit(1L).as("lo"), lit(50L).as("hi")))
      graft.operators.RangeJoin.pointInIntervalAuto(
          t(s, dir, "lineitem"), bands, "l_quantity", "lo", "hi",
          bucketWidth = 10L)
        .groupBy("band_id")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("int")).as("sum_qty"))
        .orderBy("band_id")
    }),

    // ===== C: LLM-data operators =====

    "c1_exact_dedup" -> ((s, dir) =>
      Dedup.exactDedup(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("fingerprint")),

    // The c2–c5 checked queries plant one exact copy of every document
    // (id + 1e6) and emit the found (original, its-copy) pairs — recall on
    // planted duplicates is deterministic (identical inputs always share
    // every LSH bucket), so the DuckDB oracle knows the full expected
    // output. General near-dup discovery (non-identical pairs) is locked by
    // the ScalaTest specs with planted near-duplicates instead.
    "c2_minhash_lsh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val withCopies = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
      Dedup.minhashDedupPairs(withCopies, "text", "doc_id")
        .where(col("id_b") - col("id_a") === 1000000L)
        .orderBy("id_a", "id_b")
    }),

    // C2b cross-corpus near-dup: today's increment matched AGAINST
    // yesterday's reference (the incremental-crawl shape — D21 answers
    // "seen exactly", this answers "seen nearly"). The increment is 1/3
    // re-crawled copies (must pair at jaccard 1.0 with their reference
    // originals) + novel docs (reversed text — disjoint shingles, must
    // pair with nothing). Only cross pairs are emitted.
    "c2b_minhash_cross" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val inc = docs.where(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
        .unionByName(docs.where(col("doc_id") % 3 =!= 0)
          .withColumn("doc_id", col("doc_id") + lit(2000000L))
          .withColumn("text", reverse(col("text"))))
      Dedup.minhashCrossPairs(docs, inc, "text", "doc_id")
        .where(col("inc_id") - col("ref_id") === 1000000L)
        .orderBy("ref_id", "inc_id")
    }),

    "c3_simhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val withCopies = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
      Dedup.simhashDedupPairs(withCopies, "text", "doc_id")
        .where(col("id_b") - col("id_a") === 1000000L)
        .orderBy("id_a", "id_b")
    }),

    "c4_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val withCopies = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
      Dedup.ngramJaccardPairs(withCopies, "text", "doc_id")
        .where(col("id_b") - col("id_a") === 1000000L)
        .orderBy("id_a", "id_b")
    }),

    "c5_embed_neardup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val withCopies = emb.unionByName(
        emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
      Similarity.embeddingNearDupPairs(withCopies, "vec_id", "embedding")
        .where(col("id_b") - col("id_a") === 1000000L)
        .orderBy("id_a", "id_b")
    }),

    "c6_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.cosineTopK(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 5)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rnk")
    }),

    // The gate is a RECALL bound, matching the operator's actual contract:
    // lshTopK is probabilistic (P(miss) ≈ 1e-8 per true neighbor at pH=3),
    // so a bit-exact top-k oracle could in principle fail a round on an
    // unlucky data regeneration even when the index behaves as designed.
    // Here Spark itself joins the LSH answer against the exact brute-force
    // answer and emits per-query hit counts gated at ≥ 4 of 5 (observed:
    // 5/5 at every SF); only the booleans are hash-compared. Exact VALUES
    // of the shared top-k path are still fully oracle-checked via c6/c14,
    // and recall at the cheaper pH=2 default is asserted in SimilaritySpec.
    "c7_lsh_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 8)
      val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding",
        k = 5).select("query_id", "neighbor_id")
      val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        k = 5, probeHamming = 3).select("query_id", "neighbor_id")
      exact.join(lsh, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
        .select(col("query_id"), lit(5L).as("n_exact"),
          (col("n_hits") >= 4).as("recall_ok"))
        .orderBy("query_id")
    }),

    // c13: near-dup pairs → connected components → one survivor per
    // cluster. Checked on the planted (original, copy) pairs so the
    // expected clusters are deterministic; multi-node chain/star
    // components are locked by DedupSpec.
    "c13_dup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val withCopies = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
      val planted = Dedup.minhashDedupPairs(withCopies, "text", "doc_id")
        .where(col("id_b") - col("id_a") === 1000000L)
      Dedup.dupClusters(planted)
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("cluster_size"), max("id").as("max_id"))
        .orderBy("cluster_id")
    }),

    // Quality-aware canonical selection (C36): each planted cluster is
    // {original, degraded copy} (digits+punct appended — strictly lower
    // quality score); the keep rule (max quality, ties to min id) must
    // surface EXACTLY the originals with their c9-formula quality. A
    // single degraded copy surviving anywhere shifts a doc_id row and
    // breaks the hash.
    "c36_quality_keep" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val degraded = docs.select(
        (col("doc_id") + lit(1000000L)).as("doc_id"),
        concat(col("text"), lit(" 00 11 22 !!! ???")).as("text"))
      val pairs = docs.select(col("doc_id").as("id_a"),
        (col("doc_id") + lit(1000000L)).as("id_b"))
      Dedup.keepBestPerCluster(docs.unionByName(degraded), pairs,
          "doc_id", TextFunctions.qualityScore(col("text")))
        .orderBy("doc_id")
    }),

    // C37 model-based quality filtering (fastText hashing trick): one
    // map-only codegen pass — tokenize, md5-bucket, weight lookup, sum.
    // Weights are quantized to k/1024 so every logit is a sum of
    // exactly-representable doubles: the gate is hash-exact with NO
    // rounding, and DuckDB rebuilds the identical model from the same
    // two md5 calls. p_keep (sigmoid) is deliberately NOT gated —
    // transcendental rounding is engine-specific; the keep verdict is
    // gated on the exact logit instead.
    "c37_classifier_score" -> ((s, dir) => {
      import graft.functions.HashedClassifier
      val w = HashedClassifier.hashWeights("g6w:", 4096).toSeq
      HashedClassifier.score(t(s, dir, "documents"), "text", w, 4096)
        .select(col("doc_id"), col("n_feats"), col("logit"), col("keep"))
        .orderBy("doc_id")
    }),

    // C75 distributed classifier TRAINING — the train side C37 scores
    // with: mini-batch gradient descent on the same hashed
    // unigram+bigram features, label = (lang = 'en'), ALL-INTEGER
    // arithmetic (1/1024-grid weights, hard-sigmoid activation via
    // non-negative integer division, positive-shifted floor-div
    // updates) so the 6-update trajectory replays bit-exact in the
    // DuckDB oracle — the rebuild-oracle shape applied to a TRAINING
    // LOOP. Output: final weights + exact per-iteration loss/count
    // trace in one long-form frame; one diverged update anywhere
    // changes the final weights and breaks the hash.
    "c75_classifier_train" -> ((s, dir) =>
      graft.operators.ClassifierTrain.trainReport(
        t(s, dir, "documents"), "text", "doc_id",
        col("lang") === "en", nBuckets = 128, epochs = 3,
        nBatches = 3, lrDiv = 64L)),

    // C79 one-vs-rest MULTI-CLASS classifier training — C75's binary
    // integer-grid descent per class over ONE shared featurized frame
    // (k× iterations, 1× featurization — the only corpus-scale pass).
    // One-vs-rest rather than softmax keeps every class's trajectory
    // on the exact grid (no cross-class transcendental), so all five
    // language trajectories replay bit-for-bit in a generated DuckDB
    // oracle. Long-form (cls, kind, k, v): any diverged update in ANY
    // class's descent changes that class's weights and breaks the hash.
    "c79_multiclass_train" -> ((s, dir) =>
      graft.operators.ClassifierTrain.multiclassReport(
        t(s, dir, "documents"), "text", "doc_id", "lang",
        Seq("de", "en", "es", "fr", "zh"), nBuckets = 128,
        epochs = 2, nBatches = 2, lrDiv = 64L)),

    // C79b trained language ID — the scored path that replaces C8's
    // stopword heuristic once a labeled slice exists: LOAD the
    // committed model artifact (the C95 store — r11's top ask: serving
    // must not retrain inline; training happens once in the
    // langidModelRoot publish), then ONE projection + ONE doc-keyed
    // agg computes all five margins and the deterministic argmax
    // (ties → first class in training order). The oracle replays all
    // five training trajectories AND the argmax — so oracle-green IS
    // the proof that score-from-LOADED-model ≡ score-from-trained
    // (integer weights round-trip parquet bit-exactly).
    "c79b_trained_langid" -> ((s, dir) => {
      import graft.operators.ClassifierTrain
      val lm = graft.sources.ModelStore.loadModel(s, langidModelRoot(s, dir))
      require(lm.nBuckets == 128 && lm.trainedAtEpoch == 1L,
        s"unexpected model meta: $lm")
      ClassifierTrain.scoreMulticlass(t(s, dir, "documents"),
          "text", "doc_id", lm.model, lm.nBuckets)
        .orderBy("doc_id")
    }),

    // D36 online MULTI-CLASS maintenance (batch-identical gate): the
    // C79 one-vs-rest model folded one ARRIVING epoch at a time — the
    // way a deployed langid filter tracks a live crawl. Epoch-major
    // folding is bit-identical per class to class-major training at
    // epochs=1 (classes are independent), so the same generated
    // per-class trajectory oracle gates it; one diverged fold in ANY
    // class changes that class's weights.
    "d36_online_multiclass" -> ((s, dir) => {
      import graft.operators.ClassifierTrain
      val classes = Seq("de", "en", "es", "fr", "zh")
      val feats = ClassifierTrain.featurizeMulti(
        t(s, dir, "documents"), "text", "doc_id", "lang", 128, 3)
        .persist()
      try {
        val st = new ClassifierTrain.OnlineMulticlassState(classes, 128, 64L)
        val traces = (0 until 3).map { e =>
          e -> st.foldEpoch(e.toLong, feats.where(col("batch") === e))
        }
        import s.implicits._
        val rows = classes.flatMap { c =>
          st.weights(c).zipWithIndex.toSeq
            .map { case (wv, b) => (c, "w", b.toLong, wv) } ++
          traces.map { case (e, rep) =>
            (c, "loss", (e + 1).toLong, rep.toMap.apply(c)._2) } ++
          traces.map { case (e, rep) =>
            (c, "n", (e + 1).toLong, rep.toMap.apply(c)._1) }
        }
        rows.toDF("cls", "kind", "k", "v").orderBy("cls", "kind", "k")
      } finally { feats.unpersist() }
    }),

    // C77 distributed BPE vocabulary induction — the TRAINER C23's
    // tokenizer consumes, at corpus scale (c23's own trainFromCorpus
    // samples to the driver by documented contract): one corpus pass
    // builds the word-frequency table, then every merge round is a
    // vocabulary-sized map-combined agg + a 1-row collect. The whole
    // 24-merge trajectory replays in a generated DuckDB oracle —
    // segmentations are chr(1)-delimited strings and a round's merge
    // is EXACTLY three left-to-right replace passes on BOTH engines,
    // so agreement is by construction (the c75 rebuild-a-training-loop
    // shape applied to tokenizer induction). One diverged pair pick
    // anywhere reorders every later merge.
    "c77_bpe_train" -> ((s, dir) =>
      graft.operators.BpeTrain.trainReport(
        t(s, dir, "documents"), "text", numMerges = 24)),

    // C78 tokenizer fertility report — the standard tokenizer-eval
    // table over the C77-learned vocabulary: per-source tokens/word
    // (fertility) and chars/token as truncating integer ppm. A vocab
    // trained on one distribution quietly taxes another in sequence
    // length; this is how the tax is seen before a training run pays
    // it. Exact integers end to end, replayed by the same unrolled
    // trajectory oracle that replays training.
    "c78_tokenizer_fertility" -> ((s, dir) =>
      graft.operators.BpeTrain.fertilityReport(
        t(s, dir, "documents"), "text", "source", numMerges = 24)),

    // C80 frozen-vocabulary encode fertility — the C77 merge list
    // applied as a FROZEN artifact to (a) its own training corpus,
    // where the encode must reproduce the C78 report bit-for-bit
    // (training-state replay vs fresh re-encode: the oracle derives
    // the train block from the trajectory's final state, the engine
    // re-applies the merges — agreement proves encode ≡ training
    // semantics), and (b) a SHIFTED corpus (every word reversed),
    // where fertility visibly degrades: the sequence-length tax a
    // frozen tokenizer charges a distribution it wasn't trained on,
    // with OOV words segmenting as far as the learned pairs reach
    // (real BPE behavior, not a fallback). Encode cost is
    // vocabulary-sized merge passes + ONE corpus occurrence join.
    "c80_frozen_encode_fertility" -> ((s, dir) => {
      import graft.operators.BpeTrain
      val docs = t(s, dir, "documents")
      val merges = BpeTrain.train(docs, "text", numMerges = 24)
      val trainRep = BpeTrain
        .fertilityUnderMerges(docs, "text", "source", merges)
        .withColumn("corpus", lit("train"))
      val shifted = docs.withColumn("text", reverse(col("text")))
      val shiftRep = BpeTrain
        .fertilityUnderMerges(shifted, "text", "source", merges)
        .withColumn("corpus", lit("shifted"))
      trainRep.unionByName(shiftRep)
        .select("corpus", "source", "n_words", "n_tokens", "n_chars",
          "fertility_ppm", "chars_per_token_ppm")
        .orderBy("corpus", "source")
    }),

    // C80b strict frozen-vocabulary audit — eval words LEFT join the
    // TRAINING segmentation; out-of-vocabulary words fall back to
    // character level and are counted (n_oov): the single-join audit
    // a serving pipeline runs against a published vocabulary table,
    // bounding the exact encode from above.
    "c80b_frozen_fallback_fertility" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val shifted = docs.withColumn("text", reverse(col("text")))
      graft.operators.BpeTrain.frozenFertilityReport(
        docs, shifted, "text", "source", numMerges = 24)
    }),

    // D33 online classifier maintenance (batch-identical gate): C75's
    // descent folded one ARRIVING epoch at a time through the
    // OnlineClassifierState (single-pass SGD, the D27 replay
    // discipline) — epoch e carries batch-e docs, so the online
    // trajectory is BIT-IDENTICAL to train(epochs=1, nBatches=3) and
    // the gate reuses the same generated DuckDB trajectory oracle with
    // epochs=1. One diverged fold anywhere changes the final weights.
    "d33_online_train" -> ((s, dir) => {
      import graft.operators.ClassifierTrain
      val feats = ClassifierTrain.featurize(
        t(s, dir, "documents"), "text", "doc_id",
        col("lang") === "en", nBuckets = 128, nBatches = 3).persist()
      try {
        val st = new ClassifierTrain.OnlineClassifierState(128, 64L)
        val trace = (0 until 3).map { e =>
          e -> st.foldEpoch(e.toLong, feats.where(col("batch") === e))
        }
        import s.implicits._
        val rows =
          st.weights.zipWithIndex.toSeq
            .map { case (wv, b) => ("w", b.toLong, wv) } ++
          trace.map { case (e, (_, loss)) => ("loss", (e + 1).toLong, loss) } ++
          trace.map { case (e, (n, _)) => ("n", (e + 1).toLong, n) }
        rows.toDF("kind", "k", "v").orderBy("kind", "k")
      } finally { feats.unpersist(); () }
    }),

    // A30 incremental ingest ledger — the reference DAG's idempotence
    // rule (process only the years missing from the bucket) as an engine
    // operator: the target's partition LAYOUT is the ledger. An initial
    // load lands years ≤ 1997; ingestMissing adds exactly 1998+ (the
    // pre-1998 rows in the source must NOT double-land — the read-back
    // aggregate catches one extra row anywhere); a second ingestMissing
    // finds nothing missing. The no-op path costs one FS listing + one
    // guarded distinct — no table scan.
    "a30_ingest_ledger" -> ((s, dir) => {
      import org.apache.hadoop.fs.Path
      import graft.sources.IngestLedger
      val path = Tables.scratch("a30_ledger_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(path).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(path), true)
      val src = t(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
      src.where(col("yr") <= 1997)
        .write.mode("overwrite").partitionBy("yr").parquet(path)
      val added = IngestLedger.ingestMissing(s, src, path, "yr")
      val again = IngestLedger.ingestMissing(s, src, path, "yr")
      s.read.parquet(path)
        .groupBy(col("yr").cast("int").as("yr"))
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .withColumn("added_years", lit(added.mkString(",")))
        .withColumn("rerun_noop", lit(again.isEmpty))
        .orderBy("yr")
    }),

    // A34 binary-file ingest — the multimodal upstream (C12 consumes
    // packed payloads; THIS is where raw asset bytes enter the engine):
    // Spark's binaryFile source over a directory of files, emitting
    // (name, size, md5-of-bytes). Payload files are materialized from
    // document text (ASCII, so byte length == char length — the c12
    // rule), and the oracle recomputes every name/size/hash from the
    // documents table without touching the filesystem.
    "a34_binary_ingest" -> ((s, dir) => {
      val path = Tables.scratch("a34_bin_" + new java.io.File(dir).getName)
      val d = new java.io.File(path)
      org.apache.commons.io.FileUtils.deleteQuietly(d)
      d.mkdirs()
      t(s, dir, "documents").where(col("doc_id") < 40)
        .select("doc_id", "text").collect().foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(path, s"${r.getLong(0)}.txt"),
            r.getString(1).getBytes("UTF-8"))
        }
      s.read.format("binaryFile").load(path)
        .select(
          regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
          col("length").as("n_bytes"),
          md5(col("content")).as("h"))
        .orderBy("fname")
    }),

    // A33 targeted delete — GDPR-shape `DELETE WHERE key IN targets` on
    // plain parquet, rewriting ONLY files whose A22 zone map admits a
    // target. The table is range-partitioned on the key so the
    // entity's keys (all ≤ 200) cluster in one file; the other 7 files
    // must survive untouched (skipped_files gates filesRewritten <
    // filesTotal). Read-back count/sum + the exact deleted-row count
    // make a lost or resurrected row anywhere fatal.
    "a33_targeted_delete" -> ((s, dir) => {
      import graft.sources.TargetedDelete
      import org.apache.hadoop.fs.Path
      val path = Tables.scratch("a33_del_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(path).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(path), true)
      val ord = t(s, dir, "orders")
      ord.repartitionByRange(8, col("o_orderkey"))
        .write.mode("overwrite").parquet(path)
      val targets = ord.where(col("o_orderkey") <= 200)
        .select("o_orderkey").collect().map(_.getLong(0)).toSeq
      val rep = TargetedDelete.deleteKeys(s, path, "o_orderkey", targets,
        batchId = "a33")
      s.read.parquet(path)
        .agg(count(lit(1)).as("n_rows"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .withColumn("n_deleted", lit(rep.rowsDeleted))
        .withColumn("skipped_files",
          lit(rep.filesRewritten < rep.filesTotal))
    }),

    // A36 merge-on-read deletion vectors — A33's delete with the write
    // amplification moved to read time (Iceberg v2 / Delta DV
    // semantics): MARK writes a (file, key) sidecar for only the rows
    // that actually match (zone-pruned scan, data files untouched),
    // READ broadcast-anti-joins the marks, APPLY compacts them away.
    // The gate runs all three stages and checks MoR-read ≡ post-apply
    // read ≡ the oracle's plain filter, with NULL keys planted
    // (o_orderkey % 97 = 0) to lock the NULL-survival contract on both
    // paths, and booleans for zero-write-amplification at mark time +
    // sidecar removal after apply.
    "a36_deletion_vectors" -> ((s, dir) => {
      import graft.sources.DeletionVectors
      import org.apache.hadoop.fs.Path
      val path = Tables.scratch("a36_dv_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(path).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(path), true)
      val ord = t(s, dir, "orders")
        .withColumn("okey", when(col("o_orderkey") % 97 === 0,
          lit(null).cast("long")).otherwise(col("o_orderkey")))
      ord.repartitionByRange(8, col("o_orderkey"))
        .drop("o_orderkey").write.mode("overwrite").parquet(path)
      val targets = ord.where(col("okey") <= 300 && col("okey").isNotNull)
        .select("okey").collect().map(_.getLong(0)).toSeq
      val mark = DeletionVectors.markDeleted(s, path, "okey", targets,
        batchId = "a36mark")
      val mor = DeletionVectors.readWithDeletes(s, path, "okey")
        .agg(count(lit(1)).as("n_rows"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .withColumn("stage", lit("mor"))
      val morRow = mor.collect()(0) // force MoR read BEFORE apply
      val app = DeletionVectors.applyDeletes(s, path, "okey", "a36apply")
      val sidecarGone = !fs.exists(new Path(path, "_deletes"))
      s.read.parquet(path)
        .agg(count(lit(1)).as("n_rows"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .withColumn("stage", lit("applied"))
        .unionByName(s.createDataFrame(
          java.util.List.of(morRow), mor.schema))
        .withColumn("n_marked", lit(mark.rowsMarked))
        .withColumn("n_removed", lit(app.rowsRemoved))
        .withColumn("mark_skipped_files",
          lit(mark.filesScanned < mark.filesTotal))
        .withColumn("sidecar_gone", lit(sidecarGone))
        .select("stage", "n_rows", "sum_price", "n_marked", "n_removed",
          "mark_skipped_files", "sidecar_gone")
        .orderBy("stage")
    }),

    // A32 declarative expectations — the validation gate between
    // transform and publish (the reference has none): row-local checks
    // fold into ONE agg pass, uniqueness is one keyed count, FK checks
    // are anti-joins. range_l_quantity_le30 and unique_orderkey are
    // deliberately VIOLATED so nonzero counts and false verdicts are
    // exercised, not just all-green rows.
    "a32_expectations" -> ((s, dir) => {
      import graft.operators.Expectations
      import Expectations.RowCheck
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val row = Expectations.rowChecks(li, Seq(
        RowCheck("not_null_l_orderkey", col("l_orderkey").isNotNull),
        RowCheck("range_l_discount",
          col("l_discount") >= 0 && col("l_discount") <= 0.1),
        RowCheck("range_l_quantity_le30", col("l_quantity") <= 30),
        RowCheck("set_l_returnflag",
          col("l_returnflag").isin("A", "N", "R"))))
      Expectations.report(Seq(row,
          Expectations.uniqueKey(li, "unique_line",
            Seq("l_orderkey", "l_linenumber")),
          Expectations.uniqueKey(li, "unique_orderkey", Seq("l_orderkey")),
          Expectations.referential(li, "l_orderkey", ord, "o_orderkey",
            "fk_line_orders"),
          Expectations.referential(ord, "o_custkey", cust, "c_custkey",
            "fk_orders_cust")))
        .orderBy("check_name")
    }),

    // A31 snapshot diff / reconciliation — full-outer row-level compare
    // of two table versions with a column-level change mask. v2 is
    // derived in-plan (keys %7 removed, %5 reprice, %11 repriority —
    // %55 rows carry BOTH changes — %13 key-shifted copies added) so the
    // oracle rebuilds the identical v2 and replays the identical
    // IS-DISTINCT-FROM mask. One full-outer hash join, mask map-side.
    "a31_snapshot_diff" -> ((s, dir) => {
      import graft.operators.TableDiff
      val v1 = t(s, dir, "orders")
      val changed = v1.where(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 11 === 0, lit("Z"))
            .otherwise(col("o_orderpriority")))
      val added = v1.where(col("o_orderkey") % 13 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(2000000000L))
      TableDiff.diff(v1, changed.unionByName(added), Seq("o_orderkey"))
        .groupBy("status", "changed_cols")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
        .orderBy("status", "changed_cols")
    }),

    // A29 write-audit-publish (the staged-commit discipline the
    // reference's blind append sink lacks): a good batch stages, passes
    // its audits, and publishes via per-file renames; a bad batch (null
    // keys planted) is REFUSED — staging deleted, table bit-identical.
    // The read-back aggregate is the proof: it must equal base + good
    // batch exactly (a leaked bad batch double-counts and breaks the
    // hash); the booleans pin both verdicts and staging hygiene.
    // A35 WAP time travel — the batch-prefixed layout IS the snapshot
    // manifest: base load (no prefix) + two published batches, then
    // three snapshot reads (as-of nothing / b1 / everything). Each
    // version's count+sum must equal the corresponding key-split of the
    // source table — a file misattributed to any snapshot breaks one
    // version's row immediately.
    "a35_wap_time_travel" -> ((s, dir) => {
      import org.apache.hadoop.fs.Path
      import graft.sources.Wap
      val path = Tables.scratch("a35_tt_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(path).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(path), true)
      val cols = Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus").map(col)
      val orders = t(s, dir, "orders")
      orders.where(col("o_orderkey") % 3 === 1).select(cols: _*)
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
      val audits = Seq(Wap.minRows(1), Wap.noNulls("o_orderkey"))
      Wap.writeAuditPublish(s,
        orders.where(col("o_orderkey") % 3 === 2).select(cols: _*),
        path, "o_orderstatus", "b1", audits)
      Wap.writeAuditPublish(s,
        orders.where(col("o_orderkey") % 3 === 0).select(cols: _*),
        path, "o_orderstatus", "b2", audits)
      val all = Seq("b1", "b2")
      Seq("v0" -> Seq.empty[String], "v1" -> Seq("b1"), "v2" -> all)
        .map { case (tag, vis) =>
          Wap.readAsOf(s, path, all, vis)
            .agg(count(lit(1)).as("cnt"),
              round(sum("o_totalprice"), 2).as("sum_price"))
            .withColumn("version", lit(tag))
        }.reduce(_ unionByName _)
        .select("version", "cnt", "sum_price")
        .orderBy("version")
    }),

    // A37 multi-table atomic publish: two tables advance versions only
    // TOGETHER. The middle attempt stages a clean ord batch beside a
    // cust batch that fails its audit — the commit pointer must not
    // move for EITHER (failed_blocked), then the retry lands both at
    // v2. The oracle pins the final committed contents + the contract
    // booleans; a non-atomic implementation (ord at v2, cust at v1
    // after the failed attempt) breaks failed_blocked.
    // A39 snapshot expiration: three published versions of an orders
    // rollup (quarter, half, full corpus), then expireVersions
    // retires everything below the keepVersions window — the engine
    // requires the accounting (removed [1,2], kept [3]), the retired
    // dirs physically gone, the committed dir intact — and emits the
    // committed read, which the expire must not have touched. Oracle =
    // the full-corpus rollup recomputed from the base table: if the
    // expire removed reachable bytes the read breaks or mismatches.
    "a39_snapshot_expire" -> ((s, dir) => {
      import graft.sources.{MultiPublish, Wap}
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("a39_exp_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val orders = t(s, dir, "orders")
      def snap(mod: Int) = orders.where(col("o_orderkey") % mod === 0)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val audits = Seq(Wap.minRows(1))
      for (mod <- Seq(4, 2, 1))
        require(MultiPublish.publishAll(s,
          Map("ordsum" -> ((snap(mod), audits))), root).committed,
          s"publish mod=$mod failed")
      val dropped = MultiPublish.expireVersions(s, root, keepLast = 1)
      require(dropped == Map("ordsum" -> Seq(1, 2)),
        s"expire accounting off: $dropped")
      require(!fs.exists(new Path(s"$root/ordsum/v1")) &&
        !fs.exists(new Path(s"$root/ordsum/v2")) &&
        fs.exists(new Path(s"$root/ordsum/v3")),
        "expired dirs must be gone, the committed dir intact")
      MultiPublish.readCommitted(s, root, "ordsum")
        .orderBy("o_orderstatus")
    }),

    "a37_multi_publish" -> ((s, dir) => {
      import graft.sources.{MultiPublish, Wap}
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("a37_multi_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      val audits = Seq(Wap.minRows(1))
      val r1 = MultiPublish.publishAll(s, Map(
        "ord" -> ((orders.where(col("o_orderkey") % 2 === 0), audits)),
        "cust" -> ((cust.where(col("c_custkey") % 2 === 0), audits))), root)
      val badCust = cust.withColumn("c_custkey",
        when(col("c_custkey") % 5 === 0, lit(null).cast("long"))
          .otherwise(col("c_custkey")))
      val r2 = MultiPublish.publishAll(s, Map(
        "ord" -> ((orders, audits)),
        "cust" -> ((badCust, Seq(Wap.noNulls("c_custkey"))))), root)
      val blockedBoth = MultiPublish.commitVersions(s, root) ==
        Map("ord" -> 1, "cust" -> 1)
      val r3 = MultiPublish.publishAll(s, Map(
        "ord" -> ((orders, audits)), "cust" -> ((cust, audits))), root)
      import s.implicits._
      Seq(
        ("cust", r3.versions("cust"),
          MultiPublish.readCommitted(s, root, "cust").count()),
        ("ord", r3.versions("ord"),
          MultiPublish.readCommitted(s, root, "ord").count()))
        .toDF("tbl", "version", "cnt")
        .withColumn("v1_ok", lit(r1.committed))
        .withColumn("failed_blocked", lit(!r2.committed && blockedBoth))
        .withColumn("v2_ok", lit(r3.committed))
        .orderBy("tbl")
    }),

    "a29_wap" -> ((s, dir) => {
      import org.apache.hadoop.fs.Path
      import graft.sources.Wap
      val path = Tables.scratch("a29_wap_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(path).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(path), true)
      val cols = Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus").map(col)
      val orders = t(s, dir, "orders")
      orders.where(col("o_orderkey") % 3 =!= 0).select(cols: _*)
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
      val good = orders.where(col("o_orderkey") % 3 === 0).select(cols: _*)
      val r1 = Wap.writeAuditPublish(s, good, path, "o_orderstatus",
        "batch001", Seq(Wap.minRows(1), Wap.noNulls("o_orderkey"),
          Wap.uniqueKey("o_orderkey")))
      val bad = good.withColumn("o_orderkey",
        when(col("o_orderkey") % 9 === 0, lit(null).cast("long"))
          .otherwise(col("o_orderkey")))
      val r2 = Wap.writeAuditPublish(s, bad, path, "o_orderstatus",
        "batch002", Seq(Wap.minRows(1), Wap.noNulls("o_orderkey")))
      val stagingClean = !fs.exists(new Path(path, "_staging"))
      s.read.parquet(path)
        .groupBy(col("o_orderstatus").cast("string").as("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .withColumn("good_published", lit(r1.published))
        .withColumn("bad_blocked", lit(!r2.published))
        .withColumn("staging_clean", lit(stagingClean))
        .orderBy("o_orderstatus")
    }),

    // C41 PageRank link-authority ranking (the crawl-curation centrality
    // pass; the graph twin of C13's connected components). The link
    // graph is synthesized IN-PLAN from documents — 3 out-edges per doc
    // via an LCG hash mod n — so DuckDB rebuilds the identical graph and
    // replays the identical 3 damped iterations, unrolled as CTEs. The
    // engine-side loop shuffles the edge list ONCE (persisted
    // pre-partitioned on the join key); per-round movement is the
    // node-sized rank frame plus the keyed contribution aggregate.
    "c41_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nDocs = docs.count()
      val nodes = docs.select(col("doc_id"))
      val edges = nodes
        .select(col("doc_id").as("src"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("j"))
        .select(col("src"),
          pmod(col("src") * lit(1103515245L) + col("j") * lit(12345L),
            lit(nDocs)).as("dst"))
      graft.operators.PageRank
        .pagerank(nodes, edges, "doc_id", "src", "dst",
          iters = 3, damping = 0.85)
        .withColumn("rank", round(col("rank"), 8))
        .orderBy("doc_id")
    }),

    // D19 SLA attach — the batch twin of SlaStream.slaStream (streaming
    // equality + breach-on-watermark emission are spec-locked in
    // SlaStreamSpec): every error event joined to the user's earliest
    // view within a 1 h horizon (B42's forward as-of + the deadline
    // verdict), unresolved errors flagged breach with null fix columns.
    "d19_sla_attach" -> ((s, dir) =>
      graft.streaming.SlaStream.slaBatch(t(s, dir, "events"))
        .orderBy("fail_id")),

    // D20: SLO report over the D19 attach output — per service shard,
    // failure volume, breach rate (exact-integer ratio), and the
    // discrete p50/p90/p99 of time-to-fix. percentile_disc picks an
    // ACTUAL wait value (b12's proven cross-engine contract — no
    // interpolation arithmetic to diverge); breached rows carry null
    // wait_us and are ignored by the percentile on both engines.
    "d20_sla_slo" -> ((s, dir) => {
      graft.streaming.SlaStream.slaBatch(t(s, dir, "events"))
        .withColumn("shard", pmod(col("user_id"), lit(4L)))
        .createOrReplaceTempView("graft_d20_sla")
      s.sql("""SELECT shard, count(*) AS n_failures,
              |  sum(CASE WHEN breach THEN 1 ELSE 0 END) AS n_breaches,
              |  round(CAST(sum(CASE WHEN breach THEN 1 ELSE 0 END) AS DOUBLE)
              |        / CAST(count(*) AS DOUBLE), 6) AS breach_rate,
              |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY wait_us)
              |       AS BIGINT) AS p50_wait_us,
              |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY wait_us)
              |       AS BIGINT) AS p90_wait_us,
              |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY wait_us)
              |       AS BIGINT) AS p99_wait_us,
              |  max(wait_us) AS max_wait_us
              |FROM graft_d20_sla GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // D21 generational bloom gate (batch twin of the streaming fold —
    // the D18 reference set made LIVE): six time-ordered epochs fold
    // through one BloomGenerations (rotateEvery=2, so gens {0,1},{2,3},
    // {4,5} and epochs 2/4 drop a generation from probe scope). The
    // gate rides the c34 contract shape: ground truth (key seen in a
    // RETAINED earlier epoch) is computed exactly; flagged_hist must
    // EQUAL n_hist (no false negative survives rotation inside the
    // window), false positives bounded. The oracle recomputes n_rows /
    // n_hist from the retained-window definition alone.
    "d21_bloom_generations" -> ((s, dir) => {
      import graft.streaming.BloomStream
      val evTbl = t(s, dir, "events")
      // cached: the fold re-reads this frame ~13× (6 bloom builds, 6
      // flag scans, the truth side) — one materialization serves all
      val ev = evTbl.select(
        (col("event_id") % 6).cast("int").as("epoch"),
        concat(col("user_id"), lit(":"), col("event_id") % 50).as("key"))
        .cache()
      // generation capacity from footers (metadata-only; ~2 epochs of
      // rows bounds the distinct keys a generation can hold)
      val perGen = graft.operators.BloomDedup.footerRowCount(evTbl)
        .getOrElse(ev.count()).max(1L) / 3 + 1024
      val epochs = (0L to 5L).map(e => e -> ev.where(col("epoch") === e))
      val flagged = BloomStream.generationalFlagFold(epochs, col("key"),
        expectedPerGen = perGen, fpp = 0.01, rotateEvery = 2)
      val byKey = flagged.groupBy("epoch", "key")
        .agg(count(lit(1)).as("nrows"), max(col("maybe_seen")).as("flag"))
        .withColumn("g", expr("epoch DIV 2"))
      val occ = ev.select(col("key").as("k2"), col("epoch").as("e1"))
        .distinct().withColumn("g1", expr("e1 DIV 2"))
      val histMark = byKey
        .select(col("epoch").as("pe"), col("key").as("pk"))
        .join(occ, occ("k2") === col("pk") && occ("e1") < col("pe") &&
          occ("g1") >= expr("pe DIV 2") - 1, "left_semi")
        .select(col("pe").as("epoch"), col("pk").as("key"),
          lit(true).as("is_hist"))
      byKey.join(histMark, Seq("epoch", "key"), "left")
        .na.fill(false, Seq("is_hist"))
        .groupBy("epoch").agg(
          sum("nrows").as("n_rows"),
          sum(when(col("is_hist"), col("nrows")).otherwise(0L))
            .as("n_hist"),
          sum(when(col("is_hist") && col("flag"), col("nrows"))
            .otherwise(0L)).as("flagged_hist"),
          (sum(when(!col("is_hist") && col("flag"), col("nrows"))
              .otherwise(0L)) <=
            sum(when(!col("is_hist"), col("nrows")).otherwise(0L)) *
              lit(0.05) + lit(5.0)).as("fp_ok"))
        .orderBy("epoch")
    }),

    // Incremental (warm-start) PageRank (c41b): the crawl-refresh shape —
    // yesterday's converged ranks (c41's 3 cold iterations) advanced TWO
    // damped rounds over the graph plus a batch of added edges (every
    // 7th node gains a j=4 edge), instead of a full cold restart.
    // Out-degrees are recomputed over the updated edge set (added edges
    // change their source's split). The oracle unrolls all five stages —
    // three cold, two warm over e2/od2 — in one WITH chain.
    "c41b_pagerank_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nDocs = docs.count()
      val nodes = docs.select(col("doc_id"))
      val edges = nodes
        .select(col("doc_id").as("src"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("j"))
        .select(col("src"),
          pmod(col("src") * lit(1103515245L) + col("j") * lit(12345L),
            lit(nDocs)).as("dst"))
      val prev = graft.operators.PageRank
        .pagerank(nodes, edges, "doc_id", "src", "dst",
          iters = 3, damping = 0.85)
      val added = nodes.where(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("doc_id").as("src"),
          pmod(col("doc_id") * lit(1103515245L) + lit(4L) * lit(12345L),
            lit(nDocs)).as("dst"))
      graft.operators.PageRank
        .pagerankWarm(nodes, edges.unionByName(added), prev,
          "doc_id", "src", "dst", warmIters = 2, damping = 0.85)
        .withColumn("rank", round(col("rank"), 8))
        .orderBy("doc_id")
    }),

    // C52: PageRank subscribed to the A23 edge change feed — the
    // operator chain the r7 verdict asked for. Batch 1 is structurally
    // inert (redeliveries, which the merge's no-op rule drops from the
    // feed, plus label-only updates whose pre/post keep both endpoints):
    // the trigger must SKIP rank rounds and return the previous ranks
    // bit-identical (phase 'unchanged' = the cold 3-iter trajectory).
    // Batch 2 inserts the j=4 edges: the trigger fires and the warm
    // rounds land exactly on the c41b trajectory (phase 'warmed').
    // Batch 3 is a DELETE feed (every 5th node's j=3 edge): the trigger
    // fires and the warm rounds run over base ∖ dels (phase 'pruned').
    "c52_pagerank_cdf" -> ((s, dir) => {
      import graft.operators.{PageRank, Upsert}
      val docs = t(s, dir, "documents")
      val nDocs = docs.count()
      val nodes = docs.select(col("doc_id"))
      def dstOf(src: org.apache.spark.sql.Column,
                j: org.apache.spark.sql.Column) =
        pmod(src * lit(1103515245L) + j * lit(12345L), lit(nDocs))
      val base = nodes
        .select(col("doc_id").as("src"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("j"))
        .select((col("src") * 8 + col("j")).as("edge_id"), col("src"),
          dstOf(col("src"), col("j")).as("dst"), lit("base").as("label"))
      val prev = PageRank.pagerank(nodes, base, "doc_id", "src", "dst",
        iters = 3, damping = 0.85)

      val inert = base.where(col("edge_id") % 11 === 0)
        .unionByName(base
          .where(col("edge_id") % 13 === 0 && col("edge_id") % 11 =!= 0)
          .withColumn("label", lit("relabeled")))
      val m1 = Upsert.upsertWithChanges(base, inert, Seq("edge_id"))
      val unchanged = PageRank.pagerankFromChangeFeed(nodes, m1.merged,
        prev, m1.changes, "doc_id", "src", "dst", warmIters = 2)

      val adds = nodes.where(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") * 8 + lit(4)).as("edge_id"),
          col("doc_id").as("src"), dstOf(col("doc_id"), lit(4L)).as("dst"),
          lit("added").as("label"))
      val m2 = Upsert.upsertWithChanges(m1.merged, adds, Seq("edge_id"))
      val warmed = PageRank.pagerankFromChangeFeed(nodes, m2.merged,
        prev, m2.changes, "doc_id", "src", "dst", warmIters = 2)

      // batch 3: DELETE feed (every 5th node loses its j=3 edge) — the
      // trigger must fire on deletes too; warm rounds over base ∖ dels
      val dels = base
        .where(col("edge_id") % 8 === 3 &&
          pmod(floor(col("edge_id") / 8), lit(5)) === 0)
        .select("edge_id")
      val m3 = Upsert.upsertWithChanges(base, base.limit(0),
        Seq("edge_id"), Some(dels))
      val pruned = PageRank.pagerankFromChangeFeed(nodes, m3.merged,
        prev, m3.changes, "doc_id", "src", "dst", warmIters = 2)

      unchanged.withColumn("phase", lit("unchanged"))
        .unionByName(warmed.withColumn("phase", lit("warmed")))
        .unionByName(pruned.withColumn("phase", lit("pruned")))
        .withColumn("rank", round(col("rank"), 8))
        .orderBy("phase", "doc_id")
    }),

    // C43 semantic decontamination — the embedding-space complement of
    // C24's n-gram check (paraphrased eval leakage has no shared
    // shingles). Contamination is PLANTED in-plan: every 50th corpus
    // vector, dim-0 nudged by +0.1f, becomes an eval item — on unit-norm
    // vectors that pins the donor cosine at ≈0.995 while random 64-d
    // cosines sit ≈0.4, and the single-precision add equals
    // CAST(double-exact sum AS FLOAT), so DuckDB rebuilds the identical
    // eval matrix bit-for-bit. Exactly the planted donors must flag at
    // tau=0.95; the whole eval matrix rides the plan as ONE codegen
    // reference object — map-only, joinless, no shuffle.
    "c43_semantic_decon" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val eval = emb.where(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("eval_id"),
          concat(
            array((element_at(col("embedding"), 1) + lit(0.1f)).cast("float")),
            slice(col("embedding"), 2, 63)).as("ev"))
      graft.operators.Decontaminate
        .semanticFlags(emb, eval, "vec_id", "embedding", "eval_id", "ev",
          tau = 0.95)
        .withColumn("max_cos", round(col("max_cos"), 6))
        .orderBy("vec_id")
    }),

    // C42 HTML → text extraction: the crawl-curation stage UPSTREAM of
    // every text operator here (quality, dedup, tokenization all assume
    // extracted text). Synthetic pages are built IN-PLAN from document
    // columns — script/style/comment blocks, nested tags, and all six
    // standard entities — so the strip chain faces every case and the
    // oracle rebuilds the identical page from the same columns. The gate
    // hashes the extracted text: one mis-stripped tag or mis-ordered
    // entity decode anywhere breaks it. Map-only codegen, no shuffle.
    // C44 URL canonicalization + domain blocklist (the crawl-curation
    // stage upstream of every text op — FineWeb-shape pipelines dedup
    // and filter BY canonical URL/registered domain first). Raw URLs are
    // synthesized in-plan from document columns (the c42 pattern) so
    // every case is exercised — mixed-case scheme/host, default vs
    // non-default ports, www, tracking params amid kept ones, fragments,
    // trailing slashes, two-label public suffixes — and the oracle
    // rebuilds the identical raw URL and replays the identical
    // RE2-safe/global rewrite chain. Map-only, zero shuffles.
    "c44_url_canonical" -> ((s, dir) => {
      import graft.functions.UrlFunctions
      val docs = t(s, dir, "documents")
      val schemeRaw = when(col("doc_id") % 2 === 0, lit("HTTPS"))
        .otherwise(lit("http"))
      val hostRaw = when(col("doc_id") % 5 === 0, lit("Tracker.AdNet.com"))
        .when(col("doc_id") % 5 === 1, lit("WWW.News.co.uk"))
        .when(col("doc_id") % 5 === 2, lit("Blog.Wiki.org"))
        .when(col("doc_id") % 5 === 3, lit("www.SHOP.example.com"))
        .otherwise(lit("Spammy.net"))
      val port = when(col("doc_id") % 4 === 0, lit(":443"))
        .when(col("doc_id") % 4 === 2, lit(":8080"))
        .when(col("doc_id") % 4 === 3, lit(":80"))
        .otherwise(lit(""))
      val raw = concat(schemeRaw, lit("://"), hostRaw, port,
        lit("/"), col("source"), lit("/Item/"), col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&id="), col("doc_id"), lit("&utm_campaign=x"),
        when(col("doc_id") % 4 === 0, lit("&ref=r")).otherwise(lit("")),
        lit("#sec"), col("doc_id") % 7)
      docs.select(col("doc_id"), raw.as("url_raw"))
        .select(col("doc_id"), col("url_raw"),
          UrlFunctions.canonicalUrl(col("url_raw")).as("url_canonical"),
          UrlFunctions.canonicalHost(col("url_raw")).as("host"))
        .select(col("doc_id"), col("url_raw"), col("url_canonical"),
          col("host"),
          UrlFunctions.registeredDomain(col("host")).as("domain"),
          UrlFunctions.domainBlocked(col("host"),
            Seq("adnet.com", "spammy.net")).as("blocked"))
        .orderBy("doc_id")
    }),

    "c42_html_strip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val page = concat(
        lit("<html><head><script type=\"text/javascript\">var x = 1 < 2 && 3 > 0;</script>"),
        lit("<style>p { color: red; }</style><title>"),
        col("source"), lit(" #"), col("doc_id"),
        lit("</title></head><body><!-- nav\nboilerplate --><h1 class=\"t\">"),
        col("lang"), lit("</h1>\n<p>"), col("text"),
        lit("</p>\n<p>5 &lt; 7 &amp;&amp; 8 &gt; 2, &quot;q&quot; &#39;s&nbsp;end &amp;lt;</p><div><br/></div></body></html>"))
      docs.select(col("doc_id"), page.as("html"))
        .select(col("doc_id"), length(col("html")).as("n_raw"),
          TextFunctions.stripHtml(col("html")).as("clean"))
        .select(col("doc_id"), col("n_raw"),
          length(col("clean")).as("n_clean"), md5(col("clean")).as("fp"))
        .orderBy("doc_id")
    }),

    // C46 per-document tf-idf keyword extraction — top-3 terms per doc
    // by (tf/dl)·ln(N/df), the classic salience score (the c40 explode
    // contract: ONE token table feeds every aggregate; tf/df/dl are all
    // map-combined keyed counts of it, the top-k window partitions the
    // counts table by doc, never the corpus). Ranked on raw doubles —
    // identical op order both engines — rounded for display after.
    "c46_tfidf_keywords" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .where(col("tok") =!= "")
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val nDocs = docs.count() // one scalar — the Bm25 stats contract
      val scored = tf.join(dl, "doc_id").join(dft, "tok")
        .withColumn("tfidf", (col("tf").cast("double") / col("dl")) *
          log(lit(nDocs.toDouble) / col("df")))
      val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), col("tok"))
      scored.withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
        .select(col("doc_id"), col("tok").as("term"),
          round(col("tfidf"), 6).as("tfidf"), col("rk"))
        .orderBy("doc_id", "rk")
    }),

    // C47 content-defined chunking (Rabin-style CDC, the storage-dedup
    // chunker: boundaries where the rolling 8-token window digest ≡ 0
    // mod 64, so chunk edges are INSERTION-STABLE — editing one
    // paragraph re-chunks only its neighborhood, where C21's fixed
    // windows shift every downstream chunk. Expected chunk ≈ 64+7
    // tokens, tail chunk closes at n. Window digests via the codegen'd
    // SpanMd5sExpr (the c27 engine rule: the lambda consumes BOUND
    // columns only); boundary selection, segmentation and chunk
    // fingerprints are pure array ops — map-only, fan-out = chunks).
    "c47_cdc_chunking" -> ((s, dir) =>
      Chunking.cdcChunks(t(s, dir, "documents"), "doc_id", "text",
          w = 8, modulus = 64)
        .orderBy("doc_id", "chunk_idx")),

    // C49 blocklist word filter (the C4 "badwords" stage — the list
    // here is a stand-in of ordinary tokens since the corpus is
    // synthetic; the MACHINERY is the product): whole-word matches
    // counted via ONE alternation regex (map-only codegen, no token
    // explode), fraction over the c10 token contract, keep at the C4
    // threshold (< 1% blocked tokens). RE2-safe pattern, global count.
    "c49_badwords_filter" -> ((s, dir) => {
      val words = Seq("hash", "spill", "crash")
      val pat = "\\b(" + words.mkString("|") + ")\\b"
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
          TextFunctions.countMatches(lower(col("text")), pat)
            .as("n_blocked"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))
        // keep decides on the UNROUNDED ratio (so does the oracle);
        // blocked_frac is display-rounded after
        .withColumn("__raw", col("n_blocked").cast("double") /
          greatest(col("n_tokens"), lit(1)))
        .withColumn("blocked_frac", round(col("__raw"), 4))
        .withColumn("keep", col("__raw") < 0.01)
        .drop("__raw")
        .orderBy("doc_id")
    }),

    // C48 corpus datasheet ("datasheets for datasets" per source): the
    // QA metrics a corpus release ships — doc/token mass, mean quality,
    // Gopher keep rate, exact-dup count, language spread + modal lang —
    // assembled from the ALREADY-PROVEN per-doc contracts (c9 quality,
    // c10 tokens, c11 fingerprint, c17 gates) in one map-only metric
    // projection + two keyed aggs; keep derives from BOUND metric
    // columns (the c17 CSE rule), never recomputed per check.
    "c48_corpus_datasheet" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val m = docs.select(col("source"), col("lang"),
          TextFunctions.tokenCount(col("text")).as("toks"),
          TextFunctions.qualityScore(col("text")).as("q"),
          TextFunctions.fingerprintMd5(col("text")).as("fp"),
          QualityFilters.nWords(col("text")).as("nw"),
          QualityFilters.meanWordLen(col("text")).as("mwl"),
          QualityFilters.dupWordFrac(col("text")).as("dwf"),
          QualityFilters.topBigramFrac(col("text")).as("tbf"))
        .withColumn("keep", col("nw") >= 5 &&
          col("mwl").between(3.0, 12.0) && col("dwf") <= 0.6 &&
          col("tbf") <= 0.18)
      val stats = m.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("toks").as("n_tokens"),
        round(avg("q"), 4).as("mean_quality"),
        round(avg(col("keep").cast("int")), 4).as("keep_rate"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dup"),
        countDistinct(col("lang")).as("n_langs"))
      val lc = docs.groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("source").orderBy(desc("cnt"), col("lang"))
      val top = lc.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("source"), col("lang").as("top_lang"),
          col("cnt").as("top_lang_docs"))
      stats.join(top, Seq("source")).orderBy("source")
    }),

    // C40 per-source corpus token statistics — the mixing-QA report
    // (C25's input diagnostics): token mass, vocabulary size, type-token
    // ratio and the modal term per source. One explode feeding ONE
    // map-combined (source, token) count; everything downstream
    // aggregates that counts table (vocab-sized, not corpus-sized) —
    // the top-term window partitions by source over counts rows only.
    "c40_corpus_stats" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs.select(col("source"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .where(col("tok") =!= "")
      val counts = toks.groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("source")
        .orderBy(desc("cnt"), col("tok"))
      val top = counts.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("source"), col("tok").as("top_term"),
          col("cnt").as("top_cnt"))
      val stats = counts.groupBy("source").agg(
        count(lit(1)).as("n_types"), sum("cnt").as("n_tokens"))
      val nd = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      nd.join(stats, Seq("source")).join(top, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_types"),
          round(col("n_types").cast("double") / col("n_tokens"), 6)
            .as("ttr"),
          col("top_term"), col("top_cnt"))
        .orderBy("source")
    }),

    // C39 composed curation pipeline: C17 gate → C1 dedup → C24
    // decontamination → C15 split as one plan; the oracle replays the
    // SAME chain from the per-stage replicas, and the per-(split, lang)
    // id digests make any disagreement anywhere in the chain fatal.
    "c39_curation_pipeline" -> ((s, dir) => {
      import graft.pipeline.CurationPipeline
      val docs = t(s, dir, "documents")
      val evalSet = docs.where(col("doc_id") % 97 === 0)
      CurationPipeline.report(CurationPipeline.curate(docs, evalSet))
    }),

    // C93 drop-reason ledger: every input document attributed to the
    // FIRST c39 stage that drops it (quality -> duplicate ->
    // contaminated) or its kept split — the lineage table a 100 TB
    // curation run ships next to the corpus. Oracle = the c39 replica
    // chain restructured into CASE attribution; the per-disposition
    // id digests make one misattributed doc flip a hash.
    "c93_drop_ledger" -> ((s, dir) => {
      import graft.pipeline.CurationPipeline
      val docs = t(s, dir, "documents")
      CurationPipeline.ledger(docs, docs.where(col("doc_id") % 97 === 0))
    }),

    // C38 DSIR importance weights: target = the English subcorpus, raw =
    // everything; both models are D-bucket count vectors distilled to one
    // log-ratio array literal, scoring is a joinless map-only pass. logw
    // is rounded to 4 (ln differs ≤ 1 ulp/term across engines — the c30
    // transcendental contract); n_feats and the keep verdict are exact.
    // The Gumbel-top-k selection step is spec-locked (deterministic seeded
    // noise, partition-invariant kept set).
    "c38_dsir_score" -> ((s, dir) => {
      import graft.operators.Dsir
      val docs = t(s, dir, "documents")
      // r18: featurize ONCE — the model build and the scoring pass both
      // need the hashed feature bag; bucketize into a persisted frame
      // so tokenize+md5 runs one corpus pass instead of two (transform
      // preserves feature order, so logw's fp summation is unchanged)
      val bucketed = docs.select(col("doc_id"),
          (col("lang") === "en").as("__is_t"),
          Dsir.bucketize(col("text")).as("__bs"))
        .persist()
      val lr = Dsir.logRatiosFromBuckets(bucketed, "__bs", "__is_t")
      Dsir.scoreBuckets(bucketed, "__bs", lr.toSeq)
        .select(col("doc_id"), col("n_feats"),
          round(col("logw"), 4).as("logw"), col("keep"))
        .orderBy("doc_id")
    }),

    // deterministic content-hash train/val/test split — assignment is a
    // pure function of text bytes, so DuckDB reproduces it exactly
    "c15_hash_split" -> ((s, dir) =>
      graft.operators.Sampling.hashSplit(t(s, dir, "documents"), "text")
        .groupBy("split").agg(count(lit(1)).as("cnt"),
          countDistinct("lang").as("n_langs"))
        .orderBy("split")),

    // Deterministic seeded global shuffle (C33): the training-order
    // randomizer. order_digest is md5 over the doc ids IN SHUFFLED
    // ORDER per shard — the oracle recomputes the permutation
    // independently, so a single transposition anywhere flips the hash.
    // stable_ok proves order-invariance in-plan: the same seed over a
    // re-partitioned, reverse-sorted input yields bit-identical
    // (shard, pos, id) triples.
    "c33_seeded_shuffle" -> ((s, dir) => {
      import graft.operators.Sampling
      val docs = t(s, dir, "documents").select("doc_id")
      def digest(df: org.apache.spark.sql.DataFrame) =
        Sampling.seededShuffle(df, "doc_id", "g6", 8)
          .groupBy("shard")
          .agg(count(lit(1)).as("cnt"),
            md5(array_join(transform(
              array_sort(collect_list(struct(col("pos"),
                col("doc_id").cast("string").as("id")))),
              x => x.getField("id")), ",")).as("order_digest"))
      val base = digest(docs)
      val scrambled = digest(docs.repartition(13).orderBy(desc("doc_id")))
      val ok = base.exceptAll(scrambled).isEmpty &&
        scrambled.exceptAll(base).isEmpty
      base.select(col("shard"), col("cnt"), col("order_digest"),
          lit(ok).as("stable_ok"))
        .orderBy("shard")
    }),

    // Cross-corpus bloom flagging (C34): yesterday's corpus summarized
    // into one constant-size sketch, today's increment flagged map-only.
    // The probe mixes true overlaps (doc_id%3==0, text unchanged) with
    // novel docs (suffixed text); the gate is the bloom CONTRACT:
    // flagged_true must EQUAL the independently-computed exact overlap
    // (one-sided error — a single false negative breaks the hash), and
    // the false-positive rate on novel docs stays within 5x the 1%
    // build fpp (in-plan boolean).
    "c34_bloom_flag" -> ((s, dir) => {
      import graft.operators.BloomDedup
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val probe = docs.where(col("doc_id") % 3 === 0)
        .withColumn("is_overlap", lit(true))
        .unionByName(docs.where(col("doc_id") % 3 =!= 0)
          .withColumn("text", concat(col("text"), lit(" ::novel")))
          .withColumn("is_overlap", lit(false)))
      // sketch capacity from parquet footers (metadata-only, no scan);
      // count() only as the fallback for non-file-backed frames
      val n = BloomDedup.footerRowCount(docs)
        .getOrElse(docs.count()).max(1L)
      val bloom = BloomDedup.bloomOf(docs, col("text"), n, fpp = 0.01)
      val f = BloomDedup.flagOverlap(probe, col("text"), bloom)
      val row = f.agg(
          count(lit(1)).as("n_probe"),
          sum(when(col("is_overlap"), 1L).otherwise(0L)).as("n_overlap"),
          sum(when(col("is_overlap") && col("maybe_seen"), 1L)
            .otherwise(0L)).as("flagged_true"),
          sum(when(!col("is_overlap") && col("maybe_seen"), 1L)
            .otherwise(0L)).as("__fp"),
          sum(when(!col("is_overlap"), 1L).otherwise(0L)).as("__novel"))
      row.select(col("n_probe"), col("n_overlap"), col("flagged_true"),
        (col("__fp") <= col("__novel") * lit(0.05) + lit(5.0))
          .as("fp_ok"))
    }),

    // C56 corpus drift report: snapshot N = even doc ids, snapshot N+1
    // drops most of src7 (the planted upstream regression). Per-source
    // doc/token volumes + exact integer PPM token shares; src7's share
    // collapse must flag, stable sources must not. Every column BIGINT
    // (shares as toks*1e6 DIV total — both engines truncate) → the
    // whole report is hash-exact.
    "c56_corpus_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // moduli COPRIME with the source cycle (source = src{id % 20}):
      // %3 samples ~2/3 of EVERY source for the old snapshot, %9 keeps
      // ~1/9 of src7 in the new one — stable sources hold their share,
      // the planted src7 collapse flags
      val oldSnap = docs.where(col("doc_id") % 3 =!= 0)
      val newSnap = docs.where(col("source") =!= "src7" ||
        col("doc_id") % 9 === 0)
      graft.operators.Drift.corpusDrift(oldSnap, newSnap, "source",
          TextFunctions.tokenCount(col("text")), driftPpmLimit = 20000L)
        .orderBy("stratum")
    }),

    // B49 event-sequence pattern mining (the MATCH_RECOGNIZE operator
    // class): per-user histories rendered as ordered type-code strings,
    // scanned by regex — 'v+c*p' counts view→(clicks)→purchase funnels
    // with arbitrary regular structure (B35's fixed pair can't), 'e+'
    // runs measure error bursts. One keyed exchange, per-key linear
    // automaton scan, never an event self-join; ordering is the D2
    // (epoch-sec, event_id) total order so ties are deterministic.
    "b49_seq_pattern" -> ((s, dir) =>
      graft.operators.SeqPattern.patternReport(t(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type",
          pattern = "v+c*p", runChar = "e")
        .orderBy("user_id")),

    // B50 time-weighted average (interval-state aggregation): each
    // event's value HOLDS until the user's next event; the average
    // weighs by exact integer hold micros × integer cents, so the
    // only float is one final exact-int division both engines see
    // identically. The window sort never leaves the user partition.
    "b50_time_weighted" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("next_us", lead("us", 1).over(w))
        .where(col("next_us").isNotNull)
        .withColumn("hold_us", col("next_us") - col("us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_holds"),
          sum("hold_us").as("total_hold_us"),
          round(sum(col("cents") * col("hold_us")).cast("double") /
            sum("hold_us").cast("double") / lit(100.0), 6).as("twa_value"))
        .orderBy("user_id")
    }),

    // B51 robust outlier scoring (median/MAD): the heavy-tail-safe
    // complement of D15's mean/stddev z-score — median and MAD via
    // percentile_disc so both engines pick ACTUAL data values (no
    // interpolation arithmetic can diverge); the 3-MAD flag compares
    // identically-derived doubles. Two keyed passes over a 5-key dim.
    "b51_robust_outliers" -> ((s, dir) => {
      t(s, dir, "events").select("event_type", "value")
        .createOrReplaceTempView("graft_b51_ev")
      s.sql("""WITH med AS (
              |  SELECT event_type,
              |         percentile_disc(0.5) WITHIN GROUP (ORDER BY value)
              |           AS med
              |  FROM graft_b51_ev GROUP BY 1),
              |dev AS (
              |  SELECT e.event_type, e.value, m.med,
              |         abs(e.value - m.med) AS adev
              |  FROM graft_b51_ev e JOIN med m USING (event_type)),
              |mad AS (
              |  SELECT event_type,
              |         percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)
              |           AS mad
              |  FROM dev GROUP BY 1)
              |SELECT d.event_type, count(*) AS n,
              |       round(min(d.med), 2) AS med, round(min(a.mad), 2) AS mad,
              |       sum(CASE WHEN d.adev > 3 * a.mad THEN 1 ELSE 0 END)
              |         AS n_outliers
              |FROM dev d JOIN mad a USING (event_type)
              |GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // D23 batch twin: B49's report folded through the O(1) incremental
    // automaton (the state the streaming form carries across
    // micro-batches) instead of the regex scan — shares b49's oracle,
    // so automaton ≡ RE2 is driver-gated; EventStreamsSpec locks the
    // streaming delivery including a match split across triggers.
    "d23_pattern_fold" -> ((s, dir) =>
      graft.operators.SeqPattern.automatonReport(t(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type")
        .orderBy("user_id")),

    // A38 deterministic pseudonymization: GDPR-grade keyed-hash
    // tokenization of identifying columns — token = md5(secret:value),
    // so the SAME value tokenizes identically EVERYWHERE and joins
    // survive across tables while raw identifiers never leave the lake
    // (C18 scrubs PII out of free text; this replaces it in keyed
    // columns). Map-only on both tables; the query proves referential
    // integrity by joining customer to orders ON THE TOKENS and
    // aggregating exact integer cents. Nulls stay null.
    "a38_pseudonymize" -> ((s, dir) => {
      import graft.operators.Pseudonymize
      val cust = Pseudonymize.tokenize(
        t(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment"),
        "s3cr3t", Seq("c_custkey", "c_name"))
      val ords = Pseudonymize.tokenize(
        t(s, dir, "orders").select(col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        "s3cr3t", Seq("o_custkey"))
      cust.join(ords, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(count(col("o_custkey")).as("n_orders"),
          coalesce(sum("cents"), lit(0L)).as("sum_price_cents"))
        .orderBy("c_custkey")
    }),

    // C60 dedup-aware token accounting: per-source RAW vs EFFECTIVE
    // token mass (each distinct text counted once) — the mixing-budget
    // truth C25/C40 need when a source is largely re-crawl copies: its
    // raw mass overstates what training will see after C1. Exact-dup
    // copies planted in-plan (the c55 rule) since the base corpus is
    // dup-free; grouping keys md5(text), never the text itself, so the
    // wide column crosses the exchange once as a 32-char digest.
    "c60_effective_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "source", "text")
      val corpus = docs.unionByName(
        docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            col("source"), col("text")))
      val nt = graft.functions.TextFunctions.tokenCount(col("text"))
      corpus.select(col("source"), md5(col("text")).as("h"), nt.as("toks"))
        .groupBy("source", "h")
        .agg(count(lit(1)).as("n_copies"), min("toks").as("toks"))
        .groupBy("source")
        .agg(sum("n_copies").as("raw_docs"),
          sum(col("n_copies") * col("toks")).as("raw_tokens"),
          count(lit(1)).as("uniq_docs"),
          sum("toks").as("effective_tokens"))
        .withColumn("dup_ppm",
          ((col("raw_tokens") - col("effective_tokens")) * lit(1000000L) /
            col("raw_tokens")).cast("long"))
        .orderBy("source")
    }),

    // D26 batch twin: the admission-cap verdicts as one window rank —
    // the streaming form (admissionCapStream) decides the same
    // first-40-per-user set from one counter per key, spec-locked
    // including budgets exhausting mid-trigger and across triggers.
    "d26_admission_cap" -> ((s, dir) =>
      graft.streaming.EventStreams
        .admissionCapBatch(t(s, dir, "events"), cap = 40)
        .orderBy("event_id")),

    // D32 frontier-ingest composition gate: cap → debounce → quality
    // route as ONE composed per-key fold (batch twin of the fused
    // flatMapGroupsWithState stream; the spec locks stream ≡ batch).
    // Every event spends budget; the debounce clock advances only on
    // admitted events; quality routes but never touches state. The
    // oracle replays the greedy kept-based debounce with a RECURSIVE
    // CTE — a different algorithm (rank-synchronous recursion) for the
    // same sequential fold, the rebuild-oracle shape.
    "d32_frontier_gate" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val verdicts = graft.streaming.EventStreams
        .frontierGateBatch(ev, cap = 40, gapSec = 600L)
      ev.select(col("event_id"), col("event_type"), col("value"))
        .join(verdicts, "event_id")
        .withColumn("verdict",
          when(!col("admitted"), "capped")
            .when(!col("kept"), "debounced")
            .when(col("quarantined"), "quarantine")
            .otherwise("pass"))
        .groupBy("verdict", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("verdict", "event_type")
    }),

    // B54 inter-arrival statistics: per-key event-gap distribution
    // (min/p50/p90/max of exact integer micros between consecutive
    // events) — the heartbeat/SLO profile behind D19's deadline choice;
    // one lag window inside the user partition, then percentile_disc so
    // both engines pick actual gap values (the d20 pairing).
    "b54_interarrival" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
      t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"))
        .withColumn("gap", col("us") - lag("us", 1).over(w))
        .where(col("gap").isNotNull)
        .createOrReplaceTempView("graft_b54_gaps")
      s.sql("""SELECT user_id, count(*) AS n_gaps, min(gap) AS min_gap_us,
              |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap)
              |       AS BIGINT) AS p50_gap_us,
              |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap)
              |       AS BIGINT) AS p90_gap_us,
              |  max(gap) AS max_gap_us
              |FROM graft_b54_gaps GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // C61 chunk→document embedding pooling: mean-pool document vectors
    // from chunk vectors ON THE INTEGER GRID — quantize each component
    // (the c53 formula), sum exactly per (doc, dim), divide ONCE into a
    // rounded double both engines derive from identical BIGINTs. The
    // retrieval-side inverse of C21's chunking: indexes serve chunk
    // vectors, dedup/clustering (C5/C19/C31) want one vector per doc.
    // One explode + one keyed agg; chunk→doc here is vec_id DIV 4.
    "c61_embedding_pool" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(expr("vec_id DIV 4").as("doc_id"),
          posexplode(transform(col("embedding"),
            x => floor(x.cast("double") * 1024 + lit(0.5)))))
        .toDF("doc_id", "j", "q")
        .groupBy("doc_id", "j")
        .agg(count(lit(1)).as("n_chunks"), sum("q").as("sum_q"))
        .select(col("doc_id"), col("j"), col("n_chunks"), col("sum_q"),
          round(col("sum_q").cast("double") /
            (col("n_chunks") * lit(1024.0)), 6).as("pooled"))
        .orderBy("doc_id", "j")),

    // C62 hard-negative mining: for each query, the nearest vectors
    // whose LABEL differs — the contrastive-training data op (negatives
    // that are hard because they're close, informative because they're
    // wrong). Runs on the C53 integer codes so distances and ranks are
    // hash-exact; the 8-row query table broadcasts onto a single corpus
    // scan (exhaustive ⇒ exact, the c14/c26 gate convention — the
    // production candidate generator is c14d's cell probe).
    "c62_hard_negatives" -> ((s, dir) => {
      import graft.functions.GraftExpressions._
      val signs = jlSigns(16, 64)
      val coded = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          jlProject(col("embedding"), signs).as("code"))
      import s.implicits._
      val qdf = coded.where(col("vec_id") < 8)
        .select("vec_id", "label", "code").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
        .toSeq.toDF("query_id", "qlabel", "qcode")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
      coded.join(broadcast(qdf),
          col("label") =!= col("qlabel") &&
            col("vec_id") =!= col("query_id"))
        .withColumn("dist", aggregate(
          zip_with(col("code"), col("qcode"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, e) => acc + e))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .select(col("query_id"), col("vec_id").as("neg_id"), col("label"),
          col("dist"), col("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // C63 ANN recall report: measure the quantized serving path's
    // recall@5 ON THE CORPUS — the ops gate behind every nProbe choice,
    // run as a query instead of an offline eval. Approx = the c14d path
    // DELIBERATELY under-probed at 2-of-16 cells so the report measures
    // real misses (4 probes recall 100% here — a vacuous gate); truth =
    // exhaustive integer L2 over the same codes; both sides are EXACT
    // integer pipelines, so the recall itself (hits · 200000 ppm) is
    // hash-checked, not a spec-side bound like the float-ANN recall
    // specs. One corpus scan per side.
    "c63_ann_recall" -> ((s, dir) => {
      import graft.functions.GraftExpressions._
      val signs = jlSigns(16, 64)
      val coded = t(s, dir, "embeddings")
        .select(col("vec_id"), jlProject(col("embedding"), signs).as("code"))
      val cents: Array[Array[Long]] = coded.where(col("vec_id") < 16)
        .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)
      val assigned = coded
        .withColumn("cell", intCellAssign(col("code"), cents))
      val qRows = assigned.where(col("vec_id") < 8)
        .select("vec_id", "code").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      def d2(a: Array[Long], b: Array[Long]): Long = {
        var acc = 0L; var i = 0
        while (i < math.min(a.length, b.length)) {
          val d = a(i) - b(i); acc += d * d; i += 1
        }
        acc
      }
      import s.implicits._
      val probeRows = qRows.flatMap { case (q, qc) =>
        cents.zipWithIndex.map { case (ct, ci) => (d2(qc, ct), ci) }
          .sortBy(identity).take(2)
          .map { case (_, ci) => (q, ci, qc.toSeq) }
      }.toSeq
      val qdfProbe = probeRows.toDF("query_id", "cell", "qcode")
      val distOf = aggregate(
        zip_with(col("code"), col("qcode"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, e) => acc + e)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
      val approx = assigned.join(broadcast(qdfProbe), Seq("cell"))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("dist", distOf)
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
        .select(col("query_id"), col("vec_id"))
      val qdfFull = qRows.map { case (q, qc) => (q, qc.toSeq) }.toSeq
        .toDF("query_id", "qcode")
      val exact = coded.join(broadcast(qdfFull),
          col("vec_id") =!= col("query_id"))
        .withColumn("dist", distOf)
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
        .select(col("query_id"), col("vec_id"))
      exact.join(approx.withColumn("hit", lit(1)),
          Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .withColumn("recall_ppm", col("n_hit") * lit(200000L))
        .orderBy("query_id")
    }),

    // C64 boilerplate line removal (the CCNet/RefinedWeb rule): a line
    // occurring in ≥30% of a SOURCE's documents is template chrome —
    // nav bars, cookie banners, footers — and is stripped before
    // training; doc-level dedup can't touch it because every PAGE is
    // unique. Corpus synthesized in-plan (the c55 rule): a per-source
    // crawl header planted as line 0 of every doc + fixed 12-word body
    // windows. Cost: one explode + a (source, line)-keyed agg whose
    // frequency table is boilerplate-sized; reconstruction sorts INSIDE
    // the per-doc agg (the b49 pattern), no window. Integer percent
    // compare, md5 reconstruction digest — hash-exact.
    "c64_boilerplate_lines" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "source", "text")
      val words = split(trim(regexp_replace(lower(col("text")),
        "\\s+", " ")), " ")
      val nLines = floor((size(words) + lit(11)) / lit(12)).cast("int")
      val lineArr = transform(sequence(lit(0), nLines - 1),
        i => concat_ws(" ", slice(words, i * 12 + 1, lit(12))))
      val withHeader = docs.select(col("doc_id"), col("source"),
        concat(array(concat(lit("from "), col("source"),
          lit(" crawl header"))), lineArr).as("lines"))
      // r18: persisted — the exploded line table feeds BOTH the
      // frequency pass and the join's left side; without the cache the
      // regex-normalize + line-slice transform runs twice per doc
      val exploded = withHeader
        .select(col("doc_id"), col("source"), posexplode(col("lines")))
        .toDF("doc_id", "source", "idx", "line")
        .persist()
      val stats = exploded.groupBy("source", "line")
        .agg(countDistinct("doc_id").as("df"))
      val nd = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      exploded.join(stats, Seq("source", "line"))
        .join(broadcast(nd), Seq("source"))
        .withColumn("boiler", col("df") * 100 >= col("n_docs") * 30)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(!col("boiler"), 1L).otherwise(0L)).as("n_kept"),
          md5(concat_ws(" ", transform(
            array_sort(collect_list(when(!col("boiler"),
              struct(col("idx"), col("line"))))),
            x => x.getField("line")))).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // D27 batch twin: incremental centroid maintenance — mini-batch
    // k-means over the C53 integer grid, folded through three
    // event-ordered epochs. Codes are SHIFTED positive (+2^19) so the
    // state's truncating integer mean ≡ DuckDB's floor `//` and the
    // whole trajectory — assignments, counts, running sums — replays
    // hash-exact; each epoch assigns against the centroids AS OF ITS
    // START (the mini-batch rule). Per-epoch engine cost: one map-only
    // codegen assignment scan + a (cell, dim) agg collected at k·dim
    // rows. EventStreamsSpec locks the streaming delivery ≡ this fold.
    "d27_centroid_maintenance" -> ((s, dir) => {
      import graft.functions.GraftExpressions._
      val signs = jlSigns(16, 64)
      val coded = t(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(jlProject(col("embedding"), signs),
            x => x + lit(524288L)).as("code"))
      val seed: Array[Array[Long]] = coded.where(col("vec_id") < 8)
        .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)
      val st = new graft.operators.Clustering.IntCentroidState(seed)
      import s.implicits._
      (0 until 3).flatMap { e =>
        st.fold(coded.where(col("vec_id") % 3 === e), "code")
          .map { case (c, n, pc, l1) => (e, c, n, pc, l1) }
      }.toDF("epoch", "cell", "n_assigned", "post_count", "post_sum_l1")
        .orderBy("epoch", "cell")
    }),

    // D29 batch report: raw-predecessor debounce (an event is throttled
    // if the PREVIOUS same-(user, type) event is within 10 min) — the
    // window-expressible form; the kept-based fold (verdicts depend on
    // the last ADMITTED time — no window can express it) is the
    // streaming op, spec-locked stream ≡ fold and semantically
    // separated from this form in EventStreamsSpec.
    "d29_debounce" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy("sec", "event_id")
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("sec"))
        .withColumn("prev", lag("sec", 1).over(w))
        .select(col("event_id"), col("user_id"), col("event_type"),
          (col("prev").isNull || col("sec") - col("prev") > 600)
            .as("kept"))
        .orderBy("event_id")
    }),

    // B58 dynamic pivot: B44 demands an explicit value list ("no
    // discovery job"); this is the discovery variant done SAFELY — one
    // bounded distinct pass collects the pivot domain (loud require,
    // the BalancedRepartition guard rule: a high-cardinality pivot
    // column should fail, not OOM the driver or explode columns), then
    // the same native pivot. Values sorted so the column order is
    // deterministic cross-engine.
    "b58_pivot_auto" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val vals = orders.select("o_orderpriority").distinct()
        .limit(51).collect().map(_.getString(0))
      require(vals.length <= 50,
        "pivotAuto: pivot domain exceeds 50 values — pivot on a " +
          "lower-cardinality column or pass the list explicitly")
      orders
        .select(col("o_orderstatus"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", vals.sorted.toSeq)
        .agg(sum("cents"))
        .orderBy("o_orderstatus")
    }),

    // B59 retention cohort matrix (the week-over-week retention
    // triangle — THE product-analytics report class, distinct from
    // B35's conversion funnel): users cohorted by first-activity week,
    // then for each offset k the fraction still active in week
    // cohort+k, as exact integer ppm. Two keyed aggs + one dim-sized
    // join; activity dedup makes each (user, week) count once.
    "b59_retention_cohorts" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"),
          expr("CAST(floor(unix_timestamp(ts) / 604800) AS BIGINT)")
            .as("wk"))
      val first = ev.groupBy("user_id").agg(min("wk").as("cw"))
      val act = ev.distinct()
      val active = act.join(first, Seq("user_id"))
        .withColumn("k", col("wk") - col("cw"))
        .where(col("k").between(0, 3))
        .groupBy("cw", "k")
        .agg(countDistinct("user_id").as("n_active"))
      val cohorts = first.groupBy("cw").agg(count(lit(1)).as("n_cohort"))
      active.join(cohorts, Seq("cw"))
        .withColumn("retention_ppm",
          (col("n_active") * lit(1000000L) / col("n_cohort")).cast("long"))
        .select("cw", "k", "n_cohort", "n_active", "retention_ppm")
        .orderBy("cw", "k")
    }),

    // B60 cumulative-distinct growth curve: running distinct users per
    // day — the "how fast is the population growing" report whose naive
    // form (per-day COUNT(DISTINCT) over an expanding window) rescans
    // history per day; the scalable identity: a user contributes from
    // their FIRST day onward, so cumulative-distinct = running sum of
    // first-appearance counts — two keyed aggs + one dim-sized window.
    // B65 interval COALESCING (gaps-and-islands): merge each user's
    // overlapping [st, en] event intervals into maximal islands — the
    // classic the naive formulation solves with a range SELF-join
    // (quadratic per key); here ONE window pass per key: running max
    // of prior interval ends, a new island exactly when st jumps past
    // it, then a keyed rollup. One shuffle on user_id, codegen'd
    // windows, no join — the plan that survives 100 TB. Ties are
    // order-stable: equal (st, en) rows agree on the island flag
    // whichever sorts first. floor(value) on BOTH sides (Spark's
    // double→long cast truncates; DuckDB's rounds).
    "b65_interval_coalesce" -> ((s, dir) => {
      val iv = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("value") >= 0)
        .select(col("user_id"),
          col("ts").cast("long").as("st"),
          (col("ts").cast("long") +
            floor(col("value")).cast("long")).as("en"))
      val w = Window.partitionBy("user_id").orderBy("st", "en")
      val prevMax = max("en").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
      val flagged = iv.withColumn("__new_island",
        when(prevMax.isNull || col("st") > prevMax, 1).otherwise(0))
      flagged
        .withColumn("island",
          sum("__new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "island")
        .agg(min("st").as("island_start"), max("en").as("island_end"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "island")
    }),

    "b60_cumulative_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"),
          expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)")
            .as("day"))
      val firstDay = ev.groupBy("user_id").agg(min("day").as("fd"))
        .groupBy("fd").agg(count(lit(1)).as("n_new"))
      val days = ev.select("day").distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      days.join(firstDay, col("day") === col("fd"), "left")
        .select(col("day"), coalesce(col("n_new"), lit(0L)).as("n_new"))
        .withColumn("cum_users", sum("n_new").over(w))
        .orderBy("day")
    }),

    // B53 nearest-event as-of join: each error matched to the view
    // minimizing |Δt| per user — the alignment form where backward (B18)
    // or forward (B42) alone biases by half an interval. One union, one
    // keyed exchange, two partition-local carries; ties to the earlier
    // row. The right side dedups to min event_id per (user, ts) — the
    // same uniqueness contract d19 applies.
    "b53_asof_nearest" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val fails = ev.where(col("event_type") === "error")
        .select(col("event_id").as("fail_id"), col("user_id"), col("ts"))
      val fixes = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("fix_ts"))
        .agg(min("event_id").as("fix_id"))
        .select("user_id", "fix_ts", "fix_id")
      graft.operators.AsofJoin.asofNearest(fails, fixes, Seq("user_id"),
          "ts", "fix_ts", Seq("fix_id"))
        .select("fail_id", "user_id", "fix_id", "delta_us")
        .orderBy("fail_id")
    }),

    // B55 equi-width histogram: value-domain bucketing (A16 profiles
    // quartiles, b10/b34 bucket TIME — this buckets the measure), the
    // distribution report behind every monitoring dashboard. Buckets by
    // exact floor(value/width); the only aggregates are counts, exact
    // integer cents, and min/max of raw doubles — no fp summation
    // ordering anywhere. One map-combined exchange.
    "b55_histogram" -> ((s, dir) =>
      t(s, dir, "events")
        .select(floor(col("value") / 2).cast("long").as("bucket"),
          col("value"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(min("value"), 2).as("min_value"),
          round(max("value"), 2).as("max_value"),
          sum("cents").as("sum_cents"))
        .orderBy("bucket")),

    // B56 interval-OVERLAP join: both sides are INTERVALS (B19's point
    // side generalized) — the temporal-concurrency class: which users'
    // daily activity windows overlapped, for how long. Bucketed to an
    // hour-grid equi-join (big-to-big safe, AQE-splittable); each pair
    // emitted exactly once via the overlap-start-bucket rule, no
    // distinct. Exact integer seconds; result aggregated per (user,
    // day) so the output is dim-sized while the pair work is real.
    "b56_interval_overlap" -> ((s, dir) => {
      val iv = t(s, dir, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
        .withColumn("day", floor(col("sec") / 86400).cast("long"))
        .groupBy("user_id", "day")
        .agg(min("sec").as("lo"), max("sec").as("hi"))
      val l = iv.where(col("user_id") < 5)
        .select(col("user_id").as("user_a"), col("day").as("day_a"),
          col("lo").as("lo_a"), col("hi").as("hi_a"))
      val r = iv.where(col("user_id") >= 5)
        .select(col("lo").as("lo_b"), col("hi").as("hi_b"))
      graft.operators.RangeJoin.overlapJoin(l, r,
          "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 3600L)
        .groupBy("user_a", "day_a")
        .agg(count(lit(1)).as("n_concurrent"),
          sum(least(col("hi_a"), col("hi_b")) -
            greatest(col("lo_a"), col("lo_b")) + 1).as("total_overlap_sec"))
        .orderBy("user_a", "day_a")
    }),

    // C65 data-constrained epoch schedule: given mixing weights and a
    // token budget, how many EPOCHS of each source does the plan imply
    // over its EFFECTIVE (dedup-aware, c60) token mass — the repeat
    // accounting behind data-constrained scaling (Muennighoff et al.
    // 2023): epochs_ppm > 1e6 means repeating data, > 4e6 crosses the
    // diminishing-returns line and flags. All integer ppm arithmetic;
    // the corpus-sized work is one distinct-text token agg, the
    // schedule itself is weights-sized.
    "c65_epoch_schedule" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nt = graft.functions.TextFunctions.tokenCount(col("text"))
      import s.implicits._
      val wdf = Seq(("src0", 500000L), ("src1", 250000L),
        ("src2", 150000L), ("src3", 100000L)).toDF("source", "w_ppm")
      val eff = docs.select(col("source"), md5(col("text")).as("h"),
          nt.as("toks"))
        .groupBy("source", "h").agg(min("toks").as("toks"))
        .groupBy("source").agg(sum("toks").as("effective_tokens"))
      wdf.join(eff, Seq("source"))
        .withColumn("allocated_tokens",
          (col("w_ppm") * lit(3000000L) / lit(1000000L)).cast("long"))
        .withColumn("epochs_ppm",
          (col("allocated_tokens") * lit(1000000L) /
            col("effective_tokens")).cast("long"))
        .withColumn("over_repeat", col("epochs_ppm") > lit(4000000L))
        .orderBy("source")
    }),

    // B57 join-view incremental maintenance: an aggregate view over
    // fact ⋈ dim advanced from the FACT change feed alone (Δ(F⋈D) =
    // ΔF⋈D while the dim is static — the star-schema IVM case); the
    // feed, not the fact table, joins the dim. THE ORACLE IS THE
    // REBUILD from the merged snapshot — incremental ≡ rebuild is the
    // check itself, not a replay of the same algorithm. Exact integer
    // cents through decimal sums.
    // B61 FULL bilinear join-view maintenance — the dim-side case B57
    // names out of scope: Δ(F⋈D) = ΔF⋈D_old ∪ F_old⋈ΔD ∪ ΔF⋈ΔD with
    // product signs. The batch composes every hard case at once: fact
    // inserts AND deletes, a dim ATTRIBUTE move (every %3 customer's
    // segment → 'MOVED', re-grouping their full history), an
    // unreferenced dim insert (must be a no-op), and fact inserts
    // referencing same-batch-moved dims (the ΔF⋈ΔD cancellation). The
    // oracle REBUILDS from the merged snapshots — different algorithm,
    // same answer.
    // B62 SCD2-aware TEMPORAL view maintenance — the dim-HISTORY case
    // B61's scaladoc names as why slowly-changing dims are versioned:
    // facts join the dim version valid AT THEIR EVENT TIME, and the
    // view stays exact under late facts, retractions, and NEW VERSIONS
    // — including an out-of-order effective date ('MID' at 1993 lands
    // AFTER 'MOVED' at 1995 already versioned the %21 keys, splitting
    // an interior window and re-attributing every fact inside it).
    // The maintained view must equal the rebuild; the oracle IS the
    // rebuild (temporal argmax join + group), a different algorithm.
    "b62_scd2_view_maintenance" -> ((s, dir) => {
      import graft.operators.{MaterializedView, Upsert}
      val orders = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val cust = t(s, dir, "customer")
      val histOld = cust.select(col("c_custkey"),
        lit("1990-01-01").cast("date").as("valid_from"),
        col("c_mktsegment").as("segment"))
      val updates = cust.where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), lit("MOVED").as("segment"),
          lit("1995-06-01").cast("date").as("eff"))
        .unionByName(cust.where(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), lit("MID").as("segment"),
            lit("1993-03-01").cast("date").as("eff")))
      // A24's SCD2 apply derives the new history (every constructed
      // version differs from its neighbors, so the version set is
      // exactly base ∪ updates — which is what the oracle replays)
      val histNew = Upsert.scd2Apply(Some(histOld), updates,
        Seq("c_custkey"), "eff", Seq("segment"))
      val factOld = orders.where(col("o_orderkey") % 2 === 0)
      val view0 = MaterializedView.buildTemporal(factOld, histOld,
        "o_custkey", "c_custkey", "o_orderdate", "o_orderkey",
        Seq("segment"), Seq("cents"))
      val factFeed = orders.where(col("o_orderkey") % 10 === 1)
        .withColumn("_change_type", lit("insert"))
        .unionByName(orders.where(col("o_orderkey") % 10 === 2)
          .withColumn("_change_type", lit("delete")))
      MaterializedView.applyScd2Changes(view0, factFeed, factOld,
          histOld, histNew, "o_custkey", "c_custkey", "o_orderdate",
          "o_orderkey", Seq("segment"), Seq("cents"))
        .select(col("segment"), col("__mv_n").as("n_orders"),
          col("__mv_sum_cents").cast("long").as("sum_cents"))
        .orderBy("segment")
    }),

    "b61_bilinear_view_maintenance" -> ((s, dir) => {
      import graft.operators.MaterializedView
      val orders = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val factOld = orders.where(col("o_orderkey") % 5 =!= 0)
      val view0 = MaterializedView.build(
        factOld.join(cust, col("o_custkey") === col("c_custkey"))
          .select("c_mktsegment", "cents"),
        Seq("c_mktsegment"), Seq("cents"))
      val factFeed = orders.where(col("o_orderkey") % 5 === 0)
        .withColumn("_change_type", lit("insert"))
        .unionByName(orders
          .where(col("o_orderkey") % 5 =!= 0 && col("o_orderkey") % 7 === 0)
          .withColumn("_change_type", lit("delete")))
      val moved = cust.where(col("c_custkey") % 3 === 0)
      val dimFeed = moved
        .withColumn("_change_type", lit("update_preimage"))
        .unionByName(moved
          .withColumn("c_mktsegment", lit("MOVED"))
          .withColumn("_change_type", lit("update_postimage")))
        .unionByName(s.range(1).select(
          lit(1000000000L).as("c_custkey"),
          lit("NEWSEG").as("c_mktsegment"),
          lit("insert").as("_change_type")))
      MaterializedView.applyJoinChanges(view0, factFeed, dimFeed,
          factOld, cust, "o_custkey", "c_custkey",
          Seq("c_mktsegment"), Seq("cents"))
        .select(col("c_mktsegment"), col("__mv_n").as("n_orders"),
          col("__mv_sum_cents").cast("long").as("sum_cents"))
        .orderBy("c_mktsegment")
    }),

    "b57_join_view_maintenance" -> ((s, dir) => {
      import graft.operators.MaterializedView
      val orders = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val base = orders.where(col("o_orderkey") % 5 =!= 0)
      val view0 = MaterializedView.build(
        base.join(cust, col("o_custkey") === col("c_custkey"))
          .select("c_mktsegment", "cents"),
        Seq("c_mktsegment"), Seq("cents"))
      val feed = orders.where(col("o_orderkey") % 5 === 0)
        .withColumn("_change_type", lit("insert"))
        .unionByName(orders
          .where(col("o_orderkey") % 5 =!= 0 && col("o_orderkey") % 7 === 0)
          .withColumn("_change_type", lit("delete")))
      MaterializedView.applyFactChanges(view0, feed, cust,
          col("o_custkey") === col("c_custkey"),
          Seq("c_mktsegment"), Seq("cents"))
        .select(col("c_mktsegment"), col("__mv_n").as("n_orders"),
          col("__mv_sum_cents").cast("long").as("sum_cents"))
        .orderBy("c_mktsegment")
    }),

    // C66 eval-side contamination report: the REVERSE of c24 — per EVAL
    // item, how many of its shingles occur in training data and from
    // how many distinct training docs: the model-card audit table that
    // says which eval numbers to distrust. Same broadcast-eval-grams
    // scan shape as c24, aggregated on the eval side.
    "c66_eval_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Decontaminate.evalContaminationReport(
          docs.where(col("doc_id") % 97 =!= 0),
          docs.where(col("doc_id") % 97 === 0),
          "text", "doc_id", n = 8)
        .orderBy("eval_id")
    }),

    // C67 script-mix profiling: per-doc Unicode-script composition
    // (Latin / CJK / Cyrillic counts, non-Latin ppm, mixed-script flag)
    // — the mojibake / script-spam / wrong-language-router signal C8's
    // n-gram lang-id can't give on mixed text. Counts via
    // replace-and-measure (length minus length-after-strip) with
    // explicit BMP ranges both regex engines share; ASCII corpus gets
    // planted CJK/Cyrillic suffixes in-plan (the c49 rule: the list is
    // a stand-in, the machinery is the product). Map-only codegen.
    "c67_script_profile" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val text2 = concat(col("text"),
        when(col("doc_id") % 7 === 0, lit(" 你好世界"))
          .when(col("doc_id") % 11 === 0,
            lit(" привет"))
          .otherwise(lit("")))
      def strip(c: org.apache.spark.sql.Column, cls: String) =
        length(c) - length(regexp_replace(c, cls, ""))
      docs.select(col("doc_id"), text2.as("t2"))
        .select(col("doc_id"),
          strip(col("t2"), "[a-zA-Z]").as("n_latin"),
          strip(col("t2"), "[一-鿿]").as("n_cjk"),
          strip(col("t2"), "[Ѐ-ӿ]").as("n_cyr"))
        .withColumn("nonlatin_ppm",
          when(col("n_latin") + col("n_cjk") + col("n_cyr") === 0, lit(0L))
            .otherwise(((col("n_cjk") + col("n_cyr")) * lit(1000000L) /
              (col("n_latin") + col("n_cjk") + col("n_cyr")))
              .cast("long")))
        .withColumn("mixed_script",
          col("n_latin") > 0 && (col("n_cjk") > 0 || col("n_cyr") > 0))
        .orderBy("doc_id")
    }),

    // C68 Zipf spectrum report: rank-frequency shape of the corpus
    // vocabulary — a healthy natural corpus fits ln(freq) ≈ a − s·ln(rank)
    // with s near 1; template/spam/boilerplate-heavy corpora bend the
    // curve, making the fitted slope a one-number corpus-health gate.
    // One (token) count agg (vocab-sized), top-200 by (count desc,
    // token), OLS over (ln rank, ln count) via the b36-proven regr_*
    // pairing; transcendental outputs rounded to 4 (the c30 contract).
    "c68_zipf" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "\\s+", " ")), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        // top-200 FIRST, distributed (TakeOrderedAndProject: per-task
        // heaps, no global sort) — the prior phrasing ranked the FULL
        // vocabulary through an unpartitioned window, i.e. a single-
        // partition sort of every distinct token (r9 sf1 finding: fine
        // at sf0.1, a one-task corpus-vocabulary sort at scale). The
        // 200-row window after the limit is free; (cnt DESC, tok) makes
        // limit-then-rank ≡ rank-then-limit deterministically.
        .orderBy(col("cnt").desc, col("tok")).limit(200)
        .createOrReplaceTempView("graft_c68_vocab")
      s.sql("""WITH top AS (
              |  SELECT tok, cnt,
              |         row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
              |  FROM graft_c68_vocab)
              |SELECT count(*) AS n_terms,
              |  CAST(sum(cnt) AS BIGINT) AS top_mass,
              |  min(CASE WHEN rnk = 1 THEN tok END) AS top_term,
              |  CAST(min(CASE WHEN rnk = 1 THEN cnt END) AS BIGINT)
              |    AS top_count,
              |  round(regr_slope(ln(CAST(cnt AS DOUBLE)),
              |                   ln(CAST(rnk AS DOUBLE))), 4)
              |    AS zipf_slope,
              |  round(regr_r2(ln(CAST(cnt AS DOUBLE)),
              |                ln(CAST(rnk AS DOUBLE))), 4) AS zipf_r2
              |FROM top""".stripMargin)
    }),

    // C69 character-entropy quality signal: per-doc Shannon entropy of
    // the character distribution — low entropy = repetitive/template
    // junk, the compressibility proxy quality pipelines use beside
    // C9's ratios and C17's repetition gates. Characters enumerated by
    // position (substring over a sequence — identical in both engines,
    // no split-semantics edge), counts exact; H = ln n − Σ c·ln c / n
    // with the transcendental sum rounded 3, the c30 contract.
    "c69_char_entropy" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        // empty-doc guard (r8 advice): Spark's sequence(1, 0) yields a
        // DESCENDING [1, 0] — two phantom "" characters — while the
        // oracle's range(1, 1) is empty; an empty document would
        // diverge cross-engine. Entropy of zero characters is
        // undefined anyway — excluded on BOTH sides.
        .where(length(col("text")) > 0)
        // r18: explode the split-array directly — the previous
        // explode(sequence) + substring(text, i, 1) shape re-sliced the
        // whole text per character (O(len²) string work per doc); one
        // split per doc emits the same character rows in O(len).
        // (A fully map-only run-length rewrite over sort_array was
        // tried and REVERTED: nested array lambdas defeat
        // subexpression elimination — every element_at re-evaluated
        // the sort, >1200 s at sf0.1. Recorded in OPTIMIZATION_r18.md.)
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .groupBy("doc_id", "ch").agg(count(lit(1)).as("nc"))
        .groupBy("doc_id")
        .agg(sum("nc").as("n_chars"),
          count(lit(1)).as("n_distinct"),
          round(
            log(sum("nc")) -
              sum(col("nc") * log(col("nc"))) / sum("nc"), 3)
            .as("entropy"))
        .orderBy("doc_id")),

    // C70 soft dedup weighting: keep EVERY copy but down-weight each
    // duplicate-cluster member to 1e6/size ppm — the duplicate-aware
    // sampling alternative to C1's hard drop (training keeps document
    // diversity inside a cluster while its total mass stays one
    // document's worth); clusters keyed on md5(text) like C60, planted
    // copies in-plan (the c55 rule), truncating integer ppm.
    "c70_soft_dedup_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.unionByName(
        docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            col("text")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text")))
      corpus
        .withColumn("cluster_size", count(lit(1)).over(w))
        .withColumn("weight_ppm",
          (lit(1000000L) / col("cluster_size")).cast("long"))
        .select("doc_id", "cluster_size", "weight_ppm")
        .orderBy("doc_id")
    }),

    // C71 k-anonymity audit: group sizes over quasi-identifier columns
    // with a k threshold — the privacy gate a published table passes
    // AFTER A38's pseudonymization (tokens hide identity; a (nation,
    // segment) cell of size 1 re-identifies anyway). One map-combined
    // agg; the flagged rows are the suppression worklist.
    "c71_k_anonymity" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .withColumn("k_ok", col("n") >= 5)
        .orderBy("c_nationkey", "c_mktsegment")),

    // C94 l-diversity audit: C71's k-anonymity says each
    // quasi-identifier group is big enough to hide in — l-diversity
    // says the group's SENSITIVE attribute (account-balance band,
    // positive-shifted integer cents // 2000 dollars) actually varies:
    // a group of 50 people who all share one balance band is k-safe
    // and still leaks. Distinct-l (the base variant; entropy-l and
    // recursive-(c,l) are refinements) over the same QI columns.
    "c94_l_diversity" -> ((s, dir) => {
      val G = graft.functions.GraftExpressions
      val band = G.longDiv(
        round(col("c_acctbal") * 100).cast("long") + lit(100000000L),
        lit(200000L))
      t(s, dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"),
          countDistinct(band).as("l_distinct"))
        .withColumn("l_ok", col("l_distinct") >= 3)
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // C72 incremental corpus-datasheet maintenance: C48's per-source
    // doc/token/char counters advanced from the ingest CHANGE FEED
    // alone (B26's signed arithmetic on the curation surface) — the
    // datasheet stays fresh without rescanning a 100 TB corpus; like
    // b57 THE ORACLE IS THE REBUILD from the merged snapshot, so
    // incremental ≡ rebuild is the check itself.
    "c72_datasheet_maintenance" -> ((s, dir) => {
      import graft.operators.MaterializedView
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("toks"),
          length(col("text")).cast("long").as("chars"))
      val base = docs.where(col("doc_id") % 4 =!= 0)
      val view0 = MaterializedView.build(base.drop("doc_id"),
        Seq("source"), Seq("toks", "chars"))
      val feed = docs.where(col("doc_id") % 4 === 0)
        .withColumn("_change_type", lit("insert"))
        .unionByName(docs
          .where(col("doc_id") % 4 =!= 0 && col("doc_id") % 6 === 0)
          .withColumn("_change_type", lit("delete")))
      MaterializedView.applyChanges(view0, feed.drop("doc_id"),
          Seq("source"), Seq("toks", "chars"))
        .select(col("source"), col("__mv_n").as("n_docs"),
          col("__mv_sum_toks").cast("long").as("sum_toks"),
          col("__mv_sum_chars").cast("long").as("sum_chars"))
        .orderBy("source")
    }),

    // C73 per-source length-decile report: the calibration table behind
    // every length-filter threshold (C17 cuts at fixed bounds; this
    // shows where each source's mass actually sits, so the bounds are
    // chosen from data not folklore). ntile over the deterministic
    // (n_chars, doc_id) order — both engines assign identical buckets
    // including the remainder-to-first-buckets rule; all integers.
    "c73_length_deciles" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("n_chars", "doc_id")
      t(s, dir, "documents")
        .select(col("source"), col("n_chars"), col("doc_id"))
        .withColumn("decile", ntile(10).over(w))
        .groupBy("source", "decile")
        .agg(count(lit(1)).as("n_docs"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .orderBy("source", "decile")
    }),

    // C74 novelty saturation trend: C57's per-doc novelty averaged over
    // arrival-order deciles — the "is the crawl saturating" curve that
    // decides when to STOP crawling a source (marginal novelty falling
    // toward zero means the budget buys re-reads); integer mean ppm
    // (truncating), deterministic ntile buckets.
    "c74_novelty_trend" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nov = graft.operators.Decontaminate.noveltyScores(
        docs.where(col("doc_id") % 13 =!= 0),
        docs.where(col("doc_id") % 13 === 0), "text", "doc_id", n = 8)
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      nov.withColumn("bucket", ntile(10).over(w))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_grams").as("sum_grams"), sum("n_seen").as("sum_seen"),
          (sum("novelty_ppm") / count(lit(1))).cast("long")
            .as("mean_novelty_ppm"))
        .orderBy("bucket")
    }),

    // C57 n-gram novelty scoring: the GRADED decontamination complement
    // (c24 flags any-overlap; this scores the fraction of a candidate
    // doc's shingles absent from a reference corpus) — the incremental
    // crawl's "is this page new text" budget signal. Broadcast reference
    // grams, one map-side corpus scan, exact integer-ppm ratio.
    "c57_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Decontaminate.noveltyScores(
          docs.where(col("doc_id") % 13 =!= 0),
          docs.where(col("doc_id") % 13 === 0),
          "text", "doc_id", n = 8)
        .orderBy("doc_id")
    }),

    // C58 embedding outlier pruning: distance-to-assigned-centroid over
    // the C53/C14d quantized serving path — vectors far from every
    // cluster are OOD/noise candidates a curation pipeline drops first.
    // Everything is integer arithmetic (codes, cells, distances), the
    // flag is a per-cell rank (top ceil(5%) by distance), so the oracle
    // replays projection → cells → own-centroid L2 → rank hash-exact.
    // Per-cell ranking is the serving-index maintenance shape: cells
    // number O(√n) at scale, so the rank partitions stay task-sized.
    "c58_embed_outliers" -> ((s, dir) => {
      import graft.functions.GraftExpressions._
      val signs = jlSigns(16, 64)
      val coded = t(s, dir, "embeddings")
        .select(col("vec_id"), jlProject(col("embedding"), signs).as("code"))
      val cents: Array[Array[Long]] = coded.where(col("vec_id") < 16)
        .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)
      val assigned = coded
        .withColumn("cell", intCellAssign(col("code"), cents))
      import s.implicits._
      val centDf = cents.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cent")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cell").orderBy(col("dist2").desc, col("vec_id"))
      val cw = org.apache.spark.sql.expressions.Window.partitionBy("cell")
      assigned.join(broadcast(centDf), Seq("cell"))
        .withColumn("dist2", aggregate(
          zip_with(col("code"), col("cent"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, e) => acc + e))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(cw))
        .select(col("vec_id"), col("cell"), col("dist2"),
          (col("rn") <= floor((col("cnt") + lit(19)) / lit(20)))
            .as("is_outlier"))
        .orderBy("vec_id")
    }),

    // C59 cluster-proportional downsampling: at most `cap` vectors per
    // embedding cluster (C58's integer cells) — the diversity-preserving
    // twin of C54's head-domain cap: web corpora are dominated by a few
    // dense content clusters exactly as by a few hosts, and rate-based
    // sampling can't bound either. Selection inherits C54's seeded-md5
    // order-invariant contract (and its WindowGroupLimit plan shape);
    // cells come from the C53/C14d integer path, so membership — and
    // with it the kept set — is hash-exact cross-engine.
    "c59_cluster_quota" -> ((s, dir) => {
      import graft.functions.GraftExpressions._
      val signs = jlSigns(16, 64)
      val coded = t(s, dir, "embeddings")
        .select(col("vec_id"), jlProject(col("embedding"), signs).as("code"))
      val cents: Array[Array[Long]] = coded.where(col("vec_id") < 16)
        .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)
      val assigned = coded
        .withColumn("cell", intCellAssign(col("code"), cents))
        .select("vec_id", "cell")
      graft.operators.Sampling.quotaCap(assigned, "cell", "vec_id", cap = 20)
        .orderBy("vec_id")
    }),

    // C53 Johnson–Lindenstrauss projection on the 1/1024 integer grid:
    // 64→16 dims through a seeded ±1 sign matrix (Achlioptas form), the
    // embedding-compression front end of the ANN stack. Quantize-then-
    // project makes every component an EXACT integer — order-free,
    // associative — and the sign matrix is an LCG of the index, so the
    // oracle rebuilds matrix and projection from formulas alone.
    "c53_jl_projection" -> ((s, dir) => {
      import graft.functions.GraftExpressions
      val signs = GraftExpressions.jlSigns(16, 64)
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(GraftExpressions.jlProject(col("embedding"), signs)))
        .toDF("vec_id", "j", "y")
        .orderBy("vec_id", "j")
    }),

    // C54 per-source quota cap: keep at most 10 docs per source,
    // selected by seeded md5 rank — exact "at most N per host"
    // head-domain capping (rate-based sampling can't promise the bound).
    // rank<=cap is planner-rewritten to WindowGroupLimit: map-side
    // cap-sized heaps, no full per-group sort (plan-audited in spec).
    "c54_source_quota" -> ((s, dir) =>
      graft.operators.Sampling.quotaCap(
        t(s, dir, "documents").select("doc_id", "source"),
        "source", "doc_id", cap = 10)
        .orderBy("doc_id")),

    // C55 leakage-proof split: near-dup clusters are atomic across the
    // train/val/test boundary — every member inherits its cluster
    // representative's split, so no test doc has a near-copy in train.
    // Planted chains of 3 (d — d+1M — d+2M) force real 2-hop connected
    // components, not just pair lookup; singletons split on their own
    // id. The oracle replays root resolution + the md5 bucket formula.
    "c55_leak_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
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
      graft.operators.Sampling.leakProofSplit(corpus, "doc_id", pairs)
        .orderBy("doc_id")
    }),

    // BM25 ranked retrieval (C35): keyword search with tf saturation +
    // length normalization — the lexical complement of the ANN stack.
    // The oracle recomputes the ENTIRE ranking (token tfs, corpus
    // stats, idf, the full scoring formula, the rounded-score ordering)
    // independently in DuckDB — scores and ranks must both match.
    "c35_bm25" -> ((s, dir) =>
      graft.operators.Bm25.rank(t(s, dir, "documents"),
        "doc_id", "text", Seq("hash", "vector", "stream"), topK = 15)),

    // C45 hybrid retrieval: BM25 lexical lists (per-query term sets) +
    // cosine vector lists fused by reciprocal rank — the composition
    // that closes the retrieval stack (C35 lexical, C6 vector, here the
    // production-shape combiner). Lexical query q's embedding twin is
    // vec_id = q; both rank contracts are the already-oracle-proven
    // ones (Bm25's rounded (score, id) order, cosineTopK's (cos, id)
    // window), and rrf sums raw doubles in a fixed operand order so the
    // fused ranking is bit-reproducible in DuckDB.
    "c45_hybrid_retrieval" -> ((s, dir) => {
      import graft.operators.{Bm25, HybridRetrieval, Similarity}
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val lexRanked = Bm25.rankMany(docs, "doc_id", "text",
          hybridTermSets.zipWithIndex
            .map { case (ts, i) => i.toLong -> ts }.toMap, topK = 20)
        .select("query_id", "doc_id", "rank")
      val vec = Similarity.cosineTopK(emb,
          emb.where(col("vec_id") < hybridTermSets.size), "vec_id",
          "embedding", k = 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rnk").as("rank"))
      HybridRetrieval.rrfFuse(lexRanked, vec, k0 = 60, topK = 10)
        .orderBy("query_id", "rank")
    }),

    // MMR diverse reranking (c50) — the diversity stage after retrieval:
    // c6's top-10 candidates per query, greedily re-ranked to 5 by
    // λ·rel − (1−λ)·max-sim-to-selected. rel and every pairwise sim are
    // rounded to the c6-proven 1e-6 grid BEFORE the greedy and the score
    // combines them in fixed operand order (the SQL writes (1.0 - 0.7)
    // so both engines subtract the identical double), making the
    // selection sequence engine-independent; the oracle replays all 5
    // greedy steps as unrolled CTEs.
    "c50_mmr_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cand = Similarity.cosineTopK(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          round(col("cos"), 6).as("rel"))
      graft.operators.Mmr.mmrRerank(cand, emb, "vec_id", "embedding",
          kOut = 5, lambda = 0.7)
        // λ·rel − (1−λ)·pen with rel/pen on the 1e-6 grid is within
        // 1e-9 of the integer (7·rel − 3·pen)·1e6 ÷ 10 — ship THAT
        // integer: exact on both engines, where a decimal round of the
        // raw double can land on a half-boundary the engines resolve
        // differently (observed at sf0.01)
        .withColumn("mmr_e7", round(col("mmr") * 1e7, 0).cast("long"))
        .select("query_id", "doc_id", "mmr_e7", "mmr_rank")
        .orderBy("query_id", "mmr_rank")
    }),

    // MMR over HYBRID retrieval (c50b) — the full production stack in
    // one chain: BM25 rankMany + vector top-k → RRF fusion (c45) → MMR
    // diversity rerank (c50) with the FUSED score as relevance. The rrf
    // rel is on the c45-proven 1e-6 grid, sims on the c6 grid, so the
    // greedy replays exactly; candidates without an embedding cannot be
    // similarity-compared and are dropped by Mmr's inner vector fetch —
    // the oracle's cand CTE applies the identical join.
    "c50b_mmr_hybrid" -> ((s, dir) => {
      import graft.operators.{Bm25, HybridRetrieval, Similarity}
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val lexRanked = Bm25.rankMany(docs, "doc_id", "text",
          hybridTermSets.zipWithIndex
            .map { case (ts, i) => i.toLong -> ts }.toMap, topK = 20)
        .select("query_id", "doc_id", "rank")
      val vec = Similarity.cosineTopK(emb,
          emb.where(col("vec_id") < hybridTermSets.size), "vec_id",
          "embedding", k = 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rnk").as("rank"))
      val fused = HybridRetrieval.rrfFuse(lexRanked, vec, k0 = 60,
        topK = 10)
      val cand = fused.select(col("query_id"), col("doc_id"),
        col("rrf").as("rel")) // rrfFuse ships rrf already on the 1e-6 grid
      graft.operators.Mmr.mmrRerank(cand, emb, "vec_id", "embedding",
          kOut = 5, lambda = 0.7)
        .withColumn("mmr_e7", round(col("mmr") * 1e7, 0).cast("long"))
        .select("query_id", "doc_id", "mmr_e7", "mmr_rank")
        .orderBy("query_id", "mmr_rank")
    }),

    "c8_lang_id" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"),
          col("lang").as("lang_label"))
        .orderBy("doc_id")),

    "c9_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "c10_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("ws_tokens"),
          TextFunctions.bpeishTokenCount(col("text")).as("bpe_tokens"))
        .orderBy("doc_id")),

    "c11_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.fingerprintMd5(col("text")).as("fingerprint"))
        .orderBy("doc_id")),

    // The oracle checks what IS engine surface — payload byte counts and
    // feature-vector shape surviving the pack → batched-decode round trip;
    // the stub codec's feature VALUES are locked by MultimodalSpec.
    "c12_multimodal" -> ((s, dir) => {
      val packed = Multimodal.packMedia(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.decodeStub(s, packed)
        .select(col("media_id"), col("n_bytes"),
          size(col("features")).as("n_features"))
        .orderBy("media_id")
    }),

    // Gopher/C4-style repetition + quality gates, per document.
    // the verdict re-derives from the UNROUNDED metric columns (bound
    // once per metric) rather than calling keep(text) — which would
    // recompute all four metrics a second time for the same row
    "c17_gopher_quality" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        QualityFilters.nWords(col("text")).as("n_words"),
        QualityFilters.dupWordFrac(col("text")).as("dwf"),
        QualityFilters.topBigramFrac(col("text")).as("tbf"),
        QualityFilters.meanWordLen(col("text")).as("mwl"))
        .select(col("doc_id"), col("n_words"),
          round(col("dwf"), 4).as("dup_word_frac"),
          round(col("tbf"), 4).as("top_bigram_frac"),
          round(col("mwl"), 4).as("mean_word_len"),
          ((col("n_words") >= 5) && col("mwl").between(3.0, 12.0) &&
            (col("dwf") <= 0.6) && (col("tbf") <= 0.18)).as("keep"))
        .orderBy("doc_id")),

    // PII scrub: deterministic synthetic PII (email + IPv4 + intl phone,
    // derived from doc_id) is injected, then counted and redacted; the
    // oracle applies the byte-identical RE2-safe regexes and checks the
    // md5 of the scrubbed text.
    "c18_pii_scrub" -> ((s, dir) => {
      val withPii = t(s, dir, "documents").withColumn("text2",
        concat(col("text"), lit(" Contact u"), col("doc_id").cast("string"),
          lit("@ex"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".org or 10."), pmod(col("doc_id"), lit(200)).cast("string"),
          lit(".0.3 or call +55 11 9"),
          pmod(col("doc_id"), lit(10)).cast("string"), lit("00-0000.")))
      withPii.select(col("doc_id"),
        TextFunctions.countMatches(col("text2"), TextFunctions.emailPattern).as("n_emails"),
        TextFunctions.countMatches(col("text2"), TextFunctions.ipv4Pattern).as("n_ips"),
        TextFunctions.countMatches(col("text2"), TextFunctions.phonePattern).as("n_phones"),
        md5(TextFunctions.scrubPii(col("text2"))).as("scrub_md5"))
        .orderBy("doc_id")
    }),

    // k-means assignment pass (iters=1: centroids are raw corpus vectors,
    // bit-identical across engines, so the distributed argmax is
    // oracle-checked exactly; Lloyd UPDATE convergence is locked in
    // ClusteringSpec where cross-engine float drift can't flake the gate).
    "c19_kmeans" -> ((s, dir) =>
      Clustering.kmeansAssign(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8, iters = 1)
        .groupBy("list")
        .agg(count(lit(1)).as("n_vecs"), round(avg("cos"), 6).as("mean_cos"))
        .orderBy("list")),

    // deterministic per-language downsampling quotas (hash-bucket filter)
    "c20_stratified_sample" -> ((s, dir) =>
      graft.operators.Sampling.stratifiedSample(t(s, dir, "documents"),
          "lang", "text", Map("en" -> 80, "fr" -> 50, "de" -> 30),
          defaultPct = 10)
        .groupBy("lang").agg(count(lit(1)).as("cnt"))
        .orderBy("lang")),

    // context-length chunking: 32-token windows advancing by 24 (8-token
    // overlap); chunk content checked via md5 of the re-joined tokens
    "c21_chunking" -> ((s, dir) =>
      graft.operators.Chunking.chunkTokens(
          t(s, dir, "documents").select("doc_id", "text"), "text",
          chunkSize = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")),

    // concat-and-cut sequence packing, sharded by lang (the shard key is
    // what parallelizes the inherently sequential running sum)
    "c22_sequence_pack" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).as("nt"))
      graft.operators.Chunking
        .packSequences(toks, "doc_id", "nt", "lang", budget = 512L)
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("sum_tokens"))
        .orderBy("lang", "pack_id")
    }),

    // ===== D: streaming =====

    // batch twin of dropDuplicatesWithinWatermark: at-least-once delivery
    // simulated by a full self-union; dedup must collapse it exactly
    // (event_id is the delivery key; retransmissions are byte-identical).
    "d5_stream_dedup" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      EventStreams.dedupEvents(ev.unionByName(ev))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    }),

    // batch twin of the stream-stream interval join: purchases attributed
    // to same-user views in the trailing 30 min (floored seconds, oracle
    // parity); the streaming twin's pair-level equality is spec-locked.
    "d6_attribution" -> ((s, dir) =>
      EventStreams.attributionBatch(t(s, dir, "events"))
        .orderBy("purchase_id")),

    // pair-level LEFT-OUTER form: the null view_id rows (zero-view
    // purchases) are first-class output here, not an aggregate count —
    // the oracle checks the exact row set the streaming leftOuter join
    // must converge to (EventStreamsSpec locks the streaming side)
    "d6b_attribution_outer" -> ((s, dir) =>
      EventStreams.attributionPairs(t(s, dir, "events"))
        .orderBy(col("purchase_id"), col("view_id").asc_nulls_first)),

    // D34 stream-stream interval-OVERLAP join (batch twin, the d6
    // pattern): the drained streaming pair set is spec-locked equal to
    // overlapBatch (OverlapStreamSpec, across triggers), and
    // overlapBatch — WITH the max-length contract filter that bounds
    // the streaming state — is what the oracle checks pair-for-pair.
    // L = 12 h routes the longest user-day intervals out by contract,
    // so the filter path is exercised, not vacuous.
    "d34_overlap_stream" -> ((s, dir) => {
      val iv = t(s, dir, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
        .withColumn("day", floor(col("sec") / 86400).cast("long"))
        .groupBy("user_id", "day")
        .agg(min("sec").as("lo"), max("sec").as("hi"))
      val l = iv.where(col("user_id") < 5)
        .select((col("user_id") * 1000000L + col("day")).as("a_id"),
          col("lo").as("a_lo"), col("hi").as("a_hi"))
      val r = iv.where(col("user_id") >= 5)
        .select((col("user_id") * 1000000L + col("day")).as("b_id"),
          col("lo").as("b_lo"), col("hi").as("b_hi"))
      graft.streaming.OverlapStream.overlapBatch(l, r, maxLenSec = 43200L)
        .select("a_id", "b_id", "a_lo", "a_hi", "b_lo", "b_hi")
        .orderBy("a_id", "b_id")
    }),

    // batch twin of the stream-static enrichment join (D9): events
    // broadcast-joined to the customer dimension, aggregated per
    // (hour, segment); the streaming twin's row-level equality and its
    // broadcast (stateless) join are spec-locked in EventStreamsSpec
    "d9_enriched_segments" -> ((s, dir) =>
      EventStreams.enrichedHourly(t(s, dir, "events"), t(s, dir, "customer"))
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("segment"), col("n_events"), col("sum_value"))
        .orderBy("hour", "segment")),

    // D16 quality-gated ingest (batch twin): the A32 row-check verdict
    // on every event — error types, out-of-range values, and null-check
    // failures quarantine; the streaming form routes each epoch's split
    // to two exactly-once sinks (spec-locked: union == input, replay
    // duplicates nothing on either path).
    "d16_quality_gate" -> ((s, dir) =>
      EventStreams.gateVerdict(t(s, dir, "events"))
        .groupBy("quarantined", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("quarantined", "event_type")),

    // D15 z-score anomaly scoring (batch twin): each event against the
    // running mean/stddev of strictly earlier same-type events — the
    // 1-PRECEDING frame. The streaming form holds (n, mean, M2) Welford
    // state per type (constant per key) and scores before updating;
    // EventStreamsSpec bounds stream-vs-batch drift at 1e-6.
    "d15_zscore" -> ((s, dir) =>
      EventStreams.zscoreBatch(t(s, dir, "events"))
        .orderBy("event_id")),

    // D14 trending top-k (batch twin): hourly (hour, type) counts +
    // rank-on-read. Ranking is deliberately NOT in the stream — a top-k
    // is not incrementally emittable under append semantics — so the
    // streaming half maintains the exactly-once counts table and the
    // rank is a window over the DIM-SIZED counts (hours × types);
    // EventStreamsSpec locks stream ≡ batch including the rank.
    "d14_trending" -> ((s, dir) =>
      EventStreams.trendingBatch(t(s, dir, "events"), k = 3)
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("rnk"), col("event_type"), col("n"))
        .orderBy("hour", "rnk")),

    "d1_stream_window" -> ((s, dir) =>
      EventStreams.hourlyAgg(t(s, dir, "events"))
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("hour", "event_type")),

    "d2_sessionize" -> ((s, dir) =>
      EventStreams.sessionize(t(s, dir, "events"))
        .orderBy("user_id", "session_idx")),

    // batch twin of the flatMapGroupsWithState custom-state stream
    // (EventStreamsSpec proves the streaming form emits identical totals)
    "d3_user_totals" -> ((s, dir) =>
      EventStreams.userTotals(t(s, dir, "events"))
        .orderBy("user_id")),

    // D13 streaming quantiles: per-shard t-digests (the D12 state layout
    // with mergeable-quantile state), merged and rank-checked IN-PLAN
    // against the full value set — the b20 gate contract (≤ 2% rank
    // error per quantile). Batch twin here; EventStreamsSpec locks the
    // streaming form to the same bound plus exact total weight.
    "d13_stream_quantiles" -> ((s, dir) => {
      import graft.streaming.SketchStream
      val qsArr = Seq(0.1, 0.5, 0.9)
      val ev = t(s, dir, "events").select(col("value"))
      val shards = SketchStream.tdigestShards(ev, col("value"), nShards = 8)
      val (td, _) = SketchStream.mergedDigest(shards)
      import s.implicits._
      val estDf = qsArr.zipWithIndex
        .map { case (q, i) => (i.toLong, q, td.quantile(q)) }
        .toDF("qi", "target", "est")
      ev.crossJoin(F.broadcast(estDf))
        .groupBy("qi", "target", "est")
        .agg(sum(when(col("value") <= col("est"), 1L).otherwise(0L)).as("rk"),
          count(lit(1)).as("n"))
        .select(col("qi"),
          (abs(col("rk") / col("n") - col("target")) <= lit(0.02)).as("rank_ok"))
        .orderBy("qi")
    }),

    // D12 streaming heavy hitters: per-shard count-min sketches (the
    // state layout the stream maintains — constant size, independent of
    // key cardinality) merged into one sketch, probed against the exact
    // heavy set with the B22 contract booleans. This batch-twin pipeline
    // is what the gate checks; EventStreamsSpec locks the streaming form
    // BYTE-identical to these shard sketches, including across multiple
    // incremental batches. Key synthesizes a hot key (1/3 of rows) over
    // a long tail, the b22 pattern on the events stream.
    "d12_stream_heavy_hitters" -> ((s, dir) => {
      import graft.streaming.SketchStream
      val keyed = t(s, dir, "events").select(
        when(pmod(col("event_id"), lit(3)) === 0, lit(-1L))
          .otherwise(pmod(col("user_id"), lit(50)).cast("long")).as("hh_key"))
      val shards = SketchStream.cmsShards(keyed, col("hh_key"), nShards = 8)
      val (cms, n) = SketchStream.mergedSketch(shards)
      graft.operators.CmsHeavyHitters
        .probe(keyed, "hh_key", minShare = 0.01, cms, n, eps = 0.001)
        .orderBy("item")
    }),

    // IVF at nProbe = nLists is exhaustive (exact top-k) — that mode is
    // oracle-checked; partial-probe recall is locked in SimilaritySpec.
    "c14_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, nLists = 16, nProbe = 16)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rnk")
    }),

    // Batched ANN serving shape (c14c): the SAME answer as c14, but the
    // query batch is driver-side vectors answered in one joinless corpus
    // scan (IvfQueryIndex reference object + generator expression) — the
    // rankMany result shaping for the vector side. Exhaustive probes ⇒
    // exact top-k, same oracle as c14; partial-probe ≡ per-query ivfTopK
    // is spec-locked in SimilaritySpec.
    "c14c_ivf_rank_many" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs: Map[Long, Array[Float]] = emb.where(col("vec_id") < 8)
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      Similarity.ivfTopKMany(emb, "vec_id", "embedding", qs,
          k = 5, nLists = 16, nProbe = 16)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rnk")
    }),

    // C14d: the fully-quantized serving path — IVF over C53's JL codes.
    // Everything downstream of the projection is INTEGER arithmetic
    // (cells, probes, distances, ranks), so unlike every float-cosine
    // ANN gate this one needs NO rounding anywhere: the oracle replays
    // projection → seed centroids (codes of vec 0..15) → argmin cell
    // (ties to lowest c) → 4-cell probe per query → exact squared-L2
    // rerank → (dist, id) rank, all hash-exact. One corpus scan; the
    // ≤32-row probe table broadcasts onto the cell key; assignment is a
    // codegen'd reference-object expression (the CentroidIndex shape).
    "c14d_jl_ivf_topk" -> ((s, dir) => {
      import graft.functions.GraftExpressions._
      val signs = jlSigns(16, 64)
      val coded = t(s, dir, "embeddings")
        .select(col("vec_id"), jlProject(col("embedding"), signs).as("code"))
      val cents: Array[Array[Long]] = coded.where(col("vec_id") < 16)
        .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)
      val assigned = coded
        .withColumn("cell", intCellAssign(col("code"), cents))
      val qRows = assigned.where(col("vec_id") < 8)
        .select("vec_id", "code").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      def d2(a: Array[Long], b: Array[Long]): Long = {
        var acc = 0L; var i = 0
        while (i < math.min(a.length, b.length)) {
          val d = a(i) - b(i); acc += d * d; i += 1
        }
        acc
      }
      val probeRows = qRows.flatMap { case (q, qc) =>
        cents.zipWithIndex.map { case (ct, ci) => (d2(qc, ct), ci) }
          .sortBy(identity).take(4)
          .map { case (_, ci) => (q, ci, qc.toSeq) }
      }.toSeq
      import s.implicits._
      val qdf = probeRows.toDF("query_id", "cell", "qcode")
      val cand = assigned.join(broadcast(qdf), Seq("cell"))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("dist", aggregate(
          zip_with(col("code"), col("qcode"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, e) => acc + e))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
      cand.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("dist"), col("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // Weighted source mixing (C25): kept token mass follows the target
    // weights at the largest supportable total. The ENTIRE computation —
    // per-source token totals, the scarcity constant k, per-source rates,
    // the content-hash filter — replays in DuckDB, so the oracle checks
    // the mixing math, not just the filter.
    "c25_source_mixing" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.15,
        "src3" -> 0.10)
      val nt = TextFunctions.tokenCount(col("text"))
      graft.operators.Sampling.mixSources(docs, "source", "text", nt, w)
        .groupBy("source")
        .agg(count(lit(1)).as("kept_docs"), sum(nt).as("kept_tokens"))
        .orderBy("source")
    }),

    // Decontamination (C24): docs sharing any 8-word shingle with the
    // (deterministic) eval subset are flagged with their overlap count.
    // DuckDB replicates the whole computation from gram STRINGS — the
    // Spark side runs on codegen'd shingle hashes, so the oracle also
    // guards the hash layer's distinctness semantics.
    "c24_decontamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evalSet = docs.where(col("doc_id") % 97 === 0)
      graft.operators.Decontaminate
        .flagContaminated(docs, evalSet, "text", "doc_id", n = 8)
        .orderBy("doc_id")
    }),

    // Two-level IVF at full probe is exhaustive, like c14 — same exact
    // oracle; the point of the variant (centroids as ONE referenced index
    // object instead of O(nLists) codegen literals) is a plan property,
    // locked in SimilaritySpec + PlanAuditSpec.
    "c14b_ivf_two_level" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK2(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, l1 = 4, l2 = 4,
          probe1 = 4, probe2 = 16)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rnk")
    }),

    // C26: product-quantization ADC top-k — the compressed-domain scan
    // (m bytes per vector instead of 4·dim: 32x at dim=64, m=8). The
    // oracle replicates the ENTIRE pipeline — md5-ordered codebook sample,
    // per-subspace argmin encode, ADC lookup-sum — exactly: every float→
    // double cast is exact, both engines sum sub-distances ascending, and
    // rank orders by round(adc, 6) so a 1-ulp summation difference can't
    // flip the compare. PQ-vs-exact recall is asserted in SimilaritySpec.
    "c26_pq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 8, m = 8, kCodes = 16)
        .orderBy("query_id", "rnk")
    }),

    // C28: IVFPQ — coarse cells over PQ codes, the faiss-shape ANN
    // composition. Full probe (nProbe = nLists) degenerates to exactly
    // the brute-force ADC scan, so the oracle is the same encode+ADC
    // replica as c26 (cell routing cannot change a full scan's result);
    // partial-probe retrieval is locked in SimilaritySpec.
    "c28_ivfpq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfpqTopK(emb, emb.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 6, nLists = 8, nProbe = 8,
          m = 8, kCodes = 16)
        .orderBy("query_id", "rnk")
    }),

    // Batched IVFPQ serving (c28b): the compressed-domain twin of c14c —
    // the same answer as c28 through a joinless plan (PqQueryIndex
    // reference object + generator over the encoded corpus). Exhaustive
    // probes ⇒ exact, same oracle as c28; batched ≡ per-query at
    // partial probes is spec-locked in SimilaritySpec.
    "c28b_ivfpq_rank_many" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs: Map[Long, Array[Float]] = emb.where(col("vec_id") < 5)
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      Similarity.ivfpqTopKMany(emb, "vec_id", "embedding", qs,
          k = 6, nLists = 8, nProbe = 8, m = 8, kCodes = 16)
        .orderBy("query_id", "rnk")
    }),

    // C83 MinHash estimator calibration: every id-sampled doc paired
    // with planted variants at a 9-level overlap grid (tail words
    // replaced by synthetic tokens), then bucketed by exact shingle
    // Jaccard. The oracle reproduces bucket/n_pairs/mean_exact_ppm
    // (integer arithmetic over its own string-shingle rebuild) and
    // theory_cand (one correctly-rounded division + an IEEE
    // multiplication chain — no pow); the engine-native measured
    // columns (mean_est_ppm, cand_ppm — XXH64 signatures have no
    // DuckDB twin) are spec-locked in DedupSpec instead.
    "c83_minhash_calibration" -> ((s, dir) => {
      Dedup.minhashCalibrationReport(t(s, dir, "documents"),
          "text", "doc_id")
        .select("bucket", "n_pairs", "mean_exact_ppm", "theory_cand")
        .orderBy("bucket")
    }),

    // C101 LSH banding tuning curve — the c98 recall-vs-cost question
    // asked of the dedup candidate generator: the c83 planted grid
    // swept over bandings of the SAME k=64 signature (4x16, 8x8,
    // 16x4, 32x2) — which banding catches which true-overlap levels,
    // and at what noise cost, BEFORE a 100 TB dedup run commits to
    // one. Signatures are computed once; each config re-slices the
    // same arrays. Driver gate = the oracle-reproducible columns
    // (bucket stats + the per-config S-curve theory, the c83 column
    // split); measured candidacy is spec-locked (monotone in bands at
    // every bucket, endpoint contracts).
    "c101_banding_curve" -> ((s, dir) => {
      Dedup.minhashBandingCurve(t(s, dir, "documents"), "text", "doc_id")
        .select("bands", "bucket", "n_pairs", "mean_exact_ppm",
          "theory_cand")
        .orderBy("bands", "bucket")
    }),

    // C88 SimHash estimator calibration: the c83 harness pointed at
    // the other candidate generator — per exact-Jaccard bucket, the
    // mean 64-bit hamming distance and the C3 candidacy rate over the
    // same planted grid. The oracle checks the DuckDB-reproducible
    // exact columns; the hamming columns (xxhash64 vote chain) are
    // spec-locked (monotone, endpoint contracts).
    "c88_simhash_calibration" -> ((s, dir) => {
      Dedup.simhashCalibrationReport(t(s, dir, "documents"),
          "text", "doc_id")
        .select("bucket", "n_pairs", "mean_exact_ppm")
        .orderBy("bucket")
    }),

    // C82 incremental code-table serving: the corpus PQ-encoded in TWO
    // ingest epochs against the index (the c81 artifact's frozen-index
    // discipline applied to the DATA side — at 100 TB the float corpus
    // stays cold and serving reads the m-byte code table), appended
    // under the D8 epoch-partition rule with one epoch REPLAYED
    // (at-least-once delivery), then served from the stored codes at
    // exhaustive probes. Oracle = c28's brute-force ADC replica — a
    // replay that duplicated rows would shift every rank and break the
    // hash, so oracle-green IS the exactly-once proof.
    "c82_incremental_codes_serve" -> ((s, dir) => {
      import graft.sources.AnnIndexStore
      import org.apache.hadoop.fs.Path
      val emb = t(s, dir, "embeddings")
      val root = Tables.scratch("c82_codes_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val (cells, pq) = Similarity.buildIvfpqIndex(
        emb, "vec_id", "embedding", nLists = 8, m = 8, kCodes = 16)
      val ep0 = Similarity.encodeCodes(
        emb.where(pmod(col("vec_id"), lit(2)) === 0),
        "vec_id", "embedding", cells, pq)
      val ep1 = Similarity.encodeCodes(
        emb.where(pmod(col("vec_id"), lit(2)) === 1),
        "vec_id", "embedding", cells, pq)
      AnnIndexStore.appendCodesEpoch(ep0, root, 1, 0L)
      AnnIndexStore.appendCodesEpoch(ep1, root, 1, 1L)
      AnnIndexStore.appendCodesEpoch(ep1, root, 1, 1L) // replayed delivery
      Similarity.ivfpqTopKFromCodes(AnnIndexStore.readCodes(s, root, 1),
          emb.where(col("vec_id") < 5), "vec_id", "embedding",
          cells, pq, k = 6, nProbe = 8)
        .orderBy("query_id", "rnk")
    }),

    // C81 index-as-artifact serving: the c28 IVFPQ index BUILT once,
    // PUBLISHED as two versioned tables through A37's atomic
    // multi-table commit (a torn cells/codebooks pair would silently
    // mis-rank every query), then LOADED back and SERVED — the
    // Faiss write_index/read_index contract, relationally. Floats
    // round-trip parquet bit-exactly and the build is deterministic,
    // so the loaded index answers hash-identically to c28's in-memory
    // build — same exhaustive-probe brute-force ADC oracle.
    "c81_ann_index_serve" -> ((s, dir) => {
      import graft.sources.AnnIndexStore
      import org.apache.hadoop.fs.Path
      val emb = t(s, dir, "embeddings")
      val root = Tables.scratch("c81_ann_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val (cells, pq) = Similarity.buildIvfpqIndex(
        emb, "vec_id", "embedding", nLists = 8, m = 8, kCodes = 16)
      val rep = AnnIndexStore.publish(s, root, cells, pq)
      require(rep.committed, s"index publish failed: ${rep.failures}")
      val (loadedCells, loadedPq) = AnnIndexStore.load(s, root)
      Similarity.ivfpqTopKWith(emb, emb.where(col("vec_id") < 5),
          "vec_id", "embedding", loadedCells, loadedPq, k = 6, nProbe = 8)
        .orderBy("query_id", "rnk")
    }),

    // C85 blue/green stored-code rollover: codes are KEYED BY INDEX
    // VERSION, so a re-built index (new C81 publish with different
    // codebooks — kCodes 16 → 12) cannot silently invalidate the old
    // version's codes. The old version keeps serving its own
    // (cells, codebooks, iv1-codes) triple via the loadAt/readCodes
    // pin while the new version backfills as ordinary epochs (one
    // replayed — the D8 rule holds per version key). Output = BOTH
    // pins' servings tagged by version; the oracle is the c28
    // brute-force ADC replica built TWICE (sample LIMIT 16 and 12) —
    // each serving must hash-match its own replica, which a version
    // mix-up (codes decoded against the wrong codebooks) cannot.
    "c85_blue_green_codes" -> ((s, dir) => {
      import graft.sources.AnnIndexStore
      import org.apache.hadoop.fs.Path
      val emb = t(s, dir, "embeddings")
      val root = Tables.scratch("c85_bg_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val queries = emb.where(col("vec_id") < 5)
      def ingest(cells: graft.operators.L2Cells,
                 pq: graft.operators.PqIndex, iv: Int): Unit = {
        val ep0 = Similarity.encodeCodes(
          emb.where(pmod(col("vec_id"), lit(2)) === 0),
          "vec_id", "embedding", cells, pq)
        // r18: persisted — the replayed epoch-1 append would otherwise
        // re-run the PQ encode over the corpus a second time
        val ep1 = Similarity.encodeCodes(
          emb.where(pmod(col("vec_id"), lit(2)) === 1),
          "vec_id", "embedding", cells, pq).persist()
        AnnIndexStore.appendCodesEpoch(ep0, root, iv, 0L)
        AnnIndexStore.appendCodesEpoch(ep1, root, iv, 1L)
        AnnIndexStore.appendCodesEpoch(ep1, root, iv, 1L) // replay
        ep1.unpersist()
      }
      // BLUE: v1 index published + codes ingested under iv1
      val (c1, p1) = Similarity.buildIvfpqIndex(
        emb, "vec_id", "embedding", nLists = 8, m = 8, kCodes = 16)
      val rep1 = AnnIndexStore.publish(s, root, c1, p1)
      require(rep1.committed, s"v1 publish failed: ${rep1.failures}")
      val v1 = AnnIndexStore.committedVersion(s, root)
      ingest(c1, p1, v1)
      // GREEN: the index is REBUILT (kCodes 12) and published as v2;
      // iv2 codes backfill while v1 stays fully servable
      val (c2, p2) = Similarity.buildIvfpqIndex(
        emb, "vec_id", "embedding", nLists = 8, m = 8, kCodes = 12)
      val rep2 = AnnIndexStore.publish(s, root, c2, p2)
      require(rep2.committed, s"v2 publish failed: ${rep2.failures}")
      val v2 = AnnIndexStore.committedVersion(s, root)
      require(v2 == v1 + 1, s"expected rollover $v1 -> ${v1 + 1}, got $v2")
      ingest(c2, p2, v2)
      // serve BOTH pins — each from its own version triple
      def serve(iv: Int): DataFrame = {
        val (lc, lpq) = AnnIndexStore.loadAt(s, root, iv)
        Similarity.ivfpqTopKFromCodes(AnnIndexStore.readCodes(s, root, iv),
          queries, "vec_id", "embedding", lc, lpq, k = 6, nProbe = 8)
          .withColumn("version", lit(iv))
      }
      serve(v1).unionByName(serve(v2))
        .orderBy("version", "query_id", "rnk")
    }),

    // C86 retired-version code vacuum: the C85 lifecycle completed —
    // after the rollover flips serving to v2, v1's corpus-sized codes
    // are dead weight; vacuumRetiredCodes removes iv1 (and ONLY iv1:
    // the committed pin and any in-flight newer backfill are refused),
    // then the committed version serves exactly as before. Oracle =
    // the v2 brute-force ADC replica — if the vacuum touched live
    // bytes the hash breaks; the engine additionally requires the
    // accounting (removed=[1], kept=[2]) and that the retired key
    // space is gone before emitting rows.
    "c86_codes_vacuum" -> ((s, dir) => {
      import graft.sources.AnnIndexStore
      import org.apache.hadoop.fs.Path
      val emb = t(s, dir, "embeddings")
      val root = Tables.scratch("c86_vac_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      def ingest(cells: graft.operators.L2Cells,
                 pq: graft.operators.PqIndex, iv: Int): Unit = {
        val ep0 = Similarity.encodeCodes(
          emb.where(pmod(col("vec_id"), lit(2)) === 0),
          "vec_id", "embedding", cells, pq)
        val ep1 = Similarity.encodeCodes(
          emb.where(pmod(col("vec_id"), lit(2)) === 1),
          "vec_id", "embedding", cells, pq)
        AnnIndexStore.appendCodesEpoch(ep0, root, iv, 0L)
        AnnIndexStore.appendCodesEpoch(ep1, root, iv, 1L)
      }
      val (c1, p1) = Similarity.buildIvfpqIndex(
        emb, "vec_id", "embedding", nLists = 8, m = 8, kCodes = 16)
      require(AnnIndexStore.publish(s, root, c1, p1).committed)
      ingest(c1, p1, 1)
      val (c2, p2) = Similarity.buildIvfpqIndex(
        emb, "vec_id", "embedding", nLists = 8, m = 8, kCodes = 12)
      require(AnnIndexStore.publish(s, root, c2, p2).committed)
      ingest(c2, p2, 2)
      val rep = AnnIndexStore.vacuumRetiredCodes(s, root, keepVersions = 1)
      require(rep.committed == 2 && rep.removed == Seq(1) &&
        rep.kept == Seq(2), s"vacuum accounting off: $rep")
      require(!fs.exists(new Path(s"$root/${AnnIndexStore.CodesTable}/iv1")),
        "retired key space must be gone")
      val (lc2, lp2) = AnnIndexStore.loadAt(s, root, 2)
      Similarity.ivfpqTopKFromCodes(AnnIndexStore.readCodes(s, root, 2),
          emb.where(col("vec_id") < 5), "vec_id", "embedding",
          lc2, lp2, k = 6, nProbe = 8)
        .withColumn("version", lit(2))
        .orderBy("query_id", "rnk")
    }),

    // C89 hyperplane sign-LSH calibration: the c83/c88 harness pointed
    // at the embedding-side candidate generator — a planted cosine grid
    // on the 1/1024 integer lattice (prefix kept, tail NEGATED: equal
    // norms, so cos = (2*Sm - S)/S is one integer division), bucketed
    // by the positive-shifted cosine (Sm*1e6/S — truncate==floor on
    // non-negatives). The oracle reproduces bucket/n_pairs/
    // mean_cosp_ppm from its own lattice rebuild; the sign-agreement
    // and candidacy columns ride the seeded Rademacher planes (no SQL
    // twin) and are spec-locked against Goemans-Williamson 1 - theta/pi
    // and its OR-amplified table curve.
    "c89_hyperplane_calibration" -> ((s, dir) => {
      Similarity.hyperplaneCalibrationReport(t(s, dir, "embeddings"),
          "vec_id", "embedding")
        .select("bucket", "n_pairs", "mean_cosp_ppm")
        .orderBy("bucket")
    }),

    // C90 filtered ANN serving: the codes table WRITTEN WITH a
    // filterable attribute (encodeCodes attrCols — the metadata lives
    // in the m-byte table, not in a corpus-sized side join), served
    // under a metadata predicate that parquet-PUSHES onTO the code
    // scan. Filter-then-rank: top-k is taken among qualifying
    // neighbors only, never under-filled by post-filtering. Oracle =
    // the c28 brute-force ADC replica with the same candidate-side
    // predicate (label IN (0,2,5,7) — an In filter parquet pushes);
    // the pushdown and every served neighbor's label membership are
    // spec-locked.
    "c90_filtered_ann_serve" -> ((s, dir) => {
      import graft.sources.AnnIndexStore
      import org.apache.hadoop.fs.Path
      val emb = t(s, dir, "embeddings")
      val root = Tables.scratch("c90_filt_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val (cells, pq) = Similarity.buildIvfpqIndex(
        emb, "vec_id", "embedding", nLists = 8, m = 8, kCodes = 16)
      AnnIndexStore.appendCodesEpoch(
        Similarity.encodeCodes(emb, "vec_id", "embedding", cells, pq,
          attrCols = Seq("label")),
        root, 1, 0L)
      val served = AnnIndexStore.readCodesWith(s, root, 1, Seq("label"))
        .where(col("label").isin(0, 2, 5, 7))
        .select("neighbor_id", "cell", "codes")
      Similarity.ivfpqTopKFromCodes(served,
          emb.where(col("vec_id") < 5), "vec_id", "embedding",
          cells, pq, k = 6, nProbe = 8)
        .orderBy("query_id", "rnk")
    }),

    // C91 tombstone-aware ANN serving: a targeted delete (A33's
    // GDPR key list, ids {7i+3 : i < 50}) marked as A36 merge-on-read
    // DELETION VECTORS against the stored-code directory — serving
    // honors the tombstones through the file-count-sized broadcast
    // anti-join WITHOUT re-encoding or republishing the index. The
    // queries keep running (vec_id 3 is itself deleted: it may still
    // ASK, it must never be RETURNED). Oracle = the ADC replica minus
    // the tombstoned candidates.
    "c91_tombstone_ann_serve" -> ((s, dir) => {
      import graft.sources.{AnnIndexStore, DeletionVectors}
      import org.apache.hadoop.fs.Path
      val emb = t(s, dir, "embeddings")
      val root = Tables.scratch("c91_tomb_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val (cells, pq) = Similarity.buildIvfpqIndex(
        emb, "vec_id", "embedding", nLists = 8, m = 8, kCodes = 16)
      AnnIndexStore.appendCodesEpoch(
        Similarity.encodeCodes(emb, "vec_id", "embedding", cells, pq),
        root, 1, 0L)
      val rep = DeletionVectors.markDeleted(s,
        s"$root/${AnnIndexStore.CodesTable}/iv1", "neighbor_id",
        (0L until 50L).map(_ * 7 + 3), "gdpr_batch_1")
      require(rep.rowsMarked > 0, s"tombstone mark landed nothing: $rep")
      Similarity.ivfpqTopKFromCodes(
          AnnIndexStore.readCodesWithDeletes(s, root, 1),
          emb.where(col("vec_id") < 5), "vec_id", "embedding",
          cells, pq, k = 6, nProbe = 8)
        .orderBy("query_id", "rnk")
    }),

    // B63 theta-sketch set operations: the audience-overlap question
    // HLL can't answer — per order-status customer segment, a KMV
    // sketch (k smallest distinct xxhash64 values, 4 KB state, exact
    // merge by construction); per status pair the sketch intersection
    // and union estimates are checked against the EXACT overlaps
    // computed next to them (the c63 calibration pattern), and the
    // booleans ride the b22 style: deterministic at fixed hash + data.
    "b63_theta_overlap" -> ((s, dir) => {
      import graft.operators.{KmvSketch, ThetaSketch}
      val k = 512
      val ord = t(s, dir, "orders")
        .select(col("o_orderstatus").as("st"), col("o_custkey").as("ck"))
      val sk = ord.groupBy("st")
        .agg(ThetaSketch.kmvSketch(xxhash64(col("ck")), k).as("sk"))
        .collect().map(r => r.getString(0) ->
          KmvSketch.deserialize(r.getAs[Array[Byte]](1))).toMap // 3 segs
      val d = ord.distinct()
      val n = d.groupBy("st").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val inter = d.as("l").join(d.as("r"),
          col("l.ck") === col("r.ck") && col("l.st") < col("r.st"))
        .groupBy(col("l.st").as("a"), col("r.st").as("b"))
        .agg(count(lit(1)).as("i"))
        .collect() // <= segs^2 rows
      import s.implicits._
      val rse = 1.0 / math.sqrt(k.toDouble)
      inter.toSeq.map { r =>
        val (a, b, ei) = (r.getString(0), r.getString(1), r.getLong(2))
        val eu = n(a) + n(b) - ei
        val estI = KmvSketch.intersectEstimate(sk(a), sk(b))
        val estU = KmvSketch.unionEstimate(sk(a), sk(b))
        // union: the (k-1)/theta estimator at ~5 sigma; intersection:
        // the rate-th sample sees inter*th hits — bound by 5 sigma of
        // that binomial plus a 2-hit floor for tiny overlaps
        val unionOk = math.abs(estU - eu) <= 5.0 * rse * eu
        val interOk = math.abs(estI - ei) <=
          5.0 * math.sqrt(math.max(estI, 1.0) / KmvSketch.thetaMin(
            sk(a), sk(b))) + 2.0 / KmvSketch.thetaMin(sk(a), sk(b))
        (a, b, ei, eu, interOk, unionOk)
      }.sortBy(t => (t._1, t._2))
        .toDF("seg_a", "seg_b", "exact_inter", "exact_union",
          "inter_ok", "union_ok")
    }),

    // B64 theta a-not-b + Jaccard: the remaining set-operation
    // surfaces on the b63 machinery — per ORDERED status pair, the
    // set-difference estimate (DataSketches' a-not-b cut rule) and the
    // Jaccard similarity, checked against exact replicas; jacc_ppm is
    // integer-exact (inter*1e6 // union, non-negative truncation).
    "b64_theta_anotb" -> ((s, dir) => {
      import graft.operators.{KmvSketch, ThetaSketch}
      val k = 512
      val ord = t(s, dir, "orders")
        .select(col("o_orderstatus").as("st"), col("o_custkey").as("ck"))
      val sk = ord.groupBy("st")
        .agg(ThetaSketch.kmvSketch(xxhash64(col("ck")), k).as("sk"))
        .collect().map(r => r.getString(0) ->
          KmvSketch.deserialize(r.getAs[Array[Byte]](1))).toMap
      val d = ord.distinct()
      val n = d.groupBy("st").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val inter = d.as("l").join(d.as("r"),
          col("l.ck") === col("r.ck") && col("l.st") < col("r.st"))
        .groupBy(col("l.st").as("a"), col("r.st").as("b"))
        .agg(count(lit(1)).as("i"))
        .collect()
      import s.implicits._
      val rse = 1.0 / math.sqrt(k.toDouble)
      inter.toSeq.flatMap { r =>
        val (x, y, ei) = (r.getString(0), r.getString(1), r.getLong(2))
        Seq((x, y), (y, x)).map { case (a, b) =>
          val eu = n(a) + n(b) - ei
          val exDiff = n(a) - ei
          val th = KmvSketch.thetaMin(sk(a), sk(b))
          val estD = KmvSketch.aNotBEstimate(sk(a), sk(b))
          val estJ = KmvSketch.intersectEstimate(sk(a), sk(b)) /
            KmvSketch.unionEstimate(sk(a), sk(b))
          val jacc = ei.toDouble / eu
          val diffOk = math.abs(estD - exDiff) <=
            5.0 * math.sqrt(math.max(estD, 1.0) / th) + 2.0 / th
          // a ratio of two correlated estimates: the intersection
          // sigma scaled by the union, plus the union's own RSE, at 5x
          val jaccOk = math.abs(estJ - jacc) <=
            5.0 * (math.sqrt(math.max(ei.toDouble, 1.0) / th) / eu +
              rse * math.max(jacc, rse))
          (a, b, exDiff, ei * 1000000L / eu, diffOk, jaccOk)
        }
      }.sortBy(t => (t._1, t._2))
        .toDF("seg_a", "seg_b", "exact_anotb", "jacc_ppm",
          "diff_ok", "jacc_ok")
    }),

    // C92 budget-targeted threshold selection: the DEPLOYED langid
    // margins swept into the FineWeb-Edu decision — which score
    // threshold keeps a target token budget of the best material. The
    // model is LOADED from the committed C95 artifact (r11's top ask —
    // before the store existed this query retrained inline, ~90% of
    // its headline), so the timed path is score + sweep only. The
    // margin domain collapses to a histogram BEFORE any window (the
    // c68 rule); the binning TRUNCATES toward zero on both engines
    // (Spark `div` = IntegralDivide; DuckDB INTEGER `//` also truncates
    // — the measured rule recorded at Similarity's division note), and
    // the selected bin is the highest whose top-down cumulative token
    // mass reaches the budget (lowest bin when the corpus can't fill
    // it). Oracle = the c79b training replay + the same sweep in SQL —
    // unchanged, because score-from-load ≡ score-from-train.
    "c92_budget_threshold" -> ((s, dir) => {
      import graft.operators.{ClassifierTrain, Sampling}
      val docs = t(s, dir, "documents")
      val lm = graft.sources.ModelStore.loadModel(s, langidModelRoot(s, dir))
      val scored = ClassifierTrain.scoreMulticlass(
        docs, "text", "doc_id", lm.model, lm.nBuckets)
      val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.HashedClassifier.tokenCount(col("text"))
          .as("tokens"))
      Sampling.budgetThresholdSweep(scored.join(toks, "doc_id"),
          "margin", "tokens", budgetTokens = 8000L, binWidth = 50000L)
        .orderBy(desc("bin"))
    }),

    // C95 versioned classifier-model artifact — the C81 publish/load
    // discipline applied to C79's weights (r11's top ask): a model
    // that keeps learning publishes SNAPSHOTS through the A37 atomic
    // two-table commit (weights + class-order meta advance together or
    // not at all), a torn write is REFUSED at publish, and serving
    // PINS a version (blue/green for models — the C85 shape). The
    // query runs the lifecycle end to end: fold batch 0 (one D36
    // online step per class) → publish v1 → attempt a bucket-holed
    // weights write (must refuse, pointer unmoved) → fold batch 1 →
    // publish v2 → load BOTH pins back. Output = the LOADED weights
    // tagged by version; oracle = ONE unrolled trajectory prefix read
    // at iteration 1 (v1) and iteration 2 (v2) — load-at-version must
    // return exactly the trajectory's state at that version, which a
    // version mix-up or a lossy round-trip cannot fake.
    "c95_versioned_model" -> ((s, dir) => {
      import graft.operators.ClassifierTrain
      import graft.sources.ModelStore
      import org.apache.hadoop.fs.Path
      val docs = t(s, dir, "documents")
      val classes = Seq("de", "en", "es")
      val root = Tables.scratch("c95_model_" + new java.io.File(dir).getName)
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val feats = ClassifierTrain.featurizeMulti(
        docs, "text", "doc_id", "lang", 128, 2).persist()
      try {
        val st = new ClassifierTrain.OnlineMulticlassState(classes, 128, 64L)
        st.foldEpoch(0L, feats.where(col("batch") === 0))
        val mv1 = classes.map(c => c -> st.weights(c).clone)
        val rep1 = ModelStore.publishModel(s, root, mv1, trainedAtEpoch = 0L)
        require(rep1.committed, s"v1 publish failed: ${rep1.failures}")
        require(ModelStore.committedModelVersion(s, root) == 1,
          "expected committed v1")
        // a torn writer (bucket hole in one class) must be refused and
        // must not move the pointer — the AnnIndexStore dense rule
        val holed = ModelStore.weightsFrame(s, mv1)
          .where(!(col("cls") === classes.head && col("b") === 7))
        val torn = ModelStore.publishFrames(s, root, holed,
          ModelStore.metaFrame(s, classes, 128, 0L), classes, 128)
        require(!torn.committed && torn.failures.nonEmpty,
          s"torn publish must be refused: $torn")
        require(ModelStore.committedModelVersion(s, root) == 1,
          "refused publish must not move the pointer")
        st.foldEpoch(1L, feats.where(col("batch") === 1))
        val mv2 = classes.map(c => c -> st.weights(c).clone)
        val rep2 = ModelStore.publishModel(s, root, mv2, trainedAtEpoch = 1L)
        require(rep2.committed, s"v2 publish failed: ${rep2.failures}")
        require(ModelStore.committedModelVersion(s, root) == 2,
          "expected rollover to v2")
        val l1 = ModelStore.loadModelAt(s, root, 1)
        val l2 = ModelStore.loadModel(s, root)
        require(l1.trainedAtEpoch == 0L && l2.trainedAtEpoch == 1L &&
          l1.nBuckets == 128 && l2.nBuckets == 128,
          s"loaded meta off: $l1 / $l2")
        import s.implicits._
        Seq(1 -> l1, 2 -> l2).flatMap { case (v, lm) =>
          lm.model.flatMap { case (c, w) =>
            w.zipWithIndex.map { case (wv, b) => (v, c, b.toLong, wv) } }
        }.toDF("version", "cls", "b", "w").orderBy("version", "cls", "b")
      } finally { feats.unpersist(); () }
    }),

    // C96 versioned TOKENIZER artifact — the C95 store discipline
    // applied to the other in-session training artifact (the r11 ask
    // BpeTrain.scala names): C77's merge list published through the
    // A37 atomic two-table commit, encode sessions LOAD a pinned
    // version. Lifecycle end to end: train the 24-merge trajectory
    // once (BPE merges are PREFIX-STABLE — rounds 1..12 don't depend
    // on the total depth, so the depth-12 prefix IS the 12-merge
    // tokenizer) → publish v1 = depth 12 → attempt a rank-holed merges
    // write (must refuse, pointer unmoved) → publish v2 = depth 24 →
    // load BOTH pins back and ENCODE the training corpus under each.
    // Output = per-version per-source fertility from the LOADED merge
    // lists; oracle = the c77 trajectory chain read at w12 (v1) and
    // w24 (v2) — encode-from-load must reproduce the trajectory's own
    // segmentation state at that depth, which a version mix-up, a rank
    // swap, or a lossy round-trip cannot fake (the c80
    // encode ≡ training-semantics proof, now keyed by artifact
    // version).
    "c96_versioned_tokenizer" -> ((s, dir) => {
      import graft.operators.BpeTrain
      import graft.sources.TokenizerStore
      import org.apache.hadoop.fs.Path
      val docs = t(s, dir, "documents")
      val root = Tables.scratch("c96_tok_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val merges = BpeTrain.train(docs, "text", numMerges = 24)
      val rep1 = TokenizerStore.publishTokenizer(s, root, merges.take(12),
        trainedAtEpoch = 12L)
      require(rep1.committed, s"v1 publish failed: ${rep1.failures}")
      require(TokenizerStore.committedTokenizerVersion(s, root) == 1,
        "expected committed v1")
      // a torn writer (rank hole) must be refused and must not move the
      // pointer — the ModelStore/AnnIndexStore dense rule
      val holed = TokenizerStore.mergesFrame(s, merges.take(12))
        .where(col("rank") =!= 5)
      val torn = TokenizerStore.publishFrames(s, root, holed,
        TokenizerStore.metaFrame(s, 12, 12L), 12)
      require(!torn.committed && torn.failures.nonEmpty,
        s"torn publish must be refused: $torn")
      require(TokenizerStore.committedTokenizerVersion(s, root) == 1,
        "refused publish must not move the pointer")
      val rep2 = TokenizerStore.publishTokenizer(s, root, merges,
        trainedAtEpoch = 24L)
      require(rep2.committed, s"v2 publish failed: ${rep2.failures}")
      require(TokenizerStore.committedTokenizerVersion(s, root) == 2,
        "expected rollover to v2")
      val tok1 = TokenizerStore.loadTokenizerAt(s, root, 1)
      val tok2 = TokenizerStore.loadTokenizer(s, root)
      require(tok1.merges.size == 12 && tok1.trainedAtEpoch == 12L &&
        tok2.merges.size == 24 && tok2.trainedAtEpoch == 24L,
        s"loaded meta off: ${tok1.merges.size}@${tok1.trainedAtEpoch} / " +
          s"${tok2.merges.size}@${tok2.trainedAtEpoch}")
      val f1 = BpeTrain
        .fertilityUnderMerges(docs, "text", "source", tok1.merges)
        .withColumn("version", lit(1))
      val f2 = BpeTrain
        .fertilityUnderMerges(docs, "text", "source", tok2.merges)
        .withColumn("version", lit(2))
      f1.unionByName(f2)
        .select("version", "source", "n_words", "n_tokens", "n_chars",
          "fertility_ppm", "chars_per_token_ppm")
        .orderBy("version", "source")
    }),

    // D39 streaming MODEL ROLLOVER (batch-identical gate): the promise
    // at ModelStore's scaladoc — continued training publishes its
    // snapshots as ordinary new versions — exercised through the
    // fold-then-publish unit the real sink runs per micro-batch
    // (ModelRolloverStreamSpec locks stream ≡ fold through the actual
    // writeStream sink, blue-pin serving through the flip included).
    // Epoch e delivers pmod(doc_id, 2) = e docs — exactly the rows the
    // c95 trajectory folds at iteration e+1, and featurization is
    // batch-count-independent, so the published v1/v2 ARE the c95
    // trajectory states and the same generated oracle gates them. A
    // redelivered epoch must be a structural no-op (the MultiPublish
    // batch watermark + the state's replayed-latest-epoch rule), NOT
    // an overwrite — a publish is a pointer flip, so replay safety is
    // version-identity, the D22 contract at the model level.
    "d39_model_rollover" -> ((s, dir) => {
      import graft.operators.ClassifierTrain
      import graft.sources.ModelStore
      import graft.streaming.ModelRolloverStream
      import org.apache.hadoop.fs.Path
      val docs = t(s, dir, "documents")
      val classes = Seq("de", "en", "es")
      val root = Tables.scratch("d39_roll_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val st = new ClassifierTrain.OnlineMulticlassState(classes, 128, 64L)
      (0 to 1).foreach { e =>
        val rep = ModelRolloverStream.foldAndPublish(st, classes,
          docs.where(pmod(col("doc_id"), lit(2)) === e), e.toLong,
          "text", "doc_id", "lang", 128, root)
        require(rep.committed, s"epoch $e publish failed: ${rep.failures}")
      }
      require(ModelStore.committedModelVersion(s, root) == 2,
        "expected v2 after two epochs")
      // redelivered latest epoch: versions, weights, pointer untouched
      val replay = ModelRolloverStream.foldAndPublish(st, classes,
        docs.where(pmod(col("doc_id"), lit(2)) === 1), 1L,
        "text", "doc_id", "lang", 128, root)
      require(replay.replaySkipped && !replay.committed,
        s"replayed epoch must be watermark-skipped: $replay")
      require(ModelStore.committedModelVersion(s, root) == 2,
        "replay must not move the pointer")
      // blue pin through the rollover + the flipped committed view
      val l1 = ModelStore.loadModelAt(s, root, 1)
      val l2 = ModelStore.loadModel(s, root)
      require(l1.trainedAtEpoch == 0L && l2.trainedAtEpoch == 1L,
        s"loaded meta off: $l1 / $l2")
      import s.implicits._
      Seq(1 -> l1, 2 -> l2).flatMap { case (v, lm) =>
        lm.model.flatMap { case (c, w) =>
          w.zipWithIndex.map { case (wv, b) => (v, c, b.toLong, wv) } }
      }.toDF("version", "cls", "b", "w").orderBy("version", "cls", "b")
    }),

    // C97 image PERCEPTUAL near-dup — the audio landmark family's
    // missing image twin: REAL PNGs from the c12 pixel formula, with a
    // BMP re-encode (same pixels, different bytes) and a
    // brightness-shifted copy (+8 per channel, saturating) planted for
    // every 10th id — neither is visible to byte-level dedup. The
    // 64-bit blockhash over EQUAL-SIZED 8x8 grid blocks is
    // algebraically invariant to the uniform shift (clamping at 255 is
    // the only bit-flip source), so the planted pairs surface through
    // the c3 banded join + hamming<=3 verify; `same_pixels` splits the
    // re-encode family (checksum-equal) from the perceptual matches.
    // Oracle = full replay: formula pixels, saturated shift, crop,
    // block sums, bits, bands, hot rule, bit_count(xor) — exact
    // integers end to end.
    "c97_image_perceptual_dedup" -> ((s, dir) => {
      import graft.operators.ImageDedup
      val docs = t(s, dir, "documents")
      val packed = ImageDedup.packImageVariants(s, docs, "doc_id")
      val codes = ImageDedup.blockhashCodes(s, packed)
      ImageDedup.perceptualPairs(codes, maxHamming = 3, hotBucketCap = 64)
        .orderBy("id_a", "id_b")
    }),

    // C97b image duplicate-CLUSTER resolution — the c13 step on the
    // image surface: c97's perceptual pairs resolved to connected
    // components (min-label propagation, bounded rounds), so a corpus
    // keeps ONE canonical image per perceptual family (the base id —
    // smallest member — survives; its BMP re-encode and brightness
    // twin collapse into its cluster). Oracle = the c97 pair replay +
    // a transitive-closure recursive CTE — a DIFFERENT algorithm from
    // the engine's propagation loop, same fixpoint (the strongest-
    // oracle rule). Per-cluster rollup with a sorted member digest:
    // one mis-clustered image anywhere breaks the hash.
    "c97b_image_dup_clusters" -> ((s, dir) => {
      import graft.operators.ImageDedup
      import graft.sources.ImageCodeStore
      // r19 (the r18 verdict's ask #5): the cluster resolution reads the
      // STORED blockhash codes (the same committed ImageCodeStore table
      // c104/c128 serve from — decode paid once per corpus at publish,
      // never per query) instead of re-decoding the whole image corpus
      // inside every invocation. Pairs-from-stored-codes hash-equal
      // pairs-from-decode (c104's oracle pins exactly that identity with
      // the same maxHamming/hotBucketCap), so the clusters — hence this
      // query's declared output — are unchanged; the c97 row keeps the
      // in-query decode and stays the measure of what the store saves.
      val root = imageCodesRoot(s, dir)
      val v = ImageCodeStore.committedSpecVersion(s, root)
      val codes = ImageCodeStore.readCodes(s, root, v)
      // localCheckpoint BEFORE the propagation loop: each CC round
      // re-nests its input plan, and the pair plan here is deep
      // (band explode + self-join over the stored scan) — without
      // lineage truncation the per-round analyzer plan grows
      // multiplicatively and OOMs the driver (the c77/c13 lesson).
      // maxIter 96: the synthetic gradient images chain into
      // components whose diameter grows with corpus density (measured
      // >20 at the 10x replica — 48 labels still moving at round 20);
      // min-label propagation is O(diameter) rounds by construction,
      // and each round here is seconds over the checkpointed KB pair
      // set. Real perceptual families are clique-shaped (diameter
      // 2-3); a crawl where near-dup CHAINS span 96 hops is a corpus
      // problem the loud non-convergence failure should surface.
      val pairs = ImageDedup.perceptualPairs(codes, maxHamming = 3,
        hotBucketCap = 64).localCheckpoint(true)
      Dedup.dupClusters(pairs, maxIter = 96)
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("cluster_size"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(col("id"))),
            x => x.cast("string")))).as("members_fp"))
        .orderBy("cluster_id")
    }),

    // C98 ANN tuning curve — the c63 recall harness SWEPT over nProbe:
    // one row per probe setting with its measured recall (vs the same
    // exhaustive truth), cells touched, and codes scanned — the
    // recall-vs-cost table an operator consults to pick a serving
    // config instead of guessing (c63 is this table's nProbe=2 point;
    // the spec pins that identity and recall's monotonicity). All
    // integer arithmetic on the c53 codes, so every cell of the curve
    // is hash-exact, including the cost columns.
    "c98_ann_tuning_curve" -> ((s, dir) => {
      import graft.functions.GraftExpressions._
      val settings = Seq(1, 2, 4, 8, 16)
      val signs = jlSigns(16, 64)
      val coded = t(s, dir, "embeddings")
        .select(col("vec_id"), jlProject(col("embedding"), signs).as("code"))
      val cents: Array[Array[Long]] = coded.where(col("vec_id") < 16)
        .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)
      val assigned = coded
        .withColumn("cell", intCellAssign(col("code"), cents))
      val qRows = assigned.where(col("vec_id") < 8)
        .select("vec_id", "code").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      def d2(a: Array[Long], b: Array[Long]): Long = {
        var acc = 0L; var i = 0
        while (i < math.min(a.length, b.length)) {
          val d = a(i) - b(i); acc += d * d; i += 1
        }
        acc
      }
      import s.implicits._
      val distOf = aggregate(
        zip_with(col("code"), col("qcode"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, e) => acc + e)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
      val qdfFull = qRows.map { case (q, qc) => (q, qc.toSeq) }.toSeq
        .toDF("query_id", "qcode")
      val exact = coded.join(broadcast(qdfFull),
          col("vec_id") =!= col("query_id"))
        .withColumn("dist", distOf)
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
        .select(col("query_id"), col("vec_id"))
      settings.map { np =>
        val probeRows = qRows.flatMap { case (q, qc) =>
          cents.zipWithIndex.map { case (ct, ci) => (d2(qc, ct), ci) }
            .sortBy(identity).take(np)
            .map { case (_, ci) => (q, ci, qc.toSeq) }
        }.toSeq
        val qdfProbe = probeRows.toDF("query_id", "cell", "qcode")
        val cand = assigned.join(broadcast(qdfProbe), Seq("cell"))
          .where(col("vec_id") =!= col("query_id"))
        val scanned = cand.groupBy()
          .agg(count(lit(1)).as("codes_scanned"))
        val approx = cand.withColumn("dist", distOf)
          .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
          .select(col("query_id"), col("vec_id"))
        val hits = exact
          .join(approx.withColumn("hit", lit(1)),
            Seq("query_id", "vec_id"), "left")
          .groupBy()
          .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        hits.crossJoin(scanned).select(
          lit(np).as("n_probe"),
          lit(probeRows.size.toLong).as("cells_touched"),
          col("codes_scanned"), col("n_exact"), col("n_hit"),
          longDiv(col("n_hit") * lit(1000000L), col("n_exact"))
            .as("recall_ppm"))
      }.reduce(_ unionByName _).orderBy("n_probe")
    }),

    // C103 sensitive-value EVENNESS audit — the within-group property
    // distinct-l (c94) can't express: a group of 50 with 49 members
    // in one balance band and 1 in another is "2-diverse" by count
    // yet an attacker's guess is right 96% of the time. The inverse
    // Simpson index (Hill number of order 2 — the effective number of
    // EQUALLY-LIKELY sensitive values: n²/Σcnt²) measures the guess
    // odds directly and is integer-exact: simpson_ppm = Σcnt²·1e6//n²
    // (the attacker's match probability), eff_classes_ppm =
    // n²·1e6//Σcnt², flag = at least 3.0 effective classes — the
    // evenness-aware analog of c94's distinct-l ≥ 3. Planted
    // near-degenerate cell (every 13th customer re-published under
    // nation 88 with 12-of-13 balances forced into one band) passes
    // distinct-l (three bands present at sf>=0.01: two rare, one
    // dominant) and must fail here. One map-combined agg over the
    // same QI grain as c71/c94/c99.
    "c103_evenness_audit" -> ((s, dir) => {
      val G = graft.functions.GraftExpressions
      val cust = t(s, dir, "customer")
      val planted = cust.where(col("c_custkey") % 13 === 0)
        .withColumn("c_nationkey",
          lit(88).cast(cust.schema("c_nationkey").dataType))
        .withColumn("c_mktsegment", lit("PLANTED2"))
        .withColumn("c_acctbal",
          when(col("c_custkey") % 169 === 0, lit(-500.0))
            .when(col("c_custkey") % 169 === 13, lit(3000.0))
            .otherwise(lit(9000.0))
            .cast(cust.schema("c_acctbal").dataType))
      val band = G.longDiv(
        round(col("c_acctbal") * 100).cast("long") + lit(100000000L),
        lit(200000L))
      cust.unionByName(planted)
        .select(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
        .groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(sum("cnt").as("n"), countDistinct(col("band")).as("l_distinct"),
          sum(col("cnt") * col("cnt")).as("__s2"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          col("l_distinct"),
          G.longDiv(col("__s2") * lit(1000000L), col("n") * col("n"))
            .as("simpson_ppm"),
          G.longDiv(col("n") * col("n") * lit(1000000L), col("__s2"))
            .as("eff_classes_ppm"))
        .withColumn("evenness_ok", col("eff_classes_ppm") >= 3000000L)
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // C100 WHOLE-document bin packing — the variant C22 deliberately
    // is not: c22 cuts documents at the budget boundary (right for
    // causal-LM pretraining), this keeps every document INTACT in
    // exactly one bin (contrastive pairs, instruction tuning, eval
    // shards). Next-fit decreasing per (source × id-band) shard: a
    // strict sequential recurrence (each verdict depends on the
    // running fill — no window form exists), so the engine runs it as
    // an O(1)-state sorted-partition fold and the oracle replays it
    // as a rank-synchronous recursive CTE (the d32 discipline).
    // Planted oversized docs (every 97th id, +300 tokens > budget)
    // exercise the own-bin overflow path — visible, not dropped.
    // Output: per-bin rollup with an order-insensitive doc-id digest,
    // so one misplaced document anywhere breaks the hash.
    "c100_whole_doc_packing" -> ((s, dir) => {
      import graft.operators.Chunking
      val G = graft.functions.GraftExpressions
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("tk"))
      val corpus = base.unionByName(base.where(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          (col("tk") + 300L).as("tk")))
      Chunking.packWholeDocs(corpus, "doc_id", "tk", "source",
          nBands = 4, budget = 256L)
        .groupBy("source", "band", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("tk").as("fill_tokens"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("docs_fp"))
        .select(col("source"), col("band"), col("bin"), col("n_docs"),
          col("fill_tokens"),
          G.longDiv(col("fill_tokens") * lit(1000000L), lit(256L))
            .as("util_ppm"),
          (col("fill_tokens") > 256L).as("overflow"), col("docs_fp"))
        .orderBy("source", "band", "bin")
    }),

    // C102 embedding-drift REINDEX gate — the operational question the
    // C85 blue/green machinery can't answer by itself: the IVF index
    // was trained on yesterday's corpus; has today's arrival
    // distribution moved enough that the frozen cells are imbalanced
    // and a rebuild is due? Measure: the REFERENCE slice (even ids —
    // the index's training corpus) and the ARRIVING slice (odd ids)
    // are both assigned to the FROZEN cells (centroids from the
    // reference side only); the gate compares cell-occupancy
    // histograms by integer-exact total-variation distance (ppm) plus
    // each side's max cell share. Two scenarios in one output: the
    // stable control (arrivals drawn from the same distribution —
    // only sampling-noise TV, no rebuild) and a planted drift
    // (arrivals collapsed into one orthant via element-wise |x| — the
    // one-topic-crawl shape: occupancy concentrates, rebuild fires;
    // an isometric scramble like reversal would NOT move occupancy,
    // which is exactly why the gate measures the histogram).
    // All integers: |cntA·NB − cntB·NA| summed over the dense cell
    // domain // (2·NA·NB). At 100 TB: two code scans + a 16-row
    // histogram — the decision table costs two passes, never a
    // rebuild-to-find-out.
    "c102_reindex_gate" -> ((s, dir) => {
      import graft.functions.GraftExpressions._
      val G = graft.functions.GraftExpressions
      val signs = jlSigns(16, 64)
      val emb = t(s, dir, "embeddings")
      val ref = emb.where(col("vec_id") % 2 === 0)
        .select(col("vec_id"), jlProject(col("embedding"), signs).as("code"))
      val cents: Array[Array[Long]] = ref.where(col("vec_id") < 32)
        .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)
      val arrivals = emb.where(col("vec_id") % 2 === 1)
      def hist(coded: org.apache.spark.sql.DataFrame) = {
        import s.implicits._
        val counts = coded
          .withColumn("cell", intCellAssign(col("code"), cents))
          .groupBy("cell").agg(count(lit(1)).as("cnt"))
        // dense 16-cell domain: an empty cell still contributes to TV
        (0 until 16).toDF("cell").join(counts, Seq("cell"), "left")
          .na.fill(0L, Seq("cnt"))
      }
      val refHist = hist(ref)
      val scenarios = Seq(
        "drifted" -> arrivals.select(col("vec_id"),
          jlProject(transform(col("embedding"), x => abs(x)), signs)
            .as("code")),
        "stable" -> arrivals.select(col("vec_id"),
          jlProject(col("embedding"), signs).as("code")))
      scenarios.map { case (name, newCoded) =>
        val joined = refHist.select(col("cell"), col("cnt").as("ca"))
          .join(hist(newCoded).select(col("cell"), col("cnt").as("cb")),
            "cell")
        val totals = joined.groupBy()
          .agg(sum("ca").as("n_ref"), sum("cb").as("n_new"),
            max(col("ca")).as("__ma"), max(col("cb")).as("__mb"))
        joined.crossJoin(totals)
          .groupBy("n_ref", "n_new", "__ma", "__mb")
          .agg(sum(abs(col("ca") * col("n_new") -
            col("cb") * col("n_ref"))).as("__num"))
          .select(lit(name).as("scenario"), col("n_ref"), col("n_new"),
            G.longDiv(col("__num") * lit(1000000L),
              col("n_ref") * col("n_new") * lit(2L)).as("tv_ppm"),
            G.longDiv(col("__ma") * lit(1000000L), col("n_ref"))
              .as("max_share_ref_ppm"),
            G.longDiv(col("__mb") * lit(1000000L), col("n_new"))
              .as("max_share_new_ppm"))
          .withColumn("rebuild", col("tv_ppm") > 200000L)
      }.reduce(_ unionByName _).orderBy("scenario")
    }),

    // C99 t-closeness audit — the distribution property c71/c94 can't
    // see: a QI group can be k-big (c71) and l-diverse (c94) while its
    // sensitive-value DISTRIBUTION is wildly skewed vs the corpus
    // (Li, Li & Venkatasubramanian 2007). For ORDERED banded values
    // (the c94 balance bands) the right distance is the 1-D earth
    // mover's: EMD = mean |cumulative difference| across bands,
    // computed here as exact integers — |cum_g·N − cum·N_g| summed,
    // then one truncating ppm division by N_g·N·(B−1). A planted QI
    // cell (every 11th customer re-published under nation 77 /
    // 'PLANTED' with its balance forced to the top band) passes
    // l-diversity-style size checks but must be flagged here. One agg
    // per grain + a bands-domain cross join (groups × B rows — tiny);
    // at 100 TB the only corpus-scale pass is the first binning agg.
    "c99_t_closeness" -> ((s, dir) => {
      val G = graft.functions.GraftExpressions
      val cust = t(s, dir, "customer")
      val planted = cust.where(col("c_custkey") % 11 === 0)
        .withColumn("c_nationkey",
          lit(77).cast(cust.schema("c_nationkey").dataType))
        .withColumn("c_mktsegment", lit("PLANTED"))
        .withColumn("c_acctbal",
          lit(9999.0).cast(cust.schema("c_acctbal").dataType))
      val band = G.longDiv(
        round(col("c_acctbal") * 100).cast("long") + lit(100000000L),
        lit(200000L))
      val binned = cust.unionByName(planted)
        .select(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
      val corpusBands = binned.groupBy("band").agg(count(lit(1)).as("cb"))
      val totals = corpusBands
        .agg(sum("cb").as("n_total"), count(lit(1)).as("n_bands"))
      val groups = binned.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val gb = binned.groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("gbn"))
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey", "c_mktsegment").orderBy("band")
      groups.crossJoin(broadcast(corpusBands))
        .join(gb, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .na.fill(0L, Seq("gbn"))
        .crossJoin(broadcast(totals))
        .withColumn("cum_g", sum("gbn").over(wOrd))
        .withColumn("cum_c", sum("cb").over(wOrd))
        .withColumn("term",
          abs(col("cum_g") * col("n_total") - col("cum_c") * col("n")))
        .groupBy("c_nationkey", "c_mktsegment", "n", "n_total", "n_bands")
        .agg(sum("term").as("sumterm"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          G.longDiv(col("sumterm") * lit(1000000L),
            col("n") * col("n_total") * (col("n_bands") - lit(1L)))
            .as("emd_ppm"))
        .withColumn("t_ok", col("emd_ppm") <= 300000L)
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // C27: duplicated-span scan (exact substring dedup at 16-word
    // granularity, stride 1). Every 10th document gets a planted
    // id-shifted copy, so dup spans exist deterministically; natural
    // within-corpus 16-gram repeats are counted too (both engines see
    // the same ones — the hash is md5 of the joined window).
    "c27_span_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.unionByName(
        docs.where(pmod(col("doc_id"), lit(10)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      Dedup.duplicatedSpans(corpus, "text", "doc_id", w = 16)
        .orderBy("id")
    }),

    // C29: duplicated-span REMOVAL over the same planted corpus as c27 —
    // canonical (first) occurrences survive, every other occurrence's
    // tokens are dropped and the rewritten text is md5-fingerprinted.
    // Planted copies must come out empty (kept_tokens = 0): every window
    // of a copy duplicates its original.
    "c29_span_removal" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.unionByName(
        docs.where(pmod(col("doc_id"), lit(10)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      Dedup.removeDuplicatedSpans(corpus, "text", "doc_id", w = 16)
        // always-true filter on COMPUTED columns: without it a bare
        // count() action (the bench) lets Catalyst drop the unique-key
        // left join and skip the entire span/removal pipeline — the
        // bench would time a document count, not the operator
        .where(col("n_tokens") + col("kept_tokens") >= 0)
        .orderBy("id")
    }),

    // C76: multi-scale duplicated-span detection — the c27 scan at
    // DOUBLING widths (8, 16, 32) over the same planted corpus: a
    // duplicated substring of token length L fires every level ≤ L, so
    // the largest firing level brackets the duplication's length within
    // 2x (the suffix-array length axis, recovered at k token-linear
    // passes). Long-form output: one row per (doc, level).
    "c76_multiscale_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.unionByName(
        docs.where(pmod(col("doc_id"), lit(10)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      Dedup.multiScaleSpans(corpus, "text", "doc_id", Seq(8, 16, 32))
        .orderBy("id", "w")
    }),

    // C76c: extent-STRIP rewrite — the other arm of the strip-vs-drop
    // decision: where c29 keeps one canonical occurrence per duplicated
    // window (dedup), this removes EVERY occurrence (boilerplate strip)
    // and rebuilds the survivors; same output shape as c29 so the two
    // rewrites compare directly. SERVED from the C125 digest store (the
    // r15 verdict's ask #4): the tokenize+digest pass — the
    // stage-probe-measured majority of the span-family cost — leaves
    // the plan; the rebuild's own token read stays (a rewrite
    // inherently writes surviving tokens). Oracle = the c29 replica
    // without the canonical exemption, UNCHANGED.
    "c76c_extent_strip" -> ((s, dir) => {
      import graft.sources.SpanStore
      val root = spanDigestsRoot(s, dir)
      val v = SpanStore.committedSpecVersion(s, root)
      Dedup.stripDuplicatedExtentsFromDigests(spanDupCorpus(s, dir),
          "text", "doc_id", SpanStore.readDigests(s, root, v, 16), w = 16)
        .where(col("n_tokens") + col("kept_tokens") >= 0)
        .orderBy("id")
    }),

    // C84: extent-granularity CANONICAL strip — the composition between
    // c29 (keep one canonical per duplicated WINDOW) and c76c (strip
    // every occurrence): firing windows merge to maximal extents,
    // extents cluster by exact token content, the least (doc, start)
    // member survives intact, every other member strips whole. Oracle =
    // the c76c replica plus the exemption (token-coverage islands →
    // extents → content-md5 clusters → min-enc canonical).
    // SERVED from the C125 digest store (the r15 verdict's ask #4) —
    // the digest map pass leaves the plan; oracle UNCHANGED.
    "c84_canonical_extent_strip" -> ((s, dir) => {
      import graft.sources.SpanStore
      val root = spanDigestsRoot(s, dir)
      val v = SpanStore.committedSpecVersion(s, root)
      Dedup.canonicalStripExtentsFromDigests(spanDupCorpus(s, dir),
          "text", "doc_id", SpanStore.readDigests(s, root, v, 16), w = 16)
        .where(col("n_tokens") + col("kept_tokens") >= 0)
        .orderBy("id")
    }),

    // C87: QUALITY-aware extent canonical — C36's keep-the-best-copy
    // rule at C84's granularity: each extent cluster keeps the member
    // whose HOST document scores highest (ties to least (doc, start)).
    // The planted corpus makes quality DECISIVE, not decorative: every
    // 10th original is degraded with a junk tail while its +1e6 copy
    // stays clean — min-enc (c84) would keep the degraded original;
    // the quality rule must keep the clean higher-id copy.
    // SERVED from its OWN digest store (a corpus variant is its own
    // store — the degraded tails change the degraded docs' digests);
    // oracle UNCHANGED.
    "c87_quality_extent_strip" -> ((s, dir) => {
      import graft.sources.SpanStore
      val root = spanQualityDigestsRoot(s, dir)
      val v = SpanStore.committedSpecVersion(s, root)
      Dedup.canonicalStripExtentsFromDigests(spanQualityCorpus(s, dir),
          "text", "doc_id", SpanStore.readDigests(s, root, v, 16), w = 16,
          quality = Some(TextFunctions.qualityScore(col("text"))))
        .where(col("n_tokens") + col("kept_tokens") >= 0)
        .orderBy("id")
    }),

    // C76b: duplicated-span EXTENTS — the c76 ladder completed with
    // WHERE: firing windows merged into maximal (start_tok, end_tok)
    // intervals per (doc, level) via a per-document gaps-and-islands
    // sweep, so curation can strip the actual duplicated stretches.
    // Oracle = a DIFFERENT algorithm (token-coverage islands: explode
    // each firing window into its covered token positions, distinct,
    // then the pos − row_number() islands trick) — interval-sweep and
    // token-set must agree extent-for-extent.
    "c76b_span_extents" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.unionByName(
        docs.where(pmod(col("doc_id"), lit(10)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      Dedup.spanExtents(corpus, "text", "doc_id", Seq(8, 16, 32))
        .orderBy("id", "w", "start_tok")
    }),

    // C32: Unicode text normalization (codegen'd NormalizeTextExpr: NFC
    // composition + control-strip + whitespace collapse + trim). The
    // corpus text is ASCII, so non-trivial inputs are PLANTED around it:
    // a combining accent that must compose, a tab, a BEL control, double
    // spaces, and a precomposed é that must pass through — md5 of the
    // normalized text makes any byte-level divergence fatal.
    "c32_normalize" -> ((s, dir) => {
      val raw = concat(lit("  á\tb "), col("text"),
        lit(" xy  café é  "))
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.GraftExpressions.normalizeText(raw).as("norm"))
        .select(col("doc_id"), md5(col("norm")).as("norm_md5"),
          length(col("norm")).as("n_chars"))
        .orderBy("doc_id")
    }),

    // C31: SemDeDup — semantic dedup confined inside k-means clusters.
    // Copies of every 5th vector are planted; with the corpus's max
    // natural pairwise cosine at ~0.51, τ=0.9 is crossed ONLY by the
    // planted identical pairs, so the drop set is exact in both engines
    // (the same boundary-safety argument as c5); non-identical near-dup
    // behavior is locked in ClusteringSpec.
    "c31_semdedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val withCopies = emb.unionByName(
        emb.where(pmod(col("vec_id"), lit(5)) === 0)
          .withColumn("vec_id", col("vec_id") + lit(1000000L)))
      // k scales with corpus size (semDedupK: ~300-vector cells, floor 8)
      // so the within-cluster pair join stays linear as n grows; capacity
      // from parquet footers (no count() scan), planted copies ≈ n/5.
      // ORACLE SYNC: the DuckDB replica hardcodes LIMIT 8 — the formula
      // yields exactly 8 at every n ≤ 2000 base rows, which covers the
      // sf0.01 verification scale (200 rows); bench probes at 10x+ get a
      // proportionally larger k, which is the point.
      val n = graft.operators.BloomDedup.footerRowCount(emb)
        .getOrElse(emb.count())
      val k = graft.operators.Clustering.semDedupK(n + n / 5)
      graft.operators.Clustering.semDedup(
          withCopies, "vec_id", "embedding", k = k, tau = 0.9)
        .groupBy("list")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(col("dropped"), col("id")).otherwise(0L)).as("dropped_id_sum"))
        .orderBy("list")
    }),

    // C30: n-gram LM perplexity filter (CCNet-style) — bigram model
    // trained on the corpus itself, every doc scored by smoothed bigram
    // perplexity, kept under a fixed threshold. The whole pipeline
    // (tokenize → counts → joins → exp(−mean ln p)) is replicated in
    // DuckDB, so model training and scoring are BOTH under the oracle.
    "c30_perplexity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = graft.operators.LanguageModel.train(docs, "text")
      graft.operators.LanguageModel.perplexity(docs, "doc_id", "text", lm)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("ppl"), 3).as("ppl"),
          (col("ppl") <= 30.5).as("keep"))
        .orderBy("doc_id")
    }),

    // C104 image-code STORE serving — the r13 verdict's top ask: c97
    // re-decoded the whole image corpus inside every query; here the
    // blockhash codes are published ONCE per corpus through the
    // versioned ImageCodeStore (spec v1, two ingest epochs by media-id
    // parity, epoch 1 REPLAYED — the C82 incremental discipline on the
    // image surface) and the dedup query reads the ~36-byte/image code
    // table: no decode anywhere in the timed plan. Oracle = the c97
    // pair replay UNCHANGED — pairs-from-stored-codes must hash-equal
    // pairs-from-decode, which a lossy round trip, a version mix-up,
    // or a non-idempotent replay cannot fake (the replay gate below
    // makes duplication loud BEFORE the pair rollup would collapse it).
    "c104_image_code_serve" -> ((s, dir) => {
      import graft.sources.ImageCodeStore
      val root = imageCodesRoot(s, dir)
      val v = ImageCodeStore.committedSpecVersion(s, root)
      val stored = ImageCodeStore.readCodes(s, root, v)
      // replay visibility: perceptualPairs' groupBy(id_a,id_b) would
      // collapse duplicated code rows, so exactly-once is gated here —
      // one stored row per media id, loudly
      val dup = stored.groupBy("media_id").agg(count(lit(1)).as("__c"))
        .where(col("__c") > 1).count()
      require(dup == 0,
        s"$dup media ids stored more than once — epoch replay broke " +
          "the D8 partition rule")
      graft.operators.ImageDedup.perceptualPairs(stored,
          maxHamming = 3, hotBucketCap = 64)
        .orderBy("id_a", "id_b")
    }),

    // C105 audio duplicate-CLUSTER resolution + canonical selection —
    // the r13 verdict's ask #2: c12k/m/n stopped at candidate PAIRS,
    // so a crawl could SEE its gain-shifted audio duplicates but not
    // DROP them. The c12n amplitude-invariant chained-landmark pairs
    // (the matcher that survives re-mastered volume) are resolved to
    // connected components (dupClusters — checkpointed pair set, the
    // c97b rule) and each cluster elects a canonical clip: longest
    // REAL-DECODED duration, ties to the smallest id (so the planted
    // half-gain copy at +3e6 always collapses into its base). Oracle =
    // the c12n landmark replay + a transitive-closure recursive CTE +
    // the same election — a DIFFERENT algorithm from the engine's
    // min-label propagation, same fixpoint (the strongest-oracle
    // rule); the sorted member digest makes one mis-clustered clip
    // anywhere break the hash.
    "c105_audio_dup_clusters" -> ((s, dir) => {
      import graft.operators.{Audio, Dedup}
      val corpus = audioDupCorpus(s, dir)
      // r18: ONE decode pass — chainedLandmarkRows carries the decoded
      // clip length on its META rows (anchor = -1, one per decodable
      // clip; every packWav clip has >= 800 samples so the META set IS
      // decodeWav's id set), so both the duration-blocking lens AND
      // the landmark pairs derive from a single decode+WHT pass where
      // this query previously paid the WAV decode twice (decodeWav for
      // lens + chainedFingerprintPairs' own decode).
      val rows = Audio.chainedLandmarkRows(s, corpus).persist()
      // REAL decoded clip lengths — used twice: the duration-blocking
      // filter below and the canonical election
      val lens = rows.where(col("anchor") === -1)
        .select(col("media_id").as("id"),
          col("n_samples").cast("long").as("n_samples"))
        .localCheckpoint(true)
      // duration blocking: a gain-shifted COPY preserves its sample
      // count exactly, while the synthetic LCG corpus's cross-length
      // phase coincidences do not — merging clips of different
      // durations into one "duplicate" family is a false positive a
      // production dedup must not make (and without the block, the
      // whole phase-coincident corpus chains into ONE cluster — the
      // b32-class corpus artifact, here cut at the operator's own
      // contract instead of excluded). The length frame is KB-sized —
      // AQE broadcasts the join-backs.
      val rawPairs = Audio.chainedPairsFromCodes(rows, minShared = 4)
      // localCheckpoint BEFORE the propagation loop (the c97b lesson):
      // the pair plan is deep (WAV decode mapPartitions + WHT + chain
      // join) and each CC round re-nests its input plan
      val pairs = rawPairs
        .join(lens.select(col("id").as("id_a"),
          col("n_samples").as("__na")), "id_a")
        .join(lens.select(col("id").as("id_b"),
          col("n_samples").as("__nb")), "id_b")
        .where(col("__na") === col("__nb"))
        .select("id_a", "id_b").localCheckpoint(true)
      rows.unpersist() // lens + pairs are both checkpointed — decode done
      // maxIter 96: phase-coincident LCG families can CHAIN (the c97b
      // diameter lesson on the audio surface); propagation is
      // O(diameter) rounds over the checkpointed KB pair set
      val labels = Dedup.dupClusters(pairs, maxIter = 96)
      val out = labels.join(lens, "id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("cluster_size"),
          max(struct(col("n_samples"), (-col("id")).as("__nid")))
            .as("__m"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(col("id"))),
            x => x.cast("string")))).as("members_fp"))
        .select(col("cluster_id"), col("cluster_size"),
          (-col("__m.__nid")).as("canonical_id"),
          col("__m.n_samples").as("canonical_len"), col("members_fp"))
        .orderBy("cluster_id")
      out
    }),

    // D40 streaming TOKENIZER ROLLOVER (batch-identical gate) — the
    // c96 twin of d39, the r13 verdict's ask #3: each arriving
    // training-schedule epoch EXTENDS the BPE trajectory by 12 merges
    // (BpeTrain.continueMerges — literally the one-shot trainer's loop
    // body resumed, so depth-12-then-12-more ≡ one-shot depth-24 BY
    // CONSTRUCTION) and publishes the deepened vocabulary through
    // TokenizerStore. A redelivered epoch is a structural no-op twice
    // over (state contiguity no-op + the MultiPublish batch
    // watermark); a pinned encode session is byte-stable through the
    // flip (TokenizerRolloverStreamSpec drives the real writeStream
    // sink). The published v1/v2 ARE the c77 trajectory states at
    // depths 12/24, so the c96 oracle gates the streamed snapshots
    // unchanged — the d39/c95 batch-twin discipline on the tokenizer.
    "d40_tokenizer_rollover" -> ((s, dir) => {
      import graft.operators.BpeTrain
      import graft.sources.TokenizerStore
      import graft.streaming.TokenizerRolloverStream
      import org.apache.hadoop.fs.Path
      val docs = t(s, dir, "documents")
      val root = Tables.scratch("d40_tok_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val st = new TokenizerRolloverStream.TokenizerTrainState(
        docs, "text", depthPerEpoch = 12)
      (0 to 1).foreach { e =>
        val rep = TokenizerRolloverStream.foldAndPublish(s, st, e.toLong,
          root)
        require(rep.committed, s"epoch $e publish failed: ${rep.failures}")
      }
      require(TokenizerStore.committedTokenizerVersion(s, root) == 2,
        "expected v2 after two epochs")
      // redelivered latest epoch: fold no-op + watermark-skipped publish
      val replay = TokenizerRolloverStream.foldAndPublish(s, st, 1L, root)
      require(replay.replaySkipped && !replay.committed,
        s"replayed epoch must be watermark-skipped: $replay")
      require(TokenizerStore.committedTokenizerVersion(s, root) == 2,
        "replay must not move the pointer")
      // blue pin through the rollover + the flipped committed view
      val tok1 = TokenizerStore.loadTokenizerAt(s, root, 1)
      val tok2 = TokenizerStore.loadTokenizer(s, root)
      require(tok1.merges.size == 12 && tok1.trainedAtEpoch == 12L &&
        tok2.merges.size == 24 && tok2.trainedAtEpoch == 24L,
        s"loaded meta off: ${tok1.merges.size}@${tok1.trainedAtEpoch} / " +
          s"${tok2.merges.size}@${tok2.trainedAtEpoch}")
      st.close()
      val f1 = BpeTrain
        .fertilityUnderMerges(docs, "text", "source", tok1.merges)
        .withColumn("version", lit(1))
      val f2 = BpeTrain
        .fertilityUnderMerges(docs, "text", "source", tok2.merges)
        .withColumn("version", lit(2))
      f1.unionByName(f2)
        .select("version", "source", "n_words", "n_tokens", "n_chars",
          "fertility_ppm", "chars_per_token_ppm")
        .orderBy("version", "source")
    }),

    // C106 bounded-open-bin BEST-FIT-DECREASING packing — the fill-rate
    // upgrade c100's §7 note promised: NFD closes a bin the moment one
    // doc misses; BFD with a k=3 open-bin set keeps the 60%-full bin
    // alive until a small doc tops it off. Same corpus, same planted
    // oversized docs (own immediately-closed bin, never an open slot),
    // same per-bin rollup as c100 — so the two keys' util_ppm columns
    // are directly comparable fill-rate evidence. The oracle replays
    // the whole slot machine (eligibility, fullest-fits election,
    // first-empty placement, fullest-evicted closure) as a k-column
    // rank-synchronous recursive CTE — the d32/c100 discipline with
    // STATE WIDTH k.
    "c106_bounded_bin_packing" -> ((s, dir) => {
      import graft.operators.Chunking
      val G = graft.functions.GraftExpressions
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("tk"))
      val corpus = base.unionByName(base.where(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          (col("tk") + 300L).as("tk")))
      Chunking.packWholeDocsBounded(corpus, "doc_id", "tk", "source",
          nBands = 4, budget = 256L, openBins = 3)
        .groupBy("source", "band", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("tk").as("fill_tokens"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("docs_fp"))
        .select(col("source"), col("band"), col("bin"), col("n_docs"),
          col("fill_tokens"),
          G.longDiv(col("fill_tokens") * lit(1000000L), lit(256L))
            .as("util_ppm"),
          (col("fill_tokens") > 256L).as("overflow"), col("docs_fp"))
        .orderBy("source", "band", "bin")
    }),

    // D44 streaming whole-doc packing — c106's slot machine folded
    // ACROSS arrival epochs (the r14 verdict's ask #5): under
    // continuous arrival the open bins must survive the trigger (a bin
    // left 60% full by epoch 0 takes the small doc arriving in epoch
    // 2), so the O(k) slot state lives in a keyed GroupState per
    // (source, band) shard. This key runs the BATCH TWIN
    // (packWholeDocsBoundedEpochs — the same BinSlots.place the stream
    // drives, epoch-major order, BFD within an epoch) over the c106
    // corpus with arrival epoch = doc_id % 3; PackingStreamSpec locks
    // stream ≡ twin through real triggers, cross-batch bin reuse
    // included. Oracle = the c106 recursive slot-machine CTE re-ranked
    // by arrival epoch — a fold that dropped state at an epoch
    // boundary (or leaked it across shards) could not hash-match.
    "d44_stream_packing" -> ((s, dir) => {
      import graft.operators.Chunking
      val G = graft.functions.GraftExpressions
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("tk"))
      val corpus = base.unionByName(base.where(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          (col("tk") + 300L).as("tk")))
        .withColumn("ep", pmod(col("doc_id"), lit(3)))
      Chunking.packWholeDocsBoundedEpochs(corpus, "doc_id", "tk",
          "source", "ep", nBands = 4, budget = 256L, openBins = 3)
        .groupBy("source", "band", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("tk").as("fill_tokens"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("docs_fp"))
        .select(col("source"), col("band"), col("bin"), col("n_docs"),
          col("fill_tokens"),
          G.longDiv(col("fill_tokens") * lit(1000000L), lit(256L))
            .as("util_ppm"),
          (col("fill_tokens") > 256L).as("overflow"), col("docs_fp"))
        .orderBy("source", "band", "bin")
    }),

    // C128 INCREMENTAL image pairs from stored codes — c121's
    // incremental-crawl shape on the image surface: yesterday's media
    // (the hero images) have their codes SITTING in the C104 store —
    // a stored-key filter, never a re-decode; only today's increment
    // (the re-encoded + brightness-shifted arrivals) pays a decode.
    // The hot-bucket census runs over the UNION (identical codes
    // always still meet — the c2b rule) and only REF × INC pairs are
    // emitted. Oracle = the c97 chain restricted to the cross slice —
    // the same candidates, the same escalation, the same hamming.
    "c128_image_incremental_pairs" -> ((s, dir) => {
      import graft.operators.ImageDedup
      import graft.sources.ImageCodeStore
      val root = imageCodesRoot(s, dir)
      val v = ImageCodeStore.committedSpecVersion(s, root)
      val refCodes = ImageCodeStore.readCodes(s, root, v)
        .where(col("media_id") < 2000000L)
      val packed = ImageDedup.packImageVariants(s,
          t(s, dir, "documents"), "doc_id")
        .where(col("media_id") >= 2000000L)
      val incCodes = ImageDedup.blockhashCodes(s, packed)
      ImageDedup.perceptualCrossPairs(refCodes, incCodes,
          maxHamming = 3, hotBucketCap = 64)
        .orderBy("ref_id", "inc_id")
    }),

    // C129 INCREMENTAL audio pairs from stored landmarks — the same
    // shape on the audio surface: the reference corpus's landmarks sit
    // in the C115 store; only the re-mastered arrivals pay a decode +
    // WHT chain. Duration-blocked (the c105 contract) with the ref
    // durations read from the stored META rows. Oracle = the c105
    // synthesis→landmark chain restricted to the cross slice with the
    // shared-count threshold replayed.
    "c129_audio_incremental_pairs" -> ((s, dir) => {
      import graft.operators.Audio
      import graft.sources.AudioCodeStore
      val root = audioCodesRoot(s, dir)
      val v = AudioCodeStore.committedSpecVersion(s, root)
      val stored = AudioCodeStore.readCodes(s, root, v)
      val refCodes = stored.where(col("media_id") < 3000000L)
      val docs = t(s, dir, "documents").select("doc_id")
        .where(col("doc_id") % 4 === 0)
      val wavs = Audio.packWav(s, docs, "doc_id")
      val inc = Audio.gainWav(s,
        wavs.where(pmod(col("media_id"), lit(7)) === 0)
          .withColumn("media_id", col("media_id") + lit(3000000L)))
      val incCodes = Audio.chainedLandmarkRows(s, inc)
      val refMeta = refCodes.where(col("anchor") === -1)
        .select(col("media_id").as("ref_id"),
          col("n_samples").as("__nr"))
      val incMeta = incCodes.where(col("anchor") === -1)
        .select(col("media_id").as("inc_id"),
          col("n_samples").as("__ni"))
      Audio.chainedCrossPairsFromCodes(refCodes, incCodes, minShared = 4)
        .join(refMeta, "ref_id").join(incMeta, "inc_id")
        .where(col("__nr") === col("__ni"))
        .select("ref_id", "inc_id", "n_shared")
        .orderBy("ref_id", "inc_id")
    }),

    // C126 text-signature SPEC ROLLOVER across a REAL k/band change —
    // the C117/C122 blue/green story on the text store, completing the
    // rollover discipline on ALL FIVE versioned stores (ANN, image,
    // audio, text sigs, span digests): sv1 serves k=32/bands=8
    // signatures while the production k=64/bands=16 re-sign BACKFILLS
    // its own sv2 key space (epoch-partitioned, one epoch REPLAYED
    // both before and after the flip); the FLIP is the spec-v2 publish
    // (pointer commit — a session pinned at v1 is byte-stable through
    // it), and c120's vacuum retires the loser. The SIGNING is driven
    // by the loaded spec, so the rollover is a real re-sign. Serving
    // from the committed pin answers c2's question exactly.
    "c126_text_sig_rollover" -> ((s, dir) => {
      import graft.operators.Dedup
      import graft.sources.TextSigStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c126_roll_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val corpus = textSigCorpus(s, dir)
      lifecycleOncePerBenchJvm(s"c126:$dir") {
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        // blue: spec v1 = k 32, bands 8 — signed under the LOADED spec
        require(TextSigStore.publishSpec(s, root, "minhash", k = 32,
          bands = 8, shingleW = 3).committed)
        val (_, k1, _, _) = TextSigStore.loadSpecAt(s, root, 1)
        TextSigStore.appendSigsEpoch(
          Dedup.minhashSigRows(corpus, "text", "doc_id", k = k1),
          root, 1, 0L)
        def digest(v: Int): (Long, Long) = {
          val r = TextSigStore.readSigs(s, root, v)
            .agg(count(lit(1)).as("n"),
              bit_xor(xxhash64(col("doc_id"), col("sig"))).as("x"))
            .collect().head
          (r.getLong(0), r.getLong(1))
        }
        val pin1 = digest(1)
        // green backfill: k=64 signatures land in sv2 WHILE v1 serves
        val sigs64 = Dedup.minhashSigRows(corpus, "text", "doc_id", k = 64)
          .persist()
        try {
          TextSigStore.appendSigsEpoch(
            sigs64.where(pmod(col("doc_id"), lit(2)) === 0), root, 2, 0L)
          TextSigStore.appendSigsEpoch(
            sigs64.where(pmod(col("doc_id"), lit(2)) === 1), root, 2, 1L)
          TextSigStore.appendSigsEpoch(
            sigs64.where(pmod(col("doc_id"), lit(2)) === 1), root, 2, 1L)
          require(TextSigStore.committedSpecVersion(s, root) == 1,
            "a backfill must not move the committed pointer")
          val pre = digest(2)
          // the FLIP: publish spec v2 (k 64, bands 16) — a pointer commit
          require(TextSigStore.publishSpec(s, root, "minhash", 64, 16, 3)
            .committed)
          require(TextSigStore.committedSpecVersion(s, root) == 2,
            "the flip must land the committed pointer on v2")
          require(digest(1) == pin1,
            "the pinned v1 key space moved across the flip")
          TextSigStore.appendSigsEpoch(
            sigs64.where(pmod(col("doc_id"), lit(2)) === 1), root, 2, 1L)
          require(digest(2) == pre,
            "post-flip epoch replay duplicated stored signatures")
          val rep = TextSigStore.vacuumRetiredSigs(s, root, keepVersions = 1)
          require(rep.committed == 2 && rep.removed == Seq(1) &&
            rep.kept == Seq(2), s"vacuum accounting off: $rep")
        } finally { sigs64.unpersist(); () }
      }
      Dedup.minhashPairsFromSigs(
          requireOneSigPerDoc(TextSigStore.readSigs(s, root, 2)),
          corpus, "text", "doc_id", k = 64, bands = 16)
        .where(col("id_b") - col("id_a") === 1000000L)
        .orderBy("id_a", "id_b")
    }),

    // C127 span-digest SPEC ROLLOVER across a REAL ladder change —
    // the same blue/green contract on the span store: pv1 serves the
    // single-level {16} ladder while the full 8/16/32 ladder BACKFILLS
    // pv2 (per level, epoch-partitioned, one epoch replayed pre- and
    // post-flip), the flip is the spec-v2 publish with the v1 pin
    // byte-stable, and the vacuum retires pv1 whole (all width
    // subtrees). Serving from the committed pin answers c76's
    // multi-scale question exactly.
    "c127_span_spec_rollover" -> ((s, dir) => {
      import graft.operators.Dedup
      import graft.sources.SpanStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c127_roll_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      lifecycleOncePerBenchJvm(s"c127:$dir") {
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        val corpus = spanDupCorpus(s, dir)
        require(SpanStore.publishSpec(s, root, "span_md5", Seq(16))
          .committed)
        SpanStore.appendDigestsEpoch(
          Dedup.spanDigestRows(corpus, "text", "doc_id", 16), root, 1, 16, 0L)
        def digest(v: Int, w: Int): (Long, Long) = {
          val r = SpanStore.readDigests(s, root, v, w)
            .agg(count(lit(1)).as("n"),
              bit_xor(xxhash64(col("id"), col("pos"), col("h"))).as("x"))
            .collect().head
          (r.getLong(0), r.getLong(1))
        }
        val pin1 = digest(1, 16)
        val widths2 = Seq(8, 16, 32)
        widths2.foreach { w =>
          val rows = Dedup.spanDigestRows(corpus, "text", "doc_id", w)
            .persist()
          try {
            SpanStore.appendDigestsEpoch(
              rows.where(pmod(col("id"), lit(2)) === 0), root, 2, w, 0L)
            SpanStore.appendDigestsEpoch(
              rows.where(pmod(col("id"), lit(2)) === 1), root, 2, w, 1L)
            SpanStore.appendDigestsEpoch(
              rows.where(pmod(col("id"), lit(2)) === 1), root, 2, w, 1L)
          } finally { rows.unpersist(); () }
        }
        require(SpanStore.committedSpecVersion(s, root) == 1,
          "a backfill must not move the committed pointer")
        val pre = digest(2, 8)
        // the FLIP: publish spec v2 (the full ladder) — a pointer commit
        require(SpanStore.publishSpec(s, root, "span_md5", widths2)
          .committed)
        require(SpanStore.committedSpecVersion(s, root) == 2,
          "the flip must land the committed pointer on v2")
        require(digest(1, 16) == pin1,
          "the pinned v1 key space moved across the flip")
        SpanStore.appendDigestsEpoch(
          Dedup.spanDigestRows(corpus, "text", "doc_id", 8)
            .where(pmod(col("id"), lit(2)) === 1), root, 2, 8, 1L)
        require(digest(2, 8) == pre,
          "post-flip epoch replay duplicated stored digests")
        val rep = SpanStore.vacuumRetiredDigests(s, root, keepVersions = 1)
        require(rep.committed == 2 && rep.removed == Seq(1) &&
          rep.kept == Seq(2), s"vacuum accounting off: $rep")
        require(!fs.exists(new Path(
          s"$root/${SpanStore.DigestsTable}/pv1")),
          "retired key space must be gone whole (all width subtrees)")
      }
      val (_, widths) = SpanStore.loadSpecAt(s, root, 2)
      widths.map { w =>
        Dedup.duplicatedSpansFromDigests(
            SpanStore.readDigests(s, root, 2, w))
          .select(col("id"), lit(w).as("w"),
            col("n_spans"), col("n_dup_spans"))
      }.reduce(_ unionByName _).orderBy("id", "w")
    }),

    // C125 span-digest STORE serving — the stored-code discipline on
    // the sub-document family, aimed squarely at the measured cost:
    // the r15 stage probe showed c76's quiet 100x profile is DOMINATED
    // by the map-side tokenize+digest passes (27.7 of 41.7 summed
    // stage-wall seconds; no reduce hotspot). Those passes leave the
    // per-query plan entirely: the digest ladder is published ONCE per
    // corpus through the versioned SpanStore (spec = the 8/16/32
    // width ladder; per-level digest tables in two ingest epochs by
    // doc-id parity, epoch 1 REPLAYED — the D8 rule), and the serving
    // query runs ONLY the count aggregate + the hinted shuffle join
    // per level. Oracle = the c76 multi-scale replay UNCHANGED —
    // counts-from-stored must hash-equal counts-from-compute, and a
    // duplicated replay epoch would flip every window to duplicated
    // (loudly wrong, not silently absorbed).
    "c125_span_store_serve" -> ((s, dir) => {
      import graft.operators.Dedup
      import graft.sources.SpanStore
      val root = spanDigestsRoot(s, dir)
      val v = SpanStore.committedSpecVersion(s, root)
      val (_, widths) = SpanStore.loadSpecAt(s, root, v)
      widths.map { w =>
        Dedup.duplicatedSpansFromDigests(
            SpanStore.readDigests(s, root, v, w))
          .select(col("id"), lit(w).as("w"),
            col("n_spans"), col("n_dup_spans"))
      }.reduce(_ unionByName _).orderBy("id", "w")
    }),

    // C124 LPT shard BALANCING — the dual of c106: not "fewest bins
    // under a budget" but "k FIXED output shards, heaviest as light as
    // possible" (the balanced-export question a training run asks so
    // that equal-work loaders finish together). Classical longest-
    // processing-time: documents descending by tokens, each to the
    // currently lightest shard — mechanically the c106 slot fold with
    // all k bins pre-opened, no budget, and a least-loaded election,
    // so the oracle is the same rank-synchronous recursive CTE with
    // the election CASE flipped to min-fill. share_ppm makes the
    // balance a checked number, not a claim.
    "c124_lpt_shards" -> ((s, dir) => {
      import graft.operators.Chunking
      import org.apache.spark.sql.expressions.Window
      val G = graft.functions.GraftExpressions
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("tk"))
      val corpus = base.unionByName(base.where(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          (col("tk") + 300L).as("tk")))
      Chunking.lptShards(corpus, "doc_id", "tk", "source",
          nBands = 4, shards = 3)
        .groupBy("source", "band", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("tk").as("tokens"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("docs_fp"))
        .withColumn("share_ppm", G.longDiv(col("tokens") * lit(1000000L),
          sum("tokens").over(Window.partitionBy("source", "band"))))
        .select("source", "band", "shard", "n_docs", "tokens",
          "share_ppm", "docs_fp")
        .orderBy("source", "band", "shard")
    }),

    // C132 span EXTENTS from the store — the C125 serving argument
    // carried to the WHERE question: c76b re-digested the corpus to
    // locate the duplicated stretches; here the per-level digest
    // tables feed the duplicated-vocabulary filter, the hinted flag
    // join, and the per-document island sweep directly — the digest
    // map stages (the stage-probe-measured majority of the family's
    // cost) leave this plan too. Oracle = the c76b extent replay
    // UNCHANGED.
    "c132_extents_from_store" -> ((s, dir) => {
      import graft.operators.Dedup
      import graft.sources.SpanStore
      val root = spanDigestsRoot(s, dir)
      val v = SpanStore.committedSpecVersion(s, root)
      val (_, widths) = SpanStore.loadSpecAt(s, root, v)
      widths.map { w =>
        Dedup.spanExtentsFromDigests(
          SpanStore.readDigests(s, root, v, w), w)
      }.reduce(_ unionByName _).orderBy("id", "w", "start_tok")
    }),

    // C131 balanced SHARD EXPORT — c124's LPT assignment made an
    // artifact: the training-data interchange write (A19's JSONL
    // surface) with one directory per (source, band, shard), so
    // equal-work loaders map 1:1 onto files. The checked frame is the
    // c124 rollup computed FROM THE READ-BACK rows — the oracle gates
    // the exported bytes through the JSON round trip, not the
    // in-memory assignment (a writer that dropped, duplicated, or
    // mis-partitioned one row could not hash-match). Longs round-trip
    // JSON exactly; partition columns come back from the directory
    // names and are re-cast explicitly.
    "c131_shard_export" -> ((s, dir) => {
      import graft.operators.Chunking
      import org.apache.spark.sql.expressions.Window
      val G = graft.functions.GraftExpressions
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("tk"))
      val corpus = base.unionByName(base.where(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          (col("tk") + 300L).as("tk")))
      val assigned = Chunking.lptShards(corpus, "doc_id", "tk", "source",
        nBands = 4, shards = 3)
      // full-path hash in the scratch name (the langidModelRoot rule):
      // two dirs sharing a basename must not share an export directory
      val path = Tables.scratch("c131_exp_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      // co-locate each shard before the write: one task owns one
      // (source, band, shard) → one JSONL file per shard directory
      assigned.repartition(col("source"), col("band"), col("shard"))
        .write.mode("overwrite")
        .partitionBy("source", "band", "shard").json(path)
      val back = s.read.json(path)
        .select(col("source").cast("string").as("source"),
          col("band").cast("long").as("band"),
          col("shard").cast("long").as("shard"),
          col("doc_id").cast("long").as("doc_id"),
          col("tk").cast("long").as("tk"))
      require(back.count() == assigned.count(),
        "the export dropped or duplicated rows")
      back.groupBy("source", "band", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("tk").as("tokens"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("docs_fp"))
        .withColumn("share_ppm", G.longDiv(col("tokens") * lit(1000000L),
          sum("tokens").over(Window.partitionBy("source", "band"))))
        .select("source", "band", "shard", "n_docs", "tokens",
          "share_ppm", "docs_fp")
        .orderBy("source", "band", "shard")
    }),

    // C134 PACKING-AWARE shard export (the r15 verdict's ask #6) —
    // c106's bounded-BFD bin assignment made a training-data artifact:
    // the A19 JSONL surface with one directory per (source, band) and
    // the BIN as a SORTED row column inside each file — bins are the
    // ~budget-token BATCH unit, so bins-as-directories would mint one
    // tiny file per 256 tokens (measured: 21.9 s vs 2.4 s for the
    // shard-granularity c131 at sf0.1 — the A18 small-file pathology
    // at write time, catastrophic at 100 TB). Files stay shard-sized;
    // sortWithinPartitions(bin, doc_id) keeps each bin CONTIGUOUS in
    // its file, so a loader streams batch-by-batch without a shuffle.
    // The checked frame is the c106 per-bin rollup computed FROM THE
    // READ-BACK rows — the oracle gates the exported bytes through the
    // JSON round trip (a writer that dropped, duplicated, or
    // mis-binned one row could not hash-match the slot-machine
    // replay). Longs round-trip JSON exactly; partition columns come
    // back from the directory names and are re-cast explicitly.
    "c134_packed_export" -> ((s, dir) => {
      import graft.operators.Chunking
      val G = graft.functions.GraftExpressions
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("tk"))
      val corpus = base.unionByName(base.where(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          (col("tk") + 300L).as("tk")))
      val assigned = Chunking.packWholeDocsBounded(corpus, "doc_id",
        "tk", "source", nBands = 4, budget = 256L, openBins = 3)
      // full-path hash in the scratch name (the langidModelRoot rule)
      val path = Tables.scratch("c134_exp_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      // co-locate each (source, band) before the write — one task owns
      // one directory, bins contiguous within the file
      assigned.repartition(col("source"), col("band"))
        .sortWithinPartitions(col("bin"), col("doc_id"))
        .write.mode("overwrite")
        .partitionBy("source", "band").json(path)
      val back = s.read.json(path)
        .select(col("source").cast("string").as("source"),
          col("band").cast("long").as("band"),
          col("bin").cast("long").as("bin"),
          col("doc_id").cast("long").as("doc_id"),
          col("tk").cast("long").as("tk"))
      require(back.count() == assigned.count(),
        "the export dropped or duplicated rows")
      back.groupBy("source", "band", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("tk").as("fill_tokens"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("docs_fp"))
        .select(col("source"), col("band"), col("bin"), col("n_docs"),
          col("fill_tokens"),
          G.longDiv(col("fill_tokens") * lit(1000000L), lit(256L))
            .as("util_ppm"),
          (col("fill_tokens") > 256L).as("overflow"), col("docs_fp"))
        .orderBy("source", "band", "bin")
    }),

    // C107 CROSS-VERSION reindex gate — c102's integer-TV harness
    // pointed at STORED code generations (the r13 verdict's ask #5):
    // c102 re-assigns raw vectors on demand; here the decision reads
    // ONLY the version-keyed code tables the C85 machinery already
    // maintains. iv1 holds epoch 0 (the corpus the v1 index was built
    // from) and epoch 1 (arrivals appended under v1's FROZEN cells —
    // the C82 step blue serving performs anyway, epoch 1 replayed once
    // to exercise the D8 rule), so "did the corpus move between the v1
    // build and the v2 build?" is a TV between two epoch slices of one
    // stored table — zero re-encode, zero float reads, the common
    // frozen frame that makes the comparison meaningful. The v2
    // rebuild (centroid rule re-applied at T2) is also stored, and its
    // occupancy max-share shows the rebuilt index restoring balance in
    // the drifted scenario. Integer arithmetic end to end (the c102
    // contract); the oracle replays codes, both centroid sets,
    // assignments, histograms, and the TV from raw embeddings.
    "c107_cross_version_gate" -> ((s, dir) => {
      import graft.functions.GraftExpressions._
      import graft.sources.AnnIndexStore
      import org.apache.hadoop.fs.Path
      val G = graft.functions.GraftExpressions
      val signs = jlSigns(16, 64)
      val emb = t(s, dir, "embeddings")
      // (r18 note: persisting refCoded/arrCoded here was tried and
      // REVERTED — columnar-caching the long-array code column costs
      // far more than the jlProject re-encode it saves; measured
      // 3.5 s → 18.9 s. Recorded in OPTIMIZATION_r18.md.)
      val refCoded = emb.where(col("vec_id") % 2 === 0)
        .select(col("vec_id"), jlProject(col("embedding"), signs).as("code"))
      val cents1: Array[Array[Long]] = refCoded.where(col("vec_id") < 32)
        .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)
      def codesOf(coded: org.apache.spark.sql.DataFrame,
                  cents: Array[Array[Long]]) =
        coded.select(col("vec_id").as("neighbor_id"),
          intCellAssign(col("code"), cents).as("cell"),
          col("code").as("codes"))
      val scenarios = Seq(
        "drifted" -> emb.where(col("vec_id") % 2 === 1)
          .select(col("vec_id"),
            jlProject(transform(col("embedding"), x => abs(x)), signs)
              .as("code")),
        "stable" -> emb.where(col("vec_id") % 2 === 1)
          .select(col("vec_id"),
            jlProject(col("embedding"), signs).as("code")))
      scenarios.map { case (name, arrCoded) =>
        val root = Tables.scratch(s"c107_${name}_" +
          new java.io.File(dir).getName + "_" +
          java.lang.Integer.toHexString(
            scala.util.hashing.MurmurHash3.stringHash(dir)))
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        AnnIndexStore.appendCodesEpoch(codesOf(refCoded, cents1), root, 1, 0L)
        AnnIndexStore.appendCodesEpoch(codesOf(arrCoded, cents1), root, 1, 1L)
        // at-least-once delivery: epoch 1 redelivered (the D8 rule —
        // a duplicated arrival would double the epoch-1 histogram and
        // break the oracle, so replay safety is oracle-gated here)
        AnnIndexStore.appendCodesEpoch(codesOf(arrCoded, cents1), root, 1, 1L)
        // the v2 rebuild: the SAME centroid rule re-applied to the T2
        // corpus, stored under its own version key (the C85 contract)
        val t2 = refCoded.unionByName(arrCoded)
        val cents2: Array[Array[Long]] = t2.where(col("vec_id") < 32)
          .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)
        AnnIndexStore.appendCodesEpoch(codesOf(t2, cents2), root, 2, 0L)
        // ---- the gate: stored codes only, no floats, no re-encode ----
        import s.implicits._
        val iv1 = s.read
          .parquet(s"$root/${AnnIndexStore.CodesTable}/iv1")
          .select(col("cell"), col("__epoch").cast("long").as("ep"))
        def hist(df: org.apache.spark.sql.DataFrame) =
          (0 until 16).toDF("cell")
            .join(df.groupBy("cell").agg(count(lit(1)).as("cnt")),
              Seq("cell"), "left")
            .na.fill(0L, Seq("cnt"))
        val joined = hist(iv1.where(col("ep") === 0))
          .select(col("cell"), col("cnt").as("ca"))
          .join(hist(iv1.where(col("ep") === 1))
            .select(col("cell"), col("cnt").as("cb")), "cell")
        val totals = joined.groupBy()
          .agg(sum("ca").as("n_ref"), sum("cb").as("n_new"),
            max(col("ca")).as("__ma"), max(col("cb")).as("__mb"))
        val v2agg = s.read
          .parquet(s"$root/${AnnIndexStore.CodesTable}/iv2")
          .groupBy("cell").agg(count(lit(1)).as("__c2"))
          .groupBy().agg(sum("__c2").as("n_v2"), max("__c2").as("__mv2"))
        joined.crossJoin(totals)
          .groupBy("n_ref", "n_new", "__ma", "__mb")
          .agg(sum(abs(col("ca") * col("n_new") -
            col("cb") * col("n_ref"))).as("__num"))
          .crossJoin(v2agg)
          .select(lit(name).as("scenario"), col("n_ref"), col("n_new"),
            G.longDiv(col("__num") * lit(1000000L),
              col("n_ref") * col("n_new") * lit(2L)).as("tv_ppm"),
            G.longDiv(col("__ma") * lit(1000000L), col("n_ref"))
              .as("max_share_ref_ppm"),
            G.longDiv(col("__mb") * lit(1000000L), col("n_new"))
              .as("max_share_new_ppm"),
            col("n_v2"),
            G.longDiv(col("__mv2") * lit(1000000L), col("n_v2"))
              .as("max_share_v2_ppm"))
          .withColumn("rebuild", col("tv_ppm") > 200000L)
      }.reduce(_ unionByName _).orderBy("scenario")
    }),

    // C108 entropy-l diversity audit — the third of the four standard
    // diversity definitions beside c94 (distinct-l) / c103 (evenness)
    // / c99 (t-closeness): a QI group is entropy-l-diverse iff the
    // Shannon entropy of its sensitive distribution is ≥ ln(l)
    // (Machanavajjhala et al. 2007). Adjudication is INTEGER-EXACT
    // wherever the Hill-number sandwich decides it — N0 (distinct) ≥
    // exp(H) = N1 ≥ N2 (inverse Simpson, c103's eff_classes) — so
    // `eff_classes ≥ l` PROVES pass and `distinct < l` PROVES fail
    // with no transcendental anywhere; only the indeterminate band in
    // between falls back to the 4-decimal-rounded ln terms (the c30
    // transcendental contract), with the threshold 10987 (the smallest
    // integer strictly above ln(3)·10⁴). c103's planted skewed cell
    // (3 distinct bands, one dominant) passes distinct-l at l=3 and
    // must FAIL here — through the fallback path, since its bounds
    // straddle l.
    "c108_entropy_l_audit" -> ((s, dir) => {
      val G = graft.functions.GraftExpressions
      val cust = t(s, dir, "customer")
      val planted = cust.where(col("c_custkey") % 13 === 0)
        .withColumn("c_nationkey",
          lit(88).cast(cust.schema("c_nationkey").dataType))
        .withColumn("c_mktsegment", lit("PLANTED2"))
        .withColumn("c_acctbal",
          when(col("c_custkey") % 169 === 0, lit(-500.0))
            .when(col("c_custkey") % 169 === 13, lit(3000.0))
            .otherwise(lit(9000.0))
            .cast(cust.schema("c_acctbal").dataType))
      val band = G.longDiv(
        round(col("c_acctbal") * 100).cast("long") + lit(100000000L),
        lit(200000L))
      val counts = cust.unionByName(planted)
        .select(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
        .groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey", "c_mktsegment")
      counts
        .withColumn("n", sum("cnt").over(w))
        .withColumn("hterm", col("cnt") *
          round(log(col("n") / col("cnt")) * 10000).cast("long"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(max("n").as("n"), count(lit(1)).as("l_distinct"),
          sum(col("cnt") * col("cnt")).as("__s2"),
          sum("hterm").as("__hu"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          col("l_distinct"),
          G.longDiv(col("n") * col("n") * lit(1000000L), col("__s2"))
            .as("hill2_lb_ppm"),
          (col("l_distinct") * lit(1000000L)).as("hill0_ub_ppm"),
          G.longDiv(col("__hu"), col("n")).as("entropy_e4"))
        .withColumn("bound_decided",
          col("hill2_lb_ppm") >= 3000000L || col("l_distinct") < 3)
        .withColumn("entropy_l_ok",
          when(col("hill2_lb_ppm") >= 3000000L, lit(true))
            .when(col("l_distinct") < 3, lit(false))
            .otherwise(col("entropy_e4") >= 10987L))
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // C109 recursive-(c,l) diversity audit — the fourth definition,
    // and the only one that is integer-exact on EVERY group with no
    // fallback band: a group is recursive-(c,l)-diverse iff its most
    // common sensitive value is not a c-multiple of the tail beyond
    // the l-th (r₁ < c·(r_l + … + r_m) on the descending counts —
    // Machanavajjhala et al. 2007, §4). c=2, l=3 here. Pure sorted
    // integer counts; the tail SUM is invariant to tie order among
    // equal counts, so the window tie-break is cosmetic. The c103
    // plant (one dominant band, two rare) fails loudly; `distinct_ok`
    // rides along so the plant's distinct-l pass and recursive-(c,l)
    // fail sit in one row — the four-definition consistency the r13
    // verdict asked to see.
    "c109_recursive_cl_audit" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val G = graft.functions.GraftExpressions
      val planted = cust.where(col("c_custkey") % 13 === 0)
        .withColumn("c_nationkey",
          lit(88).cast(cust.schema("c_nationkey").dataType))
        .withColumn("c_mktsegment", lit("PLANTED2"))
        .withColumn("c_acctbal",
          when(col("c_custkey") % 169 === 0, lit(-500.0))
            .when(col("c_custkey") % 169 === 13, lit(3000.0))
            .otherwise(lit(9000.0))
            .cast(cust.schema("c_acctbal").dataType))
      val band = G.longDiv(
        round(col("c_acctbal") * 100).cast("long") + lit(100000000L),
        lit(200000L))
      val counts = cust.unionByName(planted)
        .select(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
        .groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey", "c_mktsegment")
        .orderBy(col("cnt").desc, col("band"))
      counts
        .withColumn("rn", row_number().over(w))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(sum("cnt").as("n"), count(lit(1)).as("m"),
          max("cnt").as("r1_cnt"),
          sum(when(col("rn") >= 3, col("cnt")).otherwise(0L))
            .as("tail_sum"))
        .withColumn("rcl_ok", col("r1_cnt") < lit(2L) * col("tail_sum"))
        .withColumn("distinct_ok", col("m") >= 3)
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // C112 audio CANONICAL-aware corpus strip — the step a crawl
    // actually takes with c105's clusters (the c84/c87 "strip" family
    // member on the audio surface): every clip that lost its
    // cluster's election is DROPPED; the kept corpus is each
    // cluster's canonical plus every unclustered singleton, tagged by
    // WHY it survived. One mis-kept gain copy or one over-dropped
    // singleton anywhere breaks the hash. Oracle = the c105 chain +
    // the same election + an anti-join replay of the keep rule.
    "c112_audio_canonical_keep" -> ((s, dir) => {
      import graft.operators.{Audio, Dedup}
      val corpus = audioDupCorpus(s, dir)
      // r18: ONE decode pass (the c105 rewrite) — lens from the META
      // rows, pairs from the code rows of the same landmark table
      val rows = Audio.chainedLandmarkRows(s, corpus).persist()
      val lens = rows.where(col("anchor") === -1)
        .select(col("media_id").as("id"),
          col("n_samples").cast("long").as("n_samples"))
        .localCheckpoint(true)
      val pairs = Audio.chainedPairsFromCodes(rows, minShared = 4)
        .join(lens.select(col("id").as("id_a"),
          col("n_samples").as("__na")), "id_a")
        .join(lens.select(col("id").as("id_b"),
          col("n_samples").as("__nb")), "id_b")
        .where(col("__na") === col("__nb"))
        .select("id_a", "id_b").localCheckpoint(true)
      rows.unpersist() // lens + pairs are both checkpointed — decode done
      val labels = Dedup.dupClusters(pairs, maxIter = 96)
      val canon = labels.join(lens, "id")
        .groupBy("cluster_id")
        .agg(max(struct(col("n_samples"), (-col("id")).as("__nid")))
          .as("__m"))
        .select((-col("__m.__nid")).as("id"))
        .withColumn("__canon", lit(true))
      // drops = cluster members that lost their election; kept = the
      // corpus minus the drops, tagged by why each clip survived
      val drops = labels.select("id")
        .join(canon.select("id"), Seq("id"), "left_anti")
      lens.join(drops, Seq("id"), "left_anti")
        .join(canon, Seq("id"), "left")
        .select(col("id").as("media_id"), col("n_samples"),
          when(col("__canon").isNotNull, lit("canonical"))
            .otherwise(lit("singleton")).as("kept_as"))
        .orderBy("media_id")
    }),

    // C113 heterogeneous-budget packing — per-SOURCE budgets in one
    // job (a code source packed at its long sequence length beside a
    // chat source at its short one): the c106 slot machine with the
    // budget as a COLUMN, constant per source by contract (the fold
    // refuses a source carrying two budgets). Budget rule here:
    // 128 + 64·(source suffix % 4) — four budget classes over the
    // twenty sources, all SQL-replayable; the planted oversized docs
    // overflow only where their +300 tokens exceed the LOCAL budget.
    "c113_budgeted_packing" -> ((s, dir) => {
      import graft.operators.Chunking
      val G = graft.functions.GraftExpressions
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("tk"))
      val corpus = base.unionByName(base.where(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          (col("tk") + 300L).as("tk")))
        .withColumn("bg", lit(128L) + lit(64L) *
          (substring(col("source"), 4, 10).cast("long") % 4L))
      Chunking.packWholeDocsBudgeted(corpus, "doc_id", "tk", "source",
          "bg", nBands = 4, openBins = 3)
        .groupBy("source", "band", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("tk").as("fill_tokens"),
          min("budget").as("budget"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("docs_fp"))
        .select(col("source"), col("band"), col("bin"), col("n_docs"),
          col("fill_tokens"), col("budget"),
          G.longDiv(col("fill_tokens") * lit(1000000L), col("budget"))
            .as("util_ppm"),
          (col("fill_tokens") > col("budget")).as("overflow"),
          col("docs_fp"))
        .orderBy("source", "band", "bin")
    }),

    // C114 image BANDING tuning curve — the c98/c101 "pick a config
    // from a table" question on the image banded join: per band
    // count, the candidate volume the banding generates (cost: every
    // candidate pays a verify) and the verified hamming≤3 pairs it
    // finds, as recall ppm of the guaranteed-exact b=8 truth. b=2
    // guarantees only hamming ≤ 1 (cheap, lossy); b=4 is exactly
    // c97's production join (guaranteed for the verify threshold);
    // b=8 pays more candidates for hamming-7 headroom. Reads the C104
    // STORED codes — a tuning sweep is precisely the query you never
    // want paying the decode.
    "c114_image_banding_curve" -> ((s, dir) => {
      import graft.operators.ImageDedup
      import graft.sources.ImageCodeStore
      val root = imageCodesRoot(s, dir)
      val stored = ImageCodeStore.readCodes(s, root,
        ImageCodeStore.committedSpecVersion(s, root))
      ImageDedup.bandingCurve(stored, Seq(2, 4, 8), maxHamming = 3,
        hotBucketCap = 64)
    }),

    // C110 retired image-code vacuum — the C86 lifecycle rule on the
    // C104 key space: after a spec rollover (v2 published, iv2
    // backfilled) the old version's codes are corpus-sized dead
    // weight; the vacuum removes iv trees at or below
    // committed − keepVersions, refuses the committed version and
    // in-flight newer keys, and serving from the surviving key space
    // still answers c97's question exactly (the c97 oracle verbatim —
    // a vacuum that touched live codes could not hash-match).
    "c110_image_codes_vacuum" -> ((s, dir) => {
      import graft.operators.ImageDedup
      import graft.sources.ImageCodeStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c110_vac_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val packed = ImageDedup.packImageVariants(s,
        t(s, dir, "documents"), "doc_id")
      val codes = ImageDedup.blockhashCodes(s, packed).persist()
      try {
        require(ImageCodeStore.publishSpec(s, root, "blockhash", 8, 4)
          .committed)
        ImageCodeStore.appendCodesEpoch(codes, root, 1, 0L)
        // the rollover: v2 re-published (same parameters — the version
        // is the key, not the content), iv2 backfilled
        require(ImageCodeStore.publishSpec(s, root, "blockhash", 8, 4)
          .committed)
        ImageCodeStore.appendCodesEpoch(codes, root, 2, 0L)
        val rep = ImageCodeStore.vacuumRetiredCodes(s, root,
          keepVersions = 1)
        require(rep.committed == 2 && rep.removed == Seq(1) &&
          rep.kept == Seq(2), s"vacuum accounting off: $rep")
        require(!fs.exists(new Path(
          s"$root/${ImageCodeStore.CodesTable}/iv1")),
          "retired key space must be gone")
        // idempotent: a rerun finds nothing to remove
        val again = ImageCodeStore.vacuumRetiredCodes(s, root, 1)
        require(again.removed.isEmpty && again.kept == Seq(2),
          s"vacuum rerun must be a no-op: $again")
        ImageDedup.perceptualPairs(ImageCodeStore.readCodes(s, root, 2),
            maxHamming = 3, hotBucketCap = 64)
          .orderBy("id_a", "id_b")
      } finally { codes.unpersist(); () }
    }),

    // C115 audio fingerprint-code STORE serving — the r14 verdict's
    // top ask: c105/c112 re-decoded the WAV corpus and re-derived the
    // chained-landmark codes inside every query, on the modality where
    // decode is MOST expensive per byte. Here the landmark rows (plus
    // the per-clip decoded duration — the blocking/election input) are
    // published ONCE per corpus through the versioned AudioCodeStore
    // (spec v1, two ingest epochs by media-id parity, epoch 1
    // REPLAYED — the C82/C104 incremental discipline) and the cluster
    // query reads the stored table: no decode, no WHT anywhere in the
    // timed plan. Oracle = the c105 cluster replay UNCHANGED —
    // clusters-from-stored must hash-equal clusters-from-decode, which
    // a lossy round trip, a frame-grid mix-up, or a non-idempotent
    // replay cannot fake (the meta-row gate makes duplication loud
    // BEFORE the pair rollup would collapse it).
    "c115_audio_code_serve" -> ((s, dir) => {
      import graft.sources.AudioCodeStore
      val root = audioCodesRoot(s, dir)
      val v = AudioCodeStore.committedSpecVersion(s, root)
      audioClustersFromStored(s, AudioCodeStore.readCodes(s, root, v))
    }),

    // C116 retired audio-code vacuum — the C110 lifecycle rule on the
    // C115 key space: after a spec rollover (v2 published, av2
    // backfilled) the old version's landmarks are corpus-sized dead
    // weight; the vacuum removes av trees at or below
    // committed − keepVersions, refuses the committed version and
    // in-flight newer keys, and serving from the surviving key space
    // still answers c105's question exactly (the c105 oracle verbatim
    // — a vacuum that touched live landmarks could not hash-match).
    "c116_audio_codes_vacuum" -> ((s, dir) => {
      import graft.operators.Audio
      import graft.sources.AudioCodeStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c116_vac_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val rows = Audio.chainedLandmarkRows(s, audioDupCorpus(s, dir))
        .persist()
      try {
        require(AudioCodeStore.publishSpec(s, root, "chained_landmark",
          128).committed)
        AudioCodeStore.appendCodesEpoch(rows, root, 1, 0L)
        // the rollover: v2 re-published (same parameters — the version
        // is the key, not the content), av2 backfilled
        require(AudioCodeStore.publishSpec(s, root, "chained_landmark",
          128).committed)
        AudioCodeStore.appendCodesEpoch(rows, root, 2, 0L)
        val rep = AudioCodeStore.vacuumRetiredCodes(s, root,
          keepVersions = 1)
        require(rep.committed == 2 && rep.removed == Seq(1) &&
          rep.kept == Seq(2), s"vacuum accounting off: $rep")
        require(!fs.exists(new Path(
          s"$root/${AudioCodeStore.CodesTable}/av1")),
          "retired key space must be gone")
        // idempotent: a rerun finds nothing to remove
        val again = AudioCodeStore.vacuumRetiredCodes(s, root, 1)
        require(again.removed.isEmpty && again.kept == Seq(2),
          s"vacuum rerun must be a no-op: $again")
        audioClustersFromStored(s, AudioCodeStore.readCodes(s, root, 2))
      } finally { rows.unpersist(); () }
    }),

    // C122 audio-code SPEC ROLLOVER across a REAL frame change — the
    // c117 blue/green story completed on the audio store, finishing
    // the rollover discipline on all three media stores (ANN C85,
    // image C117, audio here): av1 serves frame-64 landmark codes
    // while the quality upgrade's frame-128 codes BACKFILL their own
    // av2 key space (epoch-partitioned, one epoch REPLAYED both before
    // and after the flip — both no-ops); the FLIP is the spec-v2
    // publish (a pointer commit, never an overwrite), a session pinned
    // at v1 is byte-stable through it, and c116's vacuum then retires
    // the loser. Serving from the committed pin answers c105's cluster
    // question exactly (the c105 oracle verbatim — frame-64 codes
    // leaking into the serving plan, a half-complete backfill, or a
    // replay duplication could not hash-match). The streamed delivery
    // of the backfill is locked in AudioCodesStreamSpec (D46 — the
    // d43 shape on the audio sink).
    "c122_audio_spec_rollover" -> ((s, dir) => {
      import graft.operators.Audio
      import graft.sources.AudioCodeStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c122_roll_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      lifecycleOncePerBenchJvm(s"c122:$dir") {
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        val packed = audioDupCorpus(s, dir)
        // blue: spec v1 = frame 64 — the ENCODE is driven by the loaded
        // spec, not a constant, so the rollover is a real re-encode
        require(AudioCodeStore.publishSpec(s, root, "chained_landmark",
          frame = 64).committed)
        val (_, f1) = AudioCodeStore.loadSpecAt(s, root, 1)
        AudioCodeStore.appendCodesEpoch(
          Audio.chainedLandmarkRows(s, packed, frame = f1), root, 1, 0L)
        def digest(v: Int): (Long, Long) = {
          val r = AudioCodeStore.readCodes(s, root, v)
            .agg(count(lit(1)).as("n"), bit_xor(xxhash64(col("media_id"),
              col("n_samples"), col("anchor"), col("line_a"),
              col("line_t"))).as("x")).collect().head
          (r.getLong(0), r.getLong(1))
        }
        val pin1 = digest(1)
        // green backfill: frame-128 landmarks land in av2 WHILE v1
        // serves (two epochs by parity; epoch 1 replayed pre-flip)
        val rows128 = Audio.chainedLandmarkRows(s, packed, frame = 128)
          .persist()
        try {
          AudioCodeStore.appendCodesEpoch(
            rows128.where(pmod(col("media_id"), lit(2)) === 0), root, 2, 0L)
          AudioCodeStore.appendCodesEpoch(
            rows128.where(pmod(col("media_id"), lit(2)) === 1), root, 2, 1L)
          AudioCodeStore.appendCodesEpoch(
            rows128.where(pmod(col("media_id"), lit(2)) === 1), root, 2, 1L)
          require(AudioCodeStore.committedSpecVersion(s, root) == 1,
            "a backfill must not move the committed pointer")
          val pre = digest(2)
          // the FLIP: publish spec v2 (frame 128) — a pointer commit
          require(AudioCodeStore.publishSpec(s, root, "chained_landmark",
            frame = 128).committed)
          require(AudioCodeStore.committedSpecVersion(s, root) == 2,
            "the flip must land the committed pointer on v2")
          // a session pinned at v1 is byte-stable through the flip
          require(digest(1) == pin1,
            "the pinned v1 key space moved across the flip")
          // a replayed backfill epoch POST-flip is still a no-op
          AudioCodeStore.appendCodesEpoch(
            rows128.where(pmod(col("media_id"), lit(2)) === 1), root, 2, 1L)
          require(digest(2) == pre,
            "post-flip epoch replay duplicated stored landmarks")
          // retire the loser; the committed key space survives
          val rep = AudioCodeStore.vacuumRetiredCodes(s, root,
            keepVersions = 1)
          require(rep.committed == 2 && rep.removed == Seq(1) &&
            rep.kept == Seq(2), s"vacuum accounting off: $rep")
        } finally { rows128.unpersist(); () }
      }
      audioClustersFromStored(s, AudioCodeStore.readCodes(s, root, 2))
    }),

    // C123 TRI-MODAL document-level dup verdict — c118 completed with
    // the third modality: text MinHash families, STORED-code image
    // pairs, and STORED-landmark audio pairs meet over per-modality
    // doc↔media link tables into one result-sized per-doc verdict. The
    // audio link: every ≡0 mod 4 doc narrates its own clip; a ≡1 mod 4
    // doc whose predecessor is ≡0 mod 28 embeds that predecessor's
    // RE-MASTERED (gain-shifted) clip — so two docs with different
    // text and different images share perceptual audio (audio-dup
    // only), the planted direction no two-modality verdict can
    // express. All three pair sets are served from their stores /
    // banded joins; the verdict joins are result-sized (AQE
    // strategy). Oracle = all three replays composed (the c97 pixel
    // chain, the c2 planted relation, the c105 synthesis→WHT→landmark
    // pair chain) over the same links and the same concat verdict.
    "c123_trimodal_dup" -> ((s, dir) => trimodalVerdicts(s, dir)),

    // C130 verdict STORE — the c123 table SHIPPED: a multimodal crawl
    // does not re-run the verdict join per consumer, it publishes the
    // per-doc dup table as a versioned artifact (the ModelStore
    // discipline on the verdict surface): audits refuse a torn table
    // (duplicate doc ids, a verdict string inconsistent with its
    // booleans) BEFORE the pointer moves; a replayed publish is
    // watermark-skipped; a re-publish is a new version with the old
    // one pinned readable (time travel); serving reads the committed
    // pointer — result-sized, never a pair join. Oracle = the c123
    // replay verbatim (a store that mangled one row could not
    // hash-match).
    "c130_verdict_store_serve" -> ((s, dir) => {
      import graft.sources.VerdictStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c130_verd_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      lifecycleOncePerBenchJvm(s"c130:$dir") {
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        val v = trimodalVerdicts(s, dir).persist()
        try {
          // a torn table is REFUSED with the pointer unmoved: a verdict
          // string inconsistent with its booleans cannot publish
          val torn = v.withColumn("verdict",
            when(col("doc_id") === v.agg(min("doc_id")).head.getLong(0),
              lit("mangled")).otherwise(col("verdict")))
          val bad = VerdictStore.publishVerdicts(s, root, torn)
          require(!bad.committed && bad.failures.nonEmpty,
            s"torn verdict table must refuse: $bad")
          val r1 = VerdictStore.publishVerdicts(s, root, v,
            batchId = Some(0L))
          require(r1.committed, s"verdict publish failed: ${r1.failures}")
          // redelivered epoch: watermark-skipped, pointer unmoved
          val rep = VerdictStore.publishVerdicts(s, root, v,
            batchId = Some(0L))
          require(rep.replaySkipped && !rep.committed,
            s"replayed publish must be watermark-skipped: $rep")
          require(VerdictStore.committedVersion(s, root) == 1,
            "replay must not move the pointer")
          // a deeper crawl re-publishes: new version, old one pinned
          require(VerdictStore.publishVerdicts(s, root, v,
            batchId = Some(1L)).committed)
          require(VerdictStore.committedVersion(s, root) == 2,
            "re-publish must land v2")
          require(VerdictStore.loadVerdictsAt(s, root, 1).count() ==
            v.count(), "the pinned v1 table must stay readable")
        } finally { v.unpersist(); () }
      }
      VerdictStore.loadCommitted(s, root).orderBy("doc_id")
    }),

    // C133 verdicts via the INCREMENTAL PAIR LEDGER (D49) — the D48
    // maintenance loop re-ran the corpus×corpus banded joins on every
    // crawl epoch; here each epoch appends only its DELTA pairs (the
    // c121/c128/c129 cross shapes against everything stored so far,
    // plus within-delta pairs) to an epoch-partitioned ledger per
    // modality, and the verdict table is rebuilt from the LEDGER UNION
    // — no banding, census, or signature/code scan in the verdict
    // plan. The c123 corpus arrives in three epochs (doc_id mod 3; the
    // +1e6 re-crawl copies land in a DIFFERENT epoch than their
    // originals, so every planted text pair crosses epochs through the
    // ledger), the last epoch is REDELIVERED (D8 ledger partitions
    // overwrite themselves bit-identically; the publish is
    // watermark-skipped — the ledger-replay no-op case), and serving
    // reads the committed verdict version. Oracle = the c123 replay
    // verbatim — a pair lost at an epoch boundary, a duplicated replay
    // append, or a mis-normalized cross pair could not hash-match.
    "c133_verdict_ledger_serve" -> ((s, dir) => {
      import graft.streaming.VerdictStream
      import graft.sources.VerdictStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c133_ledg_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      lifecycleOncePerBenchJvm(s"c133:$dir") {
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        val r = VerdictStream.Roots(s"$root/sigs", s"$root/img",
          s"$root/aud", s"$root/verd", s"$root/docs_seen")
        VerdictStream.initStores(s, r)
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val withCopies = docs.unionByName(
          docs.where(pmod(col("doc_id"), lit(3)) === 1)
            .withColumn("doc_id", col("doc_id") + lit(1000000L)))
        (0 until 3).foreach { e =>
          val rep = VerdictStream.foldAndPublishLedger(s,
            withCopies.where(pmod(col("doc_id"), lit(3)) === e),
            e.toLong, r, s"$root/pairs")
          require(rep.committed,
            s"ledger epoch $e publish failed: ${rep.failures}")
        }
        // ledger-replay no-op: the last epoch redelivered — delta
        // pairs recompute identically (the ref sides exclude the
        // delta's own keys), the D8 partitions overwrite themselves,
        // and the publish is watermark-skipped with the pointer unmoved
        val rep = VerdictStream.foldAndPublishLedger(s,
          withCopies.where(pmod(col("doc_id"), lit(3)) === 2), 2L, r,
          s"$root/pairs")
        require(rep.replaySkipped && !rep.committed,
          s"redelivered ledger epoch must be watermark-skipped: $rep")
        require(VerdictStore.committedVersion(s, s"$root/verd") == 3,
          "three epochs must land exactly three verdict versions")
      }
      VerdictStore.loadCommitted(s, s"$root/verd").orderBy("doc_id")
    }),

    // C135 pair-ledger COMPACTION — the A18 small-file discipline on
    // the D49 ledger: a long crawl accrues one partition per epoch per
    // modality (each result-sized or empty; at 10k epochs the ledger
    // read pays 10k directory listings for KBs of pairs). The fold
    // merges every partition ≤ the watermark into one RESERVED
    // (negative) partition, renamed into the live tree BEFORE the
    // folded partitions are deleted (a crash leaves duplicates —
    // absorbed by the doc-distinct consumers — never a loss), and
    // refuses the in-flight tail. The proof obligation is
    // the serving one: the c133 lifecycle runs, ALL THREE modality
    // ledgers compact to a single partition each, one folded epoch is
    // REPLAYED post-compaction (the straggler partition re-lands; the
    // doc-distinct verdict absorbs it — replay converges, never
    // corrupts), and the committed verdict REBUILDS from the compacted
    // ledger. Oracle = the c123 replay verbatim — a fold that dropped,
    // duplicated, or cross-wired one pair could not hash-match.
    "c135_ledger_compaction" -> ((s, dir) => {
      import graft.streaming.VerdictStream
      import graft.sources.{PairLedger, VerdictStore}
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c135_comp_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      lifecycleOncePerBenchJvm(s"c135:$dir") {
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        val r = VerdictStream.Roots(s"$root/sigs", s"$root/img",
          s"$root/aud", s"$root/verd", s"$root/docs_seen")
        VerdictStream.initStores(s, r)
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val withCopies = docs.unionByName(
          docs.where(pmod(col("doc_id"), lit(3)) === 1)
            .withColumn("doc_id", col("doc_id") + lit(1000000L)))
        def slice(e: Int) =
          withCopies.where(pmod(col("doc_id"), lit(3)) === e)
        (0 until 3).foreach { e =>
          require(VerdictStream.foldAndPublishLedger(s, slice(e),
            e.toLong, r, s"$root/pairs").committed, s"epoch $e failed")
        }
        def nParts(m: String): Int = {
          val p = new Path(s"$root/pairs/$m")
          if (!fs.exists(p)) 0
          else fs.listStatus(p).count(st =>
            st.isDirectory && st.getPath.getName.startsWith("__epoch="))
        }
        PairLedger.Modalities.foreach { m =>
          require(nParts(m) >= 2, s"$m must hold multiple epoch " +
            "partitions before compaction exercises anything")
          val rep = PairLedger.compactEpochs(s, s"$root/pairs", m, 2L)
          require(rep.into < 0L && rep.folded == Seq(0L, 1L, 2L) &&
            nParts(m) == 1,
            s"$m must fold all three epochs into ONE reserved " +
              s"partition, got ${nParts(m)}: $rep")
        }
        // straggler replay AFTER compaction: epoch 1's ledger
        // partitions re-land beside the merged ones; the publish is
        // watermark-skipped and the verdict must absorb the duplicates
        require(VerdictStream.foldAndPublishLedger(s, slice(1), 1L, r,
          s"$root/pairs").replaySkipped,
          "replayed epoch must be watermark-skipped")
        // the rebuild FROM the compacted (+straggler) ledger must
        // still be the exact table — published as one more version
        require(VerdictStore.publishVerdicts(s, s"$root/verd",
          VerdictStream.verdictsFromLedger(s, r, s"$root/pairs"),
          batchId = Some(3L)).committed, "post-compaction publish failed")
      }
      VerdictStore.loadCommitted(s, s"$root/verd").orderBy("doc_id")
    }),

    // C136 RESOLVED-pair retirement — the governance loop the ledger
    // was missing (the r16 verdict's ask #3): A33/A36 delete documents,
    // but their pairs lived in the ledger forever — at crawl scale the
    // ledger must SHRINK when the corpus does. The c133 corpus lands in
    // three epochs; an A36 deletion-vector mark on the docs ledger
    // tombstones the RTBF batch (originals ≡ 0,1 mod 30 plus the
    // re-crawl copies of the ≡1 ones — copies of deleted content are
    // deleted content); the compaction fold RETIRES every pair with a
    // resolved endpoint (text: the tombstoned doc ids; image/audio:
    // every media id that loses its last live link — owned by OR
    // derived from a deleted doc); a folded epoch is then REPLAYED
    // (the straggler re-lands its retired pairs), and the rebuild is
    // TOMBSTONE-AWARE, so the committed verdicts are replay-stable —
    // the A36 merge-on-read contract on the pair ledger. Oracle = the
    // c123 trimodal replay over the LIVE corpus only: a pair retired
    // too eagerly, a survivor dropped, or a resurrected straggler
    // could not hash-match.
    "c136_ledger_pair_retire" -> ((s, dir) => {
      import graft.streaming.VerdictStream
      import graft.sources.{DeletionVectors, PairLedger, VerdictStore}
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c136_ret_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      lifecycleOncePerBenchJvm(s"c136:$dir") {
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        val r = VerdictStream.Roots(s"$root/sigs", s"$root/img",
          s"$root/aud", s"$root/verd", s"$root/docs_seen")
        VerdictStream.initStores(s, r)
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val withCopies = docs.unionByName(
          docs.where(pmod(col("doc_id"), lit(3)) === 1)
            .withColumn("doc_id", col("doc_id") + lit(1000000L)))
        def slice(e: Int) =
          withCopies.where(pmod(col("doc_id"), lit(3)) === e)
        (0 until 3).foreach { e =>
          require(VerdictStream.foldAndPublishLedger(s, slice(e),
            e.toLong, r, s"$root/pairs").committed, s"epoch $e failed")
        }
        // the governance event: an A36 mark on the docs ledger — a
        // request-sized target list (corpus/15 here; entity-sized in
        // production, the A33/A36 maxTargets contract)
        val maxId = docs.agg(max("doc_id")).head.getLong(0)
        val delOrig = (0L to maxId).filter(d => d % 30 <= 1)
        val targets = delOrig ++
          delOrig.filter(_ % 30 == 1).map(_ + 1000000L)
        val mark = DeletionVectors.markDeleted(s, r.docsSeen, "doc_id",
          targets, "rtbf_batch_1")
        require(mark.rowsMarked == targets.size,
          s"every RTBF doc must mark exactly once: " +
            s"${mark.rowsMarked} vs ${targets.size}")
        // retirement at the compaction fold: the ledger SHRINKS
        val reps = VerdictStream.compactRetiredEpochs(s, r,
          s"$root/pairs", 2L)
        reps.foreach(rep => require(rep.retired > 0 && rep.into < 0L,
          s"every modality must physically retire pairs: $rep"))
        // proof obligation: no pair with a resolved endpoint survives
        val resolved = VerdictStream.retiredEndpoints(s, r)
        PairLedger.Modalities.foreach { m =>
          val ids = resolved(m).toDF("__rid")
          val left = PairLedger.readPairs(s, s"$root/pairs", m)
          val touching = left
            .join(ids, col("id_a") === col("__rid"), "left_semi")
            .unionByName(left
              .join(ids, col("id_b") === col("__rid"), "left_semi"))
            .count()
          require(touching == 0,
            s"$m still holds $touching pairs with resolved endpoints")
        }
        // straggler replay AFTER retirement: epoch 1 re-lands its
        // ORIGINAL pairs (retired ones included) — watermark-skipped
        require(VerdictStream.foldAndPublishLedger(s, slice(1), 1L, r,
          s"$root/pairs").replaySkipped,
          "replayed epoch must be watermark-skipped")
        // the tombstone-aware rebuild absorbs the resurrected
        // stragglers — the replay-stability half of the contract
        require(VerdictStore.publishVerdicts(s, s"$root/verd",
          VerdictStream.verdictsFromLedgerRetired(s, r, s"$root/pairs"),
          batchId = Some(3L)).committed,
          "post-retirement publish failed")
      }
      VerdictStore.loadCommitted(s, s"$root/verd").orderBy("doc_id")
    }),

    // C137 span extents via the INCREMENTAL fired-window LEDGER — the
    // r17 verdict's ask #1, closing the stores→ledger→retirement arc
    // on the LAST dedup family that recomputed per query: c132 still
    // paid the duplicated-vocabulary count aggregate + the hinted flag
    // join over the FULL stored digest table on every question (the
    // span family's measured-majority 100x shuffle — 4.3 GB in the
    // c76 stage dumps). The ledger stores the FIRED WINDOW (id, pos)
    // per ladder width — extents don't compose across epochs (adjacent
    // arrivals must coalesce), fired windows compose as plain union —
    // and each ingest epoch appends only the windows NEWLY fired by
    // its arrivals: within-delta dups plus the ref-side 1→2
    // multiplicity transitions (Dedup.firedWindowDeltas), at
    // delta×corpus-intersection cost. The serve is the per-document
    // island sweep over stored fired windows: NO tokenizer, digest,
    // count, or corpus-scale join anywhere in the plan (PlanAuditSpec
    // locks it). Fixture: two parity epochs over the c76 corpus, D8
    // replay of epoch 1, a LedgerFold compaction per width, and a
    // post-compaction straggler re-land the sweep must absorb. Oracle
    // = the c76b extent replay UNCHANGED — a window lost at an epoch
    // boundary, a re-added ref window, or a resurrected straggler
    // could not hash-match.
    "c137_span_ledger_serve" -> ((s, dir) => {
      import graft.sources.SpanLedger
      val root = spanLedgerRoot(s, dir)
      val (_, widths) = graft.sources.SpanStore.loadSpecAt(s,
        s"$root/store", 1)
      SpanLedger.extentsFromLedger(s, s"$root/ledger", widths)
        .orderBy("id", "w", "start_tok")
    }),

    // C138 ledger AGE/TTL retention — the r17 verdict's ask #3, the
    // retention leg c136's tombstone path left open: without it a
    // long crawl's ledger grows with the ALL-TIME dup population even
    // when old epochs stop mattering for serving. The compaction fold
    // now PRESERVES each pair's arrival epoch across folds (the
    // merged partition's arr_epoch column — LedgerFold) and an
    // `olderThan` watermark expires pairs below it; the serve
    // (readPairsRetained) filters deliverable partitions by the D8
    // key and merged partitions by the persisted column, so a
    // replayed folded epoch re-lands its expired pairs physically but
    // can NEVER resurrect them in the serve — the A36 merge-on-read
    // contract, age edition. Fixture: the c2 planted relation across
    // FOUR arrival epochs (epoch = doc_id mod 4; the +1e6 re-crawl
    // offset is ≡ 0 mod 4, so every planted pair arrives WITH its
    // original — a per-pair arrival the oracle restates exactly); a
    // provenance-preserving fold, then the TTL fold (epochs 0-1
    // expire), then the epoch-1 straggler replay. Oracle = the
    // planted band restricted to the retained arrival window.
    "c138_ledger_ttl_retire" -> ((s, dir) => {
      import graft.operators.Dedup
      import graft.sources.{PairLedger, TextSigStore}
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c138_ttl_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      lifecycleOncePerBenchJvm(s"c138:$dir") {
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        require(TextSigStore.publishSpec(s, s"$root/sigs", "minhash",
          64, 16, 3).committed, "c138 sig spec publish failed")
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val withCopies = docs.unionByName(
          docs.where(pmod(col("doc_id"), lit(3)) === 1)
            .withColumn("doc_id", col("doc_id") + lit(1000000L)))
        // the text arm of foldAndPublishLedger, four arrival epochs
        def ingest(e: Long): Unit = {
          val b = withCopies.where(pmod(col("doc_id"), lit(4)) === e)
          graft.streaming.EventStreams.epochIdempotentSink(
            b.select("doc_id", "text"), e, s"$root/docs")
          val sigs = Dedup.minhashSigRows(b, "text", "doc_id")
          TextSigStore.appendSigsEpoch(sigs, s"$root/sigs", 1, e)
          val refSigs = TextSigStore.readSigsBefore(s, s"$root/sigs", 1, e)
          val refDocs = s.read.parquet(s"$root/docs")
            .where(col("__epoch") < e).select("doc_id", "text")
          val cross = Dedup.minhashCrossPairsFromSigs(
              refSigs, refDocs, b, "text", "doc_id")
            .select(col("ref_id").as("id_a"), col("inc_id").as("id_b"))
          val within = Dedup.minhashPairsFromSigs(sigs, b,
              "text", "doc_id")
            .select("id_a", "id_b")
          PairLedger.appendPairsEpoch(cross.unionByName(within),
            s"$root/pairs", "text", e)
        }
        (0L to 3L).foreach(ingest)
        // fold 1 (no watermark): arrival provenance must SURVIVE the
        // fold — the TTL below reads it off the merged column, not a
        // live partition key
        val r1 = PairLedger.compactEpochs(s, s"$root/pairs", "text", 3L)
        require(r1.into == -1L && r1.folded == Seq(0L, 1L, 2L, 3L),
          s"c138 provenance fold failed: $r1")
        // fold 2: the age watermark — epochs 0-1 expire physically
        val r2 = PairLedger.compactEpochs(s, s"$root/pairs", "text", 3L,
          olderThan = Some(2L))
        require(r2.expired > 0L,
          s"the watermark must expire old pairs: $r2")
        // straggler replay: epoch 1 re-lands its EXPIRED pairs beside
        // the merged history; the raw read must see them (positive
        // control) and the retained serve below must not
        ingest(1L)
        val raw = PairLedger.readPairs(s, s"$root/pairs", "text").count()
        val ret = PairLedger.readPairsRetained(s, s"$root/pairs",
          "text", 2L).count()
        require(raw > ret,
          s"the straggler must be visible raw ($raw) but filtered " +
            s"from the retained serve ($ret)")
      }
      PairLedger.readPairsRetained(s, s"$root/pairs", "text", 2L)
        .where(col("id_b") - col("id_a") === 1000000L)
        .select(col("id_a").as("doc_id")).distinct()
        .orderBy("doc_id")
    }),

    // D17 stream-fed incremental materialized view — PROMOTED from
    // spec-only (the r17 verdict's ask #5): the D10 streaming merge
    // sink's CHANGE FEED advances a B26 aggregate view epoch by epoch
    // (applyChanges' signed-delta arithmetic — the view is NEVER
    // rebuilt from the snapshot), and the final table is
    // SQL-expressible: last-writer-wins per key across arrival epochs
    // (max value within an epoch — the merge sink's max-struct
    // in-batch compaction), then one aggregate per group. Fixture:
    // the events table keyed by user, three file-arrival waves
    // (epoch = event_id mod 3) each drained by an AvailableNow run of
    // the merge sink against ONE checkpoint, so batch ids advance
    // 0→1→2 and the feed carries insert/update_preimage/postimage
    // rows the fold must net out. LONG columns only (the float-canon
    // rule).
    "d17_stream_mv" -> ((s, dir) => {
      import graft.operators.MaterializedView
      import graft.streaming.EventStreams
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("d17_mv_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val ev = t(s, dir, "events").select(
        col("user_id").cast("long").as("k"),
        pmod(col("user_id"), lit(7)).cast("long").as("g"),
        col("event_id").cast("long").as("v"),
        pmod(col("event_id"), lit(3)).cast("long").as("e"))
      lifecycleOncePerBenchJvm(s"d17:$dir") {
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        (0L to 2L).foreach { e =>
          ev.where(col("e") === e).drop("e")
            .write.mode("append").parquet(s"$root/arrivals")
          val src = s.readStream
            .schema("k LONG, g LONG, v LONG")
            .parquet(s"$root/arrivals")
          val q = EventStreams.mergeSink(src, s"$root/table",
            s"$root/cdf", Seq("k"), s"$root/ckpt")
          require(q.awaitTermination(240000),
            s"d17 wave $e did not drain")
        }
      }
      // the D17 surface: the view advanced from the FEED alone
      val feed = s.read.parquet(s"$root/cdf")
      val epochs = feed.select(col("__epoch").cast("long")).distinct()
        .orderBy("__epoch").collect().map(_.getLong(0)) // bounded: one
      // row per micro-batch, the D8 epoch census — never row data
      require(epochs.length >= 3, s"expected >=3 epochs: ${epochs.toSeq}")
      var view = MaterializedView.build(
        ev.drop("e").limit(0), Seq("g"), Seq("v"))
      epochs.foreach { e =>
        view = MaterializedView.applyChanges(view,
          feed.where(col("__epoch") === e).drop("__epoch"),
          Seq("g"), Seq("v"))
      }
      view.select(col("g"), col("__mv_n").as("n_keys"),
          col("__mv_sum_v").cast("long").as("sum_v"))
        .orderBy("g")
    }),

    // C118 CROSS-MODAL document-level dup verdict — the decision a
    // multimodal crawl actually ships (the r14 verdict's ask #4): the
    // TEXT dup family (c2's MinHash-LSH pairs over planted re-crawl
    // copies, docs ≡ 1 mod 3) and the IMAGE dup family (c104's
    // STORED-code perceptual pairs — no decode in this plan) meet over
    // an explicit doc↔media LINK table: every doc owns its hero image;
    // docs ≡ 5 mod 10 additionally embed the RE-ENCODE of doc (d−5)'s
    // image and docs ≡ 7 mod 10 the BRIGHTNESS-SHIFTED variant of doc
    // (d−7)'s — so two docs with different text share perceptual
    // content (image-dup, not text-dup) while re-crawled copies are
    // text-dup with unrelated images. A doc is image-dup iff one of
    // its media perceptually pairs with ANOTHER doc's media (a doc
    // pairing with itself through its own two media is not a dup).
    // Output is result-sized: only flagged docs, with the per-modality
    // booleans and the composite verdict. Oracle = both sides' replays
    // composed (the c97 pixel chain + the c2 planted relation) + the
    // same link/verdict joins.
    "c118_crossmodal_dup" -> ((s, dir) => {
      import graft.operators.{Dedup, ImageDedup}
      import graft.sources.ImageCodeStore
      val docs = t(s, dir, "documents")
      // text side: the c2 construction on the ≡1 mod 3 slice — the
      // re-crawled copies a text dedup must find (jaccard 1.0; the
      // planted-relation filter is the c2 oracle convention)
      val withCopies = docs.unionByName(
        docs.where(pmod(col("doc_id"), lit(3)) === 1)
          .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      val textDup = Dedup.minhashDedupPairs(withCopies, "text", "doc_id")
        .where(col("id_b") - col("id_a") === 1000000L)
        .select(col("id_a").as("doc_id")).distinct()
      // image side: perceptual pairs SERVED from the stored code table
      val root = imageCodesRoot(s, dir)
      val ip = ImageDedup.perceptualPairs(
          ImageCodeStore.readCodes(s, root,
            ImageCodeStore.committedSpecVersion(s, root)),
          maxHamming = 3, hotBucketCap = 64)
        .select("id_a", "id_b")
      // the doc↔media link table (every arm guarded by base existence)
      val ids = docs.select(col("doc_id"))
      val own = ids.select(col("doc_id"), col("doc_id").as("media_id"))
        .unionByName(ids.where(pmod(col("doc_id"), lit(10)) === 5)
          .join(ids.select(col("doc_id").as("__b")),
            col("doc_id") - 5 === col("__b"), "left_semi")
          .select(col("doc_id"),
            (col("doc_id") - 5 + 2000000L).as("media_id")))
        .unionByName(ids.where(pmod(col("doc_id"), lit(10)) === 7)
          .join(ids.select(col("doc_id").as("__b")),
            col("doc_id") - 7 === col("__b"), "left_semi")
          .select(col("doc_id"),
            (col("doc_id") - 7 + 3000000L).as("media_id")))
      // owners of both pair endpoints; cross-doc pairs only. The pair
      // set is result-sized — AQE picks the join-back strategy.
      val xdoc = ip
        .join(own.select(col("doc_id").as("__da"),
          col("media_id").as("id_a")), "id_a")
        .join(own.select(col("doc_id").as("__db"),
          col("media_id").as("id_b")), "id_b")
        .where(col("__da") =!= col("__db"))
      val imgDup = xdoc.select(col("__da").as("doc_id"))
        .unionByName(xdoc.select(col("__db").as("doc_id"))).distinct()
      textDup.withColumn("__t", lit(true))
        .join(imgDup.withColumn("__i", lit(true)), Seq("doc_id"),
          "full_outer")
        .select(col("doc_id"),
          coalesce(col("__t"), lit(false)).as("text_dup"),
          coalesce(col("__i"), lit(false)).as("image_dup"))
        .withColumn("verdict",
          when(col("text_dup") && col("image_dup"), lit("both"))
            .when(col("text_dup"), lit("text"))
            .otherwise(lit("image")))
        .orderBy("doc_id")
    }),

    // C117 image-code SPEC ROLLOVER across a REAL grid change — the
    // C85 blue/green story completed on the image store (the r14
    // verdict's ask #3): iv1 serves a grid-4 (16-bit) code table while
    // the quality upgrade's grid-8 codes BACKFILL their own iv2 key
    // space (epoch-partitioned, one epoch REPLAYED both before and
    // after the flip — both no-ops); the FLIP is the spec-v2 publish (a
    // pointer commit, never an overwrite), a session pinned at v1 is
    // byte-stable through it, and c110's vacuum then retires the loser.
    // Serving from the committed pin answers c97's question exactly
    // (the c97 oracle verbatim — grid-4 codes leaking into the serving
    // plan, a half-complete backfill, or a replay duplication could
    // not hash-match). D43 is the streaming delivery of the backfill
    // (the real writeStream sink, ImageCodesStreamSpec).
    "c117_image_spec_rollover" -> ((s, dir) => {
      import graft.operators.ImageDedup
      import graft.sources.ImageCodeStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c117_roll_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      lifecycleOncePerBenchJvm(s"c117:$dir") {
        val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        val packed = ImageDedup.packImageVariants(s,
          t(s, dir, "documents"), "doc_id")
        // blue: spec v1 = grid 4 — the ENCODE is driven by the loaded
        // spec, not a constant, so the rollover is a real re-encode
        require(ImageCodeStore.publishSpec(s, root, "blockhash", grid = 4,
          bands = 4).committed)
        val (_, g1, _) = ImageCodeStore.loadSpecAt(s, root, 1)
        ImageCodeStore.appendCodesEpoch(
          ImageDedup.blockhashCodes(s, packed, grid = g1), root, 1, 0L)
        def digest(v: Int): (Long, Long) = {
          val r = ImageCodeStore.readCodes(s, root, v)
            .agg(count(lit(1)).as("n"), bit_xor(xxhash64(col("media_id"),
              col("width"), col("height"), col("code"), col("pixsum")))
              .as("x")).collect().head
          (r.getLong(0), r.getLong(1))
        }
        val pin1 = digest(1)
        // green backfill: grid-8 codes land in iv2 WHILE v1 serves (two
        // epochs by parity; epoch 1 replayed pre-flip)
        val codes8 = ImageDedup.blockhashCodes(s, packed, grid = 8).persist()
        try {
          ImageCodeStore.appendCodesEpoch(
            codes8.where(pmod(col("media_id"), lit(2)) === 0), root, 2, 0L)
          ImageCodeStore.appendCodesEpoch(
            codes8.where(pmod(col("media_id"), lit(2)) === 1), root, 2, 1L)
          ImageCodeStore.appendCodesEpoch(
            codes8.where(pmod(col("media_id"), lit(2)) === 1), root, 2, 1L)
          require(ImageCodeStore.committedSpecVersion(s, root) == 1,
            "a backfill must not move the committed pointer")
          val pre = digest(2)
          // the FLIP: publish spec v2 (grid 8) — a pointer commit
          require(ImageCodeStore.publishSpec(s, root, "blockhash", grid = 8,
            bands = 4).committed)
          require(ImageCodeStore.committedSpecVersion(s, root) == 2,
            "the flip must land the committed pointer on v2")
          // a session pinned at v1 is byte-stable through the flip
          require(digest(1) == pin1,
            "the pinned v1 key space moved across the flip")
          // a replayed backfill epoch POST-flip is still a no-op
          ImageCodeStore.appendCodesEpoch(
            codes8.where(pmod(col("media_id"), lit(2)) === 1), root, 2, 1L)
          require(digest(2) == pre,
            "post-flip epoch replay duplicated stored codes")
          // retire the loser; the committed key space survives
          val rep = ImageCodeStore.vacuumRetiredCodes(s, root,
            keepVersions = 1)
          require(rep.committed == 2 && rep.removed == Seq(1) &&
            rep.kept == Seq(2), s"vacuum accounting off: $rep")
        } finally { codes8.unpersist(); () }
      }
      ImageDedup.perceptualPairs(ImageCodeStore.readCodes(s, root, 2),
          maxHamming = 3, hotBucketCap = 64)
        .orderBy("id_a", "id_b")
    }),

    // C119 text MinHash-SIGNATURE store serving — the c104/c115
    // stored-code discipline on the LARGEST modality: every text dedup
    // query was re-running the full-corpus MinHashSigExpr pass
    // (normalize + tokenize + shingle + k minima over every byte of
    // text) inside every run; at 100 TB that pass IS the query cost.
    // Here the signature rows are published ONCE per corpus through
    // the versioned TextSigStore (spec v1, two ingest epochs by doc-id
    // parity, epoch 1 REPLAYED — the C82/C104 incremental discipline)
    // and the pair query BANDS from the stored table: no tokenizer on
    // the corpus side of the plan; only semi-join-pruned candidates
    // pay a text read at verify. Oracle = the c2 planted replay
    // UNCHANGED — pairs-from-stored must hash-equal pairs-from-compute,
    // which a lossy round trip, a k/band mix-up, or a non-idempotent
    // replay cannot fake (the one-sig-per-doc gate makes duplication
    // loud BEFORE the candidate DISTINCT would collapse it).
    "c119_text_sig_serve" -> ((s, dir) => {
      import graft.operators.Dedup
      import graft.sources.TextSigStore
      val root = textSigsRoot(s, dir)
      val v = TextSigStore.committedSpecVersion(s, root)
      val sigs = requireOneSigPerDoc(TextSigStore.readSigs(s, root, v))
      Dedup.minhashPairsFromSigs(sigs, textSigCorpus(s, dir), "text",
          "doc_id")
        .where(col("id_b") - col("id_a") === 1000000L)
        .orderBy("id_a", "id_b")
    }),

    // C120 retired text-signature vacuum — the C110/C116 lifecycle
    // rule on the C119 key space: after a spec rollover (v2 published,
    // sv2 backfilled) the old version's signatures are corpus-sized
    // dead weight; the vacuum removes sv trees at or below
    // committed − keepVersions, refuses the committed version and
    // in-flight newer keys, and serving from the surviving key space
    // still answers c2's question exactly (the c2 oracle verbatim — a
    // vacuum that touched live signatures could not hash-match).
    "c120_text_sigs_vacuum" -> ((s, dir) => {
      import graft.operators.Dedup
      import graft.sources.TextSigStore
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("c120_vac_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val corpus = textSigCorpus(s, dir)
      val sigs = Dedup.minhashSigRows(corpus, "text", "doc_id").persist()
      try {
        require(TextSigStore.publishSpec(s, root, "minhash", 64, 16, 3)
          .committed)
        TextSigStore.appendSigsEpoch(sigs, root, 1, 0L)
        // the rollover: v2 re-published (same parameters — the version
        // is the key, not the content), sv2 backfilled
        require(TextSigStore.publishSpec(s, root, "minhash", 64, 16, 3)
          .committed)
        TextSigStore.appendSigsEpoch(sigs, root, 2, 0L)
        val rep = TextSigStore.vacuumRetiredSigs(s, root,
          keepVersions = 1)
        require(rep.committed == 2 && rep.removed == Seq(1) &&
          rep.kept == Seq(2), s"vacuum accounting off: $rep")
        require(!fs.exists(new Path(
          s"$root/${TextSigStore.SigsTable}/sv1")),
          "retired key space must be gone")
        // idempotent: a rerun finds nothing to remove
        val again = TextSigStore.vacuumRetiredSigs(s, root, 1)
        require(again.removed.isEmpty && again.kept == Seq(2),
          s"vacuum rerun must be a no-op: $again")
        Dedup.minhashPairsFromSigs(
            requireOneSigPerDoc(TextSigStore.readSigs(s, root, 2)),
            corpus, "text", "doc_id")
          .where(col("id_b") - col("id_a") === 1000000L)
          .orderBy("id_a", "id_b")
      } finally { sigs.unpersist(); () }
    }),

    // C121 INCREMENTAL cross-corpus dedup from stored signatures — the
    // real shape of a daily crawl at 100 TB: yesterday's corpus (the
    // reference) has its signatures SITTING in the store; only today's
    // increment pays a MinHashSigExpr pass. The c2b question (which
    // increment docs are re-crawls of a reference original?) is served
    // with the reference side read from sv1 — the history corpus is
    // never re-tokenized, which is the difference between an
    // increment-sized job and a corpus-sized one. Oracle = the c2b
    // planted replay UNCHANGED.
    "c121_text_sig_incremental" -> ((s, dir) => {
      import graft.operators.Dedup
      import graft.sources.TextSigStore
      val docs = t(s, dir, "documents")
      val inc = docs.where(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
        .unionByName(docs.where(col("doc_id") % 3 =!= 0)
          .withColumn("doc_id", col("doc_id") + lit(2000000L))
          .withColumn("text", reverse(col("text"))))
      val root = textSigsRoot(s, dir)
      val v = TextSigStore.committedSpecVersion(s, root)
      // the store holds the full c119 corpus (originals + planted
      // copies); the reference slice is the originals — a stored-key
      // filter, not a re-tokenize
      val refSigs = requireOneSigPerDoc(
        TextSigStore.readSigs(s, root, v))
        .where(col("doc_id") < 1000000L)
      Dedup.minhashCrossPairsFromSigs(refSigs, docs, inc, "text",
          "doc_id")
        .where(col("inc_id") - col("ref_id") === 1000000L)
        .orderBy("ref_id", "inc_id")
    }),

    // C111 bounded FIRST-fit-decreasing packing — the BFD-vs-FFD A/B
    // on the c106 harness: identical slot machine, identical corpus
    // and rollup, only the election differs (oldest open bin that
    // fits vs fullest). FFD preserves open headroom longer; BFD tops
    // bins off sooner — which wins is corpus-shape-dependent, which
    // is exactly why the A/B exists as two keys with one shared
    // oracle generator (FILLRATE_local_r14.json carries the measured
    // comparison).
    "c111_ffd_packing" -> ((s, dir) => {
      import graft.operators.Chunking
      val G = graft.functions.GraftExpressions
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("tk"))
      val corpus = base.unionByName(base.where(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          (col("tk") + 300L).as("tk")))
      Chunking.packWholeDocsBounded(corpus, "doc_id", "tk", "source",
          nBands = 4, budget = 256L, openBins = 3, firstFit = true)
        .groupBy("source", "band", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("tk").as("fill_tokens"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("docs_fp"))
        .select(col("source"), col("band"), col("bin"), col("n_docs"),
          col("fill_tokens"),
          G.longDiv(col("fill_tokens") * lit(1000000L), lit(256L))
            .as("util_ppm"),
          (col("fill_tokens") > 256L).as("overflow"), col("docs_fp"))
        .orderBy("source", "band", "bin")
    }),

    // A15 idempotent append sink — PROMOTED from spec-only: the D8
    // dynamic-partition-overwrite rule gated end to end. Two epoch
    // slices land, the second is REDELIVERED verbatim (the
    // exactly-once failure case a crashed-and-retried batch job
    // exhibits), and the read-back per-partition counts + integer-cent
    // sums must equal the source slices computed by DuckDB — an
    // append-instead-of-overwrite replay doubles a partition and
    // breaks rows AND hash; a replay that leaked into the OTHER
    // partition breaks its cents.
    "a15_idempotent_append" -> ((s, dir) => {
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("a15_idem_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val ord = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      def slice(k: Int) =
        ord.where(pmod(col("o_orderkey"), lit(3)) === k)
      graft.streaming.EventStreams.epochIdempotentSink(slice(0), 0L, root)
      graft.streaming.EventStreams.epochIdempotentSink(slice(1), 1L, root)
      // the D8 replay: bit-identical overwrite of its OWN partition
      graft.streaming.EventStreams.epochIdempotentSink(slice(1), 1L, root)
      s.read.parquet(root)
        .groupBy(col("__epoch").cast("long").as("epoch"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy("epoch")
    }),

    // A21 orphan-file vacuum — PROMOTED from spec-only: the log-less
    // delta-VACUUM pass gated end to end. A partitioned table is
    // written, three aborted-write orphans are planted (job-level
    // `_temporary`, partition-level `_temporary`, a stray hidden
    // file), and the oracle locks BOTH directions: the vacuum
    // accounting (3 found / 0 removed dry / 0 removed young / 3
    // removed at retention 0, `_SUCCESS` kept) rides the output as
    // columns, and the per-partition row counts recomputed by DuckDB
    // prove no visible data file was touched.
    "a21_orphan_vacuum" -> ((s, dir) => {
      import graft.sources.Compaction
      import org.apache.hadoop.fs.Path
      val root = Tables.scratch("a21_vac_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
        .write.partitionBy("o_orderstatus").mode("overwrite").parquet(root)
      def plant(rel: String): Unit = {
        val p = new Path(s"$root/$rel")
        fs.mkdirs(p.getParent)
        val out = fs.create(p, true)
        out.write("aborted-task bytes".getBytes("UTF-8")); out.close()
      }
      plant("_temporary/0/task_000/part-0.parquet")
      plant("o_orderstatus=F/_temporary/0/part-1.parquet")
      plant(".stray-hidden-file")
      val dry = Compaction.vacuum(s, root, dryRun = true)
      val young = Compaction.vacuum(s, root) // 7-day retention guard
      val swept = Compaction.vacuum(s, root, retentionMs = 0L)
      val successKept = fs.exists(new Path(s"$root/_SUCCESS"))
      s.read.parquet(root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("orphans_found", lit(dry.orphansFound.size.toLong))
        .withColumn("dry_removed", lit(dry.removed.size.toLong))
        .withColumn("young_removed", lit(young.removed.size.toLong))
        .withColumn("swept_removed", lit(swept.removed.size.toLong))
        .withColumn("success_kept", lit(successKept))
        .orderBy("o_orderstatus")
    }),

    // A26 catalog statistics / CBO — PROMOTED from spec-only (the r16
    // verdict's ask #6): the oracle now gates (1) the recorded stats
    // themselves — ANALYZE's rowCount and per-column min/max must be
    // EXACT (DuckDB recomputes them), ndv is approximate (HLL++ at
    // rsd 0.05) so it ships as a ±15% boolean (~3σ of the estimator's
    // worst case) — and (2) the plan flip the stats exist
    // for: the same filtered-dim join plans SortMergeJoin on the cold
    // catalog (file-size estimate over the threshold) and
    // BroadcastHashJoin after ANALYZE (rowCount/ndv estimate of the
    // o_custkey equality ~ rows/ndv, deterministically under it at
    // every SF). At 100 TB this flip is the difference between a
    // hand-tuned plan and what a cold catalog produces.
    "a26_cbo_stats" -> ((s, dir) => {
      import graft.sources.CatalogTables
      import org.apache.spark.sql.catalyst.TableIdentifier
      val tag = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir))
      val cust = s"graft_a26_cust_$tag"
      val ord = s"graft_a26_ord_$tag"
      val confs = Seq("spark.sql.cbo.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "4096")
      val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        CatalogTables.registerExternal(s, cust, s"$dir/customer.parquet")
        CatalogTables.registerExternal(s, ord, s"$dir/orders.parquet")
        def planOf = t(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity")
          .join(s.table(ord).where(col("o_custkey") === 370),
            col("l_orderkey") === col("o_orderkey"))
          .queryExecution.executedPlan.toString
        val smjCold = planOf.contains("SortMergeJoin")
        CatalogTables.analyze(s, ord, Seq("o_orderkey", "o_custkey"))
        CatalogTables.analyze(s, cust, Seq("c_custkey"))
        val bhjStats = planOf.contains("BroadcastHashJoin")
        def statsRow(name: String, keyCol: String, exactNdv: Long) = {
          val st = s.sessionState.catalog
            .getTableMetadata(TableIdentifier(name)).stats
            .getOrElse(sys.error(s"no stats recorded for $name"))
          val cs = st.colStats(keyCol)
          val ndv = cs.distinctCount
            .getOrElse(sys.error(s"no ndv for $name.$keyCol")).toLong
          (name.stripPrefix("graft_a26_").stripSuffix(s"_$tag"),
            st.rowCount.getOrElse(sys.error(s"no rowCount for $name"))
              .toLong,
            cs.min.getOrElse(sys.error("no min")).toLong,
            cs.max.getOrElse(sys.error("no max")).toLong,
            // ANALYZE ndv is HLL++ at rsd 0.05 — ±15% covers the ~3σ
            // worst case; the value is deterministic at fixed data
            math.abs(ndv - exactNdv) <= 0.15 * exactNdv,
            smjCold, bhjStats)
        }
        // exact NDV truth for the ±15% HLL bound: two scalar aggregates
        val custNdv = t(s, dir, "customer")
          .agg(countDistinct(col("c_custkey"))).head.getLong(0)
        val ordNdv = t(s, dir, "orders")
          .agg(countDistinct(col("o_orderkey"))).head.getLong(0)
        import s.implicits._
        Seq(statsRow(cust, "c_custkey", custNdv),
            statsRow(ord, "o_orderkey", ordNdv))
          .toDF("tbl", "n_rows", "key_min", "key_max", "ndv_ok",
            "smj_cold", "bhj_stats")
          .orderBy("tbl")
      } finally {
        prev.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
        Seq(cust, ord).foreach(n => s.sql(s"DROP TABLE IF EXISTS `$n`"))
      }
    }),

    // D7 streaming state-store observability — PROMOTED from spec-only:
    // the per-batch StateOperatorProgress counters now gate against
    // DuckDB. One AvailableNow pass over the events table (no
    // maxFilesPerTrigger → one batch) through a keyed streaming
    // aggregate: the state-row total must equal the distinct key
    // count, every state row was updated this batch, nothing was
    // evicted. A counter that drifted (double-counted groups, phantom
    // evictions) could not match.
    "d7_state_metrics" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.{OutputMode, Trigger}
      import org.apache.hadoop.fs.Path
      val ck = Tables.scratch("d7_ck_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(ck).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(ck), true) // fresh offsets: re-runs re-measure
      val schema = t(s, dir, "events").schema
      val q = s.readStream.schema(schema)
        .parquet(stageEventsDir(s, dir))
        .groupBy("event_type").count()
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ck)
        // the sink must DRAIN the batch: state-store commit validation
        // (and the observed counters) require every partition processed
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.queryExecution.toRdd.count(); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val ss = graft.streaming.StateMetrics.samples(
        q.recentProgress.toSeq)
      require(ss.nonEmpty, "no state-operator progress reported")
      import s.implicits._
      Seq((ss.map(_.numRowsTotal).max, ss.map(_.numRowsUpdated).sum,
          ss.map(_.numRowsRemoved).sum))
        .toDF("n_state_rows", "n_updated", "n_removed")
    }),

    // D11 in-flight observed metrics — PROMOTED from spec-only: the
    // `Dataset.observe` guard aggregates (the zero-extra-scan quality
    // counters) computed ON the streaming pass now gate against DuckDB
    // recomputing them from the same table: total rows, null users,
    // out-of-domain values, unexpected event types (the D16 gate's
    // checks as counters). All longs — bit-deterministic.
    "d11_observed_metrics" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.hadoop.fs.Path
      val ck = Tables.scratch("d11_ck_" + new java.io.File(dir).getName +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir)))
      val fs = org.apache.hadoop.fs.FileSystem.get(new Path(ck).toUri,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(ck), true)
      val schema = t(s, dir, "events").schema
      val q = s.readStream.schema(schema)
        .parquet(stageEventsDir(s, dir))
        .observe("gate",
          count(lit(1)).as("n_events"),
          sum(when(col("user_id").isNull, 1L).otherwise(0L))
            .as("n_null_user"),
          sum(when(!col("value").between(0, 300), 1L).otherwise(0L))
            .as("n_bad_value"),
          sum(when(!col("event_type").isin(
            "click", "view", "purchase", "signup"), 1L).otherwise(0L))
            .as("n_odd_type"))
        .writeStream
        .option("checkpointLocation", ck)
        // drain every partition: observe() counts only processed rows
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.queryExecution.toRdd.count(); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // an empty trailing batch reports (0, null, null, null) — fold
      // null-safe across batches
      val obs = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("gate")))
      require(obs.nonEmpty, "no observed metrics reported")
      def tot(i: Int) =
        obs.map(r => if (r.isNullAt(i)) 0L else r.getLong(i)).sum
      import s.implicits._
      Seq((tot(0), tot(1), tot(2), tot(3)))
        .toDF("n_events", "n_null_user", "n_bad_value", "n_odd_type")
    })
  )

  // ------------------------------------------------------------- oracles

  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    // c28b answers the SAME question as c28 through a different plan
    // (batched joinless scan vs per-query broadcast join) — exhaustive
    // probes make both exact, so they share one brute-force replica
    base + ("c28b_ivfpq_rank_many" -> base("c28_ivfpq_topk"),
      // c81 serves c28's exact question from a published-then-loaded
      // index — floats round-trip parquet bit-exactly, so the same
      // exhaustive-probe brute-force ADC replica is the oracle; any
      // load-path corruption (torn version, reordered codebook row)
      // breaks the hash
      "c81_ann_index_serve" -> base("c28_ivfpq_topk"),
      // c82 answers c28's question from the stored-code table: same
      // exhaustive-probe replica; a non-idempotent epoch replay would
      // duplicate neighbors and shift every rank
      "c82_incremental_codes_serve" -> base("c28_ivfpq_topk"),
      // d23's batch twin computes b49's report through the O(1)
      // streaming automaton instead of the regex scan — same question,
      // same answer, so the shared oracle makes automaton ≡ RE2 itself
      // a driver-gated contract
      "d23_pattern_fold" -> base("b49_seq_pattern"),
      // c85: each rollover side must match ITS OWN brute-force ADC
      // replica (kCodes 16 for v1, 12 for v2) — assembled by plain
      // concatenation of two independently-stripMargin'd blocks
      "c85_blue_green_codes" ->
        (c85AdcSql(kCodes = 16, version = 1) + "\nUNION ALL\n" +
          c85AdcSql(kCodes = 12, version = 2) +
          "\nORDER BY version, query_id, rnk"),
      // c86: after the vacuum, the committed version must serve
      // EXACTLY its own replica — vacuumed bytes were dead by proof
      "c86_codes_vacuum" ->
        (c85AdcSql(kCodes = 12, version = 2) +
          "\nORDER BY query_id, rnk"),
      // c90: the same replica with the candidate-side metadata
      // predicate — filtered serving must equal brute force over the
      // qualifying subset (queries stay unfiltered)
      "c90_filtered_ann_serve" ->
        adcCandFilterSql(kCodes = 16,
          candWhere = "c.label IN (0, 2, 5, 7)"),
      // c91: the replica minus the tombstoned candidates — a deleted id
      // may still ASK (query 3) but must never be RETURNED
      "c91_tombstone_ann_serve" ->
        adcCandFilterSql(kCodes = 16,
          candWhere = "NOT (c.vec_id % 7 = 3 AND c.vec_id <= 346)"),
      // c92: the c79b scored relation (same training depth) swept into
      // the budget-threshold decision table
      "c92_budget_threshold" ->
        c92OracleSql(Seq("de", "en", "es", "fr", "zh"), nBuckets = 128,
          epochs = 1, nBatches = 2, lrDiv = 64L, budgetTokens = 8000L,
          binWidth = 50000L),
      // c95: the versioned model artifact must hand back EXACTLY the
      // trajectory's state at each published version — one unrolled
      // prefix read at iteration 1 (v1) and 2 (v2)
      "c95_versioned_model" ->
        c95OracleSql(Seq("de", "en", "es"), nBuckets = 128,
          nBatches = 2, lrDiv = 64L),
      // d39: the rollover stream's published v1/v2 ARE the c95
      // trajectory states (epoch e delivers pmod(doc_id,2)=e docs —
      // the rows iteration e+1 folds; featurization is
      // batch-count-independent), so the same generated oracle gates
      // the streamed snapshots
      "d39_model_rollover" ->
        c95OracleSql(Seq("de", "en", "es"), nBuckets = 128,
          nBatches = 2, lrDiv = 64L),
      // c96: the versioned tokenizer must hand back EXACTLY the c77
      // trajectory's segmentation state at each published depth —
      // the fertility tail read at w12 (v1) and w24 (v2)
      "c96_versioned_tokenizer" ->
        c96OracleSql(v1Depth = 12, v2Depth = 24),
      // c98: the c63 replica swept over nProbe — one per-setting block
      // per probe count, all sharing the code/cell/exact CTEs
      "c98_ann_tuning_curve" -> c98OracleSql(Seq(1, 2, 4, 8, 16)),
      // c101: the c83 string-shingle grid rebuild shared by all
      // bandings, one S-curve tail per config (left-associated IEEE
      // chains, no pow — the c83 exactness rule)
      "c101_banding_curve" -> c101OracleSql(k = 64,
        bandsGrid = Seq(4, 8, 16, 32)),
      // c102: three code replicas (reference / stable / reversed
      // drift), frozen reference cells, dense histograms, integer TV
      "c102_reindex_gate" -> c102OracleSql,
      // c104 serves c97's exact question from the stored code table —
      // integer codes round-trip parquet bit-exactly, so the same full
      // perceptual replay is the oracle; a lossy round trip, a spec
      // version mix-up, or a duplicated replay epoch breaks the hash
      "c104_image_code_serve" -> base("c97_image_perceptual_dedup"),
      // c110 serves the same question from the SURVIVING key space
      // after the vacuum — a vacuum that touched live codes (or left
      // the old key serving) could not hash-match the perceptual replay
      "c110_image_codes_vacuum" -> base("c97_image_perceptual_dedup"),
      // c115 serves c105's exact question from the stored landmark
      // table — every stored column is a small integer, so the table
      // round-trips parquet bit-exactly and the same cluster replay is
      // the oracle; a lossy round trip, a frame-grid mix-up, or a
      // duplicated replay epoch breaks the hash
      "c115_audio_code_serve" -> base("c105_audio_dup_clusters"),
      // c116 serves the same question from the SURVIVING key space
      // after the vacuum — a vacuum that touched live landmarks (or
      // left the old key serving) could not hash-match the replay
      "c116_audio_codes_vacuum" -> base("c105_audio_dup_clusters"),
      // c122 serves c105's question from the committed pin AFTER a
      // full blue/green frame rollover — frame-64 codes leaking into
      // the serving plan, a half-complete av2 backfill, or a replay
      // duplication could not hash-match the frame-128 cluster replay
      "c122_audio_spec_rollover" -> base("c105_audio_dup_clusters"),
      // c117 serves c97's question from the committed pin AFTER a full
      // blue/green grid rollover — grid-4 codes leaking into the
      // serving plan, a half-complete iv2 backfill, or a replay
      // duplication could not hash-match the grid-8 perceptual replay
      "c117_image_spec_rollover" -> base("c97_image_perceptual_dedup"),
      // c119 serves c2's exact question with the banding fed from the
      // stored signature table — k exact longs round-trip parquet
      // bit-exactly, so the same planted replay is the oracle; a lossy
      // round trip, a k/band mix-up, or a duplicated replay epoch
      // breaks the hash
      "c119_text_sig_serve" -> base("c2_minhash_lsh"),
      // c120 serves the same question from the SURVIVING key space
      // after the vacuum — a vacuum that touched live signatures (or
      // left the old key serving) could not hash-match the replay
      "c120_text_sigs_vacuum" -> base("c2_minhash_lsh"),
      // c121 serves c2b's exact cross-corpus question with the
      // REFERENCE side banded from stored signatures — only the
      // increment is tokenized, and the planted re-crawl replay gates
      // that the stored side pairs identically to the computed one
      "c121_text_sig_incremental" -> base("c2b_minhash_cross"),
      // c125 serves c76's exact multi-scale question with every
      // level's counts fed from the stored digest tables — md5 strings
      // round-trip parquet bit-exactly, and a duplicated replay epoch
      // would flip every window to duplicated (hash-loud)
      "c125_span_store_serve" -> base("c76_multiscale_spans"),
      // c126 serves c2's question from the committed pin AFTER a full
      // blue/green k/band rollover — k-32 signatures leaking into the
      // serving band join, a half-complete sv2 backfill, or a replay
      // duplication could not hash-match the k-64 planted replay
      "c126_text_sig_rollover" -> base("c2_minhash_lsh"),
      // c127 serves c76's question from the committed pin AFTER a full
      // blue/green ladder rollover — the single-level pv1 leaking in,
      // a half-complete pv2 backfill, or a replay duplication could
      // not hash-match the three-level replay
      "c127_span_spec_rollover" -> base("c76_multiscale_spans"),
      // c128: the c97 pixel→band→hamming chain restricted to the
      // REF × INC slice — same census over the union, same escalation
      "c128_image_incremental_pairs" ->
        ("WITH " + c97ChainSql + "\n" +
          """SELECT h.id_a AS ref_id, h.id_b AS inc_id, h.hamming,
            |       pa.pixsum = pb.pixsum AS same_pixels
            |FROM hm h
            |JOIN ps pa ON pa.media_id = h.id_a
            |JOIN ps pb ON pb.media_id = h.id_b
            |WHERE h.hamming <= 3 AND h.id_a < 2000000
            |  AND h.id_b >= 2000000
            |ORDER BY ref_id, inc_id""".stripMargin),
      // c130 serves c123's exact table from the committed version of
      // the verdict store — a publish that mangled, dropped, or
      // duplicated one row could not hash-match the composed replay
      "c130_verdict_store_serve" -> base("c123_trimodal_dup"),
      // c133 serves c123's exact table built through the D49 pair
      // ledger across three arrival epochs — a pair lost at an epoch
      // boundary, a duplicated replay append, or a mis-normalized
      // cross pair could not hash-match the composed replay
      "c133_verdict_ledger_serve" -> base("c123_trimodal_dup"),
      // c135 serves the same table from the COMPACTED ledger (with a
      // straggler replay landed post-compaction) — a fold that
      // dropped, duplicated, or cross-wired one pair could not
      // hash-match
      "c135_ledger_compaction" -> base("c123_trimodal_dup"),
      // c131 serves c124's exact rollup from the READ-BACK of the
      // exported shard files — the JSON round trip plus the partition
      // directory names must reproduce every assignment bit-exactly
      "c131_shard_export" -> base("c124_lpt_shards"),
      // c134 serves c106's exact per-bin rollup from the READ-BACK of
      // the exported bin files — a writer that dropped, duplicated, or
      // mis-binned one row could not hash-match the slot-machine replay
      "c134_packed_export" -> base("c106_bounded_bin_packing"),
      // c132 serves c76b's exact extents with every level fed from the
      // stored digest tables — the same merge, zero digest compute
      "c132_extents_from_store" -> base("c76b_span_extents"),
      // c137 serves c76b's exact extents from the incremental
      // fired-window LEDGER across two arrival epochs, a D8 replay, a
      // compaction fold, and a post-compaction straggler — a window
      // lost at an epoch boundary, a ref window re-added past its 1→2
      // transition, or a resurrected straggler could not hash-match
      "c137_span_ledger_serve" -> base("c76b_span_extents"),
      // c129: the c105 synthesis→WHT→landmark chain restricted to the
      // REF × INC slice, shared-count threshold and duration block
      // replayed
      "c129_audio_incremental_pairs" ->
        ("WITH " + c105PairSql + "\n" +
          """SELECT x.media_id AS ref_id, y.media_id AS inc_id,
            |       count(*) AS n_shared
            |FROM cc x JOIN cc y
            |  ON x.anchor = y.anchor AND x.line_a = y.line_a
            | AND x.line_t = y.line_t
            | AND x.media_id < 3000000 AND y.media_id >= 3000000
            |JOIN p pa ON pa.media_id = x.media_id
            |JOIN p pb ON pb.media_id = y.media_id AND pa.n = pb.n
            |GROUP BY 1, 2 HAVING count(*) >= 4
            |ORDER BY 1, 2""".stripMargin),
      // c114: the pixel chain + one banded block per band count
      "c114_image_banding_curve" ->
        c114OracleSql(Seq(2, 4, 8), maxHamming = 3),
      // d40: the rollover stream's published v1/v2 ARE the c77
      // trajectory's depth-12/depth-24 states (continueMerges is the
      // one-shot trainer's own loop body resumed — prefix stability by
      // construction), so the c96 oracle gates the streamed snapshots
      "d40_tokenizer_rollover" -> c96OracleSql(v1Depth = 12, v2Depth = 24),
      // c107: stored-code generations replayed from raw embeddings —
      // both centroid sets, both assignments, epoch histograms, TV
      "c107_cross_version_gate" -> c107OracleSql)
  }

  /** c75's oracle is GENERATED from the same hyperparameters the engine
    * trains with: an unrolled CTE chain — per iteration a margin agg, a
    * hard-sigmoid residual, an exact loss, a per-bucket gradient and a
    * floor-div weight update — so DuckDB replays the full descent
    * trajectory bit-for-bit (all-integer arithmetic; `//` on the
    * positive-shifted numerators ≡ the engine's truncating division).
    */
  /** One version's brute-force ADC replica for c85 — the c28 oracle
    * parameterized by codebook size (the rollover changes kCodes, so
    * each index version has its own sample pool LIMIT and therefore its
    * own codebooks/encodings/distances) and tagged with the version.
    * Emitted WITHOUT a trailing ORDER BY so two instances union; built
    * as its own stripMargin block and concatenated (never re-interpolated
    * into another stripMargin — the c78 lesson).
    */
  private def c85AdcSql(kCodes: Int, version: Int): String = {
    val limit = math.max(kCodes, 8) // buildIvfpqIndex pool: max(kCodes, nLists)
    s"""SELECT query_id, neighbor_id, adc, rnk,
       |       CAST($version AS INT) AS version FROM (
       |WITH corp AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |samp AS (
       |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |                            CAST(vec_id AS VARCHAR)) - 1 AS cw, v
       |  FROM (SELECT vec_id, v FROM corp
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
       |        LIMIT $limit)),
       |cwv AS (SELECT cw, v FROM samp WHERE cw < $kCodes),
       |subs AS (SELECT unnest(range(0, 8)) AS sub),
       |cb AS (
       |  SELECT s.sub, p.cw,
       |         list_slice(p.v, s.sub*8 + 1, s.sub*8 + 8) AS cvec
       |  FROM cwv p CROSS JOIN subs s),
       |enc AS (
       |  SELECT vec_id, sub, cw FROM (
       |    SELECT c.vec_id, b.sub, b.cw,
       |           row_number() OVER (PARTITION BY c.vec_id, b.sub
       |             ORDER BY list_distance(
       |                 list_slice(c.v, b.sub*8 + 1, b.sub*8 + 8), b.cvec),
       |               b.cw) AS rn
       |    FROM corp c CROSS JOIN cb b) t WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 5),
       |adc AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         round(sum(list_distance(
       |             list_slice(q.qv, e.sub*8 + 1, e.sub*8 + 8), b.cvec)), 6)
       |           AS adc
       |  FROM q CROSS JOIN enc e
       |  JOIN cb b ON b.sub = e.sub AND b.cw = e.cw
       |  WHERE e.vec_id <> q.query_id
       |  GROUP BY 1, 2)
       |SELECT query_id, neighbor_id, adc, rnk FROM (
       |  SELECT query_id, neighbor_id, adc,
       |         row_number() OVER (PARTITION BY query_id
       |             ORDER BY adc, neighbor_id) AS rnk
       |  FROM adc) r
       |WHERE rnk <= 6)""".stripMargin
  }

  /** c90/c91: the c28 brute-force ADC replica with a candidate-side
    * predicate (filtered / tombstone-aware serving) — codebooks derive
    * from the FULL corpus sample pool (the index predates the filter),
    * only the candidate set is restricted; queries stay unfiltered.
    * `candWhere` is a short margin-safe fragment interpolated into ONE
    * stripMargin block (no '|', per the c78 rule — enforced).
    */
  private def adcCandFilterSql(kCodes: Int, candWhere: String): String = {
    require(!candWhere.contains("|"),
      s"candWhere must be margin-safe (c78 rule): $candWhere")
    val limit = math.max(kCodes, 8) // buildIvfpqIndex pool: max(kCodes, nLists)
    s"""WITH corp AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings),
       |samp AS (
       |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |                            CAST(vec_id AS VARCHAR)) - 1 AS cw, v
       |  FROM (SELECT vec_id, v FROM corp
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
       |        LIMIT $limit)),
       |cwv AS (SELECT cw, v FROM samp WHERE cw < $kCodes),
       |subs AS (SELECT unnest(range(0, 8)) AS sub),
       |cb AS (
       |  SELECT s.sub, p.cw,
       |         list_slice(p.v, s.sub*8 + 1, s.sub*8 + 8) AS cvec
       |  FROM cwv p CROSS JOIN subs s),
       |enc AS (
       |  SELECT vec_id, sub, cw FROM (
       |    SELECT c.vec_id, b.sub, b.cw,
       |           row_number() OVER (PARTITION BY c.vec_id, b.sub
       |             ORDER BY list_distance(
       |                 list_slice(c.v, b.sub*8 + 1, b.sub*8 + 8), b.cvec),
       |               b.cw) AS rn
       |    FROM corp c CROSS JOIN cb b
       |    WHERE $candWhere) t WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 5),
       |adc AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         round(sum(list_distance(
       |             list_slice(q.qv, e.sub*8 + 1, e.sub*8 + 8), b.cvec)), 6)
       |           AS adc
       |  FROM q CROSS JOIN enc e
       |  JOIN cb b ON b.sub = e.sub AND b.cw = e.cw
       |  WHERE e.vec_id <> q.query_id
       |  GROUP BY 1, 2)
       |SELECT query_id, neighbor_id, adc, rnk FROM (
       |  SELECT query_id, neighbor_id, adc,
       |         row_number() OVER (PARTITION BY query_id
       |             ORDER BY adc, neighbor_id) AS rnk
       |  FROM adc) r
       |WHERE rnk <= 6
       |ORDER BY query_id, rnk""".stripMargin
  }

  private def c75OracleSql(nBuckets: Int, epochs: Int, nBatches: Int,
                           lrDiv: Long): String = {
    val feats =
      s"""WITH tk AS (
         |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |         doc_id % $nBatches AS batch,
         |         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
         |              ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
         |         END AS t
         |  FROM documents),
         |fa AS (
         |  SELECT doc_id, y, batch,
         |         list_concat(t,
         |           CASE WHEN len(t) >= 2
         |                THEN list_transform(range(1, len(t)),
         |                       i -> t[i] || ' ' || t[i + 1])
         |                ELSE CAST([] AS VARCHAR[]) END) AS feats
         |  FROM tk),
         |fx AS (SELECT doc_id, y, batch, unnest(feats) AS f FROM fa),
         |fb AS MATERIALIZED (
         |  SELECT doc_id, y, batch,
         |         CAST(concat('0x', substr(md5(f), 1, 8)) AS BIGINT)
         |           % $nBuckets AS b,
         |         count(*) AS x
         |  FROM fx GROUP BY 1, 2, 3, 4),
         |w0 AS MATERIALIZED (
         |  SELECT CAST(u.b AS BIGINT) AS b, CAST(0 AS BIGINT) AS w
         |  FROM (SELECT unnest(range(0, $nBuckets)) AS b) u)""".stripMargin
    val iters = (for (e <- 0 until epochs; t <- 0 until nBatches)
      yield t).zipWithIndex.map { case (t, i0) => (i0 + 1, t) }
    val steps = iters.map { case (i, t) =>
      val p = i - 1
      s""",
         |m$i AS MATERIALIZED (SELECT fb.doc_id, fb.y, CAST(sum(fb.x * w$p.w) AS BIGINT) AS m
         |        FROM fb JOIN w$p ON fb.b = w$p.b
         |        WHERE fb.batch = $t GROUP BY 1, 2),
         |r$i AS MATERIALIZED (SELECT doc_id,
         |               (greatest(-2097152, least(2097152, m)) + 2097152)
         |                 // 4096 - y * 1024 AS r
         |        FROM m$i),
         |s$i AS MATERIALIZED (SELECT count(*) AS n, CAST(sum(r * r) AS BIGINT) AS loss
         |        FROM r$i),
         |g$i AS MATERIALIZED (SELECT fb.b, CAST(sum(r$i.r * fb.x) AS BIGINT) AS g
         |        FROM fb JOIN r$i USING (doc_id)
         |        WHERE fb.batch = $t GROUP BY 1),
         |w$i AS MATERIALIZED (SELECT w$p.b,
         |               w$p.w - ((1024 * coalesce(g$i.g, 0)
         |                         + 1048576 * ($lrDiv * s$i.n))
         |                        // ($lrDiv * s$i.n) - 1048576) AS w
         |        FROM w$p LEFT JOIN g$i ON w$p.b = g$i.b, s$i)""".stripMargin
    }.mkString
    val last = iters.last._1
    val traceRows = iters.map { case (i, _) =>
      s"""|UNION ALL SELECT 'loss' AS kind, CAST($i AS BIGINT) AS k, loss AS v FROM s$i
          |UNION ALL SELECT 'n' AS kind, CAST($i AS BIGINT) AS k, CAST(n AS BIGINT) AS v FROM s$i""".stripMargin
    }.mkString("\n")
    s"""$feats$steps
       |SELECT kind, k, v FROM (
       |  SELECT 'w' AS kind, b AS k, w AS v FROM w$last
       |$traceRows
       |) ORDER BY kind, k""".stripMargin
  }

  /** c79's oracle: the c75 unrolled-trajectory chain PER CLASS — one
    * shared label-agnostic featurization (fb carries the raw lang), then
    * for each class an independent m/r/s/g/w CTE chain with the binary
    * label derived in the margin step (`lang = '<cls>'`). All-integer
    * arithmetic throughout, so all k trajectories replay bit-for-bit.
    * With `score = true`, appends the argmax scoring tail: per-doc
    * margins against every class's FINAL weights, prediction = highest
    * margin with ties to the first class in training order.
    */
  /** The c79 per-class trajectory CTE chain (feats + every class's
    * unrolled descent) and the final iteration index — shared by the
    * c79/c79b/d36 oracles and c92's sweep.
    */
  private def c79TrajPrefix(classes: Seq[String], nBuckets: Int,
                            epochs: Int, nBatches: Int,
                            lrDiv: Long): (String, Int) = {
    val feats =
      s"""WITH tk AS (
         |  SELECT doc_id, lang, doc_id % $nBatches AS batch,
         |         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
         |              ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
         |         END AS t
         |  FROM documents),
         |fa AS (
         |  SELECT doc_id, lang, batch,
         |         list_concat(t,
         |           CASE WHEN len(t) >= 2
         |                THEN list_transform(range(1, len(t)),
         |                       i -> t[i] || ' ' || t[i + 1])
         |                ELSE CAST([] AS VARCHAR[]) END) AS feats
         |  FROM tk),
         |fx AS (SELECT doc_id, lang, batch, unnest(feats) AS f FROM fa),
         |fb AS MATERIALIZED (
         |  SELECT doc_id, lang, batch,
         |         CAST(concat('0x', substr(md5(f), 1, 8)) AS BIGINT)
         |           % $nBuckets AS b,
         |         count(*) AS x
         |  FROM fx GROUP BY 1, 2, 3, 4),
         |wz AS MATERIALIZED (
         |  SELECT CAST(u.b AS BIGINT) AS b, CAST(0 AS BIGINT) AS w
         |  FROM (SELECT unnest(range(0, $nBuckets)) AS b) u)""".stripMargin
    val iters = (for (e <- 0 until epochs; t <- 0 until nBatches)
      yield t).zipWithIndex.map { case (t, i0) => (i0 + 1, t) }
    val perClass = classes.zipWithIndex.map { case (cls, ci) =>
      val zero = s",\nc${ci}w0 AS (SELECT b, w FROM wz)"
      val steps = iters.map { case (i, t) =>
        val p = i - 1
        s""",
           |c${ci}m$i AS MATERIALIZED (SELECT fb.doc_id,
           |               CASE WHEN fb.lang = '$cls' THEN 1 ELSE 0 END AS y,
           |               CAST(sum(fb.x * c${ci}w$p.w) AS BIGINT) AS m
           |        FROM fb JOIN c${ci}w$p ON fb.b = c${ci}w$p.b
           |        WHERE fb.batch = $t GROUP BY 1, 2),
           |c${ci}r$i AS MATERIALIZED (SELECT doc_id,
           |               (greatest(-2097152, least(2097152, m)) + 2097152)
           |                 // 4096 - y * 1024 AS r
           |        FROM c${ci}m$i),
           |c${ci}s$i AS MATERIALIZED (SELECT count(*) AS n,
           |               CAST(sum(r * r) AS BIGINT) AS loss
           |        FROM c${ci}r$i),
           |c${ci}g$i AS MATERIALIZED (SELECT fb.b,
           |               CAST(sum(c${ci}r$i.r * fb.x) AS BIGINT) AS g
           |        FROM fb JOIN c${ci}r$i USING (doc_id)
           |        WHERE fb.batch = $t GROUP BY 1),
           |c${ci}w$i AS MATERIALIZED (SELECT c${ci}w$p.b,
           |               c${ci}w$p.w - ((1024 * coalesce(c${ci}g$i.g, 0)
           |                         + 1048576 * ($lrDiv * c${ci}s$i.n))
           |                        // ($lrDiv * c${ci}s$i.n) - 1048576) AS w
           |        FROM c${ci}w$p LEFT JOIN c${ci}g$i
           |          ON c${ci}w$p.b = c${ci}g$i.b, c${ci}s$i)""".stripMargin
      }.mkString
      zero + steps
    }.mkString
    (feats + perClass, iters.last._1)
  }

  /** The c79 scored-path CTE chain: [[c79TrajPrefix]] + per-class final
    * margins + the argmax row — everything up to a
    * `scored(doc_id, pred, margin)` relation. c79b appends an ORDER BY
    * tail; c92 appends the threshold-sweep tail.
    */
  private def c79ScoredSql(classes: Seq[String], nBuckets: Int,
                           epochs: Int, nBatches: Int,
                           lrDiv: Long): String = {
    val (prefix, last) = c79TrajPrefix(classes, nBuckets, epochs,
      nBatches, lrDiv)
    // (doc_id, b) is unique in fb (lang and batch are functions of
    // doc_id), so fb joins each class's final weights directly; argmax
    // = best margin, ties to FIRST training class
    val marginCtes = classes.indices.map { ci =>
      s""",
         |mm$ci AS MATERIALIZED (SELECT fb.doc_id,
         |        CAST(sum(fb.x * c${ci}w$last.w) AS BIGINT) AS m
         |        FROM fb JOIN c${ci}w$last ON fb.b = c${ci}w$last.b
         |        GROUP BY 1)""".stripMargin
    }.mkString
    val unions = classes.zipWithIndex.map { case (cls, ci) =>
      s"  SELECT doc_id, '$cls' AS pred, m, $ci AS ci FROM mm$ci"
    }.mkString("\nUNION ALL\n")
    s"""$prefix$marginCtes,
       |scored AS (
       |SELECT doc_id, pred, m AS margin FROM (
       |  SELECT doc_id, pred, m,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY m DESC, ci ASC) AS rk
       |  FROM (
       |$unions
       |  ) u) v
       |WHERE rk = 1)""".stripMargin
  }

  private def c79OracleSql(classes: Seq[String], nBuckets: Int,
                           epochs: Int, nBatches: Int, lrDiv: Long,
                           score: Boolean): String = {
    if (score)
      return c79ScoredSql(classes, nBuckets, epochs, nBatches, lrDiv) +
        "\nSELECT doc_id, pred, margin FROM scored ORDER BY doc_id"
    val (prefix, last) = c79TrajPrefix(classes, nBuckets, epochs,
      nBatches, lrDiv)
    val iters = (for (e <- 0 until epochs; t <- 0 until nBatches)
      yield t).zipWithIndex.map { case (t, i0) => (i0 + 1, t) }
    val rows = classes.zipWithIndex.map { case (cls, ci) =>
      val trace = iters.map { case (i, _) =>
        s"""|UNION ALL SELECT '$cls' AS cls, 'loss' AS kind, CAST($i AS BIGINT) AS k, loss AS v FROM c${ci}s$i
            |UNION ALL SELECT '$cls' AS cls, 'n' AS kind, CAST($i AS BIGINT) AS k, CAST(n AS BIGINT) AS v FROM c${ci}s$i""".stripMargin
      }.mkString("\n")
      s"""|  SELECT '$cls' AS cls, 'w' AS kind, b AS k, w AS v FROM c${ci}w$last
          |$trace""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$prefix
       |SELECT cls, kind, k, v FROM (
       |$rows
       |) ORDER BY cls, kind, k""".stripMargin
  }

  /** c92's oracle: the c79b scored relation (same training depth) joined
    * with the token counts, swept into the budget-threshold decision
    * table — histogram bins (integer `//` truncates toward zero on
    * negatives, exactly Spark's `div` — measured), top-down cumulative
    * totals, and the selected-bin rule (highest bin reaching the budget,
    * lowest bin as the under-filled fallback).
    */
  private def c92OracleSql(classes: Seq[String], nBuckets: Int,
                           epochs: Int, nBatches: Int, lrDiv: Long,
                           budgetTokens: Long, binWidth: Long): String = {
    val scored = c79ScoredSql(classes, nBuckets, epochs, nBatches, lrDiv)
    val tail =
      s""",
         |tok AS (
         |  SELECT doc_id,
         |         CASE WHEN trim(text) = '' THEN 0
         |              ELSE len(regexp_split_to_array(trim(lower(text)),
         |                                             '\\s+'))
         |         END AS tokens
         |  FROM documents),
         |sw AS (
         |  SELECT margin // $binWidth AS bin,
         |         count(*) AS n_docs,
         |         CAST(sum(t.tokens) AS BIGINT) AS bin_tokens
         |  FROM scored s JOIN tok t USING (doc_id)
         |  GROUP BY 1),
         |cum AS (
         |  SELECT bin, n_docs, bin_tokens,
         |         CAST(sum(n_docs) OVER (ORDER BY bin DESC) AS BIGINT)
         |           AS cum_docs,
         |         CAST(sum(bin_tokens) OVER (ORDER BY bin DESC) AS BIGINT)
         |           AS cum_tokens
         |  FROM sw),
         |sel AS (
         |  SELECT coalesce(max(bin) FILTER (WHERE cum_tokens >= $budgetTokens),
         |                  min(bin)) AS tbin FROM cum)
         |SELECT cum.bin, cum.n_docs, cum.bin_tokens, cum.cum_docs,
         |       cum.cum_tokens, (cum.bin = sel.tbin) AS selected
         |FROM cum, sel
         |ORDER BY bin DESC""".stripMargin
    scored + tail
  }

  /** c95's oracle: ONE unrolled per-class trajectory prefix (epochs=1
    * over nBatches mini-batches — the same generator as c79/c79b/c92),
    * read at iteration 1 (the v1 snapshot: one fold) and iteration
    * nBatches (v2: all folds) — the versioned artifact must hand back
    * exactly the trajectory's state at each published version.
    */
  private def c95OracleSql(classes: Seq[String], nBuckets: Int,
                           nBatches: Int, lrDiv: Long): String = {
    val (prefix, last) = c79TrajPrefix(classes, nBuckets, epochs = 1,
      nBatches = nBatches, lrDiv = lrDiv)
    val rows = (for {
      (v, it) <- Seq((1, 1), (2, last))
      (cls, ci) <- classes.zipWithIndex
    } yield s"  SELECT $v AS version, '$cls' AS cls, b, w FROM c${ci}w$it")
      .mkString("\nUNION ALL\n")
    s"""$prefix
       |SELECT version, cls, b, w FROM (
       |$rows
       |) ORDER BY version, cls, b""".stripMargin
  }

  /** c77's oracle: the BPE merge trajectory unrolled — per round a
    * pair-count CTE, a top-1 pick ((total DESC, pair) byte order) and a
    * three-pass replace rewrite, all over chr(1)-delimited segmentation
    * strings. Pass count and scan semantics are engine-shared (see
    * BpeTrain's scaladoc), so the replay is bit-exact by construction.
    */
  private def c77OracleSql(numMerges: Int): String = {
    val head =
      """WITH w0 AS MATERIALIZED (
        |  SELECT chr(1) || regexp_replace(w, '(.)', '\1' || chr(1), 'g')
        |           AS s,
        |         count(*) AS cnt
        |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
        |          AS w
        |        FROM documents WHERE length(trim(text)) > 0) z
        |  WHERE length(w) > 0 AND w NOT LIKE '%' || chr(1) || '%'
        |        AND w NOT LIKE '%' || chr(2) || '%'
        |  GROUP BY 1)""".stripMargin
    val rounds = (1 to numMerges).map { r =>
      val p = r - 1
      s""",
         |pc$r AS MATERIALIZED (
         |  SELECT t[i] || chr(2) || t[i + 1] AS pair,
         |         CAST(sum(cnt) AS BIGINT) AS total
         |  FROM (SELECT list_filter(string_split(s, chr(1)),
         |                           x -> len(x) > 0) AS t, cnt
         |        FROM w$p) z, unnest(range(1, len(z.t))) u(i)
         |  GROUP BY 1),
         |tp$r AS MATERIALIZED (
         |  SELECT pair FROM pc$r ORDER BY total DESC, pair LIMIT 1),
         |w$r AS MATERIALIZED (
         |  SELECT replace(replace(replace(w.s, p.pat, p.rep),
         |                 p.pat, p.rep), p.pat, p.rep) AS s, w.cnt
         |  FROM w$p w, (SELECT chr(1) || replace(pair, chr(2), chr(1))
         |                        || chr(1) AS pat,
         |                      chr(1) || replace(pair, chr(2), '')
         |                        || chr(1) AS rep
         |               FROM tp$r) p)""".stripMargin
    }.mkString
    val out = (1 to numMerges).map { r =>
      s"""|  SELECT CAST($r AS BIGINT) AS rank,
          |         split_part(pair, chr(2), 1) AS lhs,
          |         split_part(pair, chr(2), 2) AS rhs FROM tp$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$head$rounds\nSELECT rank, lhs, rhs FROM (\n$out\n) ORDER BY rank"
  }

  /** c78's oracle: the c77 trajectory chain's FINAL segmentation state
    * (w_n) aggregated into the per-source fertility table — same
    * delimiter arithmetic for token counts, truncating integer ppm.
    */
  private def c78OracleSql(numMerges: Int): String = {
    val chain = c77OracleSql(numMerges)
    val body = chain.substring(0, chain.indexOf("\nSELECT rank"))
    // the tail is stripMargin'd ON ITS OWN: running stripMargin over a
    // string with $body interpolated would ALSO strip the body's `||`
    // concatenations down to single `|`s (it already went through its
    // own stripMargin once)
    body + ",\n" + s"""seg AS (
       |  SELECT replace(s, chr(1), '') AS word,
       |         CAST(length(s) - length(replace(s, chr(1), '')) - 1
       |              AS BIGINT) AS n_tokens
       |  FROM w$numMerges),
       |occ AS (
       |  SELECT source, w AS word FROM (
       |    SELECT source,
       |           unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents WHERE length(trim(text)) > 0) z
       |  WHERE length(w) > 0 AND w NOT LIKE '%' || chr(1) || '%'
       |        AND w NOT LIKE '%' || chr(2) || '%'),
       |j AS (SELECT o.source, s.n_tokens, length(o.word) AS wl
       |      FROM occ o JOIN seg s USING (word))
       |SELECT source, count(*) AS n_words,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(sum(wl) AS BIGINT) AS n_chars,
       |       CAST(sum(n_tokens) AS BIGINT) * 1000000 // count(*)
       |         AS fertility_ppm,
       |       CAST(sum(wl) AS BIGINT) * 1000000
       |         // CAST(sum(n_tokens) AS BIGINT) AS chars_per_token_ppm
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** c80's oracle: the c77 trajectory chain + a SECOND apply chain over
    * the reversed-corpus word table (e0..e_n — the same three-pass
    * replace per learned pair, pairs read from the trajectory's tp
    * CTEs), then both corpora's fertility tails united. The 'train'
    * block aggregates the trajectory's FINAL STATE (w_n) while the
    * engine RE-APPLIES the frozen merges — their agreement is the
    * encode ≡ training-semantics proof. Tails are built stripMargin'd
    * on their own and concatenated (the c78 interpolation rule).
    */
  private def c80OracleSql(numMerges: Int): String = {
    val chain = c77OracleSql(numMerges)
    val body = chain.substring(0, chain.indexOf("\nSELECT rank"))
    val e0 =
      """,
        |e0 AS MATERIALIZED (
        |  SELECT chr(1) || regexp_replace(w, '(.)', '\1' || chr(1), 'g')
        |           AS s,
        |         count(*) AS cnt
        |  FROM (SELECT unnest(regexp_split_to_array(trim(reverse(text)),
        |                                            '\s+')) AS w
        |        FROM documents
        |        WHERE length(trim(reverse(text))) > 0) z
        |  WHERE length(w) > 0 AND w NOT LIKE '%' || chr(1) || '%'
        |        AND w NOT LIKE '%' || chr(2) || '%'
        |  GROUP BY 1)""".stripMargin
    val evalChain = (1 to numMerges).map { r =>
      val p = r - 1
      s""",
         |e$r AS MATERIALIZED (
         |  SELECT replace(replace(replace(w.s, p.pat, p.rep),
         |                 p.pat, p.rep), p.pat, p.rep) AS s, w.cnt
         |  FROM e$p w, (SELECT chr(1) || replace(pair, chr(2), chr(1))
         |                        || chr(1) AS pat,
         |                      chr(1) || replace(pair, chr(2), '')
         |                        || chr(1) AS rep
         |               FROM tp$r) p)""".stripMargin
    }.mkString
    val tail = s""",
       |segt AS (
       |  SELECT replace(s, chr(1), '') AS word,
       |         CAST(length(s) - length(replace(s, chr(1), '')) - 1
       |              AS BIGINT) AS n_tokens
       |  FROM w$numMerges),
       |sege AS (
       |  SELECT replace(s, chr(1), '') AS word,
       |         CAST(length(s) - length(replace(s, chr(1), '')) - 1
       |              AS BIGINT) AS n_tokens
       |  FROM e$numMerges),
       |occt AS (
       |  SELECT source, w AS word FROM (
       |    SELECT source,
       |           unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents WHERE length(trim(text)) > 0) z
       |  WHERE length(w) > 0 AND w NOT LIKE '%' || chr(1) || '%'
       |        AND w NOT LIKE '%' || chr(2) || '%'),
       |occe AS (
       |  SELECT source, w AS word FROM (
       |    SELECT source,
       |           unnest(regexp_split_to_array(trim(reverse(text)),
       |                                        '\\s+')) AS w
       |    FROM documents WHERE length(trim(reverse(text))) > 0) z
       |  WHERE length(w) > 0 AND w NOT LIKE '%' || chr(1) || '%'
       |        AND w NOT LIKE '%' || chr(2) || '%'),
       |u AS (
       |  SELECT 'train' AS corpus, o.source, s.n_tokens,
       |         length(o.word) AS wl
       |  FROM occt o JOIN segt s USING (word)
       |  UNION ALL
       |  SELECT 'shifted' AS corpus, o.source, s.n_tokens,
       |         length(o.word) AS wl
       |  FROM occe o JOIN sege s USING (word))
       |SELECT corpus, source, count(*) AS n_words,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(sum(wl) AS BIGINT) AS n_chars,
       |       CAST(sum(n_tokens) AS BIGINT) * 1000000 // count(*)
       |         AS fertility_ppm,
       |       CAST(sum(wl) AS BIGINT) * 1000000
       |         // CAST(sum(n_tokens) AS BIGINT) AS chars_per_token_ppm
       |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    body + e0 + evalChain + tail
  }

  /** c96's oracle: the c77 trajectory chain read at TWO depths — the
    * fertility tail aggregated from w(v1Depth) tagged version 1 and
    * from w(v2Depth) tagged version 2. The engine re-applies the
    * LOADED merge lists (encode-from-load); the oracle aggregates the
    * trajectory's own states — agreement proves load ≡ training state
    * at each published version (the c80 proof, keyed by artifact
    * version; BPE merges are prefix-stable, so the depth-12 prefix of
    * the 24-round trajectory IS the 12-merge tokenizer). Tails built
    * stripMargin'd on their own and concatenated (the c78 rule).
    */
  private def c96OracleSql(v1Depth: Int, v2Depth: Int): String = {
    val chain = c77OracleSql(v2Depth)
    val body = chain.substring(0, chain.indexOf("\nSELECT rank"))
    body + ",\n" + s"""seg1 AS (
       |  SELECT replace(s, chr(1), '') AS word,
       |         CAST(length(s) - length(replace(s, chr(1), '')) - 1
       |              AS BIGINT) AS n_tokens
       |  FROM w$v1Depth),
       |seg2 AS (
       |  SELECT replace(s, chr(1), '') AS word,
       |         CAST(length(s) - length(replace(s, chr(1), '')) - 1
       |              AS BIGINT) AS n_tokens
       |  FROM w$v2Depth),
       |occ AS (
       |  SELECT source, w AS word FROM (
       |    SELECT source,
       |           unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents WHERE length(trim(text)) > 0) z
       |  WHERE length(w) > 0 AND w NOT LIKE '%' || chr(1) || '%'
       |        AND w NOT LIKE '%' || chr(2) || '%'),
       |u AS (
       |  SELECT CAST(1 AS INT) AS version, o.source, s.n_tokens,
       |         length(o.word) AS wl
       |  FROM occ o JOIN seg1 s USING (word)
       |  UNION ALL
       |  SELECT CAST(2 AS INT) AS version, o.source, s.n_tokens,
       |         length(o.word) AS wl
       |  FROM occ o JOIN seg2 s USING (word))
       |SELECT version, source, count(*) AS n_words,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(sum(wl) AS BIGINT) AS n_chars,
       |       CAST(sum(n_tokens) AS BIGINT) * 1000000 // count(*)
       |         AS fertility_ppm,
       |       CAST(sum(wl) AS BIGINT) * 1000000
       |         // CAST(sum(n_tokens) AS BIGINT) AS chars_per_token_ppm
       |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** c98's oracle: the c63 replica (codes → centroids → cells → exact
    * truth) with one PER-SETTING block per probe count — each block
    * re-derives the probed cells at its own rn cutoff, counts the
    * scanned candidates, ranks top-5, and aggregates one curve row;
    * the final UNION stacks the settings. All exact integers, so the
    * whole curve is hash-checked, cost columns included.
    */
  private def c98OracleSql(settings: Seq[Int]): String = {
    val prefix =
      """WITH idx AS (SELECT unnest(range(0, 64)) AS i),
        |jj AS (SELECT unnest(range(0, 16)) AS j),
        |codes AS (
        |  SELECT vec_id, CAST(j.j AS INT) AS j,
        |         CAST(sum((CASE WHEN ((j.j * 64 + i.i) * 2654435761)
        |                             % 4294967296 < 2147483648
        |                        THEN 1 ELSE -1 END)
        |              * CAST(floor(CAST(embedding[CAST(i.i AS INT) + 1]
        |                     AS DOUBLE) * 1024 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM embeddings CROSS JOIN idx i CROSS JOIN jj j
        |  GROUP BY 1, 2),
        |cent AS (SELECT vec_id AS c, j, y FROM codes WHERE vec_id < 16),
        |asg AS (
        |  SELECT v.vec_id, c.c, sum((v.y - c.y) * (v.y - c.y)) AS d
        |  FROM codes v JOIN cent c ON v.j = c.j
        |  GROUP BY 1, 2),
        |cell AS (
        |  SELECT vec_id, CAST(c AS INT) AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY d, c) AS rn FROM asg) t
        |  WHERE rn = 1),
        |edist AS (
        |  SELECT q.query_id, b.vec_id,
        |         sum((a.y - b.y) * (a.y - b.y)) AS dist
        |  FROM (SELECT vec_id AS query_id FROM embeddings
        |        WHERE vec_id < 8) q
        |  JOIN codes a ON a.vec_id = q.query_id
        |  JOIN codes b ON b.j = a.j
        |  WHERE b.vec_id <> q.query_id
        |  GROUP BY 1, 2),
        |exact AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY dist, vec_id) AS rnk FROM edist) t
        |  WHERE rnk <= 5)""".stripMargin
    val per = settings.map { np =>
      s""",
         |qp$np AS (
         |  SELECT vec_id AS query_id, CAST(c AS INT) AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |        ORDER BY d, c) AS rn
         |    FROM asg WHERE vec_id < 8) t
         |  WHERE rn <= $np),
         |cd$np AS (
         |  SELECT q.query_id, v.vec_id
         |  FROM cell v JOIN qp$np q ON v.cell = q.cell
         |  WHERE v.vec_id <> q.query_id),
         |ad$np AS (
         |  SELECT ca.query_id, ca.vec_id,
         |         sum((a.y - b.y) * (a.y - b.y)) AS dist
         |  FROM cd$np ca
         |  JOIN codes a ON a.vec_id = ca.query_id
         |  JOIN codes b ON b.vec_id = ca.vec_id AND b.j = a.j
         |  GROUP BY 1, 2),
         |ap$np AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY dist, vec_id) AS rnk FROM ad$np) t
         |  WHERE rnk <= 5),
         |r$np AS (
         |  SELECT CAST($np AS INT) AS n_probe,
         |         (SELECT count(*) FROM qp$np) AS cells_touched,
         |         (SELECT count(*) FROM cd$np) AS codes_scanned,
         |         count(*) AS n_exact, count(a.vec_id) AS n_hit,
         |         CAST(count(a.vec_id) AS BIGINT) * 1000000 // count(*)
         |           AS recall_ppm
         |  FROM exact e LEFT JOIN ap$np a
         |    ON a.query_id = e.query_id AND a.vec_id = e.vec_id)"""
        .stripMargin
    }.mkString
    val out = settings.map(np => s"SELECT * FROM r$np")
      .mkString("\nUNION ALL\n")
    prefix + per + "\n" + out + "\nORDER BY n_probe"
  }

  /** c101's oracle: the c83 string-shingle planted-grid rebuild (one
    * shared bucket table) with ONE S-curve tail per banding config —
    * per config b×r the theory is built from one correctly-rounded
    * division then left-associated IEEE multiplication chains (j
    * multiplied r times, q multiplied b times — no pow), bit-identical
    * cross-engine, the c83 exactness rule swept over configs.
    */
  private def c101OracleSql(k: Int, bandsGrid: Seq[Int]): String = {
    val prefix =
      """WITH base AS (
        |  SELECT doc_id AS id,
        |         regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |           ' ') AS w
        |  FROM documents WHERE doc_id % 3 = 0
        |), elig AS (
        |  SELECT id, w, len(w) AS n FROM base WHERE len(w) >= 5
        |), grid AS (
        |  SELECT unnest([0, 125000, 250000, 375000, 500000, 625000,
        |                 750000, 875000, 1000000]) AS f_ppm
        |), paired AS (
        |  SELECT id, w, n, f_ppm, (n * f_ppm) // 1000000 AS m
        |  FROM elig, grid
        |), varw AS (
        |  SELECT id, f_ppm, w,
        |         list_concat(w[1:m],
        |           list_transform(range(m + 1, n + 1),
        |             i -> 'x' || id || 'q' || i)) AS v
        |  FROM paired
        |), sh AS (
        |  SELECT id, f_ppm,
        |         list_distinct(list_transform(range(1, len(w) - 1),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sa,
        |         list_distinct(list_transform(range(1, len(v) - 1),
        |           i -> v[i] || ' ' || v[i+1] || ' ' || v[i+2])) AS sb
        |  FROM varw
        |), px AS (
        |  SELECT id, f_ppm,
        |         (len(list_intersect(sa, sb)) * 1000000) //
        |           (len(sa) + len(sb) - len(list_intersect(sa, sb)))
        |           AS exact_ppm
        |  FROM sh
        |), bk AS (
        |  SELECT least(19, exact_ppm // 50000) AS bucket,
        |         count(*) AS n_pairs,
        |         CAST(sum(exact_ppm) AS BIGINT) // count(*)
        |           AS mean_exact_ppm
        |  FROM px GROUP BY 1
        |)""".stripMargin
    val tails = bandsGrid.map { b =>
      val r = k / b
      val jChain = Seq.fill(r)("j").mkString("*")
      val qChain = Seq.fill(b)("q").mkString("*")
      s"""|SELECT CAST($b AS INT) AS bands, bucket, n_pairs,
          |       mean_exact_ppm,
          |       round(1.0 - $qChain, 6) AS theory_cand
          |FROM (SELECT bucket, n_pairs, mean_exact_ppm,
          |             1.0 - $jChain AS q
          |      FROM (SELECT bucket, n_pairs, mean_exact_ppm,
          |                   CAST(mean_exact_ppm AS DOUBLE) / 1000000.0
          |                     AS j
          |            FROM bk))""".stripMargin
    }.mkString("\nUNION ALL\n")
    prefix + "\n" + tails + "\nORDER BY bands, bucket"
  }

  /** c102's oracle: the c63 jlProject code replica computed for three
    * slices (reference = even ids; stable arrivals = odd ids; drifted
    * arrivals = odd ids collapsed into one orthant — `abs(embedding[i])`
    * replays Spark's element-wise abs under the same sign/grid chain),
    * frozen cells from the reference slice's first 16 even ids, dense
    * per-cell histograms (empty cells coalesce to 0 — they still
    * contribute to TV), then the integer-exact total-variation and
    * max-share arithmetic per scenario.
    */
  private def c102OracleSql: String = {
    def codesCte(name: String, whereMod: Int, drifted: Boolean): String = {
      val elem =
        if (drifted) "abs(embedding[CAST(i.i AS INT) + 1])"
        else "embedding[CAST(i.i AS INT) + 1]"
      s"""|$name AS (
          |  SELECT vec_id, CAST(j.j AS INT) AS j,
          |         CAST(sum((CASE WHEN ((j.j * 64 + i.i) * 2654435761)
          |                             % 4294967296 < 2147483648
          |                        THEN 1 ELSE -1 END)
          |              * CAST(floor(CAST($elem
          |                     AS DOUBLE) * 1024 + 0.5) AS BIGINT))
          |              AS BIGINT) AS y
          |  FROM embeddings CROSS JOIN idx i CROSS JOIN jj j
          |  WHERE vec_id % 2 = $whereMod
          |  GROUP BY 1, 2)""".stripMargin
    }
    def cellCte(src: String): String =
      s"""|asg_$src AS (
          |  SELECT v.vec_id, c.cw, sum((v.y - c.y) * (v.y - c.y)) AS d
          |  FROM $src v JOIN cent c ON v.j = c.j
          |  GROUP BY 1, 2),
          |cell_$src AS (
          |  SELECT vec_id, cw AS cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id
          |        ORDER BY d, cw) AS rn FROM asg_$src) t
          |  WHERE rn = 1),
          |hist_$src AS (
          |  SELECT d.cell, count(cl.vec_id) AS cnt
          |  FROM dom d LEFT JOIN cell_$src cl ON cl.cell = d.cell
          |  GROUP BY 1)""".stripMargin
    def scenarioSelect(tag: String, src: String): String =
      s"""|SELECT '$tag' AS scenario, t.n_ref, t.n_new,
          |       n.num * 1000000 // (t.n_ref * t.n_new * 2) AS tv_ppm,
          |       t.ma * 1000000 // t.n_ref AS max_share_ref_ppm,
          |       t.mb * 1000000 // t.n_new AS max_share_new_ppm,
          |       n.num * 1000000 // (t.n_ref * t.n_new * 2) > 200000
          |         AS rebuild
          |FROM (SELECT CAST(sum(a.cnt) AS BIGINT) AS n_ref,
          |             CAST(sum(b.cnt) AS BIGINT) AS n_new,
          |             CAST(max(a.cnt) AS BIGINT) AS ma,
          |             CAST(max(b.cnt) AS BIGINT) AS mb
          |      FROM hist_refc a JOIN hist_$src b USING (cell)) t,
          |     (SELECT CAST(sum(abs(a.cnt * tb.n - b.cnt * ta.n))
          |                  AS BIGINT) AS num
          |      FROM hist_refc a JOIN hist_$src b USING (cell),
          |           (SELECT CAST(sum(cnt) AS BIGINT) AS n
          |            FROM hist_refc) ta,
          |           (SELECT CAST(sum(cnt) AS BIGINT) AS n
          |            FROM hist_$src) tb) n""".stripMargin
    "WITH idx AS (SELECT unnest(range(0, 64)) AS i),\n" +
      "jj AS (SELECT unnest(range(0, 16)) AS j),\n" +
      codesCte("refc", 0, drifted = false) + ",\n" +
      codesCte("newstable", 1, drifted = false) + ",\n" +
      codesCte("newdrift", 1, drifted = true) + ",\n" +
      """|cent AS (SELECT vec_id AS cw, j, y FROM refc WHERE vec_id < 32),
         |dom AS (SELECT DISTINCT cw AS cell FROM cent)""".stripMargin +
      ",\n" + cellCte("refc") + ",\n" + cellCte("newstable") + ",\n" +
      cellCte("newdrift") + "\n" +
      scenarioSelect("drifted", "newdrift") + "\nUNION ALL\n" +
      scenarioSelect("stable", "newstable") + "\nORDER BY scenario"
  }

  /** The c106/c111 oracle: the bounded-open-bin slot machine replayed
    * rank-synchronously as a k=3-column recursive CTE (the d32/c100
    * discipline at state width k). The two keys differ ONLY in the
    * election CASE: best-fit (fullest eligible, tie lowest id) vs
    * first-fit (lowest-id eligible); eviction on a miss is the fullest
    * slot under both. Head and tail are shared stripMargin blocks
    * concatenated around the election (the c78 rule: never
    * re-interpolate a stripMargin'd string into another block).
    */
  private def boundedPackOracleSql(firstFit: Boolean,
                                    perSourceBudget: Boolean = false,
                                    epochArrival: Boolean = false)
      : String = {
    // d44: the same slot machine replayed in ARRIVAL order — the rank
    // that drives the recursion sorts by epoch first, BFD within
    val epSel1 =
      if (epochArrival) ",\n         doc_id % 3 AS ep" else ""
    val epSel2 =
      if (epochArrival) ",\n         (doc_id + 1000000) % 3 AS ep" else ""
    val ord = if (epochArrival) "ep, " else ""
    // budget expression per context: the recursive arm reads the
    // current row's budget (a.bg), the base case the ranked row's (bg);
    // fixed-budget keys keep the literal
    val bA = if (perSourceBudget) "a.bg" else "256"
    val bR = if (perSourceBudget) "bg" else "256"
    val tgtCase =
      if (firstFit)
        s"""|           CASE WHEN (d.b1 >= 0 AND d.f1 + a.tk <= $bA)
           |                     AND (NOT (d.b2 >= 0 AND d.f2 + a.tk <= $bA)
           |                          OR d.b1 < d.b2)
           |                     AND (NOT (d.b3 >= 0 AND d.f3 + a.tk <= $bA)
           |                          OR d.b1 < d.b3)
           |                  THEN 1
           |                WHEN (d.b2 >= 0 AND d.f2 + a.tk <= $bA)
           |                     AND (NOT (d.b3 >= 0 AND d.f3 + a.tk <= $bA)
           |                          OR d.b2 < d.b3)
           |                  THEN 2
           |                WHEN d.b3 >= 0 AND d.f3 + a.tk <= $bA THEN 3
           |                ELSE 0 END AS tgt,""".stripMargin
      else
        s"""|           CASE WHEN (d.b1 >= 0 AND d.f1 + a.tk <= $bA)
           |                     AND (NOT (d.b2 >= 0 AND d.f2 + a.tk <= $bA)
           |                          OR d.f1 > d.f2
           |                          OR (d.f1 = d.f2 AND d.b1 < d.b2))
           |                     AND (NOT (d.b3 >= 0 AND d.f3 + a.tk <= $bA)
           |                          OR d.f1 > d.f3
           |                          OR (d.f1 = d.f3 AND d.b1 < d.b3))
           |                  THEN 1
           |                WHEN (d.b2 >= 0 AND d.f2 + a.tk <= $bA)
           |                     AND (NOT (d.b3 >= 0 AND d.f3 + a.tk <= $bA)
           |                          OR d.f2 > d.f3
           |                          OR (d.f2 = d.f3 AND d.b2 < d.b3))
           |                  THEN 2
           |                WHEN d.b3 >= 0 AND d.f3 + a.tk <= $bA THEN 3
           |                ELSE 0 END AS tgt,""".stripMargin
    val bgSel =
      if (perSourceBudget)
        ",\n         128 + 64 * (CAST(substr(source, 4) AS INT) % 4) AS bg"
      else ""
    val head =
      raw"""WITH RECURSIVE toks AS (
        |  SELECT doc_id, source,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |         END AS tk
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, source, CAST(tk AS BIGINT) AS tk,
        |         doc_id % 4 AS band$epSel1$bgSel
        |  FROM toks
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, CAST(tk + 300 AS BIGINT),
        |         (doc_id + 1000000) % 4$epSel2$bgSel
        |  FROM toks WHERE doc_id % 97 = 0),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY source, band
        |             ORDER BY ${ord}tk DESC, doc_id) AS rn
        |  FROM corpus),
        |rec AS (
        |  SELECT source, band, rn, doc_id, tk,
        |         CAST(0 AS BIGINT) AS bin,
        |         CASE WHEN tk > $bR THEN CAST(-1 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS b1,
        |         CASE WHEN tk > $bR THEN CAST(0 AS BIGINT)
        |              ELSE tk END AS f1,
        |         CAST(-1 AS BIGINT) AS b2, CAST(0 AS BIGINT) AS f2,
        |         CAST(-1 AS BIGINT) AS b3, CAST(0 AS BIGINT) AS f3,
        |         CAST(1 AS BIGINT) AS nb
        |  FROM ranked WHERE rn = 1
        |  UNION ALL
        |  SELECT source, band, rn, doc_id, tk,
        |         CASE WHEN tgt = 1 THEN b1 WHEN tgt = 2 THEN b2
        |              WHEN tgt = 3 THEN b3 ELSE nb END,
        |         CASE WHEN tgt = 1 THEN b1
        |              WHEN tgt = 0 AND NOT ovs
        |                   AND (emp = 1 OR (emp = 0 AND ev = 1)) THEN nb
        |              ELSE b1 END,
        |         CASE WHEN tgt = 1 THEN f1 + tk
        |              WHEN tgt = 0 AND NOT ovs
        |                   AND (emp = 1 OR (emp = 0 AND ev = 1)) THEN tk
        |              ELSE f1 END,
        |         CASE WHEN tgt = 2 THEN b2
        |              WHEN tgt = 0 AND NOT ovs
        |                   AND (emp = 2 OR (emp = 0 AND ev = 2)) THEN nb
        |              ELSE b2 END,
        |         CASE WHEN tgt = 2 THEN f2 + tk
        |              WHEN tgt = 0 AND NOT ovs
        |                   AND (emp = 2 OR (emp = 0 AND ev = 2)) THEN tk
        |              ELSE f2 END,
        |         CASE WHEN tgt = 3 THEN b3
        |              WHEN tgt = 0 AND NOT ovs
        |                   AND (emp = 3 OR (emp = 0 AND ev = 3)) THEN nb
        |              ELSE b3 END,
        |         CASE WHEN tgt = 3 THEN f3 + tk
        |              WHEN tgt = 0 AND NOT ovs
        |                   AND (emp = 3 OR (emp = 0 AND ev = 3)) THEN tk
        |              ELSE f3 END,
        |         CASE WHEN tgt = 0 THEN nb + 1 ELSE nb END
        |  FROM (
        |    SELECT a.source, a.band, a.rn, a.doc_id, a.tk,
        |           d.b1, d.f1, d.b2, d.f2, d.b3, d.f3, d.nb,
        |           a.tk > $bA AS ovs,""".stripMargin
    val rollup =
      if (perSourceBudget)
        """|SELECT source, band, bin, count(*) AS n_docs,
           |       CAST(sum(tk) AS BIGINT) AS fill_tokens,
           |       CAST(min(bg) AS BIGINT) AS budget,
           |       CAST(sum(tk) AS BIGINT) * 1000000
           |         // CAST(min(bg) AS BIGINT) AS util_ppm,
           |       CAST(sum(tk) AS BIGINT) > CAST(min(bg) AS BIGINT)
           |         AS overflow,
           |       md5(string_agg(CAST(doc_id AS VARCHAR), ','
           |                      ORDER BY doc_id)) AS docs_fp
           |FROM rec JOIN (SELECT DISTINCT source, bg FROM ranked) sb
           |  USING (source)
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
      else
        """|SELECT source, band, bin, count(*) AS n_docs,
           |       CAST(sum(tk) AS BIGINT) AS fill_tokens,
           |       CAST(sum(tk) AS BIGINT) * 1000000 // 256 AS util_ppm,
           |       CAST(sum(tk) AS BIGINT) > 256 AS overflow,
           |       md5(string_agg(CAST(doc_id AS VARCHAR), ','
           |                      ORDER BY doc_id)) AS docs_fp
           |FROM rec GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    val tail =
      """|           CASE WHEN d.b1 < 0 THEN 1 WHEN d.b2 < 0 THEN 2
         |                WHEN d.b3 < 0 THEN 3 ELSE 0 END AS emp,
         |           CASE WHEN (d.f1 > d.f2
         |                      OR (d.f1 = d.f2 AND d.b1 < d.b2))
         |                     AND (d.f1 > d.f3
         |                          OR (d.f1 = d.f3 AND d.b1 < d.b3))
         |                  THEN 1
         |                WHEN d.f2 > d.f3
         |                     OR (d.f2 = d.f3 AND d.b2 < d.b3) THEN 2
         |                ELSE 3 END AS ev
         |    FROM ranked a JOIN rec d
         |      ON a.source = d.source AND a.band = d.band
         |     AND a.rn = d.rn + 1) q)""".stripMargin
    head + "\n" + tgtCase + "\n" + tail + "\n" + rollup
  }

  /** The c105 audio-cluster chain (synthesis -> WHT lines -> chained
    * codes -> pairs -> duration filter -> transitive closure -> member
    * lengths -> per-cluster election ranks), WITHOUT the leading WITH
    * RECURSIVE: shared by the c105 cluster-rollup oracle and the c112
    * canonical-keep oracle (built by concatenation, the c78 rule).
    */
  private def c105ChainSql: String =
    c105PairSql + ",\n" + c105ClusterTailSql

  /** The audio synthesis → WHT → chained-landmark → duration-blocked
    * PAIR replay (ids..prf) — split from the cluster tail so c123's
    * tri-modal oracle can compose the pair set without the recursive
    * closure.
    */
  private def c105PairSql: String =
    """ids AS (
        |  SELECT doc_id AS media_id, doc_id AS src, 0 AS halved
        |  FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, doc_id, 1 FROM documents
        |  WHERE doc_id % 4 = 0 AND doc_id % 7 = 0),
        |p AS (SELECT media_id, src, halved,
        |             CAST(800 + (src % 5) * 160 AS INT) AS n FROM ids),
        |s AS (SELECT media_id, src, halved, n,
        |             unnest(range(0, n)) AS i FROM p),
        |samp AS (
        |  SELECT media_id, CAST(i // 128 AS INT) AS frame_idx,
        |         CAST(i % 128 AS BIGINT) AS ii,
        |         CAST(CASE WHEN halved = 1
        |              THEN (((src * 7349 + i * 12345 + 6789) % 65536)
        |                    - 32768) // 2
        |              ELSE ((src * 7349 + i * 12345 + 6789) % 65536)
        |                   - 32768 END AS BIGINT) AS v
        |  FROM s WHERE i < (n // 128) * 128),
        |wht AS (
        |  SELECT f.media_id, f.frame_idx, j.j AS j,
        |         sum(CASE WHEN bit_count(CAST(j.j AS BIGINT) & f.ii) % 2 = 0
        |                  THEN f.v ELSE -f.v END) AS x
        |  FROM samp f CROSS JOIN (SELECT unnest(range(0, 128)) AS j) j
        |  GROUP BY 1, 2, 3),
        |ln AS (
        |  SELECT media_id, frame_idx, CAST(j AS INT) AS line FROM (
        |    SELECT *, row_number() OVER (PARTITION BY media_id, frame_idx
        |        ORDER BY x * x DESC, j) AS rn FROM wht) t
        |  WHERE rn = 1),
        |cc AS (
        |  SELECT a.media_id, a.frame_idx AS anchor, a.line AS line_a,
        |         b.line AS line_t
        |  FROM ln a JOIN ln b ON a.media_id = b.media_id
        |   AND b.frame_idx = a.frame_idx + 1),
        |pr AS (
        |  SELECT x.media_id AS id_a, y.media_id AS id_b
        |  FROM cc x JOIN cc y
        |    ON x.anchor = y.anchor AND x.line_a = y.line_a
        |   AND x.line_t = y.line_t AND x.media_id < y.media_id
        |  GROUP BY 1, 2 HAVING count(*) >= 4),
        |prf AS (
        |  SELECT pr.id_a, pr.id_b FROM pr
        |  JOIN p pa ON pa.media_id = pr.id_a
        |  JOIN p pb ON pb.media_id = pr.id_b
        |  WHERE pa.n = pb.n)""".stripMargin

  private def c105ClusterTailSql: String =
    """edges AS (
        |  SELECT id_a AS a, id_b AS b FROM prf
        |  UNION
        |  SELECT id_b, id_a FROM prf),
        |reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |lbl AS (
        |  SELECT a AS id, least(a, min(b)) AS cluster_id
        |  FROM reach GROUP BY a),
        |mem AS (
        |  SELECT l.id, l.cluster_id, CAST(p.n AS BIGINT) AS n
        |  FROM lbl l JOIN p ON p.media_id = l.id),
        |rk AS (
        |  SELECT cluster_id, id, n,
        |         row_number() OVER (PARTITION BY cluster_id
        |             ORDER BY n DESC, id) AS rn
        |  FROM mem)""".stripMargin

  /** c114's oracle: the c97 pixel chain + one banded-join block per
    * band count (bands/census/hot-refine/candidates/hamming at band
    * width 64/b — buckets partition the code, so per-band xor
    * popcounts SUM to the full hamming), aggregated to the per-b
    * (cost, recall) row against the b=8 truth. The hot-refine key is
    * the band-string full-code fk (the c97 oracle convention — it
    * only needs to equal-compare consistently within the engine).
    */
  private def c114OracleSql(bandsGrid: Seq[Int], maxHamming: Int): String = {
    require(bandsGrid == bandsGrid.sorted && bandsGrid.nonEmpty)
    val truthB = bandsGrid.max
    def block(b: Int): String = {
      val w = 64 / b
      s"""|bands_$b AS (
          |  SELECT media_id, CAST(cell // $w AS INT) AS band,
          |         CAST(sum(bit * (CAST(1 AS BIGINT)
          |              << CAST(cell % $w AS INT))) AS BIGINT) AS bucket
          |  FROM bits GROUP BY 1, 2),
          |census_$b AS (SELECT band, bucket, count(*) AS bsz
          |              FROM bands_$b GROUP BY 1, 2),
          |ref_$b AS (
          |  SELECT x.media_id, x.band, x.bucket,
          |         CASE WHEN c.bsz > 64 THEN f.fk ELSE '' END AS refine
          |  FROM bands_$b x JOIN census_$b c USING (band, bucket)
          |  JOIN fullk f USING (media_id)),
          |cand_$b AS (
          |  SELECT l.media_id AS id_a, r.media_id AS id_b
          |  FROM ref_$b l JOIN ref_$b r
          |    ON l.band = r.band AND l.bucket = r.bucket
          |   AND l.refine = r.refine
          |  WHERE l.media_id < r.media_id
          |  GROUP BY 1, 2),
          |hm_$b AS (
          |  SELECT c.id_a, c.id_b,
          |         CAST(sum(bit_count(xor(ba.bucket, bb.bucket))) AS INT)
          |           AS hamming
          |  FROM cand_$b c
          |  JOIN bands_$b ba ON ba.media_id = c.id_a
          |  JOIN bands_$b bb ON bb.media_id = c.id_b
          |    AND bb.band = ba.band
          |  GROUP BY 1, 2),
          |agg_$b AS (
          |  SELECT count(*) AS n_cand,
          |         CAST(sum(CASE WHEN hamming <= $maxHamming THEN 1
          |                       ELSE 0 END) AS BIGINT) AS n_pairs
          |  FROM hm_$b)""".stripMargin
    }
    val fullkCte =
      """|bands16k AS (
         |  SELECT media_id, CAST(cell // 16 AS INT) AS band,
         |         CAST(sum(bit * (CAST(1 AS BIGINT)
         |              << CAST(cell % 16 AS INT))) AS BIGINT) AS bucket
         |  FROM bits GROUP BY 1, 2),
         |fullk AS (
         |  SELECT media_id,
         |         string_agg(CAST(bucket AS VARCHAR), '_' ORDER BY band)
         |           AS fk
         |  FROM bands16k GROUP BY 1)""".stripMargin
    val union = bandsGrid.map(b =>
      s"  SELECT $b AS bands, ${64 / b} AS band_bits, " +
        s"${b - 1} AS guaranteed_hamming, n_cand, n_pairs FROM agg_$b")
      .mkString("\n  UNION ALL\n")
    "WITH " + c97PixelsSql + ",\n" + fullkCte + ",\n" +
      bandsGrid.map(block).mkString(",\n") + ",\n" +
      s"tr AS (SELECT n_pairs AS t FROM agg_$truthB)\n" +
      "SELECT g.bands, g.band_bits, g.guaranteed_hamming, g.n_cand,\n" +
      "       g.n_pairs, g.n_pairs * 1000000 // greatest(t.t, 1) " +
      "AS recall_ppm\n" +
      "FROM (\n" + union + ") g, tr t\nORDER BY bands"
  }

  /** c107's oracle: the c102 replay machinery pointed at TWO centroid
    * generations — jl codes for the reference slice and both arrival
    * scenarios, v1 cells (reference vec_id < 32), per-epoch dense
    * histograms + integer TV under v1's frozen frame, and the v2
    * rebuild (the same `vec_id < 32` rule over the T2 corpus) with its
    * occupancy max-share. All integers; the engine must reproduce
    * every cell from its STORED tables.
    */
  private def c107OracleSql: String = {
    def codesCte(name: String, whereMod: Int, drifted: Boolean): String = {
      val elem =
        if (drifted) "abs(embedding[CAST(i.i AS INT) + 1])"
        else "embedding[CAST(i.i AS INT) + 1]"
      s"""|$name AS (
          |  SELECT vec_id, CAST(j.j AS INT) AS j,
          |         CAST(sum((CASE WHEN ((j.j * 64 + i.i) * 2654435761)
          |                             % 4294967296 < 2147483648
          |                        THEN 1 ELSE -1 END)
          |              * CAST(floor(CAST($elem
          |                     AS DOUBLE) * 1024 + 0.5) AS BIGINT))
          |              AS BIGINT) AS y
          |  FROM embeddings CROSS JOIN idx i CROSS JOIN jj j
          |  WHERE vec_id % 2 = $whereMod
          |  GROUP BY 1, 2)""".stripMargin
    }
    // assignment of `src` codes under centroid set `cent` (+ suffix for
    // unique CTE names); hist joins against that centroid set's domain
    def cellCte(src: String, cent: String, dom: String,
                withHist: Boolean): String = {
      val assign =
        s"""|asg_${src}_$cent AS (
            |  SELECT v.vec_id, c.cw, sum((v.y - c.y) * (v.y - c.y)) AS d
            |  FROM $src v JOIN $cent c ON v.j = c.j
            |  GROUP BY 1, 2),
            |cell_${src}_$cent AS (
            |  SELECT vec_id, cw AS cell FROM (
            |    SELECT *, row_number() OVER (PARTITION BY vec_id
            |        ORDER BY d, cw) AS rn FROM asg_${src}_$cent) t
            |  WHERE rn = 1)""".stripMargin
      if (!withHist) assign
      else assign + s""",
hist_${src}_$cent AS (
  SELECT d.cell, count(cl.vec_id) AS cnt
  FROM $dom d LEFT JOIN cell_${src}_$cent cl ON cl.cell = d.cell
  GROUP BY 1)"""
    }
    def scenarioSelect(tag: String, arr: String): String =
      s"""|SELECT '$tag' AS scenario, t.n_ref, t.n_new,
          |       n.num * 1000000 // (t.n_ref * t.n_new * 2) AS tv_ppm,
          |       t.ma * 1000000 // t.n_ref AS max_share_ref_ppm,
          |       t.mb * 1000000 // t.n_new AS max_share_new_ppm,
          |       v.n_v2, v.mv2 * 1000000 // v.n_v2 AS max_share_v2_ppm,
          |       n.num * 1000000 // (t.n_ref * t.n_new * 2) > 200000
          |         AS rebuild
          |FROM (SELECT CAST(sum(a.cnt) AS BIGINT) AS n_ref,
          |             CAST(sum(b.cnt) AS BIGINT) AS n_new,
          |             CAST(max(a.cnt) AS BIGINT) AS ma,
          |             CAST(max(b.cnt) AS BIGINT) AS mb
          |      FROM hist_refc_cent1 a JOIN hist_${arr}_cent1 b
          |        USING (cell)) t,
          |     (SELECT CAST(sum(abs(a.cnt * tb.n - b.cnt * ta.n))
          |                  AS BIGINT) AS num
          |      FROM hist_refc_cent1 a JOIN hist_${arr}_cent1 b
          |        USING (cell),
          |           (SELECT CAST(sum(cnt) AS BIGINT) AS n
          |            FROM hist_refc_cent1) ta,
          |           (SELECT CAST(sum(cnt) AS BIGINT) AS n
          |            FROM hist_${arr}_cent1) tb) n,
          |     (SELECT CAST(sum(c) AS BIGINT) AS n_v2,
          |             CAST(max(c) AS BIGINT) AS mv2
          |      FROM (SELECT cell, count(*) AS c
          |            FROM cell_t2${arr}_cent2$arr
          |            GROUP BY 1) z) v""".stripMargin
    "WITH idx AS (SELECT unnest(range(0, 64)) AS i),\n" +
      "jj AS (SELECT unnest(range(0, 16)) AS j),\n" +
      codesCte("refc", 0, drifted = false) + ",\n" +
      codesCte("newstable", 1, drifted = false) + ",\n" +
      codesCte("newdrift", 1, drifted = true) + ",\n" +
      """|cent1 AS (SELECT vec_id AS cw, j, y FROM refc WHERE vec_id < 32),
         |dom1 AS (SELECT DISTINCT cw AS cell FROM cent1),
         |t2newstable AS (SELECT * FROM refc UNION ALL
         |                SELECT * FROM newstable),
         |t2newdrift AS (SELECT * FROM refc UNION ALL
         |               SELECT * FROM newdrift),
         |cent2newstable AS (SELECT vec_id AS cw, j, y FROM t2newstable
         |                   WHERE vec_id < 32),
         |cent2newdrift AS (SELECT vec_id AS cw, j, y FROM t2newdrift
         |                  WHERE vec_id < 32)""".stripMargin + ",\n" +
      cellCte("refc", "cent1", "dom1", withHist = true) + ",\n" +
      cellCte("newstable", "cent1", "dom1", withHist = true) + ",\n" +
      cellCte("newdrift", "cent1", "dom1", withHist = true) + ",\n" +
      cellCte("t2newstable", "cent2newstable", "", withHist = false) +
      ",\n" +
      cellCte("t2newdrift", "cent2newdrift", "", withHist = false) + "\n" +
      scenarioSelect("drifted", "newdrift") + "\nUNION ALL\n" +
      scenarioSelect("stable", "newstable") + "\nORDER BY scenario"
  }

  /** c80b's oracle: the c77 chain's final segmentation LEFT-joined by
    * the reversed corpus's occurrences — OOV rows fall back to
    * character-level token counts and are counted per source.
    */
  private def c80bOracleSql(numMerges: Int): String = {
    val chain = c77OracleSql(numMerges)
    val body = chain.substring(0, chain.indexOf("\nSELECT rank"))
    body + ",\n" + s"""seg AS (
       |  SELECT replace(s, chr(1), '') AS word,
       |         CAST(length(s) - length(replace(s, chr(1), '')) - 1
       |              AS BIGINT) AS n_tokens
       |  FROM w$numMerges),
       |occ AS (
       |  SELECT source, w AS word FROM (
       |    SELECT source,
       |           unnest(regexp_split_to_array(trim(reverse(text)),
       |                                        '\\s+')) AS w
       |    FROM documents WHERE length(trim(reverse(text))) > 0) z
       |  WHERE length(w) > 0 AND w NOT LIKE '%' || chr(1) || '%'
       |        AND w NOT LIKE '%' || chr(2) || '%'),
       |j AS (SELECT o.source,
       |             CASE WHEN s.n_tokens IS NULL THEN 1 ELSE 0 END AS oov,
       |             coalesce(s.n_tokens, length(o.word)) AS n_tok_eff,
       |             length(o.word) AS wl
       |      FROM occ o LEFT JOIN seg s USING (word))
       |SELECT source, count(*) AS n_words,
       |       CAST(sum(oov) AS BIGINT) AS n_oov,
       |       CAST(sum(n_tok_eff) AS BIGINT) AS n_tokens,
       |       CAST(sum(wl) AS BIGINT) AS n_chars,
       |       CAST(sum(n_tok_eff) AS BIGINT) * 1000000 // count(*)
       |         AS fertility_ppm,
       |       CAST(sum(wl) AS BIGINT) * 1000000
       |         // CAST(sum(n_tok_eff) AS BIGINT) AS chars_per_token_ppm
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The c97 perceptual PAIR chain (imgs -> dims -> pixels -> gray ->
    * checksums -> cells -> bits -> bands -> census -> hot refine ->
    * candidates -> hamming), WITHOUT the leading WITH: shared by the
    * c97 pair oracle ("WITH " + chain + pair select) and the c97b
    * cluster oracle ("WITH RECURSIVE " + chain + transitive-closure
    * tail). Built as one stripMargin block, concatenated by callers
    * (the c78 rule: never re-interpolate a stripMargin'd string into
    * another stripMargin block).
    */
  private def c97PixelsSql: String =
    """imgs AS (
        |  SELECT doc_id AS media_id, doc_id AS src, 0 AS delta
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id, 0 FROM documents
        |  WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, doc_id, 8 FROM documents
        |  WHERE doc_id % 10 = 0),
        |dims AS (
        |  SELECT media_id, src, delta,
        |         src % 64 + 16 AS w, src % 48 + 16 AS h
        |  FROM imgs),
        |px AS (
        |  SELECT media_id, src, delta, w, h,
        |         w - w % 8 AS w8, h - h % 8 AS h8,
        |         unnest(range(0, w)) AS x
        |  FROM dims),
        |pxy AS (SELECT *, unnest(range(0, h)) AS y FROM px),
        |vv AS (
        |  SELECT media_id, w8, h8, x, y, delta,
        |         ((src * 1103515245 + x * 31 + y * 131) & 16777215) AS v
        |  FROM pxy),
        |g AS (
        |  SELECT media_id, w8, h8, x, y,
        |         least(((v >> 16) & 255) + delta, 255)
        |         + least(((v >> 8) & 255) + delta, 255)
        |         + least((v & 255) + delta, 255) AS gv
        |  FROM vv),
        |ps AS (
        |  SELECT media_id,
        |         CAST(sum(gv * (x + 1) * (y + 3)) AS BIGINT) AS pixsum
        |  FROM g GROUP BY 1),
        |cells AS (
        |  SELECT media_id,
        |         (y // (h8 // 8)) * 8 + (x // (w8 // 8)) AS cell,
        |         CAST(sum(gv) AS BIGINT) AS s
        |  FROM g WHERE x < w8 AND y < h8 GROUP BY 1, 2),
        |tot AS (SELECT media_id, sum(s) AS total FROM cells GROUP BY 1),
        |bits AS (
        |  SELECT c.media_id, c.cell,
        |         CASE WHEN 64 * c.s > t.total THEN 1 ELSE 0 END AS bit
        |  FROM cells c JOIN tot t USING (media_id))""".stripMargin

  private def c97ChainSql: String =
    c97PixelsSql + ",\n" + c97BandTailSql

  /** The b=4 production banding tail (bands/census/fullk/hot-refine/
    * candidates/hamming) — split from the pixel prefix so c114's
    * banding-curve oracle can reuse the pixels with its own per-band
    * blocks.
    */
  private def c97BandTailSql: String =
    """bands AS (
        |  SELECT media_id, CAST(cell // 16 AS INT) AS band,
        |         CAST(sum(bit * (CAST(1 AS BIGINT)
        |              << CAST(cell % 16 AS INT))) AS BIGINT) AS bucket
        |  FROM bits GROUP BY 1, 2),
        |census AS (SELECT band, bucket, count(*) AS bsz
        |           FROM bands GROUP BY 1, 2),
        |fullk AS (
        |  SELECT media_id,
        |         string_agg(CAST(bucket AS VARCHAR), '_' ORDER BY band)
        |           AS fk
        |  FROM bands GROUP BY 1),
        |ref AS (
        |  SELECT b.media_id, b.band, b.bucket,
        |         CASE WHEN c.bsz > 64 THEN f.fk ELSE '' END AS refine
        |  FROM bands b JOIN census c USING (band, bucket)
        |  JOIN fullk f USING (media_id)),
        |cand AS (
        |  SELECT DISTINCT l.media_id AS id_a, r.media_id AS id_b
        |  FROM ref l JOIN ref r
        |    ON l.band = r.band AND l.bucket = r.bucket
        |   AND l.refine = r.refine
        |  WHERE l.media_id < r.media_id),
        |hm AS (
        |  SELECT c.id_a, c.id_b,
        |         CAST(sum(bit_count(xor(ba.bucket, bb.bucket))) AS INT)
        |           AS hamming
        |  FROM cand c
        |  JOIN bands ba ON ba.media_id = c.id_a
        |  JOIN bands bb ON bb.media_id = c.id_b AND bb.band = ba.band
        |  GROUP BY 1, 2)""".stripMargin

  private def oracleSqlBase: Map[String, String] = Map(

    "c77_bpe_train" -> c77OracleSql(numMerges = 24),

    "c80_frozen_encode_fertility" -> c80OracleSql(numMerges = 24),

    "c80b_frozen_fallback_fertility" -> c80bOracleSql(numMerges = 24),

    "c78_tokenizer_fertility" -> c78OracleSql(numMerges = 24),

    // c83: the DuckDB side REBUILDS the planted-variant grid from raw
    // text (string shingles, not the engine's XXH64 hash sets) and
    // re-derives the calibration table — integer ppm throughout; the
    // theory column is one correctly-rounded division then
    // left-associated IEEE multiplications (j^4 and q^16 written out),
    // bit-identical cross-engine without pow()
    "c83_minhash_calibration" ->
      """WITH base AS (
        |  SELECT doc_id AS id,
        |         regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |           ' ') AS w
        |  FROM documents WHERE doc_id % 3 = 0
        |), elig AS (
        |  SELECT id, w, len(w) AS n FROM base WHERE len(w) >= 5
        |), grid AS (
        |  SELECT unnest([0, 125000, 250000, 375000, 500000, 625000,
        |                 750000, 875000, 1000000]) AS f_ppm
        |), paired AS (
        |  SELECT id, w, n, f_ppm, (n * f_ppm) // 1000000 AS m
        |  FROM elig, grid
        |), varw AS (
        |  SELECT id, f_ppm, w,
        |         list_concat(w[1:m],
        |           list_transform(range(m + 1, n + 1),
        |             i -> 'x' || id || 'q' || i)) AS v
        |  FROM paired
        |), sh AS (
        |  SELECT id, f_ppm,
        |         list_distinct(list_transform(range(1, len(w) - 1),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sa,
        |         list_distinct(list_transform(range(1, len(v) - 1),
        |           i -> v[i] || ' ' || v[i+1] || ' ' || v[i+2])) AS sb
        |  FROM varw
        |), px AS (
        |  SELECT id, f_ppm,
        |         (len(list_intersect(sa, sb)) * 1000000) //
        |           (len(sa) + len(sb) - len(list_intersect(sa, sb)))
        |           AS exact_ppm
        |  FROM sh
        |), bk AS (
        |  SELECT least(19, exact_ppm // 50000) AS bucket,
        |         count(*) AS n_pairs,
        |         CAST(sum(exact_ppm) AS BIGINT) // count(*)
        |           AS mean_exact_ppm
        |  FROM px GROUP BY 1
        |)
        |SELECT bucket, n_pairs, mean_exact_ppm,
        |       round(1.0 - q*q*q*q*q*q*q*q*q*q*q*q*q*q*q*q, 6)
        |         AS theory_cand
        |FROM (SELECT bucket, n_pairs, mean_exact_ppm, 1.0 - j*j*j*j AS q
        |      FROM (SELECT bucket, n_pairs, mean_exact_ppm,
        |                   CAST(mean_exact_ppm AS DOUBLE) / 1000000.0 AS j
        |            FROM bk))
        |ORDER BY bucket""".stripMargin,

    // c88: the same string-shingle grid rebuild as c83, exact columns
    // only (SimHash has no closed-form curve to derive)
    "c88_simhash_calibration" ->
      """WITH base AS (
        |  SELECT doc_id AS id,
        |         regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |           ' ') AS w
        |  FROM documents WHERE doc_id % 3 = 0
        |), elig AS (
        |  SELECT id, w, len(w) AS n FROM base WHERE len(w) >= 5
        |), grid AS (
        |  SELECT unnest([0, 125000, 250000, 375000, 500000, 625000,
        |                 750000, 875000, 1000000]) AS f_ppm
        |), paired AS (
        |  SELECT id, w, n, f_ppm, (n * f_ppm) // 1000000 AS m
        |  FROM elig, grid
        |), varw AS (
        |  SELECT id, f_ppm, w,
        |         list_concat(w[1:m],
        |           list_transform(range(m + 1, n + 1),
        |             i -> 'x' || id || 'q' || i)) AS v
        |  FROM paired
        |), sh AS (
        |  SELECT id, f_ppm,
        |         list_distinct(list_transform(range(1, len(w) - 1),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sa,
        |         list_distinct(list_transform(range(1, len(v) - 1),
        |           i -> v[i] || ' ' || v[i+1] || ' ' || v[i+2])) AS sb
        |  FROM varw
        |), px AS (
        |  SELECT id, f_ppm,
        |         (len(list_intersect(sa, sb)) * 1000000) //
        |           (len(sa) + len(sb) - len(list_intersect(sa, sb)))
        |           AS exact_ppm
        |  FROM sh
        |)
        |SELECT least(19, exact_ppm // 50000) AS bucket,
        |       count(*) AS n_pairs,
        |       CAST(sum(exact_ppm) AS BIGINT) // count(*)
        |         AS mean_exact_ppm
        |FROM px GROUP BY 1
        |ORDER BY bucket""".stripMargin,

    // c89: the planted-cosine lattice rebuild — quantize to the 1/1024
    // grid, keep the prefix / negate the tail, and the positive-shifted
    // exact cosine is one integer division (Sm*1e6 // S)
    "c89_hyperplane_calibration" ->
      """WITH base AS (
        |  SELECT vec_id AS id,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5)
        |                     AS BIGINT)) AS q
        |  FROM embeddings WHERE vec_id % 3 = 0
        |), el AS (
        |  SELECT id, q,
        |         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT)
        |           AS s
        |  FROM base
        |), elig AS (
        |  SELECT id, q, s FROM el WHERE s > 0
        |), grid AS (
        |  SELECT unnest([0, 125000, 250000, 375000, 500000, 625000,
        |                 750000, 875000, 1000000]) AS f_ppm
        |), pr AS (
        |  SELECT id, q, s, f_ppm, (len(q) * f_ppm) // 1000000 AS m
        |  FROM elig, grid
        |), px AS (
        |  SELECT (CAST(coalesce(
        |            list_sum(list_transform(q[1:m], x -> x * x)), 0)
        |            AS BIGINT) * 1000000) // s AS cosp_ppm
        |  FROM pr
        |)
        |SELECT least(19, cosp_ppm // 50000) AS bucket,
        |       count(*) AS n_pairs,
        |       CAST(sum(cosp_ppm) AS BIGINT) // count(*) AS mean_cosp_ppm
        |FROM px GROUP BY 1
        |ORDER BY bucket""".stripMargin,

    "c75_classifier_train" ->
      c75OracleSql(nBuckets = 128, epochs = 3, nBatches = 3, lrDiv = 64L),

    "c79_multiclass_train" ->
      c79OracleSql(Seq("de", "en", "es", "fr", "zh"), nBuckets = 128,
        epochs = 2, nBatches = 2, lrDiv = 64L, score = false),

    // d36's epoch-major online fold ≡ class-major training at epochs=1
    "d36_online_multiclass" ->
      c79OracleSql(Seq("de", "en", "es", "fr", "zh"), nBuckets = 128,
        epochs = 1, nBatches = 3, lrDiv = 64L, score = false),

    "c79b_trained_langid" ->
      c79OracleSql(Seq("de", "en", "es", "fr", "zh"), nBuckets = 128,
        epochs = 1, nBatches = 2, lrDiv = 64L, score = true),

    // d33's online fold is bit-identical to train(epochs=1): the same
    // generated trajectory replica, one epoch
    "d33_online_train" ->
      c75OracleSql(nBuckets = 128, epochs = 1, nBatches = 3, lrDiv = 64L),

    "a1_csv_schema_read" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty,
        |       min(strftime(l_shipdate, '%Y-%m-%d')) AS min_ship
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a2_recode_map" ->
      """SELECT CASE l_returnflag WHEN 'A' THEN 'Accepted'
        |            WHEN 'N' THEN 'None' WHEN 'R' THEN 'Refused' END
        |         AS l_returnflag,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a3_recode_bool" ->
      """SELECT (o_orderstatus = 'O') AS IN_OPEN, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "a4_cast_int" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(CAST(CAST(l_quantity AS INT) AS VARCHAR) AS INT))
        |            AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a5_parse_date" ->
      """SELECT year(CAST(l_shipdate AS DATE)) AS yr, count(*) AS cnt,
        |       count(*) AS n_match
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a6_derive_or" ->
      """SELECT (l_quantity > 25 OR l_discount > 0.05) AS IN_EITHER,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a7_prefix_cols" ->
      """SELECT n_nationkey AS dim_n_nationkey, n_name AS dim_n_name
        |FROM nation ORDER BY 1""".stripMargin,

    "a8_union_regions" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a9_balanced_repartition" ->
      """SELECT l_returnflag, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a10_partitioned_sink" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a11_censo_pipeline" ->
      """SELECT CASE l_returnflag WHEN 'A' THEN 'Accepted'
        |            WHEN 'N' THEN 'None' WHEN 'R' THEN 'Refused' END
        |         AS TP_RETURN,
        |       year(CAST(l_shipdate AS DATE)) AS yr,
        |       (l_quantity > 25 OR l_discount > 0.05) AS IN_ANY,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "a16_profile" ->
      """WITH s AS (SELECT * FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'l_orderkey' AS "column",
        |    count(l_orderkey) AS n_non_null,
        |    count(*) - count(l_orderkey) AS n_nulls,
        |    count(DISTINCT l_orderkey) AS n_distinct,
        |    CAST(min(l_orderkey) AS VARCHAR) AS min_value,
        |    CAST(max(l_orderkey) AS VARCHAR) AS max_value FROM s
        |  UNION ALL
        |  SELECT 'l_linenumber', count(l_linenumber),
        |    count(*) - count(l_linenumber), count(DISTINCT l_linenumber),
        |    CAST(min(l_linenumber) AS VARCHAR),
        |    CAST(max(l_linenumber) AS VARCHAR) FROM s
        |  UNION ALL
        |  SELECT 'l_quantity', count(l_quantity),
        |    count(*) - count(l_quantity), count(DISTINCT l_quantity),
        |    CAST(min(l_quantity) AS VARCHAR),
        |    CAST(max(l_quantity) AS VARCHAR) FROM s
        |  UNION ALL
        |  SELECT 'l_returnflag', count(l_returnflag),
        |    count(*) - count(l_returnflag), count(DISTINCT l_returnflag),
        |    CAST(min(l_returnflag) AS VARCHAR),
        |    CAST(max(l_returnflag) AS VARCHAR) FROM s
        |) ORDER BY "column"""".stripMargin,

    "a12_catalog_table" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty
        |FROM lineitem WHERE l_returnflag <> 'N'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_join_topk" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_star_join" ->
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(DISTINCT o_orderkey) AS n_orders
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "b4_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |         row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |           AS run_sum
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "b5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "b6_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // same explicit grouping-bit formula, same NULLS FIRST order
    "b40_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
        |            AS INT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST,
        |         l_linestatus NULLS FIRST""".stripMargin,

    // DuckDB's native DISTINCT window aggregate replays the identical
    // frame; the (ts, event_id) order key makes the frame content —
    // hence the running count — engine-independent
    "b41_window_distinct" ->
      """SELECT event_id, user_id,
        |       CAST(count(DISTINCT event_type) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       AS INT) AS n_types_seen
        |FROM events ORDER BY event_id""".stripMargin,

    // identical frame, identical linear-interpolation quantile
    "b43_window_median" ->
      """SELECT event_id, event_type,
        |       round(quantile_cont(value, 0.5) OVER (
        |         PARTITION BY event_type ORDER BY ts, event_id
        |         ROWS BETWEEN 99 PRECEDING AND CURRENT ROW), 4) AS med
        |FROM events ORDER BY event_id""".stripMargin,

    "b7_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // conditional-agg replica with Spark's pivot column naming
    "b44_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2)
        |    AS F_qty,
        |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F_cnt,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2)
        |    AS O_qty,
        |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O_cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "b8_pivot" ->
      """SELECT o_orderstatus,
        |       count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
        |         AS n_urgent,
        |       count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_low,
        |       round(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |                      THEN o_totalprice ELSE 0 END), 2) AS urgent_value
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "b9_exists" ->
      """SELECT c_nationkey, count(*) AS n_rich FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "b11_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "b14_lead_lag" ->
      """SELECT o_custkey, o_orderkey, days_since_prev, price_quartile FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(date_diff('day',
        |      CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey) AS DATE),
        |      CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev,
        |    CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice DESC, o_orderkey)
        |      AS INT) AS price_quartile
        |  FROM orders) t
        |WHERE days_since_prev IS NOT NULL
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "b15_set_ops" ->
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,

    // DuckDB's native ALL variants carry the same multiplicities
    "b47_bag_set_ops" ->
      """WITH i AS (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |e AS (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |ic AS (SELECT o_custkey, count(*) AS n_inter FROM i GROUP BY 1),
        |ec AS (SELECT o_custkey, count(*) AS n_except FROM e GROUP BY 1)
        |SELECT coalesce(ic.o_custkey, ec.o_custkey) AS o_custkey,
        |       coalesce(ic.n_inter, 0) AS n_inter,
        |       coalesce(ec.n_except, 0) AS n_except
        |FROM ic FULL OUTER JOIN ec ON ic.o_custkey = ec.o_custkey
        |ORDER BY o_custkey""".stripMargin,

    // value-based RANGE frame over epoch days — identical frame
    // semantics in both engines (peers share a frame; the bound is a
    // day delta, not a row count)
    "b27_range_frame" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT)
        |           AS days,
        |         o_totalprice
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, days,
        |       count(*) OVER w AS cnt_90,
        |       round(sum(o_totalprice) OVER w, 2) AS sum_90
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY days
        |             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    // the oracle reads the raw columns — the Spark side must round-trip
    // them through JSON → VARIANT → typed path extraction unchanged
    "b30_variant" ->
      """SELECT o_orderstatus AS status, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS sum_total,
        |       CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
        |       count(DISTINCT o_orderpriority) AS n_prio
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // explicit UNION ALL long-form rebuild — engine-agnostic unpivot
    "b29_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag, round(sum(l_quantity), 2) AS qty,
        |         round(sum(l_extendedprice), 2) AS price,
        |         round(sum(l_discount), 2) AS disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM a
        |UNION ALL SELECT l_returnflag, 'price', price FROM a
        |UNION ALL SELECT l_returnflag, 'disc', disc FROM a
        |ORDER BY 1, 2""".stripMargin,

    // DuckDB runs the IDENTICAL recursive closure — same seed band,
    // same inverted-edge equi-join expansion, same depth guard
    "b28_recursive_cte" ->
      """WITH RECURSIVE edges AS (
        |  SELECT p_partkey, p_partkey // 2 AS parent
        |  FROM part WHERE p_partkey >= 2),
        |bom(root, pk, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM part
        |  WHERE p_partkey BETWEEN 1 AND 8
        |  UNION ALL
        |  SELECT b.root, e.p_partkey, b.depth + 1
        |  FROM bom b JOIN edges e ON e.parent = b.pk
        |  WHERE b.depth < 20)
        |SELECT b.root, count(*) AS n_parts, max(b.depth) AS max_depth,
        |       round(sum(p.p_retailprice), 2) AS sum_price
        |FROM bom b JOIN part p ON p.p_partkey = b.pk
        |GROUP BY b.root ORDER BY b.root""".stripMargin,

    // same grid: generate_series over the observed hour range × the
    // distinct types, zero-filled left join
    "b34_densify" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |         count(*) AS n_events, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM h),
        |grid AS (
        |  SELECT g.hour, t.event_type
        |  FROM (SELECT unnest(generate_series((SELECT lo FROM b),
        |          (SELECT hi FROM b), INTERVAL 1 HOUR)) AS hour) g
        |  CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
        |SELECT strftime(grid.hour, '%Y-%m-%d %H:%M:%S') AS hour,
        |       grid.event_type,
        |       coalesce(h.n_events, 0) AS n_events,
        |       coalesce(h.sum_value, 0.0) AS sum_value
        |FROM grid LEFT JOIN h
        |  ON h.hour = grid.hour AND h.event_type = grid.event_type
        |ORDER BY 1, 2""".stripMargin,

    // identical window (unique sort key), position before thinning
    "b38_window_stats" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |       round(pr, 6) AS pr, round(cd, 6) AS cd, third_lowest
        |FROM (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    percent_rank() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice, o_orderkey) AS pr,
        |    cume_dist() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice, o_orderkey) AS cd,
        |    nth_value(o_totalprice, 3) OVER (
        |        PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND UNBOUNDED FOLLOWING) AS third_lowest
        |  FROM orders) t
        |WHERE o_orderkey % 101 = 0 ORDER BY o_orderkey""".stripMargin,

    // same exact-cents arrays, same sort/slice/join-string contract
    "b39_array_agg" ->
      """SELECT o_orderpriority,
        |       array_to_string(
        |         list_sort(list(CAST(round(o_totalprice * 100) AS BIGINT)),
        |                   'DESC')[1:5], ',') AS top5_cents,
        |       count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // same two keyed aggregates + left join; hours from exact integer
    // micros so the doubles are bit-identical before rounding
    "b35_funnel" ->
      """WITH signup AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |fp AS (
        |  SELECT s.user_id, s.signup_ts, min(e.ts) AS first_purch
        |  FROM signup s LEFT JOIN events e
        |    ON e.user_id = s.user_id AND e.event_type = 'purchase'
        |   AND e.ts > s.signup_ts
        |  GROUP BY 1, 2)
        |SELECT CAST(signup_ts AS DATE) AS cohort_day,
        |       count(*) AS n_signups,
        |       count(CASE WHEN first_purch IS NOT NULL
        |                   AND first_purch <= signup_ts + INTERVAL 24 HOUR
        |             THEN 1 END) AS n_conv_24h,
        |       round(avg(CASE WHEN first_purch IS NOT NULL
        |                       AND first_purch <= signup_ts + INTERVAL 24 HOUR
        |             THEN (epoch_us(first_purch) - epoch_us(signup_ts))
        |                  / 3600000000.0 END), 4) AS avg_hours
        |FROM fp GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical textbook estimators (sample covariance/variance, OLS)
    "b36_stats" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |       round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
        |       round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |       round(var_samp(l_quantity), 6) AS var_qty,
        |       round(regr_slope(l_extendedprice, l_quantity), 4)
        |         AS slope_price_on_qty,
        |       round(regr_r2(l_extendedprice, l_quantity), 6)
        |         AS r2_price_on_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // each event expanded to its two aligned window starts, then the
    // same keyed agg — the explicit form of Spark's window() fan-out
    "b37_sliding_window" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
        |       count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users,
        |       round(sum(value), 2) AS sum_value
        |FROM (SELECT date_trunc('hour', ts) - o.o * INTERVAL 1 HOUR AS ws,
        |             user_id, value
        |      FROM events, (SELECT unnest([0, 1]) AS o) o)
        |GROUP BY ws ORDER BY 1""".stripMargin,

    // identical IGNORE NULLS frame; DuckDB orders the frame the same way
    "b33_gap_fill" ->
      """SELECT user_id, event_id,
        |       round(coalesce(last_value(reading IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 2)
        |         AS filled
        |FROM (SELECT user_id, event_id, ts,
        |        CASE WHEN event_id % 3 = 0 THEN value END AS reading
        |      FROM events)
        |ORDER BY user_id, event_id""".stripMargin,

    // brute-force replica: every pair, exact set Jaccard, same threshold
    "b32_jaccard_join" ->
      """WITH s AS (
        |  SELECT p_partkey AS id,
        |         list_sort(list_distinct(
        |           regexp_split_to_array(trim(lower(p_name)), '\s+'))) AS t
        |  FROM part
        |  WHERE len(regexp_split_to_array(trim(lower(p_name)), '\s+')) > 0
        |    AND trim(p_name) <> ''),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |         len(list_intersect(a.t, b.t)) AS inter,
        |         len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS uni
        |  FROM s a JOIN s b ON a.id < b.id)
        |SELECT id_a, id_b,
        |       round(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE) / uni >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,

    // identical LATERAL query — DuckDB executes the correlated subquery
    // directly; the row set (incl. boundary ties) must match exactly
    "b31_lateral_topn" ->
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_name, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name
        |  LIMIT 3) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin,

    "b16_json_struct" ->
      """SELECT event_type,
        |       count(CAST(props->>'$.k' AS INT)) AS n_k,
        |       CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
        |       round(avg(CAST(props->>'$.k' AS INT)), 4) AS avg_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "b13_salted_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "b12_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_disc(l_extendedprice, 0.25) AS p25,
        |       quantile_disc(l_extendedprice, 0.5) AS p50,
        |       quantile_disc(l_extendedprice, 0.75) AS p75
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "b10_events_window" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
        |       max(CAST(props->>'$.k' AS INT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "a17_upsert" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice
        |  FROM o WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, 'N', o_totalprice
        |  FROM o WHERE o_orderstatus = 'F'),
        |merged AS (
        |  SELECT * FROM o
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL SELECT * FROM upd)
        |SELECT o_orderstatus, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,

    // a23: DuckDB rebuilds the merge + feed classification relationally —
    // inserts (anti-join), changed matches (null-safe row diff, pre+post),
    // deletes (semi-join), the no-op slice contributing NOTHING, and the
    // merged snapshot; kind-level aggregates must agree with Spark's feed.
    "a23_cdf_merge" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
        |  FROM o WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT * FROM o WHERE o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice
        |  FROM o WHERE o_orderkey % 101 = 0),
        |del AS (
        |  SELECT o_orderkey FROM o
        |  WHERE o_orderkey % 103 = 0 AND o_orderkey % 97 <> 0
        |    AND o_orderkey % 89 <> 0),
        |matched AS (
        |  SELECT t.o_orderkey, t.o_custkey AS t_ck, t.o_totalprice AS t_tp,
        |         u.o_custkey AS u_ck, u.o_totalprice AS u_tp
        |  FROM o t JOIN upd u USING (o_orderkey)
        |  WHERE t.o_custkey IS DISTINCT FROM u.o_custkey
        |     OR t.o_totalprice IS DISTINCT FROM u.o_totalprice),
        |feed AS (
        |  SELECT 'insert' AS kind, o_orderkey, o_totalprice
        |  FROM upd ANTI JOIN o USING (o_orderkey)
        |  UNION ALL
        |  SELECT 'update_preimage', o_orderkey, t_tp FROM matched
        |  UNION ALL
        |  SELECT 'update_postimage', o_orderkey, u_tp FROM matched
        |  UNION ALL
        |  SELECT 'delete', o_orderkey, o_totalprice
        |  FROM o SEMI JOIN del USING (o_orderkey)),
        |merged AS (
        |  SELECT o_orderkey, o_totalprice FROM o
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |  UNION ALL SELECT o_orderkey, o_totalprice FROM upd)
        |SELECT kind, count(*) AS cnt,
        |       CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM feed GROUP BY 1
        |UNION ALL
        |SELECT 'merged_snapshot', count(*),
        |       CAST(sum(o_orderkey) AS BIGINT),
        |       round(sum(o_totalprice), 2)
        |FROM merged
        |ORDER BY 1""".stripMargin,

    // b26's oracle rebuilds the merged snapshot relationally (same
    // change families as a23, plus the 'Z' status flip) and aggregates
    // it directly — the incremental path exists only on the Spark side,
    // where incr_ok locks it to the rebuild.
    "b26_incremental_mv" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'Z' AS o_orderstatus,
        |         o_totalprice + 1000.0 AS o_totalprice
        |  FROM o WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT * FROM o WHERE o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
        |  FROM o WHERE o_orderkey % 101 = 0),
        |del AS (
        |  SELECT o_orderkey FROM o
        |  WHERE o_orderkey % 103 = 0 AND o_orderkey % 97 <> 0
        |    AND o_orderkey % 89 <> 0),
        |merged AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM o
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |  UNION ALL SELECT * FROM upd)
        |SELECT o_orderstatus, count(*) AS cnt,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2)
        |            AS DOUBLE) AS sum_price,
        |       true AS incr_ok
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,

    // SCD2 replica: same-instant dedup (max attribute wins), change-only
    // version compaction, lead() close-out. The batch split in the Spark
    // query is invisible here because ordered batches are equivalent to
    // one-shot processing (the operator's contract).
    "a24_scd2" ->
      """WITH ev AS (
        |  SELECT o_custkey AS k, o_orderdate AS vf,
        |         max(o_orderpriority) AS seg
        |  FROM orders GROUP BY 1, 2),
        |chg AS (
        |  SELECT k, vf, seg,
        |         lag(seg) OVER (PARTITION BY k ORDER BY vf) AS prev
        |  FROM ev),
        |keep AS (SELECT k, vf, seg FROM chg
        |         WHERE prev IS NULL OR seg <> prev),
        |fin AS (
        |  SELECT k, seg, vf,
        |         lead(vf) OVER (PARTITION BY k ORDER BY vf) AS vt
        |  FROM keep)
        |SELECT k AS o_custkey, seg AS segment,
        |       strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |       strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |       vt IS NULL AS is_current
        |FROM fin ORDER BY 1, 3""".stripMargin,

    "b19_range_join" ->
      """WITH bands AS (
        |  SELECT band_id, band_id * 10 + 1 AS lo, band_id * 10 + 10 AS hi
        |  FROM (VALUES (0), (1), (2), (3), (4)) t(band_id)
        |  UNION ALL SELECT 9, 1, 50)
        |SELECT band_id, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN bands ON l_quantity BETWEEN lo AND hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // a19 reads back the JSONL export; the oracle aggregates the source
    // table — the md5 hex-prefix sum is the text-content probe (any
    // mangled character in the round trip shifts it)
    "a19_jsonl_export" ->
      """SELECT lang, count(*) AS cnt,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
        |            AS BIGINT) AS md5_probe
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // a18 reads back the COMPACTED files; the oracle aggregates the source
    // table — equality proves the rewrite lost/duplicated nothing. The
    // idempotence booleans are computed from the compaction reports.
    "a18_compaction" ->
      """SELECT lang, count(*) AS cnt, CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       true AS compact_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // a22 aggregates through the PRUNED read of the date-clustered copy;
    // the oracle full-scans the source table — equality proves skipping
    // never changes results. skip_ok (files actually excluded) is
    // computed in-plan from the prune report.
    "a22_data_skipping" ->
      """SELECT count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       true AS skip_ok
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE)
        |      BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'""".stripMargin,

    // a27 aggregates through the pruned read of the Z-ORDERED layout; the
    // oracle full-scans the source table under the same two-column
    // predicate — equality proves the curve layout + multi-column pruning
    // never change results. zskip_ok / beats_linear (z-layout skips
    // files AND reads strictly fewer than the linear layout) come from
    // the in-plan prune reports.
    "a27_zorder" ->
      """SELECT count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       true AS zskip_ok, true AS beats_linear
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE)
        |      BETWEEN DATE '1996-01-01' AND DATE '1997-08-31'
        |  AND l_extendedprice BETWEEN 26000 AND 52000""".stripMargin,

    // c23's gate is contract-shaped (see the queries entry): Spark checks
    // losslessness + count bounds of the learned vocab in-plan; the oracle
    // pins one all-green row per document.
    "c23_bpe_tokens" ->
      """SELECT doc_id, true AS lossless_ok, true AS bounds_ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    // DuckDB recomputes the decoded-image features from the pixel formula
    // ((id*1103515245 + x*31 + y*131) & 0xFFFFFF per (x,y)) — the Spark
    // side must round-trip those pixels through a real PNG encode/decode
    // to produce the same exact-integer channel sums.
    "c12_image_codec" ->
      """WITH ids AS (
        |  SELECT doc_id AS media_id, doc_id % 64 + 16 AS w,
        |         doc_id % 48 + 16 AS h
        |  FROM documents),
        |xs AS (SELECT media_id, w, h, unnest(range(0, w)) AS x FROM ids),
        |px AS (SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |v AS (SELECT media_id, w, h,
        |        ((media_id * 1103515245 + x * 31 + y * 131) & 16777215) AS v
        |      FROM px)
        |SELECT media_id, w AS width, h AS height,
        |       round(sum((v >> 16) & 255) / (w * h * 255.0), 6) AS mean_r,
        |       round(sum((v >> 8) & 255) / (w * h * 255.0), 6) AS mean_g,
        |       round(sum(v & 255) / (w * h * 255.0), 6) AS mean_b
        |FROM v GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin,

    // identical pixel formula — the batched transport must hit the same
    // bit-exact means as the per-call codec path
    "c12b_image_codec_batched" ->
      """WITH ids AS (
        |  SELECT doc_id AS media_id, doc_id % 64 + 16 AS w,
        |         doc_id % 48 + 16 AS h
        |  FROM documents),
        |xs AS (SELECT media_id, w, h, unnest(range(0, w)) AS x FROM ids),
        |px AS (SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |v AS (SELECT media_id, w, h,
        |        ((media_id * 1103515245 + x * 31 + y * 131) & 16777215) AS v
        |      FROM px)
        |SELECT media_id, w AS width, h AS height,
        |       round(sum((v >> 16) & 255) / (w * h * 255.0), 6) AS mean_r,
        |       round(sum((v >> 8) & 255) / (w * h * 255.0), 6) AS mean_g,
        |       round(sum(v & 255) / (w * h * 255.0), 6) AS mean_b
        |FROM v GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin,

    // identical oracle to c12b: the columnar transport must produce the
    // same decoded features from the same formula-pinned pixels
    "c12c_image_codec_columnar" ->
      """WITH ids AS (
        |  SELECT doc_id AS media_id, doc_id % 64 + 16 AS w,
        |         doc_id % 48 + 16 AS h
        |  FROM documents),
        |xs AS (SELECT media_id, w, h, unnest(range(0, w)) AS x FROM ids),
        |px AS (SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |v AS (SELECT media_id, w, h,
        |        ((media_id * 1103515245 + x * 31 + y * 131) & 16777215) AS v
        |      FROM px)
        |SELECT media_id, w AS width, h AS height,
        |       round(sum((v >> 16) & 255) / (w * h * 255.0), 6) AS mean_r,
        |       round(sum((v >> 8) & 255) / (w * h * 255.0), 6) AS mean_g,
        |       round(sum(v & 255) / (w * h * 255.0), 6) AS mean_b
        |FROM v GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin,

    // b20's gate is the rank-error bound (see the queries entry): Spark
    // measures each estimate's true rank in-plan; the oracle pins the
    // deterministic part — one row per (returnflag, quantile), bound held.
    "b20_quantile_sketch" ->
      """SELECT l_returnflag, qi, true AS rank_ok
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem) f
        |CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (1), (2)) t(qi)
        |ORDER BY l_returnflag, qi""".stripMargin,

    // b63: exact pairwise overlap replica; the sketch booleans are
    // expected TRUE (fixed hash + fixed data — the b22 discipline)
    "b63_theta_overlap" ->
      """WITH d AS (
        |  SELECT DISTINCT o_orderstatus AS st, o_custkey AS ck FROM orders),
        |n AS (SELECT st, count(*) AS n FROM d GROUP BY 1),
        |p AS (
        |  SELECT l.st AS seg_a, r.st AS seg_b, count(*) AS exact_inter
        |  FROM d l JOIN d r ON l.ck = r.ck AND l.st < r.st
        |  GROUP BY 1, 2)
        |SELECT p.seg_a, p.seg_b, p.exact_inter,
        |       na.n + nb.n - p.exact_inter AS exact_union,
        |       true AS inter_ok, true AS union_ok
        |FROM p JOIN n na ON na.st = p.seg_a JOIN n nb ON nb.st = p.seg_b
        |ORDER BY seg_a, seg_b""".stripMargin,

    // b64: exact ordered-pair difference/jaccard replica; jacc_ppm is
    // integer-exact (non-negative truncating division), booleans TRUE
    "b64_theta_anotb" ->
      """WITH d AS (
        |  SELECT DISTINCT o_orderstatus AS st, o_custkey AS ck FROM orders),
        |n AS (SELECT st, count(*) AS n FROM d GROUP BY 1),
        |p0 AS (
        |  SELECT l.st AS a, r.st AS b, count(*) AS i
        |  FROM d l JOIN d r ON l.ck = r.ck AND l.st < r.st
        |  GROUP BY 1, 2),
        |p AS (SELECT a, b, i FROM p0 UNION ALL SELECT b, a, i FROM p0)
        |SELECT p.a AS seg_a, p.b AS seg_b,
        |       na.n - p.i AS exact_anotb,
        |       (p.i * 1000000) // (na.n + nb.n - p.i) AS jacc_ppm,
        |       true AS diff_ok, true AS jacc_ok
        |FROM p JOIN n na ON na.st = p.a JOIN n nb ON nb.st = p.b
        |ORDER BY seg_a, seg_b""".stripMargin,

    // c94: exact distinct-l replica over the same QI columns as c71;
    // the balance band is positive-shifted integer cents // 200000
    "c94_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |       count(DISTINCT (CAST(round(c_acctbal * 100) AS BIGINT)
        |                       + 100000000) // 200000) AS l_distinct,
        |       count(DISTINCT (CAST(round(c_acctbal * 100) AS BIGINT)
        |                       + 100000000) // 200000) >= 3 AS l_ok
        |FROM customer GROUP BY 1, 2
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    // c100: the next-fit-decreasing fold replayed as a
    // rank-synchronous recursive CTE per shard (the d32 discipline) —
    // one diverged bin decision anywhere shifts every later bin id
    // and breaks that shard's digests
    "c100_whole_doc_packing" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, source,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |         END AS tk
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, source, CAST(tk AS BIGINT) AS tk,
        |         doc_id % 4 AS band
        |  FROM toks
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, CAST(tk + 300 AS BIGINT),
        |         (doc_id + 1000000) % 4
        |  FROM toks WHERE doc_id % 97 = 0),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY source, band
        |             ORDER BY tk DESC, doc_id) AS rn
        |  FROM corpus),
        |rec AS (
        |  SELECT source, band, rn, doc_id, tk,
        |         CAST(0 AS BIGINT) AS bin, tk AS fill
        |  FROM ranked WHERE rn = 1
        |  UNION ALL
        |  SELECT a.source, a.band, a.rn, a.doc_id, a.tk,
        |         CASE WHEN d.fill + a.tk > 256 THEN d.bin + 1
        |              ELSE d.bin END,
        |         CASE WHEN d.fill + a.tk > 256 THEN a.tk
        |              ELSE d.fill + a.tk END
        |  FROM ranked a JOIN rec d
        |    ON a.source = d.source AND a.band = d.band
        |   AND a.rn = d.rn + 1)
        |SELECT source, band, bin, count(*) AS n_docs,
        |       CAST(sum(tk) AS BIGINT) AS fill_tokens,
        |       CAST(sum(tk) AS BIGINT) * 1000000 // 256 AS util_ppm,
        |       CAST(sum(tk) AS BIGINT) > 256 AS overflow,
        |       md5(string_agg(CAST(doc_id AS VARCHAR), ','
        |                      ORDER BY doc_id)) AS docs_fp
        |FROM rec GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // c103: same banding, same planted near-degenerate cell, exact
    // integer Simpson arithmetic (Σcnt², n², two truncating ppm
    // divisions)
    "c103_evenness_audit" ->
      """WITH aug AS (
        |  SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer
        |  UNION ALL
        |  SELECT 88, 'PLANTED2',
        |         CASE WHEN c_custkey % 169 = 0 THEN -500.0
        |              WHEN c_custkey % 169 = 13 THEN 3000.0
        |              ELSE 9000.0 END
        |  FROM customer WHERE c_custkey % 13 = 0),
        |b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         (CAST(round(c_acctbal * 100) AS BIGINT)
        |          + 100000000) // 200000 AS band
        |  FROM aug),
        |g AS (
        |  SELECT c_nationkey, c_mktsegment, band, count(*) AS cnt
        |  FROM b GROUP BY 1, 2, 3),
        |agg AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(sum(cnt) AS BIGINT) AS n,
        |         count(*) AS l_distinct,
        |         CAST(sum(cnt * cnt) AS BIGINT) AS s2
        |  FROM g GROUP BY 1, 2)
        |SELECT c_nationkey, c_mktsegment, n, l_distinct,
        |       s2 * 1000000 // (n * n) AS simpson_ppm,
        |       n * n * 1000000 // s2 AS eff_classes_ppm,
        |       n * n * 1000000 // s2 >= 3000000 AS evenness_ok
        |FROM agg ORDER BY 1, 2""".stripMargin,

    // c108: same banding/plant as c103; Hill-sandwich bounds as exact
    // integers (N2 = n²/Σcnt² ppm, N0 = distinct), ln terms rounded at
    // 4 decimals only inside the indeterminate band (the c30 contract)
    "c108_entropy_l_audit" ->
      """WITH aug AS (
        |  SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer
        |  UNION ALL
        |  SELECT 88, 'PLANTED2',
        |         CASE WHEN c_custkey % 169 = 0 THEN -500.0
        |              WHEN c_custkey % 169 = 13 THEN 3000.0
        |              ELSE 9000.0 END
        |  FROM customer WHERE c_custkey % 13 = 0),
        |b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         (CAST(round(c_acctbal * 100) AS BIGINT)
        |          + 100000000) // 200000 AS band
        |  FROM aug),
        |g AS (
        |  SELECT c_nationkey, c_mktsegment, band, count(*) AS cnt
        |  FROM b GROUP BY 1, 2, 3),
        |wn AS (
        |  SELECT c_nationkey, c_mktsegment, cnt,
        |         CAST(sum(cnt) OVER (PARTITION BY c_nationkey,
        |                             c_mktsegment) AS BIGINT) AS n
        |  FROM g),
        |h AS (
        |  SELECT c_nationkey, c_mktsegment, n, cnt,
        |         cnt * CAST(round(ln(CAST(n AS DOUBLE) / cnt) * 10000)
        |                    AS BIGINT) AS hterm
        |  FROM wn),
        |agg AS (
        |  SELECT c_nationkey, c_mktsegment, max(n) AS n,
        |         count(*) AS l_distinct,
        |         CAST(sum(cnt * cnt) AS BIGINT) AS s2,
        |         CAST(sum(hterm) AS BIGINT) AS hu
        |  FROM h GROUP BY 1, 2)
        |SELECT c_nationkey, c_mktsegment, n, l_distinct,
        |       n * n * 1000000 // s2 AS hill2_lb_ppm,
        |       l_distinct * 1000000 AS hill0_ub_ppm,
        |       hu // n AS entropy_e4,
        |       (n * n * 1000000 // s2 >= 3000000) OR (l_distinct < 3)
        |         AS bound_decided,
        |       CASE WHEN n * n * 1000000 // s2 >= 3000000 THEN TRUE
        |            WHEN l_distinct < 3 THEN FALSE
        |            ELSE hu // n >= 10987 END AS entropy_l_ok
        |FROM agg ORDER BY 1, 2""".stripMargin,

    // c109: pure integer recursive-(2,3) adjudication on the sorted
    // sensitive-value counts — the tail sum is tie-order invariant
    "c109_recursive_cl_audit" ->
      """WITH aug AS (
        |  SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer
        |  UNION ALL
        |  SELECT 88, 'PLANTED2',
        |         CASE WHEN c_custkey % 169 = 0 THEN -500.0
        |              WHEN c_custkey % 169 = 13 THEN 3000.0
        |              ELSE 9000.0 END
        |  FROM customer WHERE c_custkey % 13 = 0),
        |b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         (CAST(round(c_acctbal * 100) AS BIGINT)
        |          + 100000000) // 200000 AS band
        |  FROM aug),
        |g AS (
        |  SELECT c_nationkey, c_mktsegment, band, count(*) AS cnt
        |  FROM b GROUP BY 1, 2, 3),
        |rk AS (
        |  SELECT c_nationkey, c_mktsegment, cnt,
        |         row_number() OVER (PARTITION BY c_nationkey, c_mktsegment
        |             ORDER BY cnt DESC, band) AS rn
        |  FROM g)
        |SELECT c_nationkey, c_mktsegment,
        |       CAST(sum(cnt) AS BIGINT) AS n, count(*) AS m,
        |       CAST(max(cnt) AS BIGINT) AS r1_cnt,
        |       CAST(sum(CASE WHEN rn >= 3 THEN cnt ELSE 0 END)
        |            AS BIGINT) AS tail_sum,
        |       CAST(max(cnt) AS BIGINT) <
        |         2 * CAST(sum(CASE WHEN rn >= 3 THEN cnt ELSE 0 END)
        |                  AS BIGINT) AS rcl_ok,
        |       count(*) >= 3 AS distinct_ok
        |FROM rk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // c105: the c12n chained-landmark replay + transitive-closure
    // recursive CTE + the longest-clip election (clip length replayed
    // from the synthesis formula; the engine measures it by REAL
    // decode — agreement is the decode correctness c12d already locks)
    "c105_audio_dup_clusters" ->
      ("WITH RECURSIVE " + c105ChainSql + "\n" +
        """SELECT cluster_id, count(*) AS cluster_size,
          |       min(CASE WHEN rn = 1 THEN id END) AS canonical_id,
          |       min(CASE WHEN rn = 1 THEN n END) AS canonical_len,
          |       md5(string_agg(CAST(id AS VARCHAR), ','
          |                      ORDER BY id)) AS members_fp
          |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin),

    // c112: the c105 chain + the keep rule replayed — drops are the
    // election losers; kept = the corpus minus the drops, tagged
    "c112_audio_canonical_keep" ->
      ("WITH RECURSIVE " + c105ChainSql + ",\n" +
        """canon AS (SELECT id FROM rk WHERE rn = 1),
          |drops AS (SELECT id FROM rk WHERE rn > 1)
          |SELECT p.media_id, CAST(p.n AS BIGINT) AS n_samples,
          |       CASE WHEN c.id IS NOT NULL THEN 'canonical'
          |            ELSE 'singleton' END AS kept_as
          |FROM p LEFT JOIN canon c ON c.id = p.media_id
          |WHERE p.media_id NOT IN (SELECT id FROM drops)
          |ORDER BY media_id""".stripMargin),

    // c106: the bounded-open-bin slot machine replayed rank-
    // synchronously — eligibility, fullest-fits election, first-empty
    // placement, fullest-evicted closure — with the k=3 slot state as
    // recursion columns (the d32/c100 discipline at state width k)
    "c106_bounded_bin_packing" -> boundedPackOracleSql(firstFit = false),

    // d44: the identical slot machine replayed in ARRIVAL order (epoch
    // major, BFD within) — state carried across epoch boundaries is
    // exactly what distinguishes this rank from c106's
    "d44_stream_packing" ->
      boundedPackOracleSql(firstFit = false, epochArrival = true),

    // c111: the same slot machine with the FIRST-FIT election (oldest
    // open bin that fits) — one CASE block differs, everything shared
    "c111_ffd_packing" -> boundedPackOracleSql(firstFit = true),

    // c124: the LPT dual — all k=3 shards pre-opened, no budget, the
    // election flipped to MIN-fill (tie lowest shard id); the same
    // rank-synchronous recursion over the same corpus
    "c124_lpt_shards" ->
      raw"""WITH RECURSIVE toks AS (
        |  SELECT doc_id, source,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |         END AS tk
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, source, CAST(tk AS BIGINT) AS tk,
        |         doc_id % 4 AS band
        |  FROM toks
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, CAST(tk + 300 AS BIGINT),
        |         (doc_id + 1000000) % 4
        |  FROM toks WHERE doc_id % 97 = 0),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY source, band
        |             ORDER BY tk DESC, doc_id) AS rn
        |  FROM corpus),
        |rec AS (
        |  SELECT source, band, rn, doc_id, tk,
        |         CAST(0 AS BIGINT) AS shard,
        |         tk AS f1, CAST(0 AS BIGINT) AS f2,
        |         CAST(0 AS BIGINT) AS f3
        |  FROM ranked WHERE rn = 1
        |  UNION ALL
        |  SELECT a.source, a.band, a.rn, a.doc_id, a.tk,
        |         CASE WHEN d.f1 <= d.f2 AND d.f1 <= d.f3
        |                THEN CAST(0 AS BIGINT)
        |              WHEN d.f2 <= d.f3 THEN CAST(1 AS BIGINT)
        |              ELSE CAST(2 AS BIGINT) END,
        |         CASE WHEN d.f1 <= d.f2 AND d.f1 <= d.f3
        |                THEN d.f1 + a.tk ELSE d.f1 END,
        |         CASE WHEN NOT (d.f1 <= d.f2 AND d.f1 <= d.f3)
        |                   AND d.f2 <= d.f3
        |                THEN d.f2 + a.tk ELSE d.f2 END,
        |         CASE WHEN NOT (d.f1 <= d.f2 AND d.f1 <= d.f3)
        |                   AND NOT (d.f2 <= d.f3)
        |                THEN d.f3 + a.tk ELSE d.f3 END
        |  FROM ranked a JOIN rec d
        |    ON a.source = d.source AND a.band = d.band
        |   AND a.rn = d.rn + 1),
        |g AS (
        |  SELECT source, band, shard, count(*) AS n_docs,
        |         CAST(sum(tk) AS BIGINT) AS tokens,
        |         md5(string_agg(CAST(doc_id AS VARCHAR), ','
        |                        ORDER BY doc_id)) AS docs_fp
        |  FROM rec GROUP BY 1, 2, 3)
        |SELECT source, band, shard, n_docs, tokens,
        |       CAST(tokens * 1000000
        |         // CAST(sum(tokens) OVER (PARTITION BY source, band)
        |                 AS BIGINT) AS BIGINT) AS share_ppm,
        |       docs_fp
        |FROM g ORDER BY 1, 2, 3""".stripMargin,

    // c113: the same machine with the budget read per ranked row and
    // the rollup keyed to each shard's own budget
    "c113_budgeted_packing" ->
      boundedPackOracleSql(firstFit = false, perSourceBudget = true),


    // c99: the banded-EMD replay — same banding as c94, same planted
    // skewed cell as the engine, cumulative differences as exact
    // integers, one truncating ppm division at the end
    "c99_t_closeness" ->
      """WITH aug AS (
        |  SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer
        |  UNION ALL
        |  SELECT 77, 'PLANTED', 9999.0 FROM customer
        |  WHERE c_custkey % 11 = 0),
        |b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         (CAST(round(c_acctbal * 100) AS BIGINT)
        |          + 100000000) // 200000 AS band
        |  FROM aug),
        |cb AS (SELECT band, count(*) AS cb FROM b GROUP BY 1),
        |tot AS (SELECT CAST(sum(cb) AS BIGINT) AS n_total,
        |               count(*) AS n_bands FROM cb),
        |g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
        |      FROM b GROUP BY 1, 2),
        |gb AS (SELECT c_nationkey, c_mktsegment, band, count(*) AS gbn
        |       FROM b GROUP BY 1, 2, 3),
        |dom AS (SELECT g.c_nationkey, g.c_mktsegment, g.n, c.band, c.cb
        |        FROM g CROSS JOIN cb c),
        |fl AS (
        |  SELECT d.c_nationkey, d.c_mktsegment, d.n, d.band, d.cb,
        |         coalesce(gb.gbn, 0) AS gbn
        |  FROM dom d LEFT JOIN gb
        |    ON gb.c_nationkey = d.c_nationkey
        |   AND gb.c_mktsegment = d.c_mktsegment AND gb.band = d.band),
        |cum AS (
        |  SELECT c_nationkey, c_mktsegment, n,
        |         sum(gbn) OVER (PARTITION BY c_nationkey, c_mktsegment
        |                        ORDER BY band) AS cum_g,
        |         sum(cb) OVER (PARTITION BY c_nationkey, c_mktsegment
        |                       ORDER BY band) AS cum_c
        |  FROM fl),
        |emd AS (
        |  SELECT c_nationkey, c_mktsegment, n,
        |         CAST(sum(abs(cum_g * t.n_total - cum_c * n))
        |              AS BIGINT) AS sumterm,
        |         max(t.n_total) AS n_total, max(t.n_bands) AS n_bands
        |  FROM cum CROSS JOIN tot t GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment, n,
        |       sumterm * 1000000 // (n * n_total * (n_bands - 1))
        |         AS emd_ppm,
        |       sumterm * 1000000 // (n * n_total * (n_bands - 1))
        |         <= 300000 AS t_ok
        |FROM emd ORDER BY 1, 2""".stripMargin,

    // c97: full perceptual-pipeline replay from the synthesis formula —
    // saturated brightness shift, 8-aligned crop, equal-block sums,
    // strict-majority bits, 16-bit bands, hot-bucket escalation (full
    // code as a band-string key), bit_count(xor) hamming, and the
    // position-weighted pixel checksum behind same_pixels
    "c97_image_perceptual_dedup" ->
      ("WITH " + c97ChainSql + "\n" +
        """SELECT h.id_a, h.id_b, h.hamming,
          |       pa.pixsum = pb.pixsum AS same_pixels
          |FROM hm h
          |JOIN ps pa ON pa.media_id = h.id_a
          |JOIN ps pb ON pb.media_id = h.id_b
          |WHERE h.hamming <= 3
          |ORDER BY id_a, id_b""".stripMargin),

    // c97b: the c97 pair chain + a transitive-closure recursive CTE —
    // a DIFFERENT algorithm from the engine's min-label propagation
    // (the strongest-oracle rule), same fixpoint
    "c97b_image_dup_clusters" ->
      ("WITH RECURSIVE " + c97ChainSql + ",\n" +
        """edges AS (
          |  SELECT id_a AS a, id_b AS b FROM hm WHERE hamming <= 3
          |  UNION
          |  SELECT id_b, id_a FROM hm WHERE hamming <= 3),
          |reach AS (
          |  SELECT a, b FROM edges
          |  UNION
          |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
          |lbl AS (
          |  SELECT a AS id, least(a, min(b)) AS cluster_id
          |  FROM reach GROUP BY a)
          |SELECT cluster_id, count(*) AS cluster_size,
          |       md5(string_agg(CAST(id AS VARCHAR), ','
          |                      ORDER BY id)) AS members_fp
          |FROM lbl GROUP BY 1 ORDER BY 1""".stripMargin),

    // c118: both modality replays composed — the c97 pixel→pair chain
    // for the image side, the c2 planted relation (≡1 mod 3 re-crawl
    // copies, guaranteed found at jaccard 1.0) for the text side —
    // joined over the same link-table rule and the same cross-doc
    // verdict the engine runs
    "c118_crossmodal_dup" ->
      ("WITH " + c97ChainSql + ",\n" +
        """td AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
          |own AS (
          |  SELECT doc_id, doc_id AS media_id FROM documents
          |  UNION ALL
          |  SELECT a.doc_id, a.doc_id - 5 + 2000000 FROM documents a
          |  JOIN documents b ON b.doc_id = a.doc_id - 5
          |  WHERE a.doc_id % 10 = 5
          |  UNION ALL
          |  SELECT a.doc_id, a.doc_id - 7 + 3000000 FROM documents a
          |  JOIN documents b ON b.doc_id = a.doc_id - 7
          |  WHERE a.doc_id % 10 = 7),
          |ip AS (SELECT id_a, id_b FROM hm WHERE hamming <= 3),
          |xd AS (
          |  SELECT oa.doc_id AS da, ob.doc_id AS db
          |  FROM ip p JOIN own oa ON oa.media_id = p.id_a
          |            JOIN own ob ON ob.media_id = p.id_b
          |  WHERE oa.doc_id <> ob.doc_id),
          |imgd AS (SELECT da AS doc_id FROM xd UNION SELECT db FROM xd),
          |v AS (
          |  SELECT coalesce(t.doc_id, i.doc_id) AS doc_id,
          |         t.doc_id IS NOT NULL AS text_dup,
          |         i.doc_id IS NOT NULL AS image_dup
          |  FROM td t FULL OUTER JOIN imgd i ON t.doc_id = i.doc_id)
          |SELECT doc_id, text_dup, image_dup,
          |       CASE WHEN text_dup AND image_dup THEN 'both'
          |            WHEN text_dup THEN 'text' ELSE 'image' END AS verdict
          |FROM v ORDER BY doc_id""".stripMargin),

    // c123: ALL THREE modality replays composed — the c97 pixel→pair
    // chain, the c2 planted relation, and the c105 synthesis→WHT→
    // landmark pair chain (duration block included) — over the same
    // per-modality links and the same concat verdict the engine runs
    "c123_trimodal_dup" ->
      ("WITH " + c97ChainSql + ",\n" + c105PairSql + ",\n" +
        """td AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
          |iown AS (
          |  SELECT doc_id, doc_id AS media_id FROM documents
          |  UNION ALL
          |  SELECT a.doc_id, a.doc_id - 5 + 2000000 FROM documents a
          |  JOIN documents b ON b.doc_id = a.doc_id - 5
          |  WHERE a.doc_id % 10 = 5
          |  UNION ALL
          |  SELECT a.doc_id, a.doc_id - 7 + 3000000 FROM documents a
          |  JOIN documents b ON b.doc_id = a.doc_id - 7
          |  WHERE a.doc_id % 10 = 7),
          |ip AS (SELECT id_a, id_b FROM hm WHERE hamming <= 3),
          |ixd AS (
          |  SELECT oa.doc_id AS da, ob.doc_id AS db
          |  FROM ip pp JOIN iown oa ON oa.media_id = pp.id_a
          |             JOIN iown ob ON ob.media_id = pp.id_b
          |  WHERE oa.doc_id <> ob.doc_id),
          |imgd AS (SELECT da AS doc_id FROM ixd
          |         UNION SELECT db FROM ixd),
          |aown AS (
          |  SELECT doc_id, doc_id AS media_id FROM documents
          |  WHERE doc_id % 4 = 0
          |  UNION ALL
          |  SELECT a.doc_id, a.doc_id - 1 + 3000000 FROM documents a
          |  JOIN documents b ON b.doc_id = a.doc_id - 1
          |  WHERE a.doc_id % 4 = 1 AND (a.doc_id - 1) % 28 = 0),
          |axd AS (
          |  SELECT oa.doc_id AS da, ob.doc_id AS db
          |  FROM prf pp JOIN aown oa ON oa.media_id = pp.id_a
          |              JOIN aown ob ON ob.media_id = pp.id_b
          |  WHERE oa.doc_id <> ob.doc_id),
          |audd AS (SELECT da AS doc_id FROM axd
          |         UNION SELECT db FROM axd),
          |alld AS (SELECT doc_id FROM td UNION SELECT doc_id FROM imgd
          |         UNION SELECT doc_id FROM audd)
          |SELECT al.doc_id,
          |       t.doc_id IS NOT NULL AS text_dup,
          |       i.doc_id IS NOT NULL AS image_dup,
          |       u.doc_id IS NOT NULL AS audio_dup,
          |       concat_ws('+',
          |         CASE WHEN t.doc_id IS NOT NULL THEN 'text' END,
          |         CASE WHEN i.doc_id IS NOT NULL THEN 'image' END,
          |         CASE WHEN u.doc_id IS NOT NULL THEN 'audio' END)
          |         AS verdict
          |FROM alld al
          |LEFT JOIN td t ON t.doc_id = al.doc_id
          |LEFT JOIN imgd i ON i.doc_id = al.doc_id
          |LEFT JOIN audd u ON u.doc_id = al.doc_id
          |ORDER BY al.doc_id""".stripMargin),

    // c136: the c123 trimodal replay restricted to the LIVE corpus —
    // docs ≡ 0,1 (mod 30) are tombstoned (their re-crawl copies with
    // them), so every ownership table derives from `liv` only: a pair
    // whose media lost its last live link maps to no doc, exactly the
    // engine's retire-at-compaction + tombstone-aware-serve semantics
    "c136_ledger_pair_retire" ->
      ("WITH " + c97ChainSql + ",\n" + c105PairSql + ",\n" +
        """liv AS (SELECT doc_id FROM documents WHERE doc_id % 30 > 1),
          |td AS (SELECT doc_id FROM liv WHERE doc_id % 3 = 1),
          |iown AS (
          |  SELECT doc_id, doc_id AS media_id FROM liv
          |  UNION ALL
          |  SELECT a.doc_id, a.doc_id - 5 + 2000000 FROM liv a
          |  JOIN liv b ON b.doc_id = a.doc_id - 5
          |  WHERE a.doc_id % 10 = 5
          |  UNION ALL
          |  SELECT a.doc_id, a.doc_id - 7 + 3000000 FROM liv a
          |  JOIN liv b ON b.doc_id = a.doc_id - 7
          |  WHERE a.doc_id % 10 = 7),
          |ip AS (SELECT id_a, id_b FROM hm WHERE hamming <= 3),
          |ixd AS (
          |  SELECT oa.doc_id AS da, ob.doc_id AS db
          |  FROM ip pp JOIN iown oa ON oa.media_id = pp.id_a
          |             JOIN iown ob ON ob.media_id = pp.id_b
          |  WHERE oa.doc_id <> ob.doc_id),
          |imgd AS (SELECT da AS doc_id FROM ixd
          |         UNION SELECT db FROM ixd),
          |aown AS (
          |  SELECT doc_id, doc_id AS media_id FROM liv
          |  WHERE doc_id % 4 = 0
          |  UNION ALL
          |  SELECT a.doc_id, a.doc_id - 1 + 3000000 FROM liv a
          |  JOIN liv b ON b.doc_id = a.doc_id - 1
          |  WHERE a.doc_id % 4 = 1 AND (a.doc_id - 1) % 28 = 0),
          |axd AS (
          |  SELECT oa.doc_id AS da, ob.doc_id AS db
          |  FROM prf pp JOIN aown oa ON oa.media_id = pp.id_a
          |              JOIN aown ob ON ob.media_id = pp.id_b
          |  WHERE oa.doc_id <> ob.doc_id),
          |audd AS (SELECT da AS doc_id FROM axd
          |         UNION SELECT db FROM axd),
          |alld AS (SELECT doc_id FROM td UNION SELECT doc_id FROM imgd
          |         UNION SELECT doc_id FROM audd)
          |SELECT al.doc_id,
          |       t.doc_id IS NOT NULL AS text_dup,
          |       i.doc_id IS NOT NULL AS image_dup,
          |       u.doc_id IS NOT NULL AS audio_dup,
          |       concat_ws('+',
          |         CASE WHEN t.doc_id IS NOT NULL THEN 'text' END,
          |         CASE WHEN i.doc_id IS NOT NULL THEN 'image' END,
          |         CASE WHEN u.doc_id IS NOT NULL THEN 'audio' END)
          |         AS verdict
          |FROM alld al
          |LEFT JOIN td t ON t.doc_id = al.doc_id
          |LEFT JOIN imgd i ON i.doc_id = al.doc_id
          |LEFT JOIN audd u ON u.doc_id = al.doc_id
          |ORDER BY al.doc_id""".stripMargin),

    // c138: the planted re-crawl band restricted to the RETAINED
    // arrival window — epoch = doc_id mod 4 (the +1e6 offset is ≡ 0
    // mod 4, so each planted pair arrives with its original), TTL
    // watermark at 2: a pair expired too eagerly drops a row, a
    // resurrected epoch-1 straggler adds one — either breaks the hash
    "c138_ledger_ttl_retire" ->
      """SELECT DISTINCT doc_id FROM documents
        |WHERE doc_id % 3 = 1 AND doc_id % 4 >= 2
        |ORDER BY doc_id""".stripMargin,

    // d17: the streaming merge sink's final snapshot is
    // last-writer-wins per key across arrival epochs (epoch =
    // event_id mod 3) with max-value in-batch compaction; the MV the
    // feed-fold maintains equals one aggregate over that snapshot
    "d17_stream_mv" ->
      """WITH ev AS (
        |  SELECT user_id AS k, user_id % 7 AS g, event_id AS v,
        |         event_id % 3 AS e
        |  FROM events),
        |pe AS (SELECT k, g, e, max(v) AS v FROM ev GROUP BY 1, 2, 3),
        |snap AS (
        |  SELECT k, g, v FROM (
        |    SELECT pe.*,
        |           row_number() OVER (PARTITION BY k ORDER BY e DESC)
        |             AS rn
        |    FROM pe) WHERE rn = 1)
        |SELECT g, count(*) AS n_keys, CAST(sum(v) AS BIGINT) AS sum_v
        |FROM snap GROUP BY g ORDER BY g""".stripMargin,

    // a15: the D8 overwrite rule — a replayed epoch must leave the
    // read-back identical to the source slices (an append-style
    // replay doubles partition 1's rows and cents)
    "a15_idempotent_append" ->
      """SELECT CAST(o_orderkey % 3 AS BIGINT) AS epoch,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey % 3 <= 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // a21: the vacuum accounting as literal columns (3 planted
    // orphans found; dry and young sweeps remove nothing; retention-0
    // removes all 3; _SUCCESS survives) + per-partition counts that
    // prove no visible data file was touched
    "a21_orphan_vacuum" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(3 AS BIGINT) AS orphans_found,
        |       CAST(0 AS BIGINT) AS dry_removed,
        |       CAST(0 AS BIGINT) AS young_removed,
        |       CAST(3 AS BIGINT) AS swept_removed,
        |       TRUE AS success_kept
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // a26: ANALYZE must record EXACT rowCount and column min/max
    // (DuckDB recomputes them); ndv is HLL-approximate so it ships as
    // a ±15% boolean (~3σ at rsd 0.05 — matching the Spark side's
    // gate); the plan-flip booleans are deterministic at
    // every SF (cold file-size estimate > 4096 threshold → SMJ;
    // stats estimate of the o_custkey equality ~ rows/ndv → BHJ)
    "a26_cbo_stats" ->
      """SELECT 'cust' AS tbl, count(*) AS n_rows,
        |       min(c_custkey) AS key_min, max(c_custkey) AS key_max,
        |       TRUE AS ndv_ok, TRUE AS smj_cold, TRUE AS bhj_stats
        |FROM customer
        |UNION ALL
        |SELECT 'ord', count(*), min(o_orderkey), max(o_orderkey),
        |       TRUE, TRUE, TRUE
        |FROM orders
        |ORDER BY tbl""".stripMargin,

    // b65: the same one-window-pass islands formulation — DuckDB's
    // window semantics match Spark's exactly here (running max over
    // ROWS UNBOUNDED..1 PRECEDING, running sum of the island flag);
    // epoch()/floor() keep the long arithmetic bit-identical
    "b65_interval_coalesce" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS st,
        |         CAST(floor(epoch(ts)) AS BIGINT) +
        |           CAST(floor(value) AS BIGINT) AS en
        |  FROM events WHERE user_id IS NOT NULL AND value >= 0),
        |m AS (
        |  SELECT user_id, st, en,
        |         max(en) OVER (PARTITION BY user_id ORDER BY st, en
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prev_max
        |  FROM iv),
        |isl AS (
        |  SELECT user_id, st, en,
        |         sum(CASE WHEN prev_max IS NULL OR st > prev_max
        |             THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY st, en
        |             ROWS UNBOUNDED PRECEDING) AS island
        |  FROM m)
        |SELECT user_id, CAST(island AS BIGINT) AS island,
        |       min(st) AS island_start, max(en) AS island_end,
        |       count(*) AS n_events
        |FROM isl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // d7: one AvailableNow batch through a keyed streaming aggregate —
    // the state store must hold exactly one row per distinct key, all
    // updated this batch, none evicted
    "d7_state_metrics" ->
      """SELECT count(DISTINCT event_type) AS n_state_rows,
        |       count(DISTINCT event_type) AS n_updated,
        |       CAST(0 AS BIGINT) AS n_removed
        |FROM events""".stripMargin,

    // d11: the observe() guard counters recomputed directly — all
    // integer counts, bit-deterministic
    "d11_observed_metrics" ->
      """SELECT count(*) AS n_events,
        |       CAST(coalesce(sum(CASE WHEN user_id IS NULL
        |           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null_user,
        |       CAST(coalesce(sum(CASE WHEN NOT (value BETWEEN 0 AND 300)
        |           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_bad_value,
        |       CAST(coalesce(sum(CASE WHEN event_type NOT IN
        |           ('click', 'view', 'purchase', 'signup')
        |           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_odd_type
        |FROM events""".stripMargin,

    // exact heavy-hitter replica; the CMS booleans are expected TRUE (the
    // sketch's deterministic never-undercount property and the eps·N
    // overcount bound at fixed seed + fixed data)
    "b22_heavy_hitters" ->
      """WITH k AS (
        |  SELECT CASE WHEN l_orderkey % 4 = 0 THEN CAST(-1 AS BIGINT)
        |              ELSE CAST(l_partkey % 50 AS BIGINT) END AS item
        |  FROM lineitem),
        |t AS (SELECT item, count(*) AS true_cnt FROM k GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM k)
        |SELECT item, true_cnt, TRUE AS est_ge_true, TRUE AS err_within_eps
        |FROM t, tot WHERE true_cnt >= ceil(0.01 * n)
        |ORDER BY item""".stripMargin,

    // exact distinct counts; the sketch bounds and the merged==direct
    // equality are expected TRUE (register-max union is deterministic)
    "b24_hll_sketch" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact,
        |       TRUE AS within_bound
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT 'ALL', count(DISTINCT l_partkey), TRUE FROM lineitem
        |ORDER BY 1""".stripMargin,

    // the whole chain replayed from the brute-force pair set with
    // DuckDB's native levenshtein AND jaro_winkler_similarity — the
    // blocking must be lossless and the ranking bit-identical
    "b46_er_best_match" ->
      """WITH p AS (
        |  SELECT a.c_custkey AS id, b.c_custkey AS cand,
        |         a.c_name AS s, b.c_name AS cs,
        |         CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |  FROM customer a JOIN customer b
        |    ON a.c_custkey <> b.c_custkey
        |   AND levenshtein(a.c_name, b.c_name) <= 1),
        |r AS (
        |  SELECT id, cand, dist, jaro_winkler_similarity(s, cs) AS jw,
        |         row_number() OVER (PARTITION BY id
        |             ORDER BY jaro_winkler_similarity(s, cs) DESC, cand)
        |           AS rk
        |  FROM p)
        |SELECT id, cand AS best_id, dist, jw
        |FROM r WHERE rk = 1 ORDER BY id""".stripMargin,

    // brute-force quadratic levenshtein join — fine as an ORACLE at the
    // verify SF; the operator itself must never do this
    "b25_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, count(*) AS n_matches,
        |       CAST(sum(b.c_custkey) AS BIGINT) AS sum_ids,
        |       CAST(max(levenshtein(a.c_name, b.c_name)) AS INT) AS max_dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) <= 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // format parity: the parquet original is the oracle's source — both
    // format columns must reproduce it exactly
    "a25_format_roundtrip" ->
      """SELECT l_returnflag,
        |       count(*) AS cnt_orc,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_orc,
        |       CAST(sum(l_orderkey) AS BIGINT) AS keys_orc,
        |       count(*) AS cnt_json,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_json,
        |       CAST(sum(l_orderkey) AS BIGINT) AS keys_json
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the generational split (even keys shipped
    // without l_extendedprice) straight from lineitem — priced_rows /
    // sum_price cover exactly the v2 generation, cnt/sum_qty both
    "a28_schema_evolution" ->
      """SELECT count(*) AS cnt,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       count(CASE WHEN l_orderkey % 2 <> 0
        |                  THEN l_extendedprice END) AS priced_rows,
        |       round(sum(CASE WHEN l_orderkey % 2 <> 0
        |                      THEN l_extendedprice END), 2) AS sum_price,
        |       true AS evolve_ok
        |FROM lineitem""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the oracle for the union-and-carry
    // implementation; the right side is reduced to one row per (key, time)
    // identically on both sides (max-orderkey row wins).
    "b18_asof_join" ->
      """WITH ro AS (
        |  SELECT * FROM (
        |    SELECT o_custkey AS k, o_orderdate, o_orderkey, o_totalprice,
        |           row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |               ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_type, count(*) AS n_events,
        |       count(r.o_orderkey) AS n_matched,
        |       count(DISTINCT r.o_orderkey) AS n_orders,
        |       round(sum(r.o_totalprice), 2) AS sum_price
        |FROM events e ASOF LEFT JOIN ro r
        |  ON e.user_id = r.k AND e.ts >= r.o_orderdate
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // DuckDB's native implementation — the independent reference
    "b45_jaro_winkler" ->
      """SELECT c_custkey, c_name,
        |       jaro_winkler_similarity(c_name, 'Customer#000000777')
        |         AS jw_near,
        |       jaro_winkler_similarity(c_name, 'Supplier Number 9')
        |         AS jw_far
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // same two codepoints built with chr(769); nfc_normalize recomposes,
    // regexp_replace+trim mirrors normalize_text's space collapse
    "b48_sql_surface" ->
      """SELECT c_custkey,
        |       jaro_winkler_similarity(c_name, 'Customer#000000777')
        |         AS jw,
        |       trim(regexp_replace(
        |         nfc_normalize(concat(' ', c_name, '  e', chr(769), ' ')),
        |         ' +', ' ', 'g')) AS norm
        |FROM customer
        |WHERE jaro_winkler_similarity(c_name, 'Customer#000000777') > 0.75
        |ORDER BY c_custkey""".stripMargin,

    // the identical reduction, the inequality flipped: e.ts <= r.time
    "b42_asof_forward" ->
      """WITH ro AS (
        |  SELECT * FROM (
        |    SELECT o_custkey AS k, o_orderdate, o_orderkey, o_totalprice,
        |           row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |               ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_type, count(*) AS n_events,
        |       count(r.o_orderkey) AS n_matched,
        |       count(DISTINCT r.o_orderkey) AS n_orders,
        |       round(sum(r.o_totalprice), 2) AS sum_price
        |FROM events e ASOF LEFT JOIN ro r
        |  ON e.user_id = r.k AND e.ts <= r.o_orderdate
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // bucketing is invisible to values: a plain join over the source
    // tables is the oracle; the no-shuffle property is the Spark-side
    // boolean
    "b17_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty,
        |       true AS colocated_ok
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical oracle to b18 — the bucketed variant must be
    // semantics-identical
    "b18b_asof_bucketed" ->
      """WITH ro AS (
        |  SELECT * FROM (
        |    SELECT o_custkey AS k, o_orderdate, o_orderkey, o_totalprice,
        |           row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |               ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_type, count(*) AS n_events,
        |       count(r.o_orderkey) AS n_matched,
        |       count(DISTINCT r.o_orderkey) AS n_orders,
        |       round(sum(r.o_totalprice), 2) AS sum_price
        |FROM events e ASOF LEFT JOIN ro r
        |  ON e.user_id = r.k AND e.ts >= r.o_orderdate
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical oracle to b19 — dispatch must not change results
    "b19b_range_join_auto" ->
      """WITH bands AS (
        |  SELECT band_id, band_id * 10 + 1 AS lo, band_id * 10 + 10 AS hi
        |  FROM (VALUES (0), (1), (2), (3), (4)) t(band_id)
        |  UNION ALL SELECT 9, 1, 50)
        |SELECT band_id, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN bands ON l_quantity BETWEEN lo AND hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "c17_gopher_quality" ->
      """WITH m AS (
        |  SELECT doc_id, length(trim(text)) AS lt,
        |         regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |m2 AS (
        |  SELECT doc_id, lt, t,
        |         CASE WHEN lt = 0 OR len(t) < 2 THEN NULL
        |              ELSE list_transform(range(1, len(t)),
        |                                  i -> t[i] || ' ' || t[i+1]) END AS bg
        |  FROM m),
        |m3 AS (
        |  SELECT doc_id,
        |    CASE WHEN lt = 0 THEN 0 ELSE len(t) END AS n_words,
        |    CASE WHEN lt = 0 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
        |    END AS dwf,
        |    CASE WHEN bg IS NULL THEN 0.0
        |         ELSE CAST(list_max(list_transform(list_distinct(bg),
        |                x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)
        |              / (len(t) - 1)
        |    END AS tbf,
        |    CASE WHEN lt = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(t, x -> length(x)))
        |                AS DOUBLE) / len(t)
        |    END AS mwl
        |  FROM m2)
        |SELECT doc_id, n_words, round(dwf, 4) AS dup_word_frac,
        |       round(tbf, 4) AS top_bigram_frac, round(mwl, 4) AS mean_word_len,
        |       (n_words >= 5 AND mwl BETWEEN 3.0 AND 12.0
        |          AND dwf <= 0.6 AND tbf <= 0.18) AS keep
        |FROM m3 ORDER BY doc_id""".stripMargin,

    "c18_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         text || ' Contact u' || CAST(doc_id AS VARCHAR)
        |           || '@ex' || CAST(doc_id % 7 AS VARCHAR)
        |           || '.org or 10.' || CAST(doc_id % 200 AS VARCHAR)
        |           || '.0.3 or call +55 11 9' || CAST(doc_id % 10 AS VARCHAR)
        |           || '00-0000.' AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text2,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text2,
        |      '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(text2, '\+[0-9][0-9 -]{6,}[0-9]')) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text2,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |      '\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g')) AS scrub_md5
        |FROM p ORDER BY doc_id""".stripMargin,

    // same md5-ordered deterministic init as Clustering.initCentroids;
    // argmax tie-break (max cos, then max list) matches array_max on
    // (cos, list) structs
    "c19_kmeans" ->
      """WITH cent AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
        |                            CAST(vec_id AS VARCHAR)) - 1 AS list,
        |         embedding
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
        |        LIMIT 8)),
        |scored AS (
        |  SELECT e.vec_id, c.list,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                CAST(c.embedding AS DOUBLE[])) AS cos
        |  FROM embeddings e CROSS JOIN cent c),
        |best AS (
        |  SELECT vec_id, list, cos,
        |         row_number() OVER (PARTITION BY vec_id
        |             ORDER BY cos DESC, list DESC) AS rn
        |  FROM scored)
        |SELECT list, count(*) AS n_vecs, round(avg(cos), 6) AS mean_cos
        |FROM best WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    "c20_stratified_sample" ->
      """SELECT lang, count(*) AS cnt FROM (
        |  SELECT lang,
        |         CAST(concat('0x', substr(md5(text), 1, 4)) AS INT) % 100 AS b
        |  FROM documents WHERE text IS NOT NULL) s
        |WHERE b < CASE lang WHEN 'en' THEN 80 WHEN 'fr' THEN 50
        |               WHEN 'de' THEN 30 ELSE 10 END
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "c21_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |n AS (
        |  SELECT doc_id, t,
        |         CAST(greatest(ceil((len(t) - 8) / 24.0), 1.0) AS INT) AS nc
        |  FROM d),
        |e AS (SELECT doc_id, t, unnest(range(0, nc)) AS j FROM n)
        |SELECT doc_id, CAST(j AS INT) AS chunk_idx,
        |       CAST(len(list_slice(t, j*24 + 1,
        |                least(j*24 + 32, len(t)))) AS INT) AS chunk_tokens,
        |       md5(array_to_string(list_slice(t, j*24 + 1,
        |                least(j*24 + 32, len(t))), ' ')) AS chunk_md5
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    "c22_sequence_pack" ->
      """WITH d AS (
        |  SELECT lang, doc_id,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |           AS nt
        |  FROM documents),
        |c AS (
        |  SELECT lang, nt,
        |         sum(nt) OVER (PARTITION BY lang ORDER BY doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT lang, CAST(floor((cum - nt) / 512.0) AS BIGINT) AS pack_id,
        |       count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS sum_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "d5_stream_dedup" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // the merged digest must place every quantile within 2% rank error
    // of the true distribution (the b20 gate shape)
    "d13_stream_quantiles" ->
      """SELECT qi, true AS rank_ok
        |FROM (VALUES (CAST(0 AS BIGINT)), (1), (2)) t(qi)
        |ORDER BY qi""".stripMargin,

    // exact heavy set over the same synthesized key; the CMS contract
    // booleans must both hold or the hash breaks (the b22 gate shape)
    "d12_stream_heavy_hitters" ->
      """WITH k AS (
        |  SELECT CASE WHEN event_id % 3 = 0 THEN CAST(-1 AS BIGINT)
        |              ELSE CAST(user_id % 50 AS BIGINT) END AS item
        |  FROM events),
        |t AS (SELECT item, count(*) AS true_cnt FROM k GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM k)
        |SELECT item, true_cnt, TRUE AS est_ge_true, TRUE AS err_within_eps
        |FROM t, tot WHERE true_cnt >= ceil(0.01 * n)
        |ORDER BY item""".stripMargin,

    "d6_attribution" ->
      """WITH v AS (
        |  SELECT user_id, event_id AS view_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS vsec
        |  FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS psec, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, count(v.view_id) AS n_views,
        |       round(max(p.value), 2) AS value
        |FROM p LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.vsec BETWEEN p.psec - 1800 AND p.psec
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "d6b_attribution_outer" ->
      """WITH v AS (
        |  SELECT user_id, event_id AS view_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS vsec
        |  FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS psec
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, v.view_id
        |FROM p LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.vsec BETWEEN p.psec - 1800 AND p.psec
        |ORDER BY 1, 2 NULLS FIRST""".stripMargin,

    "c1_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |         AS fingerprint,
        |       min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // Planted-duplicate oracles: every doc/vec has one exact copy at
    // id + 1e6; identical inputs share all LSH buckets, so the expected
    // output is exactly one pair per original with similarity 1 / hamming 0.
    "c2_minhash_lsh" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |       CAST(1.0 AS DOUBLE) AS jaccard
        |FROM documents ORDER BY 1""".stripMargin,

    // planted cross pairs only: every re-crawled copy pairs with its
    // reference original at jaccard 1.0; reversed-text novels pair with
    // nothing (disjoint shingle sets)
    "c2b_minhash_cross" ->
      """SELECT doc_id AS ref_id, doc_id + 1000000 AS inc_id,
        |       CAST(1.0 AS DOUBLE) AS jaccard
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY 1""".stripMargin,

    "c3_simhash" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |       CAST(0 AS INTEGER) AS hamming
        |FROM documents ORDER BY 1""".stripMargin,

    "c4_ngram_jaccard" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |       CAST(1.0 AS DOUBLE) AS ngram_jaccard
        |FROM documents ORDER BY 1""".stripMargin,

    "c5_embed_neardup" ->
      """SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
        |       CAST(1.0 AS DOUBLE) AS cos
        |FROM embeddings ORDER BY 1""".stripMargin,

    // NULL keys route to 'train' explicitly — same contract as
    // Sampling.splitCol (an unkeyable row must never land in an eval split)
    "c15_hash_split" ->
      """SELECT CASE WHEN b IS NULL THEN 'train'
        |            WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*) AS cnt, count(DISTINCT lang) AS n_langs
        |FROM (SELECT lang,
        |        CAST(concat('0x', substr(md5(text), 1, 4)) AS INT) % 100 AS b
        |      FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // both snapshots re-aggregated from the same token formula; ppm
    // shares via truncating integer division — all-BIGINT, no tolerance
    "c56_corpus_drift" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |         END AS nt
        |  FROM documents),
        |o AS (SELECT source AS stratum, count(*) AS docs_old,
        |             sum(nt) AS toks_old
        |      FROM tok WHERE doc_id % 3 <> 0 GROUP BY 1),
        |n AS (SELECT source AS stratum, count(*) AS docs_new,
        |             sum(nt) AS toks_new
        |      FROM tok WHERE source <> 'src7' OR doc_id % 9 = 0
        |      GROUP BY 1),
        |j AS (
        |  SELECT coalesce(o.stratum, n.stratum) AS stratum,
        |         CAST(coalesce(docs_old, 0) AS BIGINT) AS docs_old,
        |         CAST(coalesce(toks_old, 0) AS BIGINT) AS toks_old,
        |         CAST(coalesce(docs_new, 0) AS BIGINT) AS docs_new,
        |         CAST(coalesce(toks_new, 0) AS BIGINT) AS toks_new
        |  FROM o FULL OUTER JOIN n ON o.stratum = n.stratum),
        |p AS (
        |  SELECT *,
        |         toks_old * 1000000 // greatest(1,
        |           CAST(sum(toks_old) OVER () AS BIGINT)) AS share_old_ppm,
        |         toks_new * 1000000 // greatest(1,
        |           CAST(sum(toks_new) OVER () AS BIGINT)) AS share_new_ppm
        |  FROM j)
        |SELECT stratum, docs_old, toks_old, docs_new, toks_new,
        |       share_old_ppm, share_new_ppm,
        |       abs(share_new_ppm - share_old_ppm) AS drift_ppm,
        |       abs(share_new_ppm - share_old_ppm) > 20000 AS drifted
        |FROM p ORDER BY stratum""".stripMargin,

    // the ±1 matrix from the LCG formula, the projection from the same
    // quantize-then-sum — every y an exact BIGINT, no tolerance
    "c53_jl_projection" ->
      """WITH idx AS (SELECT unnest(range(0, 64)) AS i),
        |jj AS (SELECT unnest(range(0, 16)) AS j),
        |e AS (
        |  SELECT vec_id, CAST(j.j AS INT) AS j,
        |         CAST(floor(CAST(embedding[CAST(i.i AS INT) + 1] AS DOUBLE)
        |              * 1024 + 0.5) AS BIGINT) AS q,
        |         CASE WHEN ((j.j * 64 + i.i) * 2654435761) % 4294967296
        |                   < 2147483648
        |              THEN 1 ELSE -1 END AS s
        |  FROM embeddings CROSS JOIN idx i CROSS JOIN jj j)
        |SELECT vec_id, j, CAST(sum(s * q) AS BIGINT) AS y
        |FROM e GROUP BY 1, 2 ORDER BY vec_id, j""".stripMargin,

    // the whole quantized serving path replayed: projection, seed
    // centroids, argmin cells (ties to lowest c), 4-cell probes, exact
    // integer L2, (dist, id) ranks — zero tolerance end to end
    "c14d_jl_ivf_topk" ->
      """WITH idx AS (SELECT unnest(range(0, 64)) AS i),
        |jj AS (SELECT unnest(range(0, 16)) AS j),
        |codes AS (
        |  SELECT vec_id, CAST(j.j AS INT) AS j,
        |         CAST(sum((CASE WHEN ((j.j * 64 + i.i) * 2654435761)
        |                             % 4294967296 < 2147483648
        |                        THEN 1 ELSE -1 END)
        |              * CAST(floor(CAST(embedding[CAST(i.i AS INT) + 1]
        |                     AS DOUBLE) * 1024 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM embeddings CROSS JOIN idx i CROSS JOIN jj j
        |  GROUP BY 1, 2),
        |cent AS (SELECT vec_id AS c, j, y FROM codes WHERE vec_id < 16),
        |asg AS (
        |  SELECT v.vec_id, c.c, sum((v.y - c.y) * (v.y - c.y)) AS d
        |  FROM codes v JOIN cent c ON v.j = c.j
        |  GROUP BY 1, 2),
        |cell AS (
        |  SELECT vec_id, CAST(c AS INT) AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY d, c) AS rn FROM asg) t
        |  WHERE rn = 1),
        |qprobe AS (
        |  SELECT vec_id AS query_id, CAST(c AS INT) AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY d, c) AS rn
        |    FROM asg WHERE vec_id < 8) t
        |  WHERE rn <= 4),
        |cand AS (
        |  SELECT q.query_id, v.vec_id
        |  FROM cell v JOIN qprobe q ON v.cell = q.cell
        |  WHERE v.vec_id <> q.query_id),
        |dist AS (
        |  SELECT ca.query_id, ca.vec_id,
        |         sum((a.y - b.y) * (a.y - b.y)) AS dist
        |  FROM cand ca
        |  JOIN codes a ON a.vec_id = ca.query_id
        |  JOIN codes b ON b.vec_id = ca.vec_id AND b.j = a.j
        |  GROUP BY 1, 2)
        |SELECT query_id, vec_id AS neighbor_id,
        |       CAST(dist AS BIGINT) AS dist, CAST(rnk AS INT) AS rnk
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY dist, vec_id) AS rnk
        |  FROM dist) t
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // the identical md5 rank replayed: same seed prefix, same
    // hash-then-key tiebreak, same cap
    "c54_source_quota" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY md5(concat('quota:', CAST(doc_id AS VARCHAR))),
        |                    CAST(doc_id AS VARCHAR)) AS rn
        |  FROM documents) t
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

    // root resolution by construction (chains d — d+1M — d+2M root at
    // d), then the c15 md5 bucket formula on the root id
    "c55_leak_split" ->
      """WITH corpus AS (
        |  SELECT doc_id FROM documents
        |  UNION ALL SELECT doc_id + 1000000 FROM documents
        |    WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id + 2000000 FROM documents
        |    WHERE doc_id % 6 = 0),
        |r AS (SELECT doc_id,
        |        CASE WHEN doc_id >= 2000000 THEN doc_id - 2000000
        |             WHEN doc_id >= 1000000 THEN doc_id - 1000000
        |             ELSE doc_id END AS root
        |      FROM corpus),
        |b AS (SELECT doc_id,
        |        CAST(concat('0x', substr(md5(CAST(root AS VARCHAR)), 1, 4))
        |             AS INT) % 100 AS bb
        |      FROM r)
        |SELECT doc_id,
        |       CASE WHEN bb < 80 THEN 'train' WHEN bb < 90 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    // same (sec, event_id) total order as d2; RE2's leftmost
    // non-overlapping regexp_extract_all ≡ Java's find() loop for these
    // literal-class patterns
    "b49_seq_pattern" ->
      """WITH s AS (
        |  SELECT user_id,
        |         string_agg(substr(event_type, 1, 1), ''
        |           ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
        |           AS seq
        |  FROM events GROUP BY 1)
        |SELECT user_id, CAST(length(seq) AS INT) AS seq_len,
        |       CAST(len(regexp_extract_all(seq, 'v+c*p')) AS BIGINT)
        |         AS n_matches,
        |       CAST(coalesce(list_max(list_transform(
        |              regexp_extract_all(seq, 'e+'), x -> length(x))), 0)
        |            AS BIGINT) AS longest_run
        |FROM s ORDER BY user_id""".stripMargin,

    // exact integer micros × integer cents; the single division is the
    // only float and both engines derive it from identical BIGINTs
    "b50_time_weighted" ->
      """WITH b AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |h AS (
        |  SELECT user_id, cents, us,
        |         lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |           AS next_us
        |  FROM b)
        |SELECT user_id, count(*) AS n_holds,
        |       CAST(sum(next_us - us) AS BIGINT) AS total_hold_us,
        |       round(CAST(CAST(sum(cents * (next_us - us)) AS BIGINT)
        |                  AS DOUBLE)
        |             / CAST(CAST(sum(next_us - us) AS BIGINT) AS DOUBLE)
        |             / CAST(100 AS DOUBLE), 6) AS twa_value
        |FROM h WHERE next_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // quantile_disc ≡ percentile_disc (the d20 pairing): both pick
    // actual data values, so med/mad/the 3-MAD compare are
    // interpolation-free
    "b51_robust_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_disc(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_disc(adev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, count(*) AS n,
        |       round(min(d.med), 2) AS med, round(min(a.mad), 2) AS mad,
        |       CAST(sum(CASE WHEN d.adev > 3 * a.mad THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad a ON d.event_type = a.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the identical md5(secret:value) tokens rebuilt on both tables,
    // joined on the tokens — referential integrity is the check itself
    "a38_pseudonymize" ->
      """WITH cust AS (
        |  SELECT md5(concat('s3cr3t:', CAST(c_custkey AS VARCHAR)))
        |           AS c_custkey,
        |         md5(concat('s3cr3t:', c_name)) AS c_name, c_mktsegment
        |  FROM customer),
        |ords AS (
        |  SELECT md5(concat('s3cr3t:', CAST(o_custkey AS VARCHAR)))
        |           AS o_custkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |       count(o.o_custkey) AS n_orders,
        |       CAST(coalesce(sum(o.cents), 0) AS BIGINT)
        |         AS sum_price_cents
        |FROM cust c LEFT JOIN ords o ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    // raw/effective/dup-ppm replayed from the token formula + md5 text
    // identity, with the same planted re-crawl copies
    "c60_effective_tokens" ->
      """WITH corpus AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, text FROM documents
        |  WHERE doc_id % 5 = 0),
        |tok AS (
        |  SELECT source, md5(text) AS h,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |         END AS toks
        |  FROM corpus),
        |u AS (
        |  SELECT source, h, count(*) AS n_copies, min(toks) AS toks
        |  FROM tok GROUP BY 1, 2)
        |SELECT source, CAST(sum(n_copies) AS BIGINT) AS raw_docs,
        |       CAST(sum(n_copies * toks) AS BIGINT) AS raw_tokens,
        |       count(*) AS uniq_docs,
        |       CAST(sum(toks) AS BIGINT) AS effective_tokens,
        |       CAST((CAST(sum(n_copies * toks) AS BIGINT)
        |             - CAST(sum(toks) AS BIGINT)) * 1000000
        |            // CAST(sum(n_copies * toks) AS BIGINT) AS BIGINT)
        |         AS dup_ppm
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    // the first-cap-per-key verdict as a window rank over the (sec,
    // event_id) total order
    "d26_admission_cap" ->
      """SELECT event_id, user_id,
        |       row_number() OVER (PARTITION BY user_id
        |         ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
        |         <= 40 AS admitted
        |FROM events ORDER BY event_id""".stripMargin,

    // the composed fold replayed by a DIFFERENT algorithm: admission =
    // the d26 window rank; the kept-based debounce (no window form
    // exists — the next verdict depends on the last KEPT time) as a
    // rank-synchronous RECURSIVE CTE advancing one admitted event per
    // (user, type-initial) per step; quality = the d16 predicate
    "d32_frontier_gate" ->
      """WITH RECURSIVE ev AS (
        |  SELECT event_id, user_id, event_type, value,
        |         substr(event_type, 1, 1) AS ty,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |         NOT coalesce(user_id IS NOT NULL
        |             AND value >= 0 AND value <= 300
        |             AND event_type IN ('click', 'view', 'purchase',
        |                                'signup'), false) AS quarantined
        |  FROM events),
        |adm AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |           ORDER BY sec, event_id) <= 40 AS admitted
        |  FROM ev),
        |ranked AS (
        |  SELECT event_id, user_id, ty, sec,
        |         row_number() OVER (PARTITION BY user_id, ty
        |           ORDER BY sec, event_id) AS rn
        |  FROM adm WHERE admitted),
        |rec AS (
        |  SELECT user_id, ty, rn, sec, event_id,
        |         true AS kept, sec AS last_kept
        |  FROM ranked WHERE rn = 1
        |  UNION ALL
        |  SELECT a.user_id, a.ty, a.rn, a.sec, a.event_id,
        |         a.sec - d.last_kept > 600,
        |         CASE WHEN a.sec - d.last_kept > 600
        |              THEN a.sec ELSE d.last_kept END
        |  FROM ranked a JOIN rec d
        |    ON a.user_id = d.user_id AND a.ty = d.ty AND a.rn = d.rn + 1)
        |SELECT CASE WHEN NOT a.admitted THEN 'capped'
        |            WHEN NOT coalesce(r.kept, false) THEN 'debounced'
        |            WHEN a.quarantined THEN 'quarantine'
        |            ELSE 'pass' END AS verdict,
        |       a.event_type, count(*) AS n,
        |       round(sum(a.value), 2) AS sum_value
        |FROM adm a LEFT JOIN rec r USING (event_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // both sides replayed — c14d's probe-limited top-5 AND the
    // exhaustive top-5 — then recall counted; integer end to end
    "c63_ann_recall" ->
      """WITH idx AS (SELECT unnest(range(0, 64)) AS i),
        |jj AS (SELECT unnest(range(0, 16)) AS j),
        |codes AS (
        |  SELECT vec_id, CAST(j.j AS INT) AS j,
        |         CAST(sum((CASE WHEN ((j.j * 64 + i.i) * 2654435761)
        |                             % 4294967296 < 2147483648
        |                        THEN 1 ELSE -1 END)
        |              * CAST(floor(CAST(embedding[CAST(i.i AS INT) + 1]
        |                     AS DOUBLE) * 1024 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM embeddings CROSS JOIN idx i CROSS JOIN jj j
        |  GROUP BY 1, 2),
        |cent AS (SELECT vec_id AS c, j, y FROM codes WHERE vec_id < 16),
        |asg AS (
        |  SELECT v.vec_id, c.c, sum((v.y - c.y) * (v.y - c.y)) AS d
        |  FROM codes v JOIN cent c ON v.j = c.j
        |  GROUP BY 1, 2),
        |cell AS (
        |  SELECT vec_id, CAST(c AS INT) AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY d, c) AS rn FROM asg) t
        |  WHERE rn = 1),
        |qprobe AS (
        |  SELECT vec_id AS query_id, CAST(c AS INT) AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY d, c) AS rn
        |    FROM asg WHERE vec_id < 8) t
        |  WHERE rn <= 2),
        |adist AS (
        |  SELECT ca.query_id, ca.vec_id,
        |         sum((a.y - b.y) * (a.y - b.y)) AS dist
        |  FROM (SELECT q.query_id, v.vec_id
        |        FROM cell v JOIN qprobe q ON v.cell = q.cell
        |        WHERE v.vec_id <> q.query_id) ca
        |  JOIN codes a ON a.vec_id = ca.query_id
        |  JOIN codes b ON b.vec_id = ca.vec_id AND b.j = a.j
        |  GROUP BY 1, 2),
        |approx AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY dist, vec_id) AS rnk FROM adist) t
        |  WHERE rnk <= 5),
        |edist AS (
        |  SELECT q.query_id, b.vec_id,
        |         sum((a.y - b.y) * (a.y - b.y)) AS dist
        |  FROM (SELECT vec_id AS query_id FROM embeddings
        |        WHERE vec_id < 8) q
        |  JOIN codes a ON a.vec_id = q.query_id
        |  JOIN codes b ON b.j = a.j
        |  WHERE b.vec_id <> q.query_id
        |  GROUP BY 1, 2),
        |exact AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY dist, vec_id) AS rnk FROM edist) t
        |  WHERE rnk <= 5)
        |SELECT e.query_id, count(*) AS n_exact,
        |       count(a.vec_id) AS n_hit,
        |       CAST(count(a.vec_id) * 200000 AS BIGINT) AS recall_ppm
        |FROM exact e LEFT JOIN approx a
        |  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the c53 code replay + label-inequality filter + exact (dist, id)
    // ranks — zero tolerance
    "c62_hard_negatives" ->
      """WITH idx AS (SELECT unnest(range(0, 64)) AS i),
        |jj AS (SELECT unnest(range(0, 16)) AS j),
        |codes AS (
        |  SELECT vec_id, CAST(j.j AS INT) AS j,
        |         CAST(sum((CASE WHEN ((j.j * 64 + i.i) * 2654435761)
        |                             % 4294967296 < 2147483648
        |                        THEN 1 ELSE -1 END)
        |              * CAST(floor(CAST(embedding[CAST(i.i AS INT) + 1]
        |                     AS DOUBLE) * 1024 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM embeddings CROSS JOIN idx i CROSS JOIN jj j
        |  GROUP BY 1, 2),
        |lab AS (SELECT vec_id, label FROM embeddings),
        |q AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 8),
        |dist AS (
        |  SELECT q.query_id, b.vec_id,
        |         sum((a.y - b.y) * (a.y - b.y)) AS dist
        |  FROM q
        |  JOIN codes a ON a.vec_id = q.query_id
        |  JOIN codes b ON b.j = a.j
        |  GROUP BY 1, 2),
        |f AS (
        |  SELECT d.query_id, d.vec_id, lb.label,
        |         CAST(d.dist AS BIGINT) AS dist
        |  FROM dist d
        |  JOIN lab lb ON lb.vec_id = d.vec_id
        |  JOIN lab lq ON lq.vec_id = d.query_id
        |  WHERE lb.label <> lq.label AND d.vec_id <> d.query_id)
        |SELECT query_id, vec_id AS neg_id, label, dist,
        |       CAST(rnk AS INT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |          ORDER BY dist, vec_id) AS rnk FROM f) t
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // the full three-epoch trajectory unrolled: shifted codes, integer
    // centroids (// of positive sums), argmin assignment (ties to the
    // lowest cell), state merge — zero tolerance end to end
    "d27_centroid_maintenance" ->
      """WITH idx AS (SELECT unnest(range(0, 64)) AS i),
        |jj AS (SELECT unnest(range(0, 16)) AS j),
        |codes AS (
        |  SELECT vec_id, CAST(j.j AS INT) AS j,
        |         CAST(sum((CASE WHEN ((j.j * 64 + i.i) * 2654435761)
        |                             % 4294967296 < 2147483648
        |                        THEN 1 ELSE -1 END)
        |              * CAST(floor(CAST(embedding[CAST(i.i AS INT) + 1]
        |                     AS DOUBLE) * 1024 + 0.5) AS BIGINT))
        |              AS BIGINT) + 524288 AS y
        |  FROM embeddings CROSS JOIN idx i CROSS JOIN jj j
        |  GROUP BY 1, 2),
        |s0 AS (SELECT CAST(vec_id AS INT) AS cell, j, y AS sq
        |       FROM codes WHERE vec_id < 8),
        |n0 AS (SELECT CAST(vec_id AS INT) AS cell, CAST(1 AS BIGINT)
        |         AS cnt FROM embeddings WHERE vec_id < 8),
        |c0 AS (SELECT s0.cell, s0.j, s0.sq // n0.cnt AS y
        |       FROM s0 JOIN n0 ON n0.cell = s0.cell),
        |a0 AS (SELECT v.vec_id, c.cell,
        |              sum((v.y - c.y) * (v.y - c.y)) AS d
        |       FROM codes v JOIN c0 c ON v.j = c.j
        |       WHERE v.vec_id % 3 = 0 GROUP BY 1, 2),
        |g0 AS (SELECT vec_id, cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id
        |             ORDER BY d, cell) AS rn FROM a0) t
        |       WHERE rn = 1),
        |ac0 AS (SELECT cell, count(*) AS nn FROM g0 GROUP BY 1),
        |u0 AS (SELECT g0.cell, cd.j, sum(cd.y) AS sq
        |       FROM g0 JOIN codes cd ON cd.vec_id = g0.vec_id
        |       GROUP BY 1, 2),
        |s1 AS (SELECT s0.cell, s0.j, s0.sq + coalesce(u0.sq, 0) AS sq
        |       FROM s0 LEFT JOIN u0
        |         ON u0.cell = s0.cell AND u0.j = s0.j),
        |n1 AS (SELECT n0.cell, n0.cnt + coalesce(ac0.nn, 0) AS cnt
        |       FROM n0 LEFT JOIN ac0 ON ac0.cell = n0.cell),
        |r0 AS (SELECT 0 AS epoch, n1.cell,
        |              CAST(coalesce(ac0.nn, 0) AS BIGINT) AS n_assigned,
        |              CAST(n1.cnt AS BIGINT) AS post_count, l1.sl1
        |         AS post_sum_l1
        |       FROM n1
        |       LEFT JOIN ac0 ON ac0.cell = n1.cell
        |       JOIN (SELECT cell, CAST(sum(sq) AS BIGINT) AS sl1
        |             FROM s1 GROUP BY 1) l1 ON l1.cell = n1.cell),
        |c1 AS (SELECT s1.cell, s1.j, s1.sq // n1.cnt AS y
        |       FROM s1 JOIN n1 ON n1.cell = s1.cell),
        |a1 AS (SELECT v.vec_id, c.cell,
        |              sum((v.y - c.y) * (v.y - c.y)) AS d
        |       FROM codes v JOIN c1 c ON v.j = c.j
        |       WHERE v.vec_id % 3 = 1 GROUP BY 1, 2),
        |g1 AS (SELECT vec_id, cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id
        |             ORDER BY d, cell) AS rn FROM a1) t
        |       WHERE rn = 1),
        |ac1 AS (SELECT cell, count(*) AS nn FROM g1 GROUP BY 1),
        |u1 AS (SELECT g1.cell, cd.j, sum(cd.y) AS sq
        |       FROM g1 JOIN codes cd ON cd.vec_id = g1.vec_id
        |       GROUP BY 1, 2),
        |s2 AS (SELECT s1.cell, s1.j, s1.sq + coalesce(u1.sq, 0) AS sq
        |       FROM s1 LEFT JOIN u1
        |         ON u1.cell = s1.cell AND u1.j = s1.j),
        |n2 AS (SELECT n1.cell, n1.cnt + coalesce(ac1.nn, 0) AS cnt
        |       FROM n1 LEFT JOIN ac1 ON ac1.cell = n1.cell),
        |r1 AS (SELECT 1 AS epoch, n2.cell,
        |              CAST(coalesce(ac1.nn, 0) AS BIGINT) AS n_assigned,
        |              CAST(n2.cnt AS BIGINT) AS post_count, l1.sl1
        |         AS post_sum_l1
        |       FROM n2
        |       LEFT JOIN ac1 ON ac1.cell = n2.cell
        |       JOIN (SELECT cell, CAST(sum(sq) AS BIGINT) AS sl1
        |             FROM s2 GROUP BY 1) l1 ON l1.cell = n2.cell),
        |c2 AS (SELECT s2.cell, s2.j, s2.sq // n2.cnt AS y
        |       FROM s2 JOIN n2 ON n2.cell = s2.cell),
        |a2 AS (SELECT v.vec_id, c.cell,
        |              sum((v.y - c.y) * (v.y - c.y)) AS d
        |       FROM codes v JOIN c2 c ON v.j = c.j
        |       WHERE v.vec_id % 3 = 2 GROUP BY 1, 2),
        |g2 AS (SELECT vec_id, cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id
        |             ORDER BY d, cell) AS rn FROM a2) t
        |       WHERE rn = 1),
        |ac2 AS (SELECT cell, count(*) AS nn FROM g2 GROUP BY 1),
        |u2 AS (SELECT g2.cell, cd.j, sum(cd.y) AS sq
        |       FROM g2 JOIN codes cd ON cd.vec_id = g2.vec_id
        |       GROUP BY 1, 2),
        |s3 AS (SELECT s2.cell, s2.j, s2.sq + coalesce(u2.sq, 0) AS sq
        |       FROM s2 LEFT JOIN u2
        |         ON u2.cell = s2.cell AND u2.j = s2.j),
        |n3 AS (SELECT n2.cell, n2.cnt + coalesce(ac2.nn, 0) AS cnt
        |       FROM n2 LEFT JOIN ac2 ON ac2.cell = n2.cell),
        |r2 AS (SELECT 2 AS epoch, n3.cell,
        |              CAST(coalesce(ac2.nn, 0) AS BIGINT) AS n_assigned,
        |              CAST(n3.cnt AS BIGINT) AS post_count, l1.sl1
        |         AS post_sum_l1
        |       FROM n3
        |       LEFT JOIN ac2 ON ac2.cell = n3.cell
        |       JOIN (SELECT cell, CAST(sum(sq) AS BIGINT) AS sl1
        |             FROM s3 GROUP BY 1) l1 ON l1.cell = n3.cell)
        |SELECT * FROM r0 UNION ALL SELECT * FROM r1
        |UNION ALL SELECT * FROM r2
        |ORDER BY epoch, cell""".stripMargin,

    // same line synthesis, doc-frequency threshold, and ordered
    // reconstruction digest
    "c64_boilerplate_lines" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |         regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |           ' ') AS words
        |  FROM documents),
        |ln AS (
        |  SELECT doc_id, source, 0 AS idx,
        |         concat('from ', source, ' crawl header') AS line
        |  FROM w
        |  UNION ALL
        |  SELECT doc_id, source, CAST(t.i + 1 AS INT) AS idx,
        |         array_to_string(words[(t.i*12+1):(t.i*12+12)], ' ')
        |           AS line
        |  FROM w, unnest(range(0, (len(words) + 11) // 12)) t(i)),
        |st AS (SELECT source, line, count(DISTINCT doc_id) AS df
        |       FROM ln GROUP BY 1, 2),
        |nd AS (SELECT source, count(*) AS n_docs
        |       FROM documents GROUP BY 1),
        |fl AS (
        |  SELECT l.doc_id, l.idx, l.line,
        |         (st.df * 100 >= nd.n_docs * 30) AS boiler
        |  FROM ln l
        |  JOIN st ON st.source = l.source AND st.line = l.line
        |  JOIN nd ON nd.source = l.source)
        |SELECT doc_id, count(*) AS n_lines,
        |       CAST(sum(CASE WHEN NOT boiler THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_kept,
        |       md5(coalesce(string_agg(
        |             CASE WHEN NOT boiler THEN line END, ' '
        |             ORDER BY idx), '')) AS clean_md5
        |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin,

    // quantile_disc ≡ percentile_disc on exact integer gaps
    "b54_interarrival" ->
      """WITH g AS (
        |  SELECT user_id,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |           PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |           AS gap
        |  FROM events)
        |SELECT user_id, count(*) AS n_gaps,
        |       CAST(min(gap) AS BIGINT) AS min_gap_us,
        |       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_gap_us,
        |       CAST(quantile_disc(gap, 0.9) AS BIGINT) AS p90_gap_us,
        |       CAST(max(gap) AS BIGINT) AS max_gap_us
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the c53 quantization formula, exact per-dim sums, one division
    "c61_embedding_pool" ->
      """WITH e AS (
        |  SELECT vec_id // 4 AS doc_id, CAST(i.i AS INT) AS j,
        |         CAST(floor(CAST(embedding[CAST(i.i AS INT) + 1]
        |              AS DOUBLE) * 1024 + 0.5) AS BIGINT) AS q
        |  FROM embeddings
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i)
        |SELECT doc_id, j, count(*) AS n_chunks,
        |       CAST(sum(q) AS BIGINT) AS sum_q,
        |       round(CAST(CAST(sum(q) AS BIGINT) AS DOUBLE)
        |             / (count(*) * CAST(1024 AS DOUBLE)), 6) AS pooled
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the discovered domain enumerated as explicit conditional sums —
    // identical column names, null for empty cells on both engines
    "b58_pivot_auto" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN cents
        |           END) AS BIGINT) AS "1-URGENT",
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN cents
        |           END) AS BIGINT) AS "2-HIGH",
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN cents
        |           END) AS BIGINT) AS "3-MEDIUM",
        |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
        |           THEN cents END) AS BIGINT) AS "4-NOT SPECIFIED",
        |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN cents
        |           END) AS BIGINT) AS "5-LOW"
        |FROM (SELECT o_orderstatus, o_orderpriority,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |      FROM orders) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same weekly cohorting, distinct activity, exact ppm
    "b59_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT user_id,
        |         CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS cw FROM ev GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, wk FROM ev),
        |act AS (
        |  SELECT f.cw, a.wk - f.cw AS k,
        |         count(DISTINCT a.user_id) AS n_active
        |  FROM a JOIN f ON f.user_id = a.user_id
        |  WHERE a.wk - f.cw BETWEEN 0 AND 3
        |  GROUP BY 1, 2),
        |coh AS (SELECT cw, count(*) AS n_cohort FROM f GROUP BY 1)
        |SELECT act.cw, act.k, coh.n_cohort,
        |       CAST(act.n_active AS BIGINT) AS n_active,
        |       CAST(act.n_active * 1000000 // coh.n_cohort AS BIGINT)
        |         AS retention_ppm
        |FROM act JOIN coh ON coh.cw = act.cw
        |ORDER BY act.cw, act.k""".stripMargin,

    // same lag window over the (sec, event_id) order
    "d29_debounce" ->
      """SELECT event_id, user_id, event_type,
        |       prev IS NULL OR sec - prev > 600 AS kept
        |FROM (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |           PARTITION BY user_id, event_type
        |           ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
        |           AS prev
        |  FROM events) t
        |ORDER BY event_id""".stripMargin,

    // both native ASOF directions + the exact integer-micros nearer-side
    // pick, ties to the earlier row
    "b53_asof_nearest" ->
      """WITH fx AS (
        |  SELECT user_id, ts AS fix_ts, min(event_id) AS fix_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |f AS (SELECT event_id AS fail_id, user_id, ts
        |      FROM events WHERE event_type = 'error'),
        |b AS (
        |  SELECT f.fail_id, f.user_id, f.ts, r.fix_id AS b_id,
        |         r.fix_ts AS b_ts
        |  FROM f ASOF LEFT JOIN fx r
        |    ON f.user_id = r.user_id AND f.ts >= r.fix_ts),
        |fw AS (
        |  SELECT f.fail_id, r.fix_id AS f_id, r.fix_ts AS f_ts
        |  FROM f ASOF LEFT JOIN fx r
        |    ON f.user_id = r.user_id AND f.ts <= r.fix_ts),
        |j AS (
        |  SELECT b.fail_id, b.user_id, b.ts, b.b_id, b.b_ts, fw.f_id,
        |         fw.f_ts,
        |         epoch_us(b.ts) - epoch_us(b.b_ts) AS db,
        |         epoch_us(fw.f_ts) - epoch_us(b.ts) AS df
        |  FROM b JOIN fw USING (fail_id))
        |SELECT fail_id, user_id,
        |       CASE WHEN b_id IS NULL THEN f_id
        |            WHEN f_id IS NULL THEN b_id
        |            WHEN df < db THEN f_id ELSE b_id END AS fix_id,
        |       CASE WHEN b_id IS NULL THEN df
        |            WHEN f_id IS NULL THEN db
        |            ELSE least(db, df) END AS delta_us
        |FROM j ORDER BY fail_id""".stripMargin,

    // brute-force inequality overlap join — the oracle pays the
    // cartesian the engine's bucketing avoids
    "b56_interval_overlap" ->
      """WITH iv AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |         min(CAST(floor(epoch(ts)) AS BIGINT)) AS lo,
        |         max(CAST(floor(epoch(ts)) AS BIGINT)) AS hi
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id AS user_a, day AS day_a, lo AS lo_a,
        |             hi AS hi_a FROM iv WHERE user_id < 5),
        |r AS (SELECT lo AS lo_b, hi AS hi_b FROM iv WHERE user_id >= 5),
        |p AS (
        |  SELECT user_a, day_a,
        |         least(hi_a, hi_b) - greatest(lo_a, lo_b) + 1 AS ov
        |  FROM l JOIN r ON lo_a <= hi_b AND lo_b <= hi_a)
        |SELECT user_a, day_a, count(*) AS n_concurrent,
        |       CAST(sum(ov) AS BIGINT) AS total_overlap_sec
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // d34's batch twin (stream equality spec-locked): the same interval
    // derivation as b56 plus the max-length CONTRACT filter that bounds
    // streaming state, pair-level output
    "d34_overlap_stream" ->
      """WITH iv AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |         min(CAST(floor(epoch(ts)) AS BIGINT)) AS lo,
        |         max(CAST(floor(epoch(ts)) AS BIGINT)) AS hi
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id * 1000000 + day AS a_id, lo AS a_lo,
        |             hi AS a_hi
        |      FROM iv WHERE user_id < 5 AND hi - lo <= 43200 AND lo <= hi),
        |r AS (SELECT user_id * 1000000 + day AS b_id, lo AS b_lo,
        |             hi AS b_hi
        |      FROM iv WHERE user_id >= 5 AND hi - lo <= 43200 AND lo <= hi)
        |SELECT a_id, b_id, a_lo, a_hi, b_lo, b_hi
        |FROM l JOIN r ON a_lo <= b_hi AND b_lo <= a_hi
        |ORDER BY 1, 2""".stripMargin,

    // b62: the REBUILD — new history (base ∪ updates), new fact set,
    // temporal argmax attribution (latest valid_from <= orderdate per
    // fact), one group — where the engine maintained incrementally
    "b62_scd2_view_maintenance" ->
      """WITH hist_new AS (
        |  SELECT c_custkey AS pk, DATE '1990-01-01' AS vf,
        |         c_mktsegment AS segment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, DATE '1995-06-01', 'MOVED'
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, DATE '1993-03-01', 'MID'
        |  FROM customer WHERE c_custkey % 7 = 0),
        |f_new AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |  WHERE (o_orderkey % 2 = 0 AND o_orderkey % 10 <> 2)
        |     OR o_orderkey % 10 = 1),
        |attributed AS (
        |  SELECT o_orderkey, cents, segment FROM (
        |    SELECT f.o_orderkey, f.cents, h.segment,
        |           row_number() OVER (PARTITION BY f.o_orderkey
        |                              ORDER BY h.vf DESC) AS rn
        |    FROM f_new f JOIN hist_new h
        |      ON f.o_custkey = h.pk AND h.vf <= f.o_orderdate) x
        |  WHERE rn = 1)
        |SELECT segment, count(*) AS n_orders,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM attributed GROUP BY 1 ORDER BY 1""".stripMargin,

    // the REBUILD from the merged snapshot — the strongest possible
    // check of the incremental path: a different algorithm, same answer
    "b57_join_view_maintenance" ->
      """SELECT c.c_mktsegment, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS sum_cents
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |WHERE o.o_orderkey % 5 = 0 OR o.o_orderkey % 7 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // rebuild from BOTH merged snapshots: fact' = base + inserts −
    // deletes, dim' = segments with %3 customers moved (the
    // unreferenced NEWSEG insert joins nothing — its absence from the
    // result IS the no-op check)
    "b61_bilinear_view_maintenance" ->
      """WITH dim_new AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 3 = 0 THEN 'MOVED'
        |              ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer
        |  UNION ALL SELECT 1000000000, 'NEWSEG')
        |SELECT d.c_mktsegment, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS sum_cents
        |FROM orders o JOIN dim_new d ON d.c_custkey = o.o_custkey
        |WHERE o.o_orderkey % 5 = 0 OR o.o_orderkey % 7 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // weights table inlined, same distinct-text token mass and integer
    // ppm schedule
    "c65_epoch_schedule" ->
      """WITH w AS (
        |  SELECT source, CAST(w_ppm AS BIGINT) AS w_ppm
        |  FROM (VALUES ('src0', 500000), ('src1', 250000),
        |    ('src2', 150000), ('src3', 100000)) AS t(source, w_ppm)),
        |tok AS (
        |  SELECT source, md5(text) AS h,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |         END AS toks
        |  FROM documents),
        |u AS (SELECT source, h, min(toks) AS toks FROM tok GROUP BY 1, 2),
        |eff AS (SELECT source, CAST(sum(toks) AS BIGINT)
        |          AS effective_tokens FROM u GROUP BY 1)
        |SELECT w.source, CAST(w.w_ppm AS BIGINT) AS w_ppm,
        |       CAST(w.w_ppm * 3000000 // 1000000 AS BIGINT)
        |         AS allocated_tokens,
        |       eff.effective_tokens,
        |       CAST((w.w_ppm * 3000000 // 1000000) * 1000000
        |            // eff.effective_tokens AS BIGINT) AS epochs_ppm,
        |       (w.w_ppm * 3000000 // 1000000) * 1000000
        |         // eff.effective_tokens > 4000000 AS over_repeat
        |FROM w JOIN eff ON eff.source = w.source
        |ORDER BY w.source""".stripMargin,

    // same exact floor-bucketing and integer cents
    "b55_histogram" ->
      """SELECT CAST(floor(value / 2) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       round(min(value), 2) AS min_value,
        |       round(max(value), 2) AS max_value,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // same first-appearance identity: cumulative distinct = running
    // sum of first-day counts
    "b60_cumulative_distinct" ->
      """WITH ev AS (
        |  SELECT user_id,
        |         CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day
        |  FROM events),
        |fd AS (SELECT min(day) AS fd FROM ev GROUP BY user_id),
        |nn AS (SELECT fd, count(*) AS n_new FROM fd GROUP BY 1),
        |d AS (SELECT DISTINCT day FROM ev)
        |SELECT d.day, CAST(coalesce(nn.n_new, 0) AS BIGINT) AS n_new,
        |       CAST(sum(coalesce(nn.n_new, 0)) OVER (ORDER BY d.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_users
        |FROM d LEFT JOIN nn ON nn.fd = d.day
        |ORDER BY d.day""".stripMargin,

    // same deterministic ntile order and bucket rule
    "c73_length_deciles" ->
      """SELECT source, decile, count(*) AS n_docs,
        |       CAST(min(n_chars) AS BIGINT) AS min_chars,
        |       CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM (
        |  SELECT source, n_chars,
        |         ntile(10) OVER (PARTITION BY source
        |           ORDER BY n_chars, doc_id) AS decile
        |  FROM documents) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the rebuild from the merged snapshot — a different algorithm,
    // same answer (the b57 oracle shape)
    "c72_datasheet_maintenance" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |                ELSE len(regexp_split_to_array(trim(text),
        |                     '\s+')) END) AS BIGINT) AS sum_toks,
        |       CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id % 4 = 0 OR doc_id % 6 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same planted corpus, md5 clusters, truncating ppm
    "c70_soft_dedup_weights" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 5 = 0)
        |SELECT doc_id,
        |       count(*) OVER (PARTITION BY md5(text)) AS cluster_size,
        |       1000000 // count(*) OVER (PARTITION BY md5(text))
        |         AS weight_ppm
        |FROM corpus ORDER BY doc_id""".stripMargin,

    // plain group sizes + the k threshold
    "c71_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |       count(*) >= 5 AS k_ok
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // identical positional enumeration, exact counts, same entropy
    // formula rounded 3; empty docs excluded on both sides (the engine
    // guards them too — Spark's sequence(1, 0) is descending)
    "c69_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, substr(text, CAST(t.i AS INT), 1) AS ch
        |  FROM documents, unnest(range(1, length(text) + 1)) t(i)
        |  WHERE length(text) > 0),
        |cc AS (SELECT doc_id, ch, count(*) AS nc FROM ch GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(nc) AS BIGINT) AS n_chars,
        |       count(*) AS n_distinct,
        |       round(ln(CAST(sum(nc) AS DOUBLE))
        |             - sum(nc * ln(CAST(nc AS DOUBLE)))
        |               / CAST(sum(nc) AS DOUBLE), 3) AS entropy
        |FROM cc GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical planted suffixes, replace-and-measure counts over the
    // same literal BMP ranges, integer ppm
    "c67_script_profile" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         concat(text, CASE WHEN doc_id % 7 = 0 THEN ' 你好世界'
        |                           WHEN doc_id % 11 = 0 THEN ' привет'
        |                           ELSE '' END) AS t2
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         length(t2) - length(regexp_replace(t2, '[a-zA-Z]', '',
        |           'g')) AS n_latin,
        |         length(t2) - length(regexp_replace(t2, '[一-鿿]', '',
        |           'g')) AS n_cjk,
        |         length(t2) - length(regexp_replace(t2, '[Ѐ-ӿ]', '',
        |           'g')) AS n_cyr
        |  FROM d)
        |SELECT doc_id, n_latin, n_cjk, n_cyr,
        |       CASE WHEN n_latin + n_cjk + n_cyr = 0 THEN 0
        |            ELSE (n_cjk + n_cyr) * 1000000
        |                 // (n_latin + n_cjk + n_cyr) END AS nonlatin_ppm,
        |       n_latin > 0 AND (n_cjk > 0 OR n_cyr > 0) AS mixed_script
        |FROM c ORDER BY doc_id""".stripMargin,

    // same vocab counts, same (cnt desc, tok) rank, regr_* over ln —
    // the b36 pairing, rounded 4 (the c30 transcendental contract)
    "c68_zipf" ->
      """WITH v AS (
        |  SELECT tok, count(*) AS cnt FROM (
        |    SELECT unnest(regexp_split_to_array(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
        |      AS tok
        |    FROM documents) t GROUP BY 1),
        |top AS (
        |  SELECT tok, cnt, row_number() OVER (ORDER BY cnt DESC, tok)
        |    AS rnk
        |  FROM v ORDER BY cnt DESC, tok LIMIT 200)
        |SELECT count(*) AS n_terms, CAST(sum(cnt) AS BIGINT) AS top_mass,
        |       min(CASE WHEN rnk = 1 THEN tok END) AS top_term,
        |       CAST(min(CASE WHEN rnk = 1 THEN cnt END) AS BIGINT)
        |         AS top_count,
        |       round(regr_slope(ln(CAST(cnt AS DOUBLE)),
        |                        ln(CAST(rnk AS DOUBLE))), 4) AS zipf_slope,
        |       round(regr_r2(ln(CAST(cnt AS DOUBLE)),
        |                     ln(CAST(rnk AS DOUBLE))), 4) AS zipf_r2
        |FROM top""".stripMargin,

    // c24's gram CTE aggregated on the EVAL side: distinct compromised
    // grams + distinct offending train docs per eval item
    "c66_eval_contamination" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |           ' ') AS words
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        |  FROM w, unnest(generate_series(1, len(words) - 7)) t(i)
        |  WHERE len(words) >= 8
        |  UNION ALL
        |  SELECT doc_id, array_to_string(words, ' ') AS gram
        |  FROM w WHERE len(words) < 8),
        |dg AS (SELECT DISTINCT doc_id, gram FROM g),
        |ev AS (SELECT doc_id AS eval_id, gram FROM dg
        |       WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id AS train_id, gram FROM dg
        |       WHERE doc_id % 97 <> 0),
        |h AS (
        |  SELECT ev.eval_id, count(DISTINCT ev.gram) AS n_grams_hit,
        |         count(DISTINCT tr.train_id) AS n_train_docs
        |  FROM ev JOIN tr ON tr.gram = ev.gram
        |  GROUP BY 1),
        |tot AS (SELECT eval_id, count(*) AS n_grams FROM ev GROUP BY 1)
        |SELECT t.eval_id, CAST(t.n_grams AS BIGINT) AS n_grams,
        |       CAST(coalesce(h.n_grams_hit, 0) AS BIGINT) AS n_grams_hit,
        |       CAST(coalesce(h.n_train_docs, 0) AS BIGINT)
        |         AS n_train_docs,
        |       coalesce(h.n_grams_hit, 0) = 0 AS clean
        |FROM tot t LEFT JOIN h ON h.eval_id = t.eval_id
        |ORDER BY t.eval_id""".stripMargin,

    // c57's replica + deterministic ntile + truncating integer mean
    "c74_novelty_trend" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |           ' ') AS words
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        |  FROM w, unnest(generate_series(1, len(words) - 7)) t(i)
        |  WHERE len(words) >= 8
        |  UNION ALL
        |  SELECT doc_id, array_to_string(words, ' ') AS gram
        |  FROM w WHERE len(words) < 8),
        |dg AS (SELECT DISTINCT doc_id, gram FROM g),
        |rg AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 13 = 0),
        |sc AS (
        |  SELECT dg.doc_id, count(*) AS n_grams,
        |         sum(CASE WHEN rg.gram IS NOT NULL THEN 1 ELSE 0 END)
        |           AS n_seen
        |  FROM dg LEFT JOIN rg ON rg.gram = dg.gram
        |  WHERE dg.doc_id % 13 <> 0
        |  GROUP BY 1),
        |nv AS (
        |  SELECT doc_id, n_grams, n_seen,
        |         (n_grams - n_seen) * 1000000 // n_grams AS ppm,
        |         ntile(10) OVER (ORDER BY doc_id) AS bucket
        |  FROM sc)
        |SELECT bucket, count(*) AS n_docs,
        |       CAST(sum(n_grams) AS BIGINT) AS sum_grams,
        |       CAST(sum(n_seen) AS BIGINT) AS sum_seen,
        |       CAST(sum(ppm) // count(*) AS BIGINT) AS mean_novelty_ppm
        |FROM nv GROUP BY 1 ORDER BY 1""".stripMargin,

    // the c24 gram CTE with the %13 reference split; ratio stays in
    // exact integer ppm (truncating BIGINT division both engines share)
    "c57_novelty" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |           ' ') AS words
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        |  FROM w, unnest(generate_series(1, len(words) - 7)) t(i)
        |  WHERE len(words) >= 8
        |  UNION ALL
        |  SELECT doc_id, array_to_string(words, ' ') AS gram
        |  FROM w WHERE len(words) < 8),
        |dg AS (SELECT DISTINCT doc_id, gram FROM g),
        |rg AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 13 = 0),
        |sc AS (
        |  SELECT dg.doc_id, count(*) AS n_grams,
        |         sum(CASE WHEN rg.gram IS NOT NULL THEN 1 ELSE 0 END)
        |           AS n_seen
        |  FROM dg LEFT JOIN rg ON rg.gram = dg.gram
        |  WHERE dg.doc_id % 13 <> 0
        |  GROUP BY 1)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |       CAST(n_seen AS BIGINT) AS n_seen,
        |       CAST((n_grams - n_seen) * 1000000 // n_grams AS BIGINT)
        |         AS novelty_ppm
        |FROM sc ORDER BY doc_id""".stripMargin,

    // the c14d cell replay + the c54 md5-rank quota formula per cell
    "c59_cluster_quota" ->
      """WITH idx AS (SELECT unnest(range(0, 64)) AS i),
        |jj AS (SELECT unnest(range(0, 16)) AS j),
        |codes AS (
        |  SELECT vec_id, CAST(j.j AS INT) AS j,
        |         CAST(sum((CASE WHEN ((j.j * 64 + i.i) * 2654435761)
        |                             % 4294967296 < 2147483648
        |                        THEN 1 ELSE -1 END)
        |              * CAST(floor(CAST(embedding[CAST(i.i AS INT) + 1]
        |                     AS DOUBLE) * 1024 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM embeddings CROSS JOIN idx i CROSS JOIN jj j
        |  GROUP BY 1, 2),
        |cent AS (SELECT vec_id AS c, j, y FROM codes WHERE vec_id < 16),
        |asg AS (
        |  SELECT v.vec_id, c.c, sum((v.y - c.y) * (v.y - c.y)) AS d
        |  FROM codes v JOIN cent c ON v.j = c.j
        |  GROUP BY 1, 2),
        |own AS (
        |  SELECT vec_id, CAST(c AS INT) AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY d, c) AS rn FROM asg) t
        |  WHERE rn = 1)
        |SELECT vec_id, cell FROM (
        |  SELECT vec_id, cell,
        |         row_number() OVER (PARTITION BY cell
        |           ORDER BY md5(concat('quota:', CAST(vec_id AS VARCHAR))),
        |                    CAST(vec_id AS VARCHAR)) AS rn
        |  FROM own) t
        |WHERE rn <= 20 ORDER BY vec_id""".stripMargin,

    // the c14d serving-path replay up to own-cell distance, then the
    // per-cell top-ceil(5%) rank — zero tolerance end to end
    "c58_embed_outliers" ->
      """WITH idx AS (SELECT unnest(range(0, 64)) AS i),
        |jj AS (SELECT unnest(range(0, 16)) AS j),
        |codes AS (
        |  SELECT vec_id, CAST(j.j AS INT) AS j,
        |         CAST(sum((CASE WHEN ((j.j * 64 + i.i) * 2654435761)
        |                             % 4294967296 < 2147483648
        |                        THEN 1 ELSE -1 END)
        |              * CAST(floor(CAST(embedding[CAST(i.i AS INT) + 1]
        |                     AS DOUBLE) * 1024 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM embeddings CROSS JOIN idx i CROSS JOIN jj j
        |  GROUP BY 1, 2),
        |cent AS (SELECT vec_id AS c, j, y FROM codes WHERE vec_id < 16),
        |asg AS (
        |  SELECT v.vec_id, c.c, sum((v.y - c.y) * (v.y - c.y)) AS d
        |  FROM codes v JOIN cent c ON v.j = c.j
        |  GROUP BY 1, 2),
        |own AS (
        |  SELECT vec_id, CAST(c AS INT) AS cell, CAST(d AS BIGINT)
        |           AS dist2 FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY d, c) AS rn FROM asg) t
        |  WHERE rn = 1),
        |rk AS (
        |  SELECT vec_id, cell, dist2,
        |         row_number() OVER (PARTITION BY cell
        |             ORDER BY dist2 DESC, vec_id) AS rn,
        |         count(*) OVER (PARTITION BY cell) AS cnt
        |  FROM own)
        |SELECT vec_id, cell, dist2, rn <= (cnt + 19) // 20 AS is_outlier
        |FROM rk ORDER BY vec_id""".stripMargin,

    // the kept set must be exactly the originals (the degraded copies
    // score strictly lower), each with its c9-formula quality
    "c36_quality_keep" ->
      """SELECT doc_id,
        |round(greatest(0.0, least(1.0,
        |  (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.6
        |  + (CASE WHEN (length(regexp_replace(text, '\s', '', 'g'))
        |       / CAST(greatest(
        |           CASE WHEN length(trim(text)) = 0 THEN 0
        |                ELSE len(regexp_split_to_array(trim(text), '\s+')) END,
        |           1) AS DOUBLE))
        |       BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4
        |  - (length(regexp_replace(text, '[^0-9]', '', 'g'))
        |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
        |  - ((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
        |)), 4) AS quality,
        |CAST(2 AS BIGINT) AS cluster_size
        |FROM documents ORDER BY doc_id""".stripMargin,

    // names/sizes/hashes recomputed from the documents table alone —
    // any byte lost or altered on the file round trip breaks the hash
    "a34_binary_ingest" ->
      """SELECT CAST(doc_id AS VARCHAR) || '.txt' AS fname,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       md5(text) AS h
        |FROM documents WHERE doc_id < 40 ORDER BY fname""".stripMargin,

    // survivors + the exact deleted count recomputed from the source
    // table; skipped_files is the zone-map-pruning verdict
    "a33_targeted_delete" ->
      """SELECT count(*) AS n_rows,
        |       round(sum(o_totalprice), 2) AS sum_price,
        |       (SELECT count(*) FROM orders WHERE o_orderkey <= 200)
        |         AS n_deleted,
        |       true AS skipped_files
        |FROM orders WHERE o_orderkey > 200""".stripMargin,

    // both stages (merge-on-read, post-apply) must equal the plain
    // filter; NULL-planted keys survive; booleans pin the zero-write-
    // amplification mark and the sidecar removal
    "a36_deletion_vectors" ->
      """WITH base AS (
        |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |              ELSE o_orderkey END AS okey, o_totalprice
        |  FROM orders),
        |surv AS (SELECT * FROM base
        |         WHERE okey IS NULL OR NOT (okey <= 300)),
        |m AS (SELECT count(*) AS n_marked FROM base WHERE okey <= 300)
        |SELECT s.stage,
        |       (SELECT count(*) FROM surv) AS n_rows,
        |       (SELECT round(sum(o_totalprice), 2) FROM surv)
        |         AS sum_price,
        |       (SELECT n_marked FROM m) AS n_marked,
        |       (SELECT n_marked FROM m) AS n_removed,
        |       true AS mark_skipped_files,
        |       true AS sidecar_gone
        |FROM (VALUES ('applied'), ('mor')) s(stage)
        |ORDER BY stage""".stripMargin,

    // every check recomputed relationally: null-is-violation CASE
    // folds, grouped dup counts, NOT-EXISTS anti-joins
    "a32_expectations" ->
      """SELECT check_name, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'not_null_l_orderkey' AS check_name,
        |    CAST(sum(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END)
        |         AS BIGINT) AS n_violations FROM lineitem
        |  UNION ALL
        |  SELECT 'range_l_discount',
        |    CAST(sum(CASE WHEN coalesce(l_discount >= 0
        |          AND l_discount <= 0.1, false) THEN 0 ELSE 1 END)
        |         AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'range_l_quantity_le30',
        |    CAST(sum(CASE WHEN coalesce(l_quantity <= 30, false)
        |          THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'set_l_returnflag',
        |    CAST(sum(CASE WHEN coalesce(l_returnflag IN ('A', 'N', 'R'),
        |          false) THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'unique_line', CAST(coalesce(sum(n - 1), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS n FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber)
        |  UNION ALL
        |  SELECT 'unique_orderkey', CAST(coalesce(sum(n - 1), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey)
        |  UNION ALL
        |  SELECT 'fk_line_orders', CAST(count(*) AS BIGINT)
        |  FROM lineitem l WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'fk_orders_cust', CAST(count(*) AS BIGINT)
        |  FROM orders r WHERE r.o_custkey IS NOT NULL AND NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = r.o_custkey)
        |) t ORDER BY check_name""".stripMargin,

    // identical v2 rebuilt in SQL, identical null-safe
    // (IS DISTINCT FROM) per-column mask, same name-sorted mask order
    "a31_snapshot_diff" ->
      """WITH v2 AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
        |              ELSE o_totalprice END AS o_totalprice,
        |         o_orderdate,
        |         CASE WHEN o_orderkey % 11 = 0 THEN 'Z'
        |              ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 2000000000, o_custkey, o_orderstatus,
        |         o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |d AS (
        |  SELECT coalesce(l.o_orderkey, r.o_orderkey) AS o_orderkey,
        |    CASE WHEN l.o_orderkey IS NULL THEN 'added'
        |         WHEN r.o_orderkey IS NULL THEN 'removed'
        |         WHEN (l.o_custkey IS DISTINCT FROM r.o_custkey)
        |           OR (l.o_orderdate IS DISTINCT FROM r.o_orderdate)
        |           OR (l.o_orderpriority IS DISTINCT FROM r.o_orderpriority)
        |           OR (l.o_orderstatus IS DISTINCT FROM r.o_orderstatus)
        |           OR (l.o_totalprice IS DISTINCT FROM r.o_totalprice)
        |           THEN 'changed' ELSE 'same' END AS status,
        |    concat_ws(',',
        |      CASE WHEN l.o_custkey IS DISTINCT FROM r.o_custkey
        |           THEN 'o_custkey' END,
        |      CASE WHEN l.o_orderdate IS DISTINCT FROM r.o_orderdate
        |           THEN 'o_orderdate' END,
        |      CASE WHEN l.o_orderpriority IS DISTINCT FROM r.o_orderpriority
        |           THEN 'o_orderpriority' END,
        |      CASE WHEN l.o_orderstatus IS DISTINCT FROM r.o_orderstatus
        |           THEN 'o_orderstatus' END,
        |      CASE WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice
        |           THEN 'o_totalprice' END) AS mask
        |  FROM orders l FULL OUTER JOIN v2 r ON l.o_orderkey = r.o_orderkey)
        |SELECT status,
        |       CASE WHEN status = 'changed' THEN mask ELSE '' END
        |         AS changed_cols,
        |       count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // initial load + missing-years ingest = ALL orders exactly once; a
    // double-landed year breaks cnt/sum for that year immediately
    "a30_ingest_ledger" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS sum_price,
        |       (SELECT string_agg(DISTINCT CAST(year(o_orderdate) AS VARCHAR), ','
        |                          ORDER BY CAST(year(o_orderdate) AS VARCHAR))
        |        FROM orders WHERE year(o_orderdate) > 1997) AS added_years,
        |       true AS rerun_noop
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // each snapshot version == the corresponding key-split aggregate
    "a35_wap_time_travel" ->
      """SELECT 'v0' AS version, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders WHERE o_orderkey % 3 = 1
        |UNION ALL
        |SELECT 'v1', count(*), round(sum(o_totalprice), 2)
        |FROM orders WHERE o_orderkey % 3 IN (1, 2)
        |UNION ALL
        |SELECT 'v2', count(*), round(sum(o_totalprice), 2)
        |FROM orders
        |ORDER BY version""".stripMargin,

    // base (keys % 3 != 0) + the good batch (% 3 == 0) = ALL orders; a
    // leaked bad batch or a lost good batch breaks cnt/sum immediately
    // the final committed state: both tables at v2 with full contents,
    // every lifecycle contract boolean true
    "a37_multi_publish" ->
      """SELECT 'cust' AS tbl, 2 AS version,
        |       (SELECT count(*) FROM customer) AS cnt,
        |       true AS v1_ok, true AS failed_blocked, true AS v2_ok
        |UNION ALL
        |SELECT 'ord', 2, (SELECT count(*) FROM orders), true, true, true
        |ORDER BY tbl""".stripMargin,

    // a39: the committed (full-corpus) rollup recomputed from the base
    // table — the expire may only remove UNREACHABLE bytes, so the
    // post-expire committed read must still match this exactly
    "a39_snapshot_expire" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "a29_wap" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS sum_price,
        |       true AS good_published, true AS bad_blocked,
        |       true AS staging_clean
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical synthetic graph (same LCG mod-n edges), identical 3
    // damped iterations unrolled as CTEs — mass leak semantics and all
    "c41_pagerank" ->
      """WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |                   count(*) AS nb FROM documents),
        |e AS (
        |  SELECT doc_id AS src,
        |         (doc_id * 1103515245 + j.j * 12345)
        |           % (SELECT nb FROM nn) AS dst
        |  FROM documents, (SELECT unnest([1, 2, 3]) AS j) j),
        |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY 1),
        |r0 AS (SELECT doc_id AS id, 1.0 / (SELECT n FROM nn) AS r
        |       FROM documents),
        |r1 AS (
        |  SELECT d.doc_id AS id,
        |         0.15 / (SELECT n FROM nn)
        |           + 0.85 * coalesce(sum(r0.r / od.od), 0) AS r
        |  FROM documents d
        |  LEFT JOIN e ON e.dst = d.doc_id
        |  LEFT JOIN r0 ON r0.id = e.src
        |  LEFT JOIN od ON od.src = e.src
        |  GROUP BY 1),
        |r2 AS (
        |  SELECT d.doc_id AS id,
        |         0.15 / (SELECT n FROM nn)
        |           + 0.85 * coalesce(sum(r1.r / od.od), 0) AS r
        |  FROM documents d
        |  LEFT JOIN e ON e.dst = d.doc_id
        |  LEFT JOIN r1 ON r1.id = e.src
        |  LEFT JOIN od ON od.src = e.src
        |  GROUP BY 1),
        |r3 AS (
        |  SELECT d.doc_id AS id,
        |         0.15 / (SELECT n FROM nn)
        |           + 0.85 * coalesce(sum(r2.r / od.od), 0) AS r
        |  FROM documents d
        |  LEFT JOIN e ON e.dst = d.doc_id
        |  LEFT JOIN r2 ON r2.id = e.src
        |  LEFT JOIN od ON od.src = e.src
        |  GROUP BY 1)
        |SELECT id AS doc_id, round(r, 8) AS rank
        |FROM r3 ORDER BY doc_id""".stripMargin,

    // DuckDB's native ASOF (inequality flipped = forward) + the same
    // horizon CASE; fixes deduped to min id per (user, ts) — the
    // right-side uniqueness contract both engines share
    "d19_sla_attach" ->
      """WITH fx AS (
        |  SELECT user_id, ts AS fix_ts, min(event_id) AS fix_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |j AS (
        |  SELECT f.event_id AS fail_id, f.user_id, f.ts AS fail_ts,
        |         r.fix_id,
        |         date_diff('microsecond', f.ts, r.fix_ts) AS wait_us
        |  FROM (SELECT * FROM events WHERE event_type = 'error') f
        |  ASOF LEFT JOIN fx r
        |    ON f.user_id = r.user_id AND f.ts <= r.fix_ts)
        |SELECT fail_id, user_id, fail_ts,
        |       CASE WHEN wait_us <= 3600000000 THEN fix_id END AS fix_id,
        |       CASE WHEN wait_us <= 3600000000 THEN wait_us END AS wait_us,
        |       coalesce(wait_us > 3600000000, true) AS breach
        |FROM j ORDER BY fail_id""".stripMargin,

    // exact replay of the retained-window definition: a key is history
    // for epoch e iff it occurred in some e' < e with e' DIV 2 >=
    // e DIV 2 - 1 (rotateEvery=2); the engine's flagged_hist must land
    // exactly on that count (no false negatives inside the window)
    "d21_bloom_generations" ->
      """WITH ev AS (
        |  SELECT CAST(event_id % 6 AS INT) AS epoch,
        |         concat(CAST(user_id AS VARCHAR), ':',
        |                CAST(event_id % 50 AS VARCHAR)) AS key
        |  FROM events),
        |occ AS (SELECT DISTINCT key, epoch AS e1 FROM ev),
        |byk AS (SELECT epoch, key, count(*) AS nrows FROM ev GROUP BY 1, 2),
        |hist AS (
        |  SELECT b.epoch, b.key, b.nrows,
        |         EXISTS (SELECT 1 FROM occ o WHERE o.key = b.key
        |                 AND o.e1 < b.epoch
        |                 AND o.e1 // 2 >= b.epoch // 2 - 1) AS is_hist
        |  FROM byk b)
        |SELECT epoch, CAST(sum(nrows) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN is_hist THEN nrows ELSE 0 END)
        |            AS BIGINT) AS n_hist,
        |       CAST(sum(CASE WHEN is_hist THEN nrows ELSE 0 END)
        |            AS BIGINT) AS flagged_hist,
        |       true AS fp_ok
        |FROM hist GROUP BY 1 ORDER BY 1""".stripMargin,

    // the D19 attach replica re-aggregated: same ASOF join, then the
    // shard rollup with quantile_disc (DuckDB's discrete percentile —
    // the same pick-an-actual-value contract as Spark's
    // percentile_disc, proven cross-engine by b12)
    "d20_sla_slo" ->
      """WITH fx AS (
        |  SELECT user_id, ts AS fix_ts, min(event_id) AS fix_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |j AS (
        |  SELECT f.event_id AS fail_id, f.user_id,
        |         date_diff('microsecond', f.ts, r.fix_ts) AS wait_us_raw
        |  FROM (SELECT * FROM events WHERE event_type = 'error') f
        |  ASOF LEFT JOIN fx r
        |    ON f.user_id = r.user_id AND f.ts <= r.fix_ts),
        |att AS (
        |  SELECT user_id % 4 AS shard,
        |         CASE WHEN wait_us_raw <= 3600000000 THEN wait_us_raw END
        |           AS wait_us,
        |         coalesce(wait_us_raw > 3600000000, true) AS breach
        |  FROM j)
        |SELECT shard, count(*) AS n_failures,
        |       CAST(sum(CASE WHEN breach THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_breaches,
        |       round(CAST(sum(CASE WHEN breach THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 6) AS breach_rate,
        |       CAST(quantile_disc(wait_us, 0.5) AS BIGINT) AS p50_wait_us,
        |       CAST(quantile_disc(wait_us, 0.9) AS BIGINT) AS p90_wait_us,
        |       CAST(quantile_disc(wait_us, 0.99) AS BIGINT) AS p99_wait_us,
        |       max(wait_us) AS max_wait_us
        |FROM att GROUP BY 1 ORDER BY 1""".stripMargin,

    // all five stages unrolled in one chain: three cold rounds over the
    // base edges, then the two warm rounds over e2/od2 (the added-edge
    // union with out-degrees recomputed) — the oracle IS the warm-start
    // trajectory, any divergence in any stage lands in the round(8)
    "c41b_pagerank_incremental" -> {
      def stage(out: String, prev: String, e: String, od: String) =
        raw"""$out AS (
             |  SELECT d.doc_id AS id,
             |         0.15 / (SELECT n FROM nn)
             |           + 0.85 * coalesce(sum($prev.r / $od.od), 0) AS r
             |  FROM documents d
             |  LEFT JOIN $e ON $e.dst = d.doc_id
             |  LEFT JOIN $prev ON $prev.id = $e.src
             |  LEFT JOIN $od ON $od.src = $e.src
             |  GROUP BY 1)""".stripMargin
      raw"""WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |                   count(*) AS nb FROM documents),
           |e AS (
           |  SELECT doc_id AS src,
           |         (doc_id * 1103515245 + j.j * 12345)
           |           % (SELECT nb FROM nn) AS dst
           |  FROM documents, (SELECT unnest([1, 2, 3]) AS j) j),
           |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS od
           |       FROM e GROUP BY 1),
           |r0 AS (SELECT doc_id AS id, 1.0 / (SELECT n FROM nn) AS r
           |       FROM documents),
           |${stage("r1", "r0", "e", "od")},
           |${stage("r2", "r1", "e", "od")},
           |${stage("r3", "r2", "e", "od")},
           |e2 AS (
           |  SELECT src, dst FROM e
           |  UNION ALL
           |  SELECT doc_id AS src,
           |         (doc_id * 1103515245 + 4 * 12345)
           |           % (SELECT nb FROM nn) AS dst
           |  FROM documents WHERE doc_id % 7 = 0),
           |od2 AS (SELECT src, CAST(count(*) AS DOUBLE) AS od
           |        FROM e2 GROUP BY 1),
           |${stage("w1", "r3", "e2", "od2")},
           |${stage("w2", "w1", "e2", "od2")}
           |SELECT id AS doc_id, round(r, 8) AS rank
           |FROM w2 ORDER BY doc_id""".stripMargin
    },

    // the two phases ARE the two trajectories: 'unchanged' must land on
    // the cold 3-round ranks (the trigger skipped the warm rounds — any
    // spurious round diverges in the round(8)), 'warmed' on the c41b
    // warm-start chain over the inserted-edge union
    "c52_pagerank_cdf" -> {
      def stage(out: String, prev: String, e: String, od: String) =
        raw"""$out AS (
             |  SELECT d.doc_id AS id,
             |         0.15 / (SELECT n FROM nn)
             |           + 0.85 * coalesce(sum($prev.r / $od.od), 0) AS r
             |  FROM documents d
             |  LEFT JOIN $e ON $e.dst = d.doc_id
             |  LEFT JOIN $prev ON $prev.id = $e.src
             |  LEFT JOIN $od ON $od.src = $e.src
             |  GROUP BY 1)""".stripMargin
      raw"""WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |                   count(*) AS nb FROM documents),
           |e AS (
           |  SELECT doc_id AS src,
           |         (doc_id * 1103515245 + j.j * 12345)
           |           % (SELECT nb FROM nn) AS dst
           |  FROM documents, (SELECT unnest([1, 2, 3]) AS j) j),
           |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS od
           |       FROM e GROUP BY 1),
           |r0 AS (SELECT doc_id AS id, 1.0 / (SELECT n FROM nn) AS r
           |       FROM documents),
           |${stage("r1", "r0", "e", "od")},
           |${stage("r2", "r1", "e", "od")},
           |${stage("r3", "r2", "e", "od")},
           |e2 AS (
           |  SELECT src, dst FROM e
           |  UNION ALL
           |  SELECT doc_id AS src,
           |         (doc_id * 1103515245 + 4 * 12345)
           |           % (SELECT nb FROM nn) AS dst
           |  FROM documents WHERE doc_id % 7 = 0),
           |od2 AS (SELECT src, CAST(count(*) AS DOUBLE) AS od
           |        FROM e2 GROUP BY 1),
           |${stage("w1", "r3", "e2", "od2")},
           |${stage("w2", "w1", "e2", "od2")},
           |e3 AS (
           |  SELECT doc_id AS src,
           |         (doc_id * 1103515245 + j.j * 12345)
           |           % (SELECT nb FROM nn) AS dst
           |  FROM documents, (SELECT unnest([1, 2, 3]) AS j) j
           |  WHERE NOT (doc_id % 5 = 0 AND j.j = 3)),
           |od3 AS (SELECT src, CAST(count(*) AS DOUBLE) AS od
           |        FROM e3 GROUP BY 1),
           |${stage("p1", "r3", "e3", "od3")},
           |${stage("p2", "p1", "e3", "od3")}
           |SELECT id AS doc_id, round(r, 8) AS rank, 'unchanged' AS phase
           |FROM r3
           |UNION ALL
           |SELECT id AS doc_id, round(r, 8) AS rank, 'warmed' AS phase
           |FROM w2
           |UNION ALL
           |SELECT id AS doc_id, round(r, 8) AS rank, 'pruned' AS phase
           |FROM p2
           |ORDER BY phase, doc_id""".stripMargin
    },

    // identical planted eval matrix (float nudge rebuilt bit-exactly),
    // full corpus×eval scoring, argmax ties to the smallest eval id
    "c43_semantic_decon" ->
      """WITH ev AS (
        |  SELECT vec_id AS eval_id,
        |         list_prepend(CAST(embedding[1] + CAST(0.1 AS FLOAT) AS FLOAT),
        |                      embedding[2:64]) AS ev
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |sc AS (
        |  SELECT c.vec_id, e.eval_id,
        |         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                CAST(e.ev AS DOUBLE[])) AS cos
        |  FROM embeddings c CROSS JOIN ev e),
        |best AS (
        |  SELECT vec_id, cos, eval_id,
        |         row_number() OVER (PARTITION BY vec_id
        |             ORDER BY cos DESC, eval_id) AS rn
        |  FROM sc)
        |SELECT vec_id, round(cos, 6) AS max_cos, eval_id AS nearest_eval_id,
        |       cos >= 0.95 AS flagged
        |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // identical raw URL rebuilt from the same columns, identical
    // RE2-safe rewrite chain (global flags where Spark's always-global
    // regexp_replace can match more than once)
    "c44_url_canonical" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)
        |    || '://'
        |    || (CASE WHEN doc_id % 5 = 0 THEN 'Tracker.AdNet.com'
        |             WHEN doc_id % 5 = 1 THEN 'WWW.News.co.uk'
        |             WHEN doc_id % 5 = 2 THEN 'Blog.Wiki.org'
        |             WHEN doc_id % 5 = 3 THEN 'www.SHOP.example.com'
        |             ELSE 'Spammy.net' END)
        |    || (CASE WHEN doc_id % 4 = 0 THEN ':443'
        |             WHEN doc_id % 4 = 2 THEN ':8080'
        |             WHEN doc_id % 4 = 3 THEN ':80' ELSE '' END)
        |    || '/' || source || '/Item/' || doc_id
        |    || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
        |    || '?utm_source=feed&id=' || doc_id || '&utm_campaign=x'
        |    || (CASE WHEN doc_id % 4 = 0 THEN '&ref=r' ELSE '' END)
        |    || '#sec' || (doc_id % 7) AS url_raw
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url_raw,
        |    lower(regexp_extract(url_raw, '^([A-Za-z]+)://', 1)) AS sch,
        |    lower(regexp_extract(url_raw, '^[A-Za-z]+://([^/?#]+)', 1))
        |      AS hostport,
        |    regexp_replace(regexp_extract(url_raw,
        |        '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/+$', '') AS pth,
        |    regexp_replace(regexp_replace(
        |        '&' || regexp_extract(url_raw, '[?]([^#]*)', 1) || '&',
        |        '&(utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'),
        |        '^&+|&+$', '', 'g') AS q
        |  FROM raw),
        |hosts AS (
        |  SELECT *, regexp_replace(
        |      CASE WHEN sch = 'https' THEN regexp_replace(hostport, ':443$', '')
        |           WHEN sch = 'http' THEN regexp_replace(hostport, ':80$', '')
        |           ELSE hostport END, '^www\.', '') AS host
        |  FROM parts),
        |dom AS (
        |  SELECT *, CASE
        |      WHEN regexp_matches(host,
        |             '\.(co|com|org|net|gov|ac|edu)\.[a-z][a-z]$')
        |        THEN regexp_extract(host,
        |             '([^.]+\.(co|com|org|net|gov|ac|edu)\.[a-z][a-z])$', 1)
        |      WHEN regexp_matches(host, '\.')
        |        THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
        |      ELSE host END AS domain
        |  FROM hosts)
        |SELECT doc_id, url_raw,
        |       sch || '://' || host || pth ||
        |         (CASE WHEN q = '' THEN '' ELSE '?' || q END)
        |         AS url_canonical,
        |       host, domain,
        |       domain IN ('adnet.com', 'spammy.net') AS blocked
        |FROM dom ORDER BY doc_id""".stripMargin,

    // identical page built from the same columns, identical strip chain
    // (RE2 regexes, entity decode with &amp; last), md5 of the result
    "c42_html_strip" ->
      """WITH page AS (
        |  SELECT doc_id,
        |    '<html><head><script type="text/javascript">var x = 1 < 2 && 3 > 0;</script>'
        |    || '<style>p { color: red; }</style><title>'
        |    || source || ' #' || doc_id
        |    || '</title></head><body><!-- nav' || chr(10)
        |    || 'boilerplate --><h1 class="t">'
        |    || lang || '</h1>' || chr(10) || '<p>'
        |    || text
        |    || '</p>' || chr(10)
        |    || '<p>5 &lt; 7 &amp;&amp; 8 &gt; 2, &quot;q&quot; &#39;s&nbsp;end &amp;lt;</p><div><br/></div></body></html>'
        |      AS html FROM documents),
        |clean AS (
        |  SELECT doc_id, length(html) AS n_raw,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |            '(?s)<!--.*?-->', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS c
        |  FROM page)
        |SELECT doc_id, n_raw, length(c) AS n_clean, md5(c) AS fp
        |FROM clean ORDER BY doc_id""".stripMargin,

    // same token contract, same tie-break (count desc, term asc)
    // identical whole-word alternation count, identical c10 token
    // denominator, identical threshold
    "c49_badwords_filter" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(lower(text),
        |      '\b(hash|spill|crash)\b')) AS n_blocked,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |    AS n_tokens,
        |  round(CAST(len(regexp_extract_all(lower(text),
        |        '\b(hash|spill|crash)\b')) AS DOUBLE)
        |      / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
        |          ELSE len(regexp_split_to_array(trim(text), '\s+')) END,
        |          1), 4) AS blocked_frac,
        |  (CAST(len(regexp_extract_all(lower(text),
        |        '\b(hash|spill|crash)\b')) AS DOUBLE)
        |      / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
        |          ELSE len(regexp_split_to_array(trim(text), '\s+')) END,
        |          1)) < 0.01 AS keep
        |FROM documents ORDER BY doc_id""".stripMargin,

    // each metric is the ALREADY-GREEN per-doc oracle formula (c9, c10,
    // c11, c17) carried per source, aggregated identically
    "c48_corpus_datasheet" ->
      """WITH m0 AS (
        |  SELECT source, lang, text, length(trim(text)) AS lt,
        |         regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |m1 AS (
        |  SELECT *, CASE WHEN lt = 0 OR len(t) < 2 THEN NULL
        |       ELSE list_transform(range(1, len(t)),
        |                           i -> t[i] || ' ' || t[i+1]) END AS bg
        |  FROM m0),
        |m AS (
        |  SELECT source, lang,
        |    CASE WHEN lt = 0 THEN 0 ELSE len(t) END AS toks,
        |    round(greatest(0.0, least(1.0,
        |      (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |         / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.6
        |      + (CASE WHEN (length(regexp_replace(text, '\s', '', 'g'))
        |           / CAST(greatest(
        |               CASE WHEN lt = 0 THEN 0 ELSE len(t) END,
        |               1) AS DOUBLE))
        |           BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4
        |      - (length(regexp_replace(text, '[^0-9]', '', 'g'))
        |         / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
        |      - ((length(text) -
        |          length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |         / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
        |    )), 4) AS q,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |    CASE WHEN lt = 0 THEN 0 ELSE len(t) END AS nw,
        |    CASE WHEN lt = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(t, x -> length(x)))
        |                AS DOUBLE) / len(t) END AS mwl,
        |    CASE WHEN lt = 0 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
        |         END AS dwf,
        |    CASE WHEN bg IS NULL THEN 0.0
        |         ELSE CAST(list_max(list_transform(list_distinct(bg),
        |                x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)
        |              / (len(t) - 1) END AS tbf
        |  FROM m1),
        |mk AS (
        |  SELECT *, (nw >= 5 AND mwl BETWEEN 3.0 AND 12.0
        |             AND dwf <= 0.6 AND tbf <= 0.18) AS keep
        |  FROM m),
        |stats AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(toks) AS BIGINT) AS n_tokens,
        |         round(avg(q), 4) AS mean_quality,
        |         round(avg(CASE WHEN keep THEN 1 ELSE 0 END), 4)
        |           AS keep_rate,
        |         count(*) - count(DISTINCT fp) AS n_dup,
        |         count(DISTINCT lang) AS n_langs
        |  FROM mk GROUP BY 1),
        |lc AS (SELECT source, lang, count(*) AS cnt
        |       FROM documents GROUP BY 1, 2),
        |top AS (
        |  SELECT source, lang AS top_lang, cnt AS top_lang_docs,
        |         row_number() OVER (PARTITION BY source
        |             ORDER BY cnt DESC, lang) AS rn
        |  FROM lc)
        |SELECT s.source, s.n_docs, s.n_tokens, s.mean_quality,
        |       s.keep_rate, s.n_dup, s.n_langs,
        |       top.top_lang, top.top_lang_docs
        |FROM stats s JOIN top USING (source)
        |WHERE top.rn = 1 ORDER BY s.source""".stripMargin,

    // identical windows (the c27 slice contract), identical hex-parse
    // boundary rule (the c33 contract), identical segmentation
    "c47_cdc_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |w AS (
        |  SELECT doc_id, t, unnest(range(1, len(t) - 8 + 2)) AS p
        |  FROM d WHERE len(t) >= 8),
        |b AS (
        |  SELECT doc_id, p + 7 AS e FROM w
        |  WHERE CAST(concat('0x', substr(
        |          md5(array_to_string(list_slice(t, p, p + 7), ' ')),
        |          1, 8)) AS BIGINT) % 64 = 0),
        |bl AS (SELECT doc_id, list(e ORDER BY e) AS lst FROM b GROUP BY 1),
        |ends AS (
        |  SELECT d.doc_id, d.t,
        |         list_sort(list_distinct(list_append(
        |           coalesce(bl.lst, CAST([] AS BIGINT[])),
        |           CAST(len(d.t) AS BIGINT)))) AS ends
        |  FROM d LEFT JOIN bl USING (doc_id)),
        |ch AS (
        |  SELECT doc_id, t, ends,
        |         unnest(range(1, len(ends) + 1)) AS i
        |  FROM ends)
        |SELECT doc_id, CAST(i - 1 AS INT) AS chunk_idx,
        |       CAST(ends[i] - (CASE WHEN i = 1 THEN 0
        |                            ELSE ends[i - 1] END) AS INT)
        |         AS n_tokens,
        |       md5(array_to_string(list_slice(t,
        |         (CASE WHEN i = 1 THEN 0 ELSE ends[i - 1] END) + 1,
        |         ends[i]), ' ')) AS fp
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    // identical token table, identical score formula (same casts, same
    // op order — the doubles are bit-identical), identical tie-break
    "c46_tfidf_keywords" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
        |           AS tok
        |  FROM documents),
        |tk2 AS (SELECT doc_id, tok FROM tk WHERE tok <> ''),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk2 GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
        |       FROM tf GROUP BY 1),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(*) AS n FROM documents),
        |sc AS (
        |  SELECT tf.doc_id, tf.tok,
        |         (CAST(tf.tf AS DOUBLE) / dl.dl)
        |           * ln(CAST((SELECT n FROM nd) AS DOUBLE) / df.df)
        |           AS tfidf
        |  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
        |          JOIN df ON tf.tok = df.tok)
        |SELECT doc_id, tok AS term, round(tfidf, 6) AS tfidf,
        |       CAST(rk AS INT) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, tok) AS rk FROM sc) t
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "c40_corpus_stats" ->
      """WITH tk AS (
        |  SELECT source,
        |         unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
        |           AS tok
        |  FROM documents),
        |tk2 AS (SELECT source, tok FROM tk WHERE tok <> ''),
        |c AS (SELECT source, tok, count(*) AS cnt FROM tk2 GROUP BY 1, 2),
        |top AS (
        |  SELECT source, tok AS top_term, cnt AS top_cnt,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY cnt DESC, tok) AS rn
        |  FROM c),
        |st AS (SELECT source, count(*) AS n_types,
        |              CAST(sum(cnt) AS BIGINT) AS n_tokens
        |       FROM c GROUP BY 1),
        |nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT nd.source, nd.n_docs, st.n_tokens, st.n_types,
        |       round(CAST(st.n_types AS DOUBLE) / st.n_tokens, 6) AS ttr,
        |       top.top_term, top.top_cnt
        |FROM nd JOIN st USING (source) JOIN top USING (source)
        |WHERE top.rn = 1 ORDER BY nd.source""".stripMargin,

    // the full curation chain replayed from the per-stage replicas:
    // c17's gate metrics, c1's fingerprint, c24's string-gram overlap,
    // c15's split bucket — composed exactly as the Spark plan composes
    "c39_curation_pipeline" ->
      """WITH m AS (
        |  SELECT doc_id, lang, text, n_chars, length(trim(text)) AS lt,
        |         regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |m2 AS (
        |  SELECT doc_id, lang, text, n_chars, lt, t,
        |         CASE WHEN lt = 0 OR len(t) < 2 THEN NULL
        |              ELSE list_transform(range(1, len(t)),
        |                                  i -> t[i] || ' ' || t[i+1])
        |         END AS bg
        |  FROM m),
        |gated AS (
        |  SELECT doc_id, lang, text, n_chars FROM m2
        |  WHERE (CASE WHEN lt = 0 THEN 0 ELSE len(t) END) >= 5
        |    AND (CASE WHEN lt = 0 THEN 0.0
        |              ELSE CAST(list_sum(list_transform(t, x -> length(x)))
        |                     AS DOUBLE) / len(t) END) BETWEEN 3.0 AND 12.0
        |    AND (CASE WHEN lt = 0 THEN 0.0
        |              ELSE 1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
        |                         / len(t) END) <= 0.6
        |    AND (CASE WHEN bg IS NULL THEN 0.0
        |              ELSE CAST(list_max(list_transform(list_distinct(bg),
        |                     x -> len(list_filter(bg, y -> y = x))))
        |                     AS DOUBLE) / (len(t) - 1) END) <= 0.18),
        |ded AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id,
        |          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |        FROM gated)
        |  GROUP BY fp),
        |surv AS (SELECT g.* FROM gated g JOIN ded USING (doc_id)),
        |w AS (
        |  SELECT doc_id, regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
        |           AS words
        |  FROM surv),
        |we AS (
        |  SELECT regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
        |           AS words
        |  FROM documents WHERE doc_id % 97 = 0),
        |g AS (
        |  SELECT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        |  FROM w, unnest(generate_series(1, len(words) - 7)) t(i)
        |  WHERE len(words) >= 8
        |  UNION ALL
        |  SELECT doc_id, array_to_string(words, ' ') AS gram
        |  FROM w WHERE len(words) < 8),
        |eg AS (
        |  SELECT DISTINCT gram FROM (
        |    SELECT array_to_string(words[i:i+7], ' ') AS gram
        |    FROM we, unnest(generate_series(1, len(words) - 7)) t(i)
        |    WHERE len(words) >= 8
        |    UNION ALL
        |    SELECT array_to_string(words, ' ') AS gram
        |    FROM we WHERE len(words) < 8)),
        |contam AS (SELECT DISTINCT g.doc_id FROM g JOIN eg USING (gram)),
        |clean AS (
        |  SELECT s.* FROM surv s LEFT JOIN contam c USING (doc_id)
        |  WHERE c.doc_id IS NULL),
        |sp AS (
        |  SELECT *, CASE WHEN b IS NULL THEN 'train'
        |                 WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |                 ELSE 'test' END AS split
        |  FROM (SELECT *, CAST(concat('0x', substr(md5(text), 1, 4)) AS INT)
        |                  % 100 AS b
        |        FROM clean))
        |SELECT split, lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |       md5(string_agg(CAST(doc_id AS VARCHAR), ','
        |           ORDER BY doc_id)) AS id_digest
        |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // c93: the c39 replica chain restructured into first-failing-stage
    // attribution — the gate predicate becomes a COLUMN, dedup losers
    // and contamination hits become left joins, the CASE order is the
    // pipeline order
    "c93_drop_ledger" ->
      """WITH m AS (
        |  SELECT doc_id, lang, text, n_chars, length(trim(text)) AS lt,
        |         regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |m2 AS (
        |  SELECT doc_id, lang, text, n_chars, lt, t,
        |         CASE WHEN lt = 0 OR len(t) < 2 THEN NULL
        |              ELSE list_transform(range(1, len(t)),
        |                                  i -> t[i] || ' ' || t[i+1])
        |         END AS bg
        |  FROM m),
        |gq AS (
        |  SELECT doc_id, lang, text, n_chars,
        |         ((CASE WHEN lt = 0 THEN 0 ELSE len(t) END) >= 5
        |    AND (CASE WHEN lt = 0 THEN 0.0
        |              ELSE CAST(list_sum(list_transform(t, x -> length(x)))
        |                     AS DOUBLE) / len(t) END) BETWEEN 3.0 AND 12.0
        |    AND (CASE WHEN lt = 0 THEN 0.0
        |              ELSE 1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
        |                         / len(t) END) <= 0.6
        |    AND (CASE WHEN bg IS NULL THEN 0.0
        |              ELSE CAST(list_max(list_transform(list_distinct(bg),
        |                     x -> len(list_filter(bg, y -> y = x))))
        |                     AS DOUBLE) / (len(t) - 1) END) <= 0.18) AS gok
        |  FROM m2),
        |gated AS (SELECT doc_id, lang, text, n_chars FROM gq WHERE gok),
        |ded AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id,
        |          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |        FROM gated)
        |  GROUP BY fp),
        |surv AS (SELECT g.* FROM gated g JOIN ded USING (doc_id)),
        |w AS (
        |  SELECT doc_id, regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
        |           AS words
        |  FROM surv),
        |we AS (
        |  SELECT regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
        |           AS words
        |  FROM documents WHERE doc_id % 97 = 0),
        |g AS (
        |  SELECT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        |  FROM w, unnest(generate_series(1, len(words) - 7)) t(i)
        |  WHERE len(words) >= 8
        |  UNION ALL
        |  SELECT doc_id, array_to_string(words, ' ') AS gram
        |  FROM w WHERE len(words) < 8),
        |eg AS (
        |  SELECT DISTINCT gram FROM (
        |    SELECT array_to_string(words[i:i+7], ' ') AS gram
        |    FROM we, unnest(generate_series(1, len(words) - 7)) t(i)
        |    WHERE len(words) >= 8
        |    UNION ALL
        |    SELECT array_to_string(words, ' ') AS gram
        |    FROM we WHERE len(words) < 8)),
        |contam AS (SELECT DISTINCT g.doc_id FROM g JOIN eg USING (gram)),
        |disp AS (
        |  SELECT q.doc_id, q.n_chars,
        |         CASE WHEN NOT q.gok THEN 'quality'
        |              WHEN d.doc_id IS NULL THEN 'duplicate'
        |              WHEN c.doc_id IS NOT NULL THEN 'contaminated'
        |              ELSE 'kept_' ||
        |                CASE WHEN b IS NULL THEN 'train'
        |                     WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |                     ELSE 'test' END
        |         END AS disposition
        |  FROM (SELECT *, CAST(concat('0x', substr(md5(text), 1, 4)) AS INT)
        |                  % 100 AS b
        |        FROM gq) q
        |  LEFT JOIN ded d USING (doc_id)
        |  LEFT JOIN contam c USING (doc_id))
        |SELECT disposition, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |       md5(string_agg(CAST(doc_id AS VARCHAR), ','
        |           ORDER BY doc_id)) AS id_digest
        |FROM disp GROUP BY 1 ORDER BY 1""".stripMargin,

    // full independent DSIR replica: same feature/bucket contract as c37,
    // target/raw counts rebuilt relationally, add-0.5 smoothing over 4096
    // buckets, per-doc ln-ratio sum rounded to 4
    "c38_dsir_score" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
        |         END AS t
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang,
        |         list_concat(t,
        |           CASE WHEN len(t) >= 2
        |                THEN list_transform(range(1, len(t)),
        |                       i -> t[i] || ' ' || t[i + 1])
        |                ELSE CAST([] AS VARCHAR[]) END) AS feats
        |  FROM tk),
        |fb AS (
        |  SELECT doc_id, lang,
        |         CAST(CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT)
        |              % 4096 AS INT) AS b
        |  FROM (SELECT doc_id, lang, unnest(feats) AS x FROM f)),
        |ct AS (SELECT b, count(*) AS c FROM fb WHERE lang = 'en' GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM fb WHERE lang = 'en'),
        |cr AS (SELECT b, count(*) AS c FROM fb GROUP BY 1),
        |nr AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM fb),
        |sc AS (
        |  SELECT fb.doc_id,
        |         sum(ln((coalesce(ct.c, 0) + 0.5) / (nt.n + 0.5 * 4096))
        |           - ln((cr.c + 0.5) / (nr.n + 0.5 * 4096))) AS logw
        |  FROM fb LEFT JOIN ct USING (b) JOIN cr USING (b), nt, nr
        |  GROUP BY 1)
        |SELECT d.doc_id, CAST(len(f.feats) AS INT) AS n_feats,
        |       round(coalesce(sc.logw, 0.0), 4) AS logw,
        |       coalesce(sc.logw, 0.0) > 0.0 AS keep
        |FROM documents d JOIN f USING (doc_id)
        |LEFT JOIN sc ON sc.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // full independent classifier replica: same token contract, same
    // feature bag (unigrams + space-joined bigrams), bucket = first 32
    // md5 bits mod 4096, weight = (md5('g6w:'||bucket) % 2049 - 1024)/1024
    // — every term a multiple of 1/1024, so list_sum is order-proof and
    // the logit comparison is exact
    "c37_classifier_score" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
        |         END AS t
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |         list_concat(t,
        |           CASE WHEN len(t) >= 2
        |                THEN list_transform(range(1, len(t)),
        |                       i -> t[i] || ' ' || t[i + 1])
        |                ELSE CAST([] AS VARCHAR[]) END) AS feats
        |  FROM tk),
        |sc AS (
        |  SELECT doc_id,
        |         CAST(len(feats) AS INT) AS n_feats,
        |         coalesce(list_sum(list_transform(feats, x ->
        |           ((CAST(concat('0x', substr(md5(concat('g6w:',
        |               CAST(CAST(concat('0x', substr(md5(x), 1, 8))
        |                         AS BIGINT) % 4096 AS VARCHAR))), 1, 8))
        |                 AS BIGINT) % 2049) - 1024) / 1024.0)),
        |           0.0) AS logit
        |  FROM f)
        |SELECT doc_id, n_feats, CAST(logit AS DOUBLE) AS logit,
        |       logit > 0.0 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin,

    // full independent BM25 replica: same whitespace-token contract as
    // c10, same stats, same formula, same rounded-score tie-break
    "c35_bm25" ->
      """WITH tf AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS dl,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        x -> x = 'hash')) AS tf0,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        x -> x = 'vector')) AS tf1,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        x -> x = 'stream')) AS tf2
        |  FROM documents),
        |st AS (
        |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) AS sl,
        |         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM tf)
        |SELECT doc_id, score FROM (
        |  SELECT doc_id, round(
        |      ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * tf0 * 2.2
        |        / (tf0 + 1.2 * (0.25 + 0.75 * dl / (sl / n)))
        |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * tf1 * 2.2
        |        / (tf1 + 1.2 * (0.25 + 0.75 * dl / (sl / n)))
        |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * tf2 * 2.2
        |        / (tf2 + 1.2 * (0.25 + 0.75 * dl / (sl / n))), 4) AS score
        |  FROM tf, st)
        |WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

    // full replica of BOTH candidate generators (the c35 BM25 CTE per
    // term set, the c6 cosine window) + the fusion: identical rank
    // contracts, identical fixed-order double rrf sum. Generated from
    // the same hybridTermSets the query uses.
    "c45_hybrid_retrieval" -> {
      val blocks = hybridTermSets.zipWithIndex.map { case (ts, i) =>
        val tfs = ts.zipWithIndex.map { case (term, j) =>
          raw"""len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
               |        x -> x = '$term')) AS tf$j""".stripMargin
        }.mkString(",\n    ")
        val dfs = ts.indices.map(j =>
          s"sum(CASE WHEN tf$j > 0 THEN 1 ELSE 0 END) AS df$j").mkString(", ")
        val score = ts.indices.map(j =>
          s"""ln((n - df$j + 0.5) / (df$j + 0.5) + 1.0) * tf$j * 2.2
             |        / (tf$j + 1.2 * (0.25 + 0.75 * dl / (sl / n)))""".stripMargin)
          .mkString("\n      + ")
        raw"""q${i}tf AS (
             |  SELECT doc_id,
             |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS dl,
             |    $tfs
             |  FROM documents),
             |q${i}st AS (
             |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) AS sl, $dfs
             |  FROM q${i}tf),
             |q${i}lex AS (
             |  SELECT CAST($i AS BIGINT) AS query_id, doc_id, score FROM (
             |    SELECT doc_id, round($score, 4) AS score
             |    FROM q${i}tf, q${i}st) t
             |  WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20)""".stripMargin
      }.mkString(",\n")
      val lexUnion = hybridTermSets.indices
        .map(i => s"SELECT * FROM q${i}lex").mkString(" UNION ALL ")
      raw"""WITH $blocks,
           |lex AS (
           |  SELECT query_id, doc_id,
           |         row_number() OVER (PARTITION BY query_id
           |             ORDER BY score DESC, doc_id) AS lr
           |  FROM ($lexUnion)),
           |vec AS (
           |  SELECT query_id, doc_id, rnk AS vr FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
           |           row_number() OVER (PARTITION BY q.vec_id
           |               ORDER BY list_cosine_similarity(
           |                   CAST(c.embedding AS DOUBLE[]),
           |                   CAST(q.embedding AS DOUBLE[])) DESC,
           |               c.vec_id) AS rnk
           |    FROM embeddings c, embeddings q
           |    WHERE q.vec_id < ${hybridTermSets.size}
           |      AND c.vec_id <> q.vec_id) t
           |  WHERE rnk <= 20),
           |fused AS (
           |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
           |         coalesce(l.doc_id, v.doc_id) AS doc_id,
           |         coalesce(1.0 / (60 + l.lr), 0)
           |           + coalesce(1.0 / (60 + v.vr), 0) AS rrf
           |  FROM lex l FULL OUTER JOIN vec v
           |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
           |SELECT query_id, doc_id, round(rrf, 6) AS rrf, rank FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY rrf DESC, doc_id) AS rank FROM fused) t
           |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // the full stack replayed: c45's fusion oracle builds the fused
    // top-10, the embeddings inner join applies Mmr's droppable-
    // candidate contract, and c50's five greedy steps run with the
    // fused rrf as rel — every stage of the production chain under one
    // oracle
    "c50b_mmr_hybrid" -> {
      val blocks = hybridTermSets.zipWithIndex.map { case (ts, i) =>
        val tfs = ts.zipWithIndex.map { case (term, j) =>
          raw"""len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
               |        x -> x = '$term')) AS tf$j""".stripMargin
        }.mkString(",\n    ")
        val dfs = ts.indices.map(j =>
          s"sum(CASE WHEN tf$j > 0 THEN 1 ELSE 0 END) AS df$j").mkString(", ")
        val score = ts.indices.map(j =>
          s"""ln((n - df$j + 0.5) / (df$j + 0.5) + 1.0) * tf$j * 2.2
             |        / (tf$j + 1.2 * (0.25 + 0.75 * dl / (sl / n)))""".stripMargin)
          .mkString("\n      + ")
        raw"""q${i}tf AS (
             |  SELECT doc_id,
             |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS dl,
             |    $tfs
             |  FROM documents),
             |q${i}st AS (
             |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) AS sl, $dfs
             |  FROM q${i}tf),
             |q${i}lex AS (
             |  SELECT CAST($i AS BIGINT) AS query_id, doc_id, score FROM (
             |    SELECT doc_id, round($score, 4) AS score
             |    FROM q${i}tf, q${i}st) t
             |  WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20)""".stripMargin
      }.mkString(",\n")
      val lexUnion = hybridTermSets.indices
        .map(i => s"SELECT * FROM q${i}lex").mkString(" UNION ALL ")
      val steps = (2 to 5).map { i =>
        raw"""step$i AS (
             |  SELECT c.query_id, c.doc_id,
             |         0.7 * c.rel - (1.0 - 0.7) * coalesce(p.pen, 0.0) AS mmr
             |  FROM cand c
             |  LEFT JOIN (
             |    SELECT sm.query_id, sm.doc_a AS doc_id, max(sm.sim) AS pen
             |    FROM selu${i - 1} s
             |    JOIN sim sm ON sm.query_id = s.query_id
             |               AND sm.doc_b = s.doc_id
             |    GROUP BY 1, 2) p
             |    ON p.query_id = c.query_id AND p.doc_id = c.doc_id
             |  WHERE NOT EXISTS (SELECT 1 FROM selu${i - 1} s
             |                    WHERE s.query_id = c.query_id
             |                      AND s.doc_id = c.doc_id)),
             |sel$i AS (
             |  SELECT query_id, doc_id, mmr, $i AS mmr_rank FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id
             |        ORDER BY mmr DESC, doc_id) AS rn FROM step$i) t
             |  WHERE rn = 1),
             |selu$i AS (SELECT query_id, doc_id FROM selu${i - 1}
             |           UNION ALL SELECT query_id, doc_id FROM sel$i)"""
          .stripMargin
      }.mkString(",\n")
      raw"""WITH $blocks,
           |lex AS (
           |  SELECT query_id, doc_id,
           |         row_number() OVER (PARTITION BY query_id
           |             ORDER BY score DESC, doc_id) AS lr
           |  FROM ($lexUnion)),
           |vec AS (
           |  SELECT query_id, doc_id, rnk AS vr FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
           |           row_number() OVER (PARTITION BY q.vec_id
           |               ORDER BY list_cosine_similarity(
           |                   CAST(c.embedding AS DOUBLE[]),
           |                   CAST(q.embedding AS DOUBLE[])) DESC,
           |               c.vec_id) AS rnk
           |    FROM embeddings c, embeddings q
           |    WHERE q.vec_id < ${hybridTermSets.size}
           |      AND c.vec_id <> q.vec_id) t
           |  WHERE rnk <= 20),
           |fused AS (
           |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
           |         coalesce(l.doc_id, v.doc_id) AS doc_id,
           |         coalesce(1.0 / (60 + l.lr), 0)
           |           + coalesce(1.0 / (60 + v.vr), 0) AS rrf
           |  FROM lex l FULL OUTER JOIN vec v
           |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
           |topf AS (
           |  SELECT query_id, doc_id, round(rrf, 6) AS rel FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |        ORDER BY rrf DESC, doc_id) AS rank FROM fused) t
           |  WHERE rank <= 10),
           |cand AS (
           |  SELECT f.query_id, f.doc_id, f.rel
           |  FROM topf f JOIN embeddings e ON e.vec_id = f.doc_id),
           |sim AS (
           |  SELECT a.query_id, a.doc_id AS doc_a, b.doc_id AS doc_b,
           |         round(list_cosine_similarity(
           |             CAST(va.embedding AS DOUBLE[]),
           |             CAST(vb.embedding AS DOUBLE[])), 6) AS sim
           |  FROM cand a
           |  JOIN cand b ON a.query_id = b.query_id
           |  JOIN embeddings va ON va.vec_id = a.doc_id
           |  JOIN embeddings vb ON vb.vec_id = b.doc_id),
           |sel1 AS (
           |  SELECT query_id, doc_id, 0.7 * rel - (1.0 - 0.7) * 0.0 AS mmr,
           |         1 AS mmr_rank FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |        ORDER BY 0.7 * rel - (1.0 - 0.7) * 0.0 DESC, doc_id)
           |        AS rn
           |    FROM cand) t
           |  WHERE rn = 1),
           |selu1 AS (SELECT query_id, doc_id FROM sel1),
           |$steps
           |SELECT query_id, doc_id,
           |       CAST(round(mmr * 1e7, 0) AS BIGINT) AS mmr_e7, mmr_rank
           |FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
           |      UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
           |      UNION ALL SELECT * FROM sel5)
           |ORDER BY query_id, mmr_rank""".stripMargin
    },

    // the oracle replays the whole greedy: candidates = c6's top-10 on
    // the identical unrounded ordering, rel/sim on the 1e-6 grid, then
    // five unrolled argmax steps — penalty = max sim to the selected-so-
    // far union, (1.0 - 0.7) spelled as a SUBTRACTION so both engines
    // use the identical double coefficient, ties to doc_id asc
    "c50_mmr_rerank" -> {
      val steps = (2 to 5).map { i =>
        raw"""step$i AS (
             |  SELECT c.query_id, c.doc_id,
             |         0.7 * c.rel - (1.0 - 0.7) * coalesce(p.pen, 0.0) AS mmr
             |  FROM cand c
             |  LEFT JOIN (
             |    SELECT sm.query_id, sm.doc_a AS doc_id, max(sm.sim) AS pen
             |    FROM selu${i - 1} s
             |    JOIN sim sm ON sm.query_id = s.query_id
             |               AND sm.doc_b = s.doc_id
             |    GROUP BY 1, 2) p
             |    ON p.query_id = c.query_id AND p.doc_id = c.doc_id
             |  WHERE NOT EXISTS (SELECT 1 FROM selu${i - 1} s
             |                    WHERE s.query_id = c.query_id
             |                      AND s.doc_id = c.doc_id)),
             |sel$i AS (
             |  SELECT query_id, doc_id, mmr, $i AS mmr_rank FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id
             |        ORDER BY mmr DESC, doc_id) AS rn FROM step$i) t
             |  WHERE rn = 1),
             |selu$i AS (SELECT query_id, doc_id FROM selu${i - 1}
             |           UNION ALL SELECT query_id, doc_id FROM sel$i)"""
          .stripMargin
      }.mkString(",\n")
      raw"""WITH cand AS (
           |  SELECT query_id, doc_id, round(cos, 6) AS rel FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
           |           list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
           |                                  CAST(q.embedding AS DOUBLE[]))
           |             AS cos,
           |           row_number() OVER (PARTITION BY q.vec_id
           |               ORDER BY list_cosine_similarity(
           |                   CAST(c.embedding AS DOUBLE[]),
           |                   CAST(q.embedding AS DOUBLE[])) DESC,
           |               c.vec_id) AS rnk
           |    FROM embeddings c, embeddings q
           |    WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id) t
           |  WHERE rnk <= 10),
           |sim AS (
           |  SELECT a.query_id, a.doc_id AS doc_a, b.doc_id AS doc_b,
           |         round(list_cosine_similarity(
           |             CAST(va.embedding AS DOUBLE[]),
           |             CAST(vb.embedding AS DOUBLE[])), 6) AS sim
           |  FROM cand a
           |  JOIN cand b ON a.query_id = b.query_id
           |  JOIN embeddings va ON va.vec_id = a.doc_id
           |  JOIN embeddings vb ON vb.vec_id = b.doc_id),
           |sel1 AS (
           |  SELECT query_id, doc_id, 0.7 * rel - (1.0 - 0.7) * 0.0 AS mmr,
           |         1 AS mmr_rank FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |        ORDER BY 0.7 * rel - (1.0 - 0.7) * 0.0 DESC, doc_id)
           |        AS rn
           |    FROM cand) t
           |  WHERE rn = 1),
           |selu1 AS (SELECT query_id, doc_id FROM sel1),
           |$steps
           |SELECT query_id, doc_id,
           |       CAST(round(mmr * 1e7, 0) AS BIGINT) AS mmr_e7, mmr_rank
           |FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
           |      UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
           |      UNION ALL SELECT * FROM sel5)
           |ORDER BY query_id, mmr_rank""".stripMargin
    },

    // the exact overlap is recomputable (doc_id family); flagged_true
    // MUST equal it (no false negatives — the bloom's one-sided-error
    // contract), and the fp-rate bound is the in-plan boolean
    "c34_bloom_flag" ->
      """SELECT count(*) AS n_probe,
        |       count(CASE WHEN doc_id % 3 = 0 THEN 1 END) AS n_overlap,
        |       count(CASE WHEN doc_id % 3 = 0 THEN 1 END) AS flagged_true,
        |       true AS fp_ok
        |FROM documents""".stripMargin,

    // the oracle independently recomputes the whole permutation: shard
    // from the seeded md5 prefix, order from (md5, id), digest over the
    // ids in that order — any divergence anywhere flips a row hash
    "c33_seeded_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         md5(concat('g6:', CAST(doc_id AS VARCHAR))) AS hx
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, hx,
        |         CAST(CAST(concat('0x', substr(hx, 1, 8)) AS BIGINT) % 8
        |              AS INT) AS shard
        |  FROM h)
        |SELECT shard, count(*) AS cnt,
        |       md5(string_agg(CAST(doc_id AS VARCHAR), ','
        |           ORDER BY hx, CAST(doc_id AS VARCHAR))) AS order_digest,
        |       true AS stable_ok
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "c12_multimodal" ->
      """SELECT doc_id AS media_id, CAST(strlen(text) AS INT) AS n_bytes,
        |       CAST(16 AS INT) AS n_features
        |FROM documents ORDER BY 1""".stripMargin,

    // every decoded pixel of every sampled frame must survive the GIF
    // container round trip bit-exactly for these sums to land — the
    // palette construction makes the codec provably lossless, so the
    // oracle recomputes mean-RGB from the pixel formula alone
    "c12e_gif_frames" ->
      """WITH p AS (
        |  SELECT doc_id, (doc_id % 16 + 16) AS w, (doc_id % 8 + 16) AS h,
        |         (doc_id % 4 + 1) AS nf
        |  FROM documents),
        |f AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS fi FROM p),
        |kept AS (SELECT * FROM f WHERE fi % 2 = 0),
        |px AS (SELECT doc_id, w, h, nf, fi, unnest(range(0, w)) AS x
        |       FROM kept),
        |pxy AS (SELECT doc_id, w, h, nf, fi, x, unnest(range(0, h)) AS y
        |        FROM px),
        |c AS (SELECT doc_id, w, h, nf, fi,
        |             (x + 3 * y + 5 * fi + doc_id) % 8 AS k FROM pxy)
        |SELECT doc_id AS media_id, CAST(nf AS INT) AS n_frames,
        |       CAST(fi AS INT) AS frame_idx, CAST(w AS INT) AS width,
        |       CAST(h AS INT) AS height,
        |       round(sum(36 * k) / (w * h * 255.0), 6) AS mean_r,
        |       round(sum(252 - 36 * k) / (w * h * 255.0), 6) AS mean_g,
        |       round(sum(31 * k) / (w * h * 255.0), 6) AS mean_b
        |FROM c GROUP BY doc_id, nf, fi, w, h
        |ORDER BY media_id, frame_idx""".stripMargin,

    // frame deltas from the palette formula: kept frames under stride 2
    // are 0 and 2, so Δk = k(f=2) − k(f=0) with k = (x+3y+5f+id)%8;
    // |Δr| = |Δg| = 36|Δk| (g = 252−36k differences by the same 36|Δk|)
    // and |Δb| = 31|Δk| — exact integers, bit-identical to the decoded
    // pixels because the GIF round trip is lossless
    "c12f_frame_deltas" ->
      """WITH p AS (
        |  SELECT doc_id, (doc_id % 16 + 16) AS w, (doc_id % 8 + 16) AS h,
        |         (doc_id % 4 + 1) AS nf
        |  FROM documents WHERE doc_id % 4 + 1 >= 3),
        |px AS (SELECT doc_id, w, h, nf, unnest(range(0, w)) AS x FROM p),
        |pxy AS (SELECT doc_id, w, h, nf, x, unnest(range(0, h)) AS y
        |        FROM px),
        |d AS (SELECT doc_id, w, h, nf,
        |             abs(((x + 3 * y + 10 + doc_id) % 8)
        |                 - ((x + 3 * y + doc_id) % 8)) AS dk
        |      FROM pxy)
        |SELECT doc_id AS media_id, CAST(nf AS INT) AS n_frames,
        |       CAST(0 AS INT) AS prev_idx, CAST(2 AS INT) AS frame_idx,
        |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       round(sum(36 * dk) / (w * h * 255.0), 6) AS mad_r,
        |       round(sum(36 * dk) / (w * h * 255.0), 6) AS mad_g,
        |       round(sum(31 * dk) / (w * h * 255.0), 6) AS mad_b
        |FROM d GROUP BY doc_id, nf, w, h
        |ORDER BY media_id, frame_idx""".stripMargin,

    // the whole landmark pipeline replayed: copies synthesize from
    // their SOURCE id's formula (byte-identical payloads), the per-frame
    // argmax of X_j² ties to the lower line, and the (frame, line,
    // exact power) self-join + threshold land on identical integers
    "c12k_audio_neardup" ->
      """WITH ids AS (
        |  SELECT doc_id AS media_id, doc_id AS src FROM documents
        |  WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id % 4 = 0 AND doc_id % 7 = 0),
        |p AS (SELECT media_id, src,
        |             CAST(800 + (src % 5) * 160 AS INT) AS n FROM ids),
        |s AS (SELECT media_id, src, n, unnest(range(0, n)) AS i FROM p),
        |samp AS (
        |  SELECT media_id, CAST(i // 128 AS INT) AS frame_idx,
        |         CAST(i % 128 AS BIGINT) AS ii,
        |         CAST(((src * 7349 + i * 12345 + 6789) % 65536)
        |              - 32768 AS BIGINT) AS v
        |  FROM s WHERE i < (n // 128) * 128),
        |wht AS (
        |  SELECT f.media_id, f.frame_idx, j.j AS j,
        |         sum(CASE WHEN bit_count(CAST(j.j AS BIGINT) & f.ii) % 2 = 0
        |                  THEN f.v ELSE -f.v END) AS x
        |  FROM samp f CROSS JOIN (SELECT unnest(range(0, 128)) AS j) j
        |  GROUP BY 1, 2, 3),
        |cc AS (
        |  SELECT media_id, frame_idx, CAST(j AS INT) AS line,
        |         CAST(x * x AS BIGINT) AS power FROM (
        |    SELECT *, row_number() OVER (PARTITION BY media_id, frame_idx
        |        ORDER BY x * x DESC, j) AS rn FROM wht) t
        |  WHERE rn = 1)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       CAST(count(*) AS BIGINT) AS n_shared,
        |       b.media_id - a.media_id = 1000000 AS planted
        |FROM cc a JOIN cc b
        |  ON a.frame_idx = b.frame_idx AND a.line = b.line
        | AND a.power = b.power AND a.media_id < b.media_id
        |GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY id_a, id_b""".stripMargin,

    // chained-landmark replay with the half-gain copies: v' = v // 2
    // (truncating, ≡ Java /), per-frame argmax lines, codes chain
    // frames a and a+1, magnitude never enters
    "c12n_audio_chained_match" ->
      """WITH ids AS (
        |  SELECT doc_id AS media_id, doc_id AS src, 0 AS halved
        |  FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, doc_id, 1 FROM documents
        |  WHERE doc_id % 4 = 0 AND doc_id % 7 = 0),
        |p AS (SELECT media_id, src, halved,
        |             CAST(800 + (src % 5) * 160 AS INT) AS n FROM ids),
        |s AS (SELECT media_id, src, halved, n,
        |             unnest(range(0, n)) AS i FROM p),
        |samp AS (
        |  SELECT media_id, CAST(i // 128 AS INT) AS frame_idx,
        |         CAST(i % 128 AS BIGINT) AS ii,
        |         CAST(CASE WHEN halved = 1
        |              THEN (((src * 7349 + i * 12345 + 6789) % 65536)
        |                    - 32768) // 2
        |              ELSE ((src * 7349 + i * 12345 + 6789) % 65536)
        |                   - 32768 END AS BIGINT) AS v
        |  FROM s WHERE i < (n // 128) * 128),
        |wht AS (
        |  SELECT f.media_id, f.frame_idx, j.j AS j,
        |         sum(CASE WHEN bit_count(CAST(j.j AS BIGINT) & f.ii) % 2 = 0
        |                  THEN f.v ELSE -f.v END) AS x
        |  FROM samp f CROSS JOIN (SELECT unnest(range(0, 128)) AS j) j
        |  GROUP BY 1, 2, 3),
        |ln AS (
        |  SELECT media_id, frame_idx, CAST(j AS INT) AS line FROM (
        |    SELECT *, row_number() OVER (PARTITION BY media_id, frame_idx
        |        ORDER BY x * x DESC, j) AS rn FROM wht) t
        |  WHERE rn = 1),
        |cc AS (
        |  SELECT a.media_id, a.frame_idx AS anchor, a.line AS line_a,
        |         b.line AS line_t
        |  FROM ln a JOIN ln b ON a.media_id = b.media_id
        |   AND b.frame_idx = a.frame_idx + 1)
        |SELECT x.media_id AS id_a, y.media_id AS id_b,
        |       CAST(count(*) AS BIGINT) AS n_shared,
        |       y.media_id - x.media_id = 3000000 AS planted
        |FROM cc x JOIN cc y
        |  ON x.anchor = y.anchor AND x.line_a = y.line_a
        | AND x.line_t = y.line_t AND x.media_id < y.media_id
        |GROUP BY 1, 2 HAVING count(*) >= 4
        |ORDER BY id_a, id_b""".stripMargin,

    // same landmark replay as c12k but with the dithered copies:
    // v' = clamp(v + δ_i) from the same LCG, magnitude quantized to its
    // bit length (length(bin(p))), matched within ±1 bucket
    "c12m_audio_robust_match" ->
      """WITH ids AS (
        |  SELECT doc_id AS media_id, doc_id AS src, 0 AS dith
        |  FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id, 1 FROM documents
        |  WHERE doc_id % 4 = 0 AND doc_id % 7 = 0),
        |p AS (SELECT media_id, src, dith,
        |             CAST(800 + (src % 5) * 160 AS INT) AS n FROM ids),
        |s AS (SELECT media_id, src, dith, n,
        |             unnest(range(0, n)) AS i FROM p),
        |samp AS (
        |  SELECT media_id, CAST(i // 128 AS INT) AS frame_idx,
        |         CAST(i % 128 AS BIGINT) AS ii,
        |         CAST(LEAST(32767, GREATEST(-32768,
        |              ((src * 7349 + i * 12345 + 6789) % 65536) - 32768
        |              + CASE WHEN dith = 1 THEN
        |                  (CASE WHEN i % 3 = 0 THEN 1 ELSE -1 END)
        |                ELSE 0 END)) AS BIGINT) AS v
        |  FROM s WHERE i < (n // 128) * 128),
        |wht AS (
        |  SELECT f.media_id, f.frame_idx, j.j AS j,
        |         sum(CASE WHEN bit_count(CAST(j.j AS BIGINT) & f.ii) % 2 = 0
        |                  THEN f.v ELSE -f.v END) AS x
        |  FROM samp f CROSS JOIN (SELECT unnest(range(0, 128)) AS j) j
        |  GROUP BY 1, 2, 3),
        |cc AS (
        |  SELECT media_id, frame_idx, CAST(j AS INT) AS line,
        |         CAST(x * x AS BIGINT) AS power FROM (
        |    SELECT *, row_number() OVER (PARTITION BY media_id, frame_idx
        |        ORDER BY x * x DESC, j) AS rn FROM wht) t
        |  WHERE rn = 1),
        |qc AS (
        |  SELECT media_id, frame_idx, line,
        |         CASE WHEN power = 0 THEN 0
        |              ELSE length(bin(power)) END AS qmag
        |  FROM cc)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       CAST(count(*) AS BIGINT) AS n_shared,
        |       b.media_id - a.media_id = 2000000 AS planted
        |FROM qc a JOIN qc b
        |  ON a.frame_idx = b.frame_idx AND a.line = b.line
        | AND abs(a.qmag - b.qmag) <= 1 AND a.media_id < b.media_id
        |GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY id_a, id_b""".stripMargin,

    // the c12j grid with a hop-indexed frame axis: frame f of clip n
    // covers samples [f*64, f*64+128), f ranging to (n-128)//64
    "c12l_audio_spectrogram_hop" ->
      """WITH p AS (
        |  SELECT doc_id, CAST(800 + (doc_id % 5) * 160 AS INT) AS n
        |  FROM documents WHERE doc_id % 2 = 0),
        |fr AS (SELECT doc_id, n,
        |              unnest(range(0, (n - 128) // 64 + 1)) AS f FROM p),
        |sq AS (SELECT doc_id, f, unnest(range(0, 128)) AS ii FROM fr),
        |samp AS (
        |  SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |         CAST(ii AS BIGINT) AS ii,
        |         CAST(((doc_id * 7349 + (f * 64 + ii) * 12345 + 6789)
        |               % 65536) - 32768 AS BIGINT) AS v
        |  FROM sq),
        |wht AS (
        |  SELECT f.doc_id, f.frame_idx, j.j AS j,
        |         sum(CASE WHEN bit_count(CAST(j.j AS BIGINT) & f.ii) % 2 = 0
        |                  THEN f.v ELSE -f.v END) AS x
        |  FROM samp f CROSS JOIN (SELECT unnest(range(0, 128)) AS j) j
        |  GROUP BY 1, 2, 3),
        |pw AS (
        |  SELECT doc_id, frame_idx, x * x AS pp,
        |         CASE WHEN j = 0 THEN 0 WHEN j < 2 THEN 1
        |              WHEN j < 4 THEN 2 WHEN j < 8 THEN 3
        |              WHEN j < 16 THEN 4 WHEN j < 32 THEN 5
        |              WHEN j < 64 THEN 6 ELSE 7 END AS band
        |  FROM wht),
        |tot AS (SELECT doc_id, frame_idx, sum(pp) AS total
        |        FROM pw GROUP BY 1, 2)
        |SELECT pw.doc_id AS media_id, pw.frame_idx AS frame_idx,
        |       CAST(band AS INT) AS band,
        |       CAST(sum(pp) AS BIGINT) AS band_energy,
        |       round(CAST(sum(pp) AS DOUBLE) / CAST(tot.total AS DOUBLE), 6)
        |         AS frac
        |FROM pw JOIN tot ON pw.doc_id = tot.doc_id
        |                AND pw.frame_idx = tot.frame_idx
        |GROUP BY pw.doc_id, pw.frame_idx, band, tot.total
        |ORDER BY media_id, pw.frame_idx, band""".stripMargin,

    // the whole grid from first principles: per (doc, frame), the WHT
    // via popcount over the frame's own samples, then the dyadic
    // re-banding — HUGEINT-exact until the final casts
    "c12j_audio_spectrogram" ->
      """WITH p AS (
        |  SELECT doc_id, CAST(800 + (doc_id % 5) * 160 AS INT) AS n
        |  FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM p),
        |samp AS (
        |  SELECT doc_id, CAST(i // 128 AS INT) AS frame_idx,
        |         CAST(i % 128 AS BIGINT) AS ii,
        |         CAST(((doc_id * 7349 + i * 12345 + 6789) % 65536)
        |              - 32768 AS BIGINT) AS v
        |  FROM s WHERE i < (n // 128) * 128),
        |wht AS (
        |  SELECT f.doc_id, f.frame_idx, j.j AS j,
        |         sum(CASE WHEN bit_count(CAST(j.j AS BIGINT) & f.ii) % 2 = 0
        |                  THEN f.v ELSE -f.v END) AS x
        |  FROM samp f CROSS JOIN (SELECT unnest(range(0, 128)) AS j) j
        |  GROUP BY 1, 2, 3),
        |pw AS (
        |  SELECT doc_id, frame_idx, x * x AS pp,
        |         CASE WHEN j = 0 THEN 0 WHEN j < 2 THEN 1
        |              WHEN j < 4 THEN 2 WHEN j < 8 THEN 3
        |              WHEN j < 16 THEN 4 WHEN j < 32 THEN 5
        |              WHEN j < 64 THEN 6 ELSE 7 END AS band
        |  FROM wht),
        |tot AS (SELECT doc_id, frame_idx, sum(pp) AS total
        |        FROM pw GROUP BY 1, 2)
        |SELECT pw.doc_id AS media_id, pw.frame_idx AS frame_idx,
        |       CAST(band AS INT) AS band,
        |       CAST(sum(pp) AS BIGINT) AS band_energy,
        |       round(CAST(sum(pp) AS DOUBLE) / CAST(tot.total AS DOUBLE), 6)
        |         AS frac
        |FROM pw JOIN tot ON pw.doc_id = tot.doc_id
        |                AND pw.frame_idx = tot.frame_idx
        |GROUP BY pw.doc_id, pw.frame_idx, band, tot.total
        |ORDER BY media_id, pw.frame_idx, band""".stripMargin,

    // every frame row from the synthesis LCG: frame = i div 128 (full
    // frames only), energy/zcr/peak as exact integer aggregates
    "c12i_audio_activity" ->
      """WITH p AS (
        |  SELECT doc_id, CAST(800 + (doc_id % 5) * 160 AS INT) AS n
        |  FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM p),
        |samp AS (
        |  SELECT doc_id, CAST(i // 128 AS INT) AS frame_idx, i,
        |         CAST(((doc_id * 7349 + i * 12345 + 6789) % 65536)
        |              - 32768 AS BIGINT) AS v
        |  FROM s WHERE i < (n // 128) * 128),
        |lagged AS (
        |  SELECT doc_id, frame_idx, v,
        |         lag(v) OVER (PARTITION BY doc_id, frame_idx
        |                      ORDER BY i) AS pv
        |  FROM samp)
        |SELECT doc_id AS media_id, frame_idx,
        |       CAST(sum(v * v) AS BIGINT) AS energy,
        |       CAST(count(CASE WHEN (v < 0) <> (pv < 0) THEN 1 END)
        |            AS INT) AS zcr,
        |       CAST(max(abs(v)) AS INT) AS peak
        |FROM lagged GROUP BY 1, 2
        |ORDER BY media_id, frame_idx""".stripMargin,

    // same WHT-from-first-principles as c12g, re-grouped into dyadic
    // bands; band sums stay HUGEINT-exact and cast once at the edge
    "c12h_audio_bands" ->
      """WITH fr AS (
        |  SELECT doc_id, unnest(range(0, 128)) AS i FROM documents),
        |samp AS (
        |  SELECT doc_id, i,
        |         CAST(((doc_id * 7349 + i * 12345 + 6789) % 65536)
        |              - 32768 AS BIGINT) AS v
        |  FROM fr),
        |wht AS (
        |  SELECT f.doc_id, j.j AS j,
        |         sum(CASE WHEN bit_count(CAST(j.j AS BIGINT)
        |                                 & CAST(f.i AS BIGINT)) % 2 = 0
        |                  THEN f.v ELSE -f.v END) AS x
        |  FROM samp f CROSS JOIN (SELECT unnest(range(0, 128)) AS j) j
        |  GROUP BY f.doc_id, j.j),
        |pw AS (
        |  SELECT doc_id, x * x AS pp,
        |         CASE WHEN j = 0 THEN 0 WHEN j < 2 THEN 1
        |              WHEN j < 4 THEN 2 WHEN j < 8 THEN 3
        |              WHEN j < 16 THEN 4 WHEN j < 32 THEN 5
        |              WHEN j < 64 THEN 6 ELSE 7 END AS band
        |  FROM wht),
        |tot AS (SELECT doc_id, sum(pp) AS total FROM pw GROUP BY 1)
        |SELECT pw.doc_id AS media_id, CAST(band AS INT) AS band,
        |       CAST(sum(pp) AS BIGINT) AS band_energy,
        |       round(CAST(sum(pp) AS DOUBLE) / CAST(tot.total AS DOUBLE), 6)
        |         AS frac
        |FROM pw JOIN tot ON pw.doc_id = tot.doc_id
        |GROUP BY pw.doc_id, band, tot.total
        |ORDER BY media_id, band""".stripMargin,

    // the full sequency spectrum recomputed from first principles:
    // samples from the synthesis LCG, X_j = Σ_i s_i·(−1)^popcount(j&i)
    // (the Hadamard definition — the engine's fast butterfly computes
    // exactly this), P_j = X_j², then the same exact-integer ratios.
    // Every intermediate is an exact BIGINT/HUGEINT; the only doubles
    // are the final casts, which round identically in both engines.
    "c12g_audio_spectral" ->
      """WITH p AS (
        |  SELECT doc_id, CAST(800 + (doc_id % 5) * 160 AS INT) AS n
        |  FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM p),
        |samp AS (
        |  SELECT doc_id, n, i,
        |         CAST(((doc_id * 7349 + i * 12345 + 6789) % 65536)
        |              - 32768 AS BIGINT) AS v
        |  FROM s),
        |zc AS (
        |  SELECT doc_id,
        |         CAST(count(CASE WHEN (v < 0) <> (pv < 0) THEN 1 END)
        |              AS INT) AS zcr
        |  FROM (SELECT doc_id, v,
        |               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |        FROM samp)
        |  WHERE pv IS NOT NULL GROUP BY doc_id),
        |fr AS (SELECT doc_id, i, v FROM samp WHERE i < 128),
        |wht AS (
        |  SELECT f.doc_id, j.j AS j,
        |         sum(CASE WHEN bit_count(CAST(j.j AS BIGINT)
        |                                 & CAST(f.i AS BIGINT)) % 2 = 0
        |                  THEN f.v ELSE -f.v END) AS x
        |  FROM fr f CROSS JOIN (SELECT unnest(range(0, 128)) AS j) j
        |  GROUP BY f.doc_id, j.j),
        |pw AS (SELECT doc_id, j, x * x AS p FROM wht),
        |agg AS (SELECT doc_id, sum(p) AS energy, sum(j * p) AS wsum,
        |               max(p) AS maxp
        |        FROM pw GROUP BY doc_id),
        |dom AS (SELECT pw.doc_id, CAST(min(j) AS INT) AS dominant_seq
        |        FROM pw JOIN agg ON pw.doc_id = agg.doc_id
        |                        AND pw.p = agg.maxp
        |        GROUP BY pw.doc_id)
        |SELECT p.doc_id AS media_id, p.n AS n_samples, zc.zcr,
        |       round(CAST(a.wsum AS DOUBLE) / CAST(a.energy AS DOUBLE), 6)
        |         AS seq_centroid,
        |       round(128.0 * CAST(a.maxp AS DOUBLE)
        |             / CAST(a.energy AS DOUBLE), 6) AS seq_crest,
        |       dom.dominant_seq
        |FROM p JOIN zc ON p.doc_id = zc.doc_id
        |       JOIN agg a ON p.doc_id = a.doc_id
        |       JOIN dom ON p.doc_id = dom.doc_id
        |ORDER BY media_id""".stripMargin,

    // the oracle recomputes every audio feature from the synthesis
    // formula alone — the WAV container round trip (AudioSystem encode →
    // parse) must preserve every PCM sample bit-exactly for the rms/peak
    // to land; Σs² ≤ 1600·2^30 is exact in a double in any order, and
    // n/16-style divisions are the same doubles both engines compute
    "c12d_audio_codec" ->
      """WITH p AS (
        |  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM p),
        |v AS (
        |  SELECT doc_id, n,
        |         ((doc_id * 7349 + i * 12345 + 6789) % 65536) - 32768 AS v
        |  FROM s)
        |SELECT doc_id AS media_id, CAST(n AS INT) AS n_samples,
        |       CAST(16000 AS INT) AS sample_rate,
        |       n * 1000.0 / 16000 AS duration_ms,
        |       round(sqrt(sum(CAST(v AS DOUBLE) * v) / n), 6) AS rms,
        |       CAST(max(abs(v)) AS INT) AS peak
        |FROM v GROUP BY doc_id, n ORDER BY media_id""".stripMargin,

    "c13_dup_clusters" ->
      """SELECT doc_id AS cluster_id, CAST(2 AS BIGINT) AS cluster_size,
        |       doc_id + 1000000 AS max_id
        |FROM documents ORDER BY 1""".stripMargin,

    "c6_cosine_topk" ->
      """SELECT query_id, neighbor_id, round(cos, 6) AS cos, rnk FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                CAST(q.embedding AS DOUBLE[])) AS cos,
        |         row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_cosine_similarity(
        |                 CAST(c.embedding AS DOUBLE[]),
        |                 CAST(q.embedding AS DOUBLE[])) DESC, c.vec_id) AS rnk
        |  FROM embeddings c, embeddings q
        |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id) t
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // c7's gate is recall-shaped (see the queries entry): the Spark side
    // computes LSH-vs-exact hit counts itself; the oracle pins the
    // deterministic part — 8 queries, 5 exact neighbors each, recall ≥ 4/5.
    "c7_lsh_topk" ->
      """SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_exact,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY 1""".stripMargin,

    // Exact DuckDB replica of the stopword-argmax heuristic (ties resolve
    // to the greatest lang code in both engines: array_max on structs /
    // list_aggregate 'max'). Note the corpus's `lang` labels are random
    // metadata on synthetic text, so label-accuracy is not a usable oracle;
    // per-doc prediction equality is the stronger check.
    "c8_lang_id" ->
      """SELECT doc_id,
        |  list_aggregate([
        |    {'hits': len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |       t -> list_contains(['der','die','und','in','den','von','zu','das','mit','sich'], t))), 'lang': 'de'},
        |    {'hits': len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |       t -> list_contains(['the','and','of','to','in','is','that','it','for','with'], t))), 'lang': 'en'},
        |    {'hits': len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |       t -> list_contains(['de','la','que','el','en','y','los','del','se','las'], t))), 'lang': 'es'},
        |    {'hits': len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |       t -> list_contains(['de','la','le','et','les','des','en','du','un','que'], t))), 'lang': 'fr'},
        |    {'hits': len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |       t -> list_contains(['de','que','e','o','a','do','da','em','um','para'], t))), 'lang': 'pt'}
        |  ], 'max').lang AS lang_pred,
        |  lang AS lang_label
        |FROM documents ORDER BY doc_id""".stripMargin,

    "c9_quality" ->
      """SELECT doc_id,
        |round(greatest(0.0, least(1.0,
        |  (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.6
        |  + (CASE WHEN (length(regexp_replace(text, '\s', '', 'g'))
        |       / CAST(greatest(
        |           CASE WHEN length(trim(text)) = 0 THEN 0
        |                ELSE len(regexp_split_to_array(trim(text), '\s+')) END,
        |           1) AS DOUBLE))
        |       BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4
        |  - (length(regexp_replace(text, '[^0-9]', '', 'g'))
        |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
        |  - ((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
        |)), 4) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "c10_tokens" ->
      """SELECT doc_id,
        |       CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |         AS ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))
        |         AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "c11_fingerprint" ->
      """SELECT doc_id,
        |       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |         AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "d3_user_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "c14_ivf_topk" ->
      """SELECT query_id, neighbor_id, round(cos, 6) AS cos, rnk FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                CAST(q.embedding AS DOUBLE[])) AS cos,
        |         row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_cosine_similarity(
        |                 CAST(c.embedding AS DOUBLE[]),
        |                 CAST(q.embedding AS DOUBLE[])) DESC, c.vec_id) AS rnk
        |  FROM embeddings c, embeddings q
        |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id) t
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // exhaustive probes make the batched scan exact — same brute-force
    // replica as c14 (the plan differs, the answer must not)
    "c14c_ivf_rank_many" ->
      """SELECT query_id, neighbor_id, round(cos, 6) AS cos, rnk FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                CAST(q.embedding AS DOUBLE[])) AS cos,
        |         row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_cosine_similarity(
        |                 CAST(c.embedding AS DOUBLE[]),
        |                 CAST(q.embedding AS DOUBLE[])) DESC, c.vec_id) AS rnk
        |  FROM embeddings c, embeddings q
        |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id) t
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // Full replica of the mixing computation: totals → k → rates →
    // content-hash filter, all in SQL. Arithmetic shape matches the Scala
    // side exactly (((k*w)/toks)*10000, left-assoc; weights cast to
    // DOUBLE) so the floor() lands on identical IEEE doubles.
    "c25_source_mixing" ->
      """WITH d AS (
        |  SELECT source, text,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |           AS nt
        |  FROM documents),
        |w AS (SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.25),
        |                            ('src2', 0.15), ('src3', 0.10))
        |      t(source, wt)),
        |tot AS (SELECT source, CAST(sum(nt) AS DOUBLE) AS toks
        |        FROM d GROUP BY 1),
        |k AS (SELECT min(toks / CAST(wt AS DOUBLE)) AS k
        |      FROM tot JOIN w USING (source)),
        |rates AS (
        |  SELECT source,
        |         CAST(floor(k.k * CAST(wt AS DOUBLE) / toks * 10000) AS INT)
        |           AS rate
        |  FROM tot JOIN w USING (source), k)
        |SELECT d.source, count(*) AS kept_docs,
        |       CAST(sum(d.nt) AS BIGINT) AS kept_tokens
        |FROM d JOIN rates ON d.source = rates.source
        |WHERE CAST(concat('0x', substr(md5(d.text), 1, 6)) AS BIGINT)
        |        % 10000 < rate
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Full string-level replica of the shingle-overlap check. Docs shorter
    // than the shingle width hash their whole text as one shingle — the
    // UNION ALL branch mirrors that contract.
    "c24_decontamination" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(
        |           trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |           ' ') AS words
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        |  FROM w, unnest(generate_series(1, len(words) - 7)) t(i)
        |  WHERE len(words) >= 8
        |  UNION ALL
        |  SELECT doc_id, array_to_string(words, ' ') AS gram
        |  FROM w WHERE len(words) < 8),
        |dg AS (SELECT DISTINCT doc_id, gram FROM g),
        |eg AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 97 = 0),
        |ov AS (SELECT dg.doc_id, count(*) AS n_overlap
        |       FROM dg JOIN eg USING (gram) GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
        |       COALESCE(ov.n_overlap, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN ov USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // full-probe two-level IVF ≡ exact — same brute-force oracle as c14
    "c14b_ivf_two_level" ->
      """SELECT query_id, neighbor_id, round(cos, 6) AS cos, rnk FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                CAST(q.embedding AS DOUBLE[])) AS cos,
        |         row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_cosine_similarity(
        |                 CAST(c.embedding AS DOUBLE[]),
        |                 CAST(q.embedding AS DOUBLE[])) DESC, c.vec_id) AS rnk
        |  FROM embeddings c, embeddings q
        |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id) t
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // full PQ replica: same md5-ordered codebook sample as pqTopK, encode
    // = per-(vec, subspace) argmin over codewords (ties → lowest index),
    // ADC = sum of per-subspace distances between the query sub-vector
    // and the ASSIGNED codeword; round(adc, 6) before ranking on both
    // engines (quantized ordering — see the queries entry)
    "c26_pq_topk" ->
      """WITH corp AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |samp AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
        |                            CAST(vec_id AS VARCHAR)) - 1 AS cw, v
        |  FROM (SELECT vec_id, v FROM corp
        |        ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
        |        LIMIT 16)),
        |subs AS (SELECT unnest(range(0, 8)) AS sub),
        |cb AS (
        |  SELECT s.sub, p.cw,
        |         list_slice(p.v, s.sub*8 + 1, s.sub*8 + 8) AS cvec
        |  FROM samp p CROSS JOIN subs s),
        |enc AS (
        |  SELECT vec_id, sub, cw FROM (
        |    SELECT c.vec_id, b.sub, b.cw,
        |           row_number() OVER (PARTITION BY c.vec_id, b.sub
        |             ORDER BY list_distance(
        |                 list_slice(c.v, b.sub*8 + 1, b.sub*8 + 8), b.cvec),
        |               b.cw) AS rn
        |    FROM corp c CROSS JOIN cb b) t WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 5),
        |adc AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |         round(sum(list_distance(
        |             list_slice(q.qv, e.sub*8 + 1, e.sub*8 + 8), b.cvec)), 6)
        |           AS adc
        |  FROM q CROSS JOIN enc e
        |  JOIN cb b ON b.sub = e.sub AND b.cw = e.cw
        |  WHERE e.vec_id <> q.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, adc, rnk FROM (
        |  SELECT query_id, neighbor_id, adc,
        |         row_number() OVER (PARTITION BY query_id
        |             ORDER BY adc, neighbor_id) AS rnk
        |  FROM adc) r
        |WHERE rnk <= 8 ORDER BY query_id, rnk""".stripMargin,

    // c28 at full probe == the c26 ADC replica (same md5 codebook sample,
    // same encode, same summed-subspace ADC), only k differs
    "c28_ivfpq_topk" ->
      """WITH corp AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |samp AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
        |                            CAST(vec_id AS VARCHAR)) - 1 AS cw, v
        |  FROM (SELECT vec_id, v FROM corp
        |        ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
        |        LIMIT 16)),
        |subs AS (SELECT unnest(range(0, 8)) AS sub),
        |cb AS (
        |  SELECT s.sub, p.cw,
        |         list_slice(p.v, s.sub*8 + 1, s.sub*8 + 8) AS cvec
        |  FROM samp p CROSS JOIN subs s),
        |enc AS (
        |  SELECT vec_id, sub, cw FROM (
        |    SELECT c.vec_id, b.sub, b.cw,
        |           row_number() OVER (PARTITION BY c.vec_id, b.sub
        |             ORDER BY list_distance(
        |                 list_slice(c.v, b.sub*8 + 1, b.sub*8 + 8), b.cvec),
        |               b.cw) AS rn
        |    FROM corp c CROSS JOIN cb b) t WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 5),
        |adc AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |         round(sum(list_distance(
        |             list_slice(q.qv, e.sub*8 + 1, e.sub*8 + 8), b.cvec)), 6)
        |           AS adc
        |  FROM q CROSS JOIN enc e
        |  JOIN cb b ON b.sub = e.sub AND b.cw = e.cw
        |  WHERE e.vec_id <> q.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, adc, rnk FROM (
        |  SELECT query_id, neighbor_id, adc,
        |         row_number() OVER (PARTITION BY query_id
        |             ORDER BY adc, neighbor_id) AS rnk
        |  FROM adc) r
        |WHERE rnk <= 6 ORDER BY query_id, rnk""".stripMargin,

    // full span-dedup replica: same window enumeration (stride 1, 1-based
    // inclusive slices), same md5-of-joined-window hash, same planted
    // every-10th-doc copies
    "c27_span_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |      FROM corpus WHERE length(trim(text)) > 0),
        |s AS (SELECT doc_id, t, unnest(range(0, len(t) - 16 + 1)) AS pos
        |      FROM d WHERE len(t) >= 16),
        |h AS (SELECT doc_id, pos,
        |             md5(array_to_string(list_slice(t, pos + 1, pos + 16), ' '))
        |               AS h
        |      FROM s),
        |c AS (SELECT h, count(*) AS n_occ FROM h GROUP BY 1)
        |SELECT doc_id AS id, count(*) AS n_spans,
        |       CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dup_spans
        |FROM h JOIN c USING (h)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // full removal replica: same windows/hashes as c27, canonical = min
    // over the doc·2^31+pos encoding, positions of non-canonical
    // duplicate occurrences dropped, kept tokens re-joined in order
    "c29_span_removal" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |      FROM corpus WHERE length(trim(text)) > 0),
        |s AS (SELECT doc_id, t, unnest(range(0, len(t) - 16 + 1)) AS pos
        |      FROM d WHERE len(t) >= 16),
        |h AS (SELECT doc_id, pos,
        |             md5(array_to_string(list_slice(t, pos + 1, pos + 16), ' '))
        |               AS h
        |      FROM s),
        |m AS (SELECT doc_id, pos FROM (
        |        SELECT doc_id, pos,
        |               count(*) OVER (PARTITION BY h) AS n_occ,
        |               min(doc_id * 2147483648 + pos) OVER (PARTITION BY h)
        |                 AS canon
        |        FROM h) x
        |      WHERE n_occ > 1 AND doc_id * 2147483648 + pos <> canon),
        |rem AS (SELECT DISTINCT doc_id, pos + u.i AS tp
        |        FROM m, (SELECT unnest(range(0, 16)) AS i) u),
        |tokp AS (SELECT doc_id, unnest(range(0, len(t))) AS tp, t FROM d),
        |kept AS (SELECT k.doc_id, k.tp, k.t[k.tp + 1] AS tok
        |         FROM tokp k ANTI JOIN rem r
        |           ON k.doc_id = r.doc_id AND k.tp = r.tp),
        |reb AS (SELECT doc_id, count(*) AS kept_tokens,
        |               md5(string_agg(tok, ' ' ORDER BY tp)) AS clean_md5
        |        FROM kept GROUP BY 1)
        |SELECT id, n_tokens, kept_tokens, clean_md5 FROM (
        |  SELECT d.doc_id AS id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        |         coalesce(reb.kept_tokens, 0) AS kept_tokens,
        |         coalesce(reb.clean_md5, md5('')) AS clean_md5
        |  FROM d LEFT JOIN reb USING (doc_id)) x
        |WHERE n_tokens + kept_tokens >= 0
        |ORDER BY 1""".stripMargin,

    // the c29 replica WITHOUT the canonical exemption: every position
    // covered by any duplicated window drops (strip, not dedup)
    "c76c_extent_strip" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |      FROM corpus WHERE length(trim(text)) > 0),
        |s AS (SELECT doc_id, t, unnest(range(0, len(t) - 16 + 1)) AS pos
        |      FROM d WHERE len(t) >= 16),
        |h AS (SELECT doc_id, pos,
        |             md5(array_to_string(list_slice(t, pos + 1, pos + 16), ' '))
        |               AS h
        |      FROM s),
        |m AS (SELECT doc_id, pos FROM (
        |        SELECT doc_id, pos,
        |               count(*) OVER (PARTITION BY h) AS n_occ
        |        FROM h) x
        |      WHERE n_occ > 1),
        |rem AS (SELECT DISTINCT doc_id, pos + u.i AS tp
        |        FROM m, (SELECT unnest(range(0, 16)) AS i) u),
        |tokp AS (SELECT doc_id, unnest(range(0, len(t))) AS tp, t FROM d),
        |kept AS (SELECT k.doc_id, k.tp, k.t[k.tp + 1] AS tok
        |         FROM tokp k ANTI JOIN rem r
        |           ON k.doc_id = r.doc_id AND k.tp = r.tp),
        |reb AS (SELECT doc_id, count(*) AS kept_tokens,
        |               md5(string_agg(tok, ' ' ORDER BY tp)) AS clean_md5
        |        FROM kept GROUP BY 1)
        |SELECT id, n_tokens, kept_tokens, clean_md5 FROM (
        |  SELECT d.doc_id AS id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        |         coalesce(reb.kept_tokens, 0) AS kept_tokens,
        |         coalesce(reb.clean_md5, md5('')) AS clean_md5
        |  FROM d LEFT JOIN reb USING (doc_id)) x
        |WHERE n_tokens + kept_tokens >= 0
        |ORDER BY 1""".stripMargin,

    // c27's replica cross-joined with the level ladder: per (level,
    // hash) counts, long-form per (doc, level) report
    "c76_multiscale_spans" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |      FROM corpus WHERE length(trim(text)) > 0),
        |lvl AS (SELECT unnest([8, 16, 32]) AS w),
        |s AS (SELECT doc_id, t, w, unnest(range(0, len(t) - w + 1)) AS pos
        |      FROM d, lvl WHERE len(t) >= w),
        |h AS (SELECT doc_id, w, pos,
        |             md5(array_to_string(list_slice(t, pos + 1, pos + w), ' '))
        |               AS h
        |      FROM s),
        |c AS (SELECT w, h, count(*) AS n_occ FROM h GROUP BY 1, 2)
        |SELECT doc_id AS id, w, count(*) AS n_spans,
        |       CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dup_spans
        |FROM h JOIN c USING (w, h)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the c76c strip replica PLUS the canonical exemption: extents
    // recovered by the token-coverage-islands algorithm (not the
    // engine's interval sweep), content-hashed with the same md5 slice,
    // canonical elected by the same single-BIGINT min-enc rule as c29;
    // only non-canonical extents' positions drop
    "c84_canonical_extent_strip" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |      FROM corpus WHERE length(trim(text)) > 0),
        |s AS (SELECT doc_id, t, unnest(range(0, len(t) - 16 + 1)) AS pos
        |      FROM d WHERE len(t) >= 16),
        |h AS (SELECT doc_id, pos,
        |             md5(array_to_string(list_slice(t, pos + 1, pos + 16), ' '))
        |               AS h
        |      FROM s),
        |c AS (SELECT h FROM (
        |        SELECT h, count(*) AS n_occ FROM h GROUP BY 1) x
        |      WHERE n_occ > 1),
        |f AS (SELECT doc_id, pos FROM h JOIN c USING (h)),
        |cov0 AS (SELECT doc_id, unnest(range(pos, pos + 16)) AS tp FROM f),
        |cov AS (SELECT DISTINCT doc_id, tp FROM cov0),
        |isl AS (SELECT doc_id, tp,
        |               tp - row_number()
        |                      OVER (PARTITION BY doc_id ORDER BY tp) AS grp
        |        FROM cov),
        |ext AS (SELECT doc_id, min(tp) AS st, max(tp) AS en
        |        FROM isl GROUP BY doc_id, grp),
        |eh AS (SELECT e.doc_id, e.st, e.en,
        |              md5(array_to_string(
        |                list_slice(d.t, e.st + 1, e.en + 1), ' ')) AS ehash
        |       FROM ext e JOIN d USING (doc_id)),
        |strip AS (SELECT doc_id, st, en FROM (
        |            SELECT doc_id, st, en,
        |                   doc_id * 2147483648 + st AS enc,
        |                   min(doc_id * 2147483648 + st)
        |                     OVER (PARTITION BY ehash) AS canon
        |            FROM eh) x
        |          WHERE enc <> canon),
        |rem AS (SELECT doc_id, unnest(range(st, en + 1)) AS tp FROM strip),
        |tokp AS (SELECT doc_id, unnest(range(0, len(t))) AS tp, t FROM d),
        |kept AS (SELECT k.doc_id, k.tp, k.t[k.tp + 1] AS tok
        |         FROM tokp k ANTI JOIN rem r
        |           ON k.doc_id = r.doc_id AND k.tp = r.tp),
        |reb AS (SELECT doc_id, count(*) AS kept_tokens,
        |               md5(string_agg(tok, ' ' ORDER BY tp)) AS clean_md5
        |        FROM kept GROUP BY 1)
        |SELECT id, n_tokens, kept_tokens, clean_md5 FROM (
        |  SELECT d.doc_id AS id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        |         coalesce(reb.kept_tokens, 0) AS kept_tokens,
        |         coalesce(reb.clean_md5, md5('')) AS clean_md5
        |  FROM d LEFT JOIN reb USING (doc_id)) x
        |WHERE n_tokens + kept_tokens >= 0
        |ORDER BY 1""".stripMargin,

    // the c84 replica with the C36 quality formula deciding each
    // cluster: degraded originals vs clean +1e6 copies, election by
    // (q DESC, enc ASC) row_number — the quality rule must beat min-enc
    "c87_quality_extent_strip" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 10 = 0
        |              THEN text || ' 00 11 22 !!! ???' ELSE text END AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |qual AS (
        |  SELECT doc_id,
        |round(greatest(0.0, least(1.0,
        |  (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.6
        |  + (CASE WHEN (length(regexp_replace(text, '\s', '', 'g'))
        |       / CAST(greatest(
        |           CASE WHEN length(trim(text)) = 0 THEN 0
        |                ELSE len(regexp_split_to_array(trim(text), '\s+')) END,
        |           1) AS DOUBLE))
        |       BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4
        |  - (length(regexp_replace(text, '[^0-9]', '', 'g'))
        |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
        |  - ((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
        |)), 4) AS q
        |  FROM corpus),
        |d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |      FROM corpus WHERE length(trim(text)) > 0),
        |s AS (SELECT doc_id, t, unnest(range(0, len(t) - 16 + 1)) AS pos
        |      FROM d WHERE len(t) >= 16),
        |h AS (SELECT doc_id, pos,
        |             md5(array_to_string(list_slice(t, pos + 1, pos + 16), ' '))
        |               AS h
        |      FROM s),
        |c AS (SELECT h FROM (
        |        SELECT h, count(*) AS n_occ FROM h GROUP BY 1) x
        |      WHERE n_occ > 1),
        |f AS (SELECT doc_id, pos FROM h JOIN c USING (h)),
        |cov0 AS (SELECT doc_id, unnest(range(pos, pos + 16)) AS tp FROM f),
        |cov AS (SELECT DISTINCT doc_id, tp FROM cov0),
        |isl AS (SELECT doc_id, tp,
        |               tp - row_number()
        |                      OVER (PARTITION BY doc_id ORDER BY tp) AS grp
        |        FROM cov),
        |ext AS (SELECT doc_id, min(tp) AS st, max(tp) AS en
        |        FROM isl GROUP BY doc_id, grp),
        |eh AS (SELECT e.doc_id, e.st, e.en, q.q,
        |              md5(array_to_string(
        |                list_slice(d.t, e.st + 1, e.en + 1), ' ')) AS ehash
        |       FROM ext e JOIN d USING (doc_id) JOIN qual q USING (doc_id)),
        |strip AS (SELECT doc_id, st, en FROM (
        |            SELECT doc_id, st, en,
        |                   row_number() OVER (PARTITION BY ehash
        |                     ORDER BY q DESC,
        |                              doc_id * 2147483648 + st ASC) AS rn
        |            FROM eh) x
        |          WHERE rn > 1),
        |rem AS (SELECT doc_id, unnest(range(st, en + 1)) AS tp FROM strip),
        |tokp AS (SELECT doc_id, unnest(range(0, len(t))) AS tp, t FROM d),
        |kept AS (SELECT k.doc_id, k.tp, k.t[k.tp + 1] AS tok
        |         FROM tokp k ANTI JOIN rem r
        |           ON k.doc_id = r.doc_id AND k.tp = r.tp),
        |reb AS (SELECT doc_id, count(*) AS kept_tokens,
        |               md5(string_agg(tok, ' ' ORDER BY tp)) AS clean_md5
        |        FROM kept GROUP BY 1)
        |SELECT id, n_tokens, kept_tokens, clean_md5 FROM (
        |  SELECT d.doc_id AS id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        |         coalesce(reb.kept_tokens, 0) AS kept_tokens,
        |         coalesce(reb.clean_md5, md5('')) AS clean_md5
        |  FROM d LEFT JOIN reb USING (doc_id)) x
        |WHERE n_tokens + kept_tokens >= 0
        |ORDER BY 1""".stripMargin,

    // token-coverage islands replica of the interval-sweep engine: each
    // firing window explodes to its covered token positions, distinct
    // coverage per (doc, level), maximal consecutive runs recovered by
    // the pos - row_number() grouping — a genuinely different merge
    // algorithm that must agree extent-for-extent
    "c76b_span_extents" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |      FROM corpus WHERE length(trim(text)) > 0),
        |lvl AS (SELECT unnest([8, 16, 32]) AS w),
        |s AS (SELECT doc_id, t, w, unnest(range(0, len(t) - w + 1)) AS pos
        |      FROM d, lvl WHERE len(t) >= w),
        |h AS (SELECT doc_id, w, pos,
        |             md5(array_to_string(list_slice(t, pos + 1, pos + w), ' '))
        |               AS h
        |      FROM s),
        |c AS (SELECT w, h FROM (
        |        SELECT w, h, count(*) AS n_occ FROM h GROUP BY 1, 2) x
        |      WHERE n_occ > 1),
        |f AS (SELECT doc_id, w, pos FROM h JOIN c USING (w, h)),
        |cov0 AS (SELECT doc_id, w, unnest(range(pos, pos + w)) AS tp FROM f),
        |cov AS (SELECT DISTINCT doc_id, w, tp FROM cov0),
        |isl AS (SELECT doc_id, w, tp,
        |               tp - row_number()
        |                      OVER (PARTITION BY doc_id, w ORDER BY tp) AS grp
        |        FROM cov)
        |SELECT doc_id AS id, w, min(tp) AS start_tok, max(tp) AS end_tok,
        |       max(tp) - min(tp) + 1 AS ext_len
        |FROM isl GROUP BY doc_id, w, grp
        |ORDER BY 1, 2, 3""".stripMargin,

    // byte-level replica of NormalizeTextExpr: DuckDB's nfc_normalize is
    // the same Unicode NFC; planted chars built with chr() so the SQL
    // stays ASCII-safe through the JSON hand-off
    "c32_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |         '  a' || chr(769) || chr(9) || 'b ' || text ||
        |         ' x' || chr(7) || 'y  cafe' || chr(769) || ' ' ||
        |         chr(233) || '  ' AS r
        |  FROM documents),
        |norm AS (
        |  SELECT doc_id,
        |         trim(regexp_replace(regexp_replace(nfc_normalize(r),
        |           '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS n
        |  FROM raw)
        |SELECT doc_id, md5(n) AS norm_md5, CAST(length(n) AS INT) AS n_chars
        |FROM norm ORDER BY doc_id""".stripMargin,

    // full SemDeDup replica: same md5-ordered centroid init as c19, same
    // argmax (tie → greatest list), pairwise cosine within cluster,
    // min-id keep rule
    "c31_semdedup" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, embedding FROM embeddings
        |  WHERE vec_id % 5 = 0),
        |cent AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
        |                            CAST(vec_id AS VARCHAR)) - 1 AS list,
        |         embedding
        |  FROM (SELECT vec_id, embedding FROM corpus
        |        ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
        |        LIMIT 8)),
        |scored AS (
        |  SELECT e.vec_id, c.list,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                CAST(c.embedding AS DOUBLE[])) AS cos
        |  FROM corpus e CROSS JOIN cent c),
        |assigned AS (
        |  SELECT s.vec_id, s.list, e.embedding FROM (
        |    SELECT vec_id, list,
        |           row_number() OVER (PARTITION BY vec_id
        |               ORDER BY cos DESC, list DESC) AS rn
        |    FROM scored) s JOIN corpus e USING (vec_id)
        |  WHERE rn = 1),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM assigned a JOIN assigned b
        |    ON a.list = b.list AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])) >= 0.9)
        |SELECT a.list, count(*) AS n_vecs,
        |       CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_dropped,
        |       CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN a.vec_id
        |                ELSE 0 END) AS BIGINT) AS dropped_id_sum
        |FROM assigned a LEFT JOIN dropped d USING (vec_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // full LM replica: same tokenization (c8's contract), same counts,
    // same add-α smoothing formula — training AND scoring both replayed
    "c30_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |uni AS (
        |  SELECT w, CAST(count(*) AS DOUBLE) AS cu
        |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
        |pairs AS (
        |  SELECT doc_id, p.w1 AS w1, p.bg AS bg
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(range(1, len(t)),
        |            i -> {'w1': t[i], 'bg': t[i] || ' ' || t[i + 1]})) AS p
        |        FROM toks WHERE len(t) >= 2)),
        |bi AS (SELECT bg, CAST(count(*) AS DOUBLE) AS cb
        |       FROM pairs GROUP BY 1),
        |scored AS (
        |  SELECT p.doc_id,
        |         ln((b.cb + 0.5) / (u.cu + 0.5 * (s.v + 1.0))) AS lp
        |  FROM pairs p JOIN bi b USING (bg) JOIN uni u ON p.w1 = u.w
        |  CROSS JOIN stats s),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         exp(-sum(lp) / count(*)) AS ppl
        |  FROM scored GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
        |       round(a.ppl, 3) AS ppl, a.ppl <= 30.5 AS keep
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "d9_enriched_segments" ->
      """SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |       c.c_mktsegment AS segment, count(*) AS n_events,
        |       round(sum(e.value), 2) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "d1_stream_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |       event_type, count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // identical verdict formula, identical null contract (a null under
    // any check quarantines)
    "d16_quality_gate" ->
      """SELECT NOT coalesce(user_id IS NOT NULL
        |           AND value >= 0 AND value <= 300
        |           AND event_type IN ('click', 'view', 'purchase',
        |                              'signup'), false) AS quarantined,
        |       event_type, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // identical 1-PRECEDING frame, identical null contract (first two
    // of a type, or zero deviation, score null)
    "d15_zscore" ->
      """SELECT event_id, event_type,
        |       CASE WHEN sd > 0 THEN round((value - mu) / sd, 4) END AS z
        |FROM (
        |  SELECT event_id, event_type, value,
        |         avg(value) OVER w AS mu,
        |         stddev_samp(value) OVER w AS sd
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |) t ORDER BY event_id""".stripMargin,

    // same hourly counts, same rank window, same tie-break (n desc, type)
    "d14_trending" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT hour, event_type, n,
        |         row_number() OVER (PARTITION BY hour
        |             ORDER BY n DESC, event_type) AS rnk
        |  FROM c)
        |SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
        |       rnk, event_type, n
        |FROM r WHERE rnk <= 3 ORDER BY hour, rnk""".stripMargin,

    "d2_sessionize" ->
      """SELECT user_id, session_idx, count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value,
        |       min(sec) AS start_sec, max(sec) AS end_sec
        |FROM (
        |  SELECT user_id, event_id, value, sec,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id
        |             ORDER BY sec, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_idx
        |  FROM (
        |    SELECT user_id, event_id, value, sec,
        |           CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
        |                THEN 1 ELSE 0 END AS is_new
        |    FROM (
        |      SELECT user_id, event_id, value,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |             lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
        |               OVER (PARTITION BY user_id
        |                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
        |               AS prev_sec
        |      FROM events) a) b) c
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
