package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CatalogTables, SchemaCsv}

class SourcesSpec extends AnyFunSuite with SparkSpec {

  test("registerExternal: SQL over discovered partitions, pruning applies") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_catalog").toString
    val df = Seq((1L, "x", 2019), (2L, "y", 2019), (3L, "z", 2020))
      .toDF("id", "k", "yr")
    SchemaCsv.writePartitioned(df, dir, Seq("yr"))

    CatalogTables.registerExternal(spark, "graft_ext_spec", dir, Seq("yr"))
    val out = spark.sql(
      "SELECT count(*) FROM graft_ext_spec WHERE yr = 2019").head.getLong(0)
    assert(out === 2L)

    // partition pruning: the 2020 filter must land in PartitionFilters,
    // and only one partition directory is read
    val plan = spark.sql("SELECT id FROM graft_ext_spec WHERE yr = 2020")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(yr"), plan)

    // DROP + CREATE is idempotent, and new partitions are re-discovered
    SchemaCsv.writePartitioned(
      Seq((4L, "w", 2021)).toDF("id", "k", "yr"), dir, Seq("yr"), mode = "append")
    CatalogTables.registerExternal(spark, "graft_ext_spec", dir, Seq("yr"))
    assert(spark.sql("SELECT count(*) FROM graft_ext_spec").head.getLong(0) === 4L)
    // external table: dropping never deletes data
    spark.sql("DROP TABLE graft_ext_spec")
    assert(SchemaCsv.readPartitioned(spark, dir).count() === 4L)
  }

  test("analyze: column stats flip a filtered-dim join from SMJ to broadcast") {
    val s = spark
    import s.implicits._
    // dim: file size well over the (scaled) broadcast threshold, but a
    // selective equality keeps only ~0.1% of it; fact joins on the key
    // incompressible pad: the cold-catalog size estimate derives from
    // the parquet FILE size; a constant pad compresses to nothing and
    // the dim would broadcast even without stats
    val dim = s.range(100000).select($"id".as("k"),
      ($"id" % 1000).as("grp"), md5($"id".cast("string")).as("pad"))
    val fact = s.range(200000).select(($"id" % 100000).as("k"),
      $"id".as("v"))
    val dimDir = Files.createTempDirectory("graft_cbo_dim").toString
    val factDir = Files.createTempDirectory("graft_cbo_fact").toString
    dim.write.mode("overwrite").parquet(dimDir)
    fact.write.mode("overwrite").parquet(factDir)
    CatalogTables.registerExternal(spark, "graft_cbo_dim", dimDir)
    CatalogTables.registerExternal(spark, "graft_cbo_fact", factDir)
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "65536")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def planOf = spark.sql(
        """SELECT f.k, f.v FROM graft_cbo_fact f
          |JOIN graft_cbo_dim d ON f.k = d.k WHERE d.grp = 7""".stripMargin)
        .queryExecution.executedPlan.toString
      // cold catalog: the filtered dim is estimated at ~file size → no
      // broadcast (this assertion is what makes the flip meaningful)
      assert(planOf.contains("SortMergeJoin"),
        s"expected SMJ before stats:\n${planOf.take(600)}")
      CatalogTables.analyze(spark, "graft_cbo_dim", Seq("k", "grp"))
      CatalogTables.analyze(spark, "graft_cbo_fact", Seq("k"))
      // with rowCount + NDV(grp), the CBO estimates grp=7 at ~rows/1000
      // → far under the threshold → broadcast side flips
      assert(planOf.contains("BroadcastHashJoin"),
        s"stats did not flip the join to broadcast:\n${planOf.take(600)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without any shuffle exchange") {
    val li = Tables(spark, sfDir(), "lineitem")
      .select("l_orderkey", "l_quantity")
    val ords = Tables(spark, sfDir(), "orders")
      .select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    CatalogTables.writeBucketed(li, "graft_li_bkt", "l_orderkey", 8)
    CatalogTables.writeBucketed(ords, "graft_ord_bkt", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_li_bkt")
        .join(spark.table("graft_ord_bkt"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      // and it still computes the right thing
      val expected = li.join(ords, "l_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_li_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bkt")
    }
  }

  test("profile: single-pass stats handle nulls and constant columns") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")))
      .toDF("id", "tag")
    val prof = graft.operators.Profile.profile(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(prof("id") === ((3L, 0L, 3L, "1")))
    assert(prof("tag") === ((2L, 1L, 1L, "a")))
    // one scan: the plan must contain exactly one relation read
    val plan = graft.operators.Profile.profile(df, Seq("id", "tag"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), "profiler must not self-join per column")
  }

  test("streaming censo ingest equals the batch transform row-for-row") {
    import graft.pipeline.CensoPipeline
    val li = Tables(spark, sfDir(), "lineitem").limit(500)
    val censo = CensoPipeline.censoLike(li)
    val dir = Files.createTempDirectory("graft_censo_stream").toString
    censo.write.mode("overwrite")
      .options(Map("header" -> "true", "delimiter" -> "|")).csv(dir)
    // schema as the CSV presents: all strings (censoLike emits strings)
    val schema = org.apache.spark.sql.types.StructType(censo.schema.fields
      .map(f => f.copy(dataType = org.apache.spark.sql.types.StringType)))

    val streamed = CensoPipeline.run(
      SchemaCsv.readStream(spark, dir, schema), year = 2020)
    val q = streamed.writeStream.format("memory").queryName("censo_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("censo_stream")

    val batch = CensoPipeline.run(
      SchemaCsv.read(spark, dir, schema), year = 2020)
    assert(got.count() === 500L)
    assert(got.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(got).count() === 0L)
  }

  test("a30: ingest ledger is incremental, idempotent, and refuses a " +
       "non-partition column") {
    import graft.sources.IngestLedger
    val p = Tables.scratch("ledger_spec")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(p).toUri,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    val src = Tables(spark, sfDir(), "orders")
      .withColumn("yr", year(col("o_orderdate")))
    src.where(col("yr") === 1995)
      .write.mode("overwrite").partitionBy("yr").parquet(p)
    val added = IngestLedger.ingestMissing(spark, src, p, "yr")
    assert(added.nonEmpty && !added.contains("1995"))
    assert(IngestLedger.ingestMissing(spark, src, p, "yr").isEmpty)
    assert(spark.read.parquet(p).count() === src.count())
    // high-cardinality column ⇒ loud failure, not a driver OOM
    val e = intercept[IllegalArgumentException] {
      IngestLedger.missingPartitions(spark, p, src, "o_orderkey",
        maxPartitions = 10)
    }
    assert(e.getMessage.contains("not a partition column"))
  }

  test("readPermissive captures malformed rows instead of failing the job") {
    val dir = Files.createTempDirectory("graft_permissive").toString
    Files.writeString(java.nio.file.Paths.get(dir, "in.csv"),
      Seq("id|qty|name",
        "1|10|ok",
        "2|not_a_number|bad",
        "3|30|ok2").mkString("\n"))
    val schema = SchemaCsv.schemaFromJson(
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":{}},
        |{"name":"qty","type":"integer","nullable":true,"metadata":{}},
        |{"name":"name","type":"string","nullable":true,"metadata":{}}]}""".stripMargin)
    // corrupt-only projections are disallowed straight off raw files;
    // parse once, then quarantine (what a real pipeline does anyway)
    val out = SchemaCsv.readPermissive(spark, dir, schema).cache()
    assert(out.count() === 3L)
    val bad = out.where(col("_corrupt_record").isNotNull)
    assert(bad.count() === 1L)
    assert(bad.head.getAs[String]("_corrupt_record").contains("not_a_number"))
    val clean = out.where(col("_corrupt_record").isNull).drop("_corrupt_record")
    assert(clean.agg(sum("qty")).head.getLong(0) === 40L)
  }
}
