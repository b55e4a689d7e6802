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
