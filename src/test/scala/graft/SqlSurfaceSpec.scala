package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExpressions

/** The SQL surface of the engine's custom expressions (VERDICT r6 ask #5):
  * every graft function a Column-API user reaches must be reachable from
  * `spark.sql` too — the reference's user is a SQL-first one
  * (load_external_tables.sql's SELECT surface). GraftExtensions registers
  * them in the session FunctionRegistry at build time; these cases lock
  * SQL ≡ Column API value-for-value, so the b48 oracle gate (which checks
  * jaro_winkler + normalize_text against DuckDB) extends to the functions
  * DuckDB cannot phrase.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    val df = spark.read.parquet(s"${sfDir()}/documents.parquet")
      .select(col("doc_id"), col("text"),
        split(col("text"), "\\s+").as("toks"))
      .limit(200)
    df.createOrReplaceTempView("sql_docs")
    df
  }

  private def assertSame(sql: String, colApi: org.apache.spark.sql.DataFrame,
                         sortCol: String = "doc_id"): Unit = {
    val a = spark.sql(sql).orderBy(sortCol).collect().toSeq
    val b = colApi.orderBy(sortCol).collect().toSeq
    assert(a == b)
  }

  test("sql surface: minhash_signature / char_ngram_hashes / span_md5s / " +
       "simhash64 / shingle_hashes match the Column API value-for-value") {
    val d = docs
    assertSame(
      """SELECT doc_id,
        |       minhash_signature(toks, 3, 16) AS mh,
        |       char_ngram_hashes(text, 4) AS ng,
        |       span_md5s(toks, 8) AS spans,
        |       simhash64(toks) AS sh,
        |       shingle_hashes(toks, 3) AS shg
        |FROM sql_docs""".stripMargin,
      d.select(col("doc_id"),
        GraftExpressions.minhashSignature(col("toks"), 3, 16).as("mh"),
        GraftExpressions.charNgramHashes(col("text"), 4).as("ng"),
        GraftExpressions.spanMd5s(col("toks"), 8).as("spans"),
        GraftExpressions.simhash64(col("toks")).as("sh"),
        GraftExpressions.shingleHashes(col("toks"), 3).as("shg")))
  }

  test("sql surface: zvalue with a literal boundary matrix matches the " +
       "Column API (matrix rides the plan as one reference object)") {
    docs
    val boundaries = Array(Array(10.0, 20.0, 30.0), Array(0.25, 0.5, 0.75))
    assertSame(
      """SELECT doc_id,
        |       zvalue(array(cast(length(text) % 40 AS double),
        |                    cast(doc_id % 4 AS double) / 4.0),
        |              array(array(10.0, 20.0, 30.0),
        |                    array(0.25, 0.5, 0.75)), 2) AS z
        |FROM sql_docs""".stripMargin,
      spark.table("sql_docs").select(col("doc_id"),
        GraftExpressions.zValue(
          array((length(col("text")) % 40).cast("double"),
            (col("doc_id") % 4).cast("double") / 4.0),
          boundaries, 2).as("z")))
  }

  test("sql surface: plane_sign_buckets literal planes match Column API") {
    val planes = Array(Array(1.0, -0.5, 0.25), Array(-1.0, 0.75, 0.5))
    val df = spark.read.parquet(s"${sfDir()}/embeddings.parquet")
      .select(col("vec_id"), slice(col("embedding"), 1, 3).as("v3")).limit(50)
    df.createOrReplaceTempView("sql_vecs")
    val a = spark.sql(
      """SELECT vec_id,
        |       plane_sign_buckets(v3,
        |         array(array(1.0, -0.5, 0.25), array(-1.0, 0.75, 0.5)),
        |         2, 1) AS b
        |FROM sql_vecs""".stripMargin).orderBy("vec_id").collect().toSeq
    val b = df.select(col("vec_id"),
        GraftExpressions.planeSignBuckets(col("v3"), planes, 2, 1).as("b"))
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("sql surface: jl_project derives the sign matrix from (k, d) and " +
       "int_cell_assign takes a literal centroid matrix — both ≡ Column API") {
    val df = spark.read.parquet(s"${sfDir()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(50)
    df.createOrReplaceTempView("sql_jl_vecs")
    val signs = GraftExpressions.jlSigns(8, 64)
    val a = spark.sql(
      """SELECT vec_id, jl_project(embedding, 8, 64) AS code
        |FROM sql_jl_vecs""".stripMargin).orderBy("vec_id").collect().toSeq
    val b = df.select(col("vec_id"),
        GraftExpressions.jlProject(col("embedding"), signs).as("code"))
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
    val cents = Array(Array(0L, 0L), Array(1000L, -1000L))
    val a2 = spark.sql(
      """SELECT vec_id,
        |       int_cell_assign(slice(jl_project(embedding, 8, 64), 1, 2),
        |         array(array(0L, 0L), array(1000L, -1000L))) AS cell
        |FROM sql_jl_vecs""".stripMargin).orderBy("vec_id").collect().toSeq
    val b2 = df.select(col("vec_id"),
        GraftExpressions.intCellAssign(
          slice(GraftExpressions.jlProject(col("embedding"), signs), 1, 2),
          cents).as("cell"))
      .orderBy("vec_id").collect().toSeq
    assert(a2 == b2)
  }

  test("b48 engine side is a spark.sql string and returns rows with the " +
       "recomposed NFC marker") {
    val out = SparkEntry.queries("b48_sql_surface")(spark, sfDir())
      .collect()
    assert(out.nonEmpty)
    // every norm ends with the PRECOMPOSED é (U+00E9): NFC recomposition
    // actually happened and the planted double space collapsed
    assert(out.forall(_.getAs[String]("norm").endsWith(" \u00e9")))
    assert(out.forall(r => !r.getAs[String]("norm").contains("  ")))
    assert(out.forall(r => { val n = r.getAs[String]("norm")
      n == n.trim && !n.contains("\u0301") }))
  }
}
