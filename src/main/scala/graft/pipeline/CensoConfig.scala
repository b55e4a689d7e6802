package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, StructType}

/** Loader for the reference pipeline's actual configuration artifacts:
  *
  *   - `maps.json` (/root/reference/etl/censo_escolar/transform/maps.json):
  *     72 column dictionaries `{column -> {code -> label}}` driving the
  *     categorical recodes (transform.py:104-110);
  *   - `schemas/<table>_schema.json`: PySpark `StructType.jsonValue()`
  *     dumps (241 fields for escolas) consumed by the schema-driven CSV
  *     reads (transform.py:53-65).
  *
  * Jackson comes off Spark's own classpath — no extra dependency. Config
  * parsing happens once on the driver; nothing here touches executors.
  */
object CensoConfig {

  /** Parse a maps.json document: {column -> {code -> label}}. */
  def parseMaps(json: String): Map[String, Map[String, String]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readValue(json, classOf[java.util.Map[String, Object]])
    root.asScala.map { case (column, dict) =>
      column -> dict.asInstanceOf[java.util.Map[String, Object]].asScala
        .map { case (code, label) => code -> String.valueOf(label) }
        .toMap
    }.toMap
  }

  def loadMaps(path: String): Map[String, Map[String, String]] =
    parseMaps(new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8))

  /** Rebuild a recode dictionary from a raw lookup table (the CSVs under
    * transform/tables/ — the inputs the reference's maps.ipynb bakes into
    * maps.json offline). First column = code, second = label;
    * rows with an empty code are dropped. `floatKeys = true` reproduces
    * the notebook's pandas artifact of float-formatted codes
    * ("30" → "30.0") — with it, the rebuilt CO_LINGUA_INDIGENA dictionary
    * is entry-for-entry identical to the shipped maps.json (spec-locked).
    * Spark parses the CSV (quoted labels contain commas); the collect is
    * a KB-sized dictionary.
    */
  def loadLookupCsv(spark: org.apache.spark.sql.SparkSession, path: String,
                    floatKeys: Boolean = true): Map[String, String] =
    spark.read
      .options(Map("header" -> "true", "quote" -> "\""))
      .csv(path)
      .collect()
      .iterator
      .flatMap { r =>
        val code = Option(r.getString(0)).map(_.trim).filter(_.nonEmpty)
        val label = Option(r.getString(1)).getOrElse("")
        code.flatMap { c =>
          if (!floatKeys) Some(c -> label)
          else scala.util.Try(
            "%.1f".formatLocal(java.util.Locale.ROOT, c.toDouble)).toOption
            .map(_ -> label)
        }
      }
      .toMap

  /** Parse a StructType JSON schema (PySpark `StructType.jsonValue()`). */
  def parseSchema(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  def loadSchema(path: String): StructType =
    parseSchema(new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8))
}
