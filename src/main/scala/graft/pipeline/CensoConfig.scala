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

  /** Parse a StructType JSON schema (PySpark `StructType.jsonValue()`). */
  def parseSchema(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  def loadSchema(path: String): StructType =
    parseSchema(new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8))
}
