package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The cross-modal verdict building blocks shared by the batch c123
  * query, the c130 versioned publish, and the D48 streaming
  * maintenance — one implementation of the link tables, the cross-doc
  * flag rule, and the verdict join, so stream ≡ batch holds by
  * construction wherever the pair inputs agree.
  */
object CrossModal {

  /** The image doc↔media link table over the fixture's id scheme:
    * every doc owns its hero image (media_id = doc_id); ≡5 mod 10
    * docs embed the RE-ENCODE of doc (d−5)'s image (+2e6); ≡7 mod 10
    * the BRIGHTNESS-SHIFTED variant of doc (d−7)'s (+3e6). Every arm
    * is guarded by base-doc existence.
    */
  def imageLinks(ids: DataFrame): DataFrame =
    ids.select(col("doc_id"), col("doc_id").as("media_id"))
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

  /** The audio doc↔media link table: every ≡0 mod 4 doc narrates its
    * own clip; a ≡1 mod 4 doc whose predecessor is ≡0 mod 28 embeds
    * that predecessor's gain-shifted RE-MASTER (+3e6).
    */
  def audioLinks(ids: DataFrame): DataFrame =
    ids.where(pmod(col("doc_id"), lit(4)) === 0)
      .select(col("doc_id"), col("doc_id").as("media_id"))
      .unionByName(ids.where(pmod(col("doc_id"), lit(4)) === 1)
        .where(pmod(col("doc_id") - 1, lit(28)) === 0)
        .join(ids.select(col("doc_id").as("__b")),
          col("doc_id") - 1 === col("__b"), "left_semi")
        .select(col("doc_id"),
          (col("doc_id") - 1 + 3000000L).as("media_id")))

  /** Docs flagged dup in one modality: a doc is flagged iff one of its
    * media pairs with ANOTHER doc's media (a doc pairing with itself
    * through its own two media is not a dup). Result-sized — the
    * join-backs ride AQE on the result-sized pair set.
    */
  def crossDocDups(pairs: DataFrame, own: DataFrame): DataFrame = {
    val xd = pairs
      .join(own.select(col("doc_id").as("__da"),
        col("media_id").as("id_a")), "id_a")
      .join(own.select(col("doc_id").as("__db"),
        col("media_id").as("id_b")), "id_b")
      .where(col("__da") =!= col("__db"))
    xd.select(col("__da").as("doc_id"))
      .unionByName(xd.select(col("__db").as("doc_id"))).distinct()
  }

  /** The three-way verdict: one row per flagged doc, modality booleans
    * + a composed verdict string (concat_ws skips the null arms
    * identically in Spark and DuckDB).
    */
  def verdictTable(textDup: DataFrame, imgDup: DataFrame,
                   audDup: DataFrame): DataFrame = {
    val alld = textDup.unionByName(imgDup).unionByName(audDup)
      .distinct()
    alld
      .join(textDup.withColumn("__t", lit(true)), Seq("doc_id"), "left")
      .join(imgDup.withColumn("__i", lit(true)), Seq("doc_id"), "left")
      .join(audDup.withColumn("__a", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__t"), lit(false)).as("text_dup"),
        coalesce(col("__i"), lit(false)).as("image_dup"),
        coalesce(col("__a"), lit(false)).as("audio_dup"))
      .withColumn("verdict", concat_ws("+",
        when(col("text_dup"), lit("text")),
        when(col("image_dup"), lit("image")),
        when(col("audio_dup"), lit("audio"))))
  }
}
