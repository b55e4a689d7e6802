package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: media payloads ride through the engine as
  * opaque `binary` columns with a typed metadata struct alongside, so
  * Catalyst prunes/filters on metadata WITHOUT ever deserializing payloads.
  *
  * The decode/feature step is the only place a codec runs; it is
  * mapPartitions-batched so a real codec (libjpeg/ffmpeg/…) would amortize
  * init per batch, and the batch shape (id, bytes) → (id, features…) is
  * exactly what a vectorized/Arrow UDF needs. Codecs aren't available in
  * this container, so [[decodeStub]] produces a deterministic fake feature
  * vector — clearly marked; swap the body, keep the plumbing.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Attach a media payload + metadata to a text table (payload here is the
    * utf-8 bytes of the text — a deterministic stand-in for image bytes;
    * the engine treats it as opaque either way).
    */
  def packMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(
        lit("fake/rgb8").as("format"),
        (pmod(col(idCol), lit(64)) + 16).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) + 16).cast("int").as("height"),
        (pmod(col(idCol), lit(8)) + 1).cast("int").as("n_frames")
      ).as("meta"))

  /** Frame sampling: slice the payload into n_frames equal byte ranges and
    * keep every `stride`-th — pure binary plumbing (substr on binary),
    * no codec needed, fully codegen'd.
    */
  def sampleFrames(df: DataFrame, stride: Int = 2): DataFrame =
    df.select(col("media_id"), col("meta"),
        posexplode(
          filter(
            transform(sequence(lit(0), col("meta.n_frames") - 1),
              i => substring(col("media"),
                (i * (length(col("media")) / col("meta.n_frames")) + 1)
                  .cast("int"),
                (length(col("media")) / col("meta.n_frames")).cast("int"))),
            (_, i) => i % stride === 0))
          .as(Seq("frame_idx", "frame")))

  private val histBins = 16

  /** Decode + feature-extract, batched per partition.
    *
    * >>> STUB CODEC <<< — a real implementation would decode `media` with an
    * image/audio library and emit embeddings; container has no codecs, so
    * features are a deterministic byte histogram (16 bins, L1-normalized)
    * + payload length. The Spark-side contract (schema, batching,
    * partition-locality, no shuffle) is the real, tested part.
    */
  def decodeStub(spark: SparkSession, packed: DataFrame,
                 batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = packed.select(col("media_id").cast("long"), col("media"))
    in.mapPartitions { rows =>
      // batch so a real codec amortizes per-batch init (codec handle,
      // pinned buffers, GPU context, …)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val hist = new Array[Double](histBins)
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xFF) * histBins / 256) += 1.0
            i += 1
          }
          val total = math.max(bytes.length, 1).toDouble
          Row(id, bytes.length, hist.map(_ / total).toSeq)
        }
      }
    }(enc)
  }
}
