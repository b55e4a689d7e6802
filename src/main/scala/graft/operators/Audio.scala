package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audio-column support — the second real codec of the multimodal surface
  * (C12 images; this file is the audio twin). Payloads are REAL WAV
  * (RIFF/PCM) bytes produced and parsed by the JDK's own sampled-audio
  * stack (`javax.sound.sampled.AudioSystem` — pure JVM, headless-safe, no
  * native deps), so both directions run an actual container codec, not a
  * formula over raw bytes.
  *
  * Engine contract (identical to the image path): payloads are opaque
  * `binary` columns the optimizer never deserializes; the codec runs
  * executor-side in batched `mapPartitions` with per-partition
  * `AudioFormat` reuse; payloads that are not parseable WAV quarantine to
  * null features instead of failing the task (the A13 PERMISSIVE rule).
  *
  * Determinism contract (what makes the DuckDB gate possible): synthesized
  * PCM samples are an integer formula of (id, sample index), every
  * per-document aggregate (sum of squares ≤ 1600·2^30 < 2^53, peak, count)
  * is exactly representable in a double, and duration/rms divide by powers
  * of two — so Spark's codec-decoded features and the oracle's
  * formula-recomputed features are BIT-identical, no tolerance anywhere.
  */
object Audio {

  val SampleRate = 16000

  /** Samples per clip: 800 + (id mod 5)·160 — 50–90 ms at 16 kHz, five
    * distinct lengths so duration math is exercised, divisible by 16 so
    * `duration_ms = n/16` is exact in binary floating point.
    */
  def nSamples(id: Long): Int = (800 + (id % 5) * 160).toInt

  /** Sample i of clip id: LCG-mixed 16-bit value in [-32768, 32767]. */
  def sample(id: Long, i: Int): Int =
    (((id * 7349L + i.toLong * 12345L + 6789L) % 65536L) - 32768L).toInt

  /** Synthesize REAL WAV payloads (PCM_SIGNED 16-bit LE mono @16 kHz)
    * through `AudioSystem.write` — the encoder writes the actual RIFF
    * chunk structure; nothing is hand-assembled. Output:
    * (media_id, media: binary, meta: {format, sample_rate, channels,
    * bits}).
    */
  def packWav(spark: SparkSession, df: DataFrame, idCol: String,
              batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("format", StringType),
        StructField("sample_rate", IntegerType),
        StructField("channels", IntegerType),
        StructField("bits", IntegerType))))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val narrow = df.select(col(idCol).cast("long").as("media_id"))
    // codec stages are CPU-bound per row: size by cores, not by the
    // source file's split count (the packImagesBatched rule)
    val target = spark.sparkContext.defaultParallelism
    val in = if (narrow.rdd.getNumPartitions < target)
      narrow.repartition(target) else narrow
    in.mapPartitions { rows =>
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        SampleRate.toFloat, 16, 1, 2, SampleRate.toFloat, false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val n = nSamples(id)
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = sample(id, i)
            pcm(2 * i) = (s & 0xFF).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          Row(id, bos.toByteArray, Row("audio/wav", SampleRate, 1, 16))
        }
      }
    }(enc)
  }

  /** Decode + feature-extract with the REAL parser
    * (`AudioSystem.getAudioInputStream` — validates the RIFF/WAVE chunk
    * structure and yields the format): per clip, (n_samples, sample_rate,
    * duration_ms, rms, peak). Non-WAV payloads (or any codec failure)
    * yield null features with the byte count kept — quarantine, not
    * crash.
    *
    * Feature math (the oracle-replicable contract): rms =
    * sqrt(Σ s²/n) with Σ s² accumulated exactly in a long; peak =
    * max |s|; duration_ms = n·1000/rate. All three land bit-identical to
    * the oracle's integer-formula recomputation.
    */
  def decodeWav(spark: SparkSession, packed: DataFrame,
                batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", DoubleType),
      StructField("rms", DoubleType),
      StructField("peak", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = packed.select(col("media_id").cast("long"), col("media"))
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          decodeOne(id, bytes)
        }
      }
    }(enc)
  }

  private[operators] def decodeOne(id: Long, bytes: Array[Byte]): Row = {
    val parsed =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.isBigEndian) null
        else {
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          var sumSq = 0L
          var peak = 0
          var i = 0
          while (i < n) {
            val s = ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort.toInt
            sumSq += s.toLong * s
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 1
          }
          val rate = fmt.getSampleRate.toInt
          (n, rate, sumSq, peak)
        }
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (parsed == null) Row(id, bytes.length, null, null, null, null, null)
    else {
      val (n, rate, sumSq, peak) = parsed
      Row(id, bytes.length, n, rate,
        n * 1000.0 / rate,
        math.sqrt(sumSq.toDouble / n), peak)
    }
  }
}
