package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Audio

class AudioSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = Tables(spark, sfDir(), "documents")
    .select("doc_id").limit(25)
  private lazy val packed = Audio.packWav(spark, docs, "doc_id")

  test("packWav emits REAL WAV containers: RIFF magic, JDK-parseable, " +
    "declared format") {
    val rows = packed.collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("media")
      assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate.toInt === Audio.SampleRate)
      assert(fmt.getChannels === 1)
      assert(fmt.getSampleSizeInBits === 16)
      assert(!fmt.isBigEndian)
    }
  }

  test("decode round-trip: every feature equals the synthesis formula " +
    "(codec must preserve all PCM samples bit-exactly)") {
    val out = Audio.decodeWav(spark, packed).collect()
    assert(out.length === 25)
    out.foreach { r =>
      val id = r.getLong(0)
      val n = Audio.nSamples(id)
      var sumSq = 0L
      var peak = 0
      (0 until n).foreach { i =>
        val s = Audio.sample(id, i)
        sumSq += s.toLong * s
        peak = math.max(peak, math.abs(s))
      }
      assert(r.getAs[Int]("n_samples") === n, s"id=$id n")
      assert(r.getAs[Int]("sample_rate") === Audio.SampleRate)
      assert(r.getAs[Double]("duration_ms") === n * 1000.0 / Audio.SampleRate)
      assert(r.getAs[Double]("rms") === math.sqrt(sumSq.toDouble / n),
        s"id=$id rms must be bit-exact")
      assert(r.getAs[Int]("peak") === peak, s"id=$id peak")
    }
  }

  test("non-WAV payloads quarantine to null features, byte count kept " +
    "(the A13 PERMISSIVE rule)") {
    val junk = packed.select(col("media_id"),
      // corrupt: text bytes, truncated header, empty
      when(col("media_id") % 3 === 0, encode(lit("not audio at all"), "UTF-8"))
        .when(col("media_id") % 3 === 1,
          substring(col("media"), 1, 11).cast("binary"))
        .otherwise(encode(lit(""), "UTF-8")).as("media"))
    val out = Audio.decodeWav(spark, junk).collect()
    assert(out.length === 25)
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("n_samples")), s"row $r must quarantine")
      assert(r.isNullAt(r.fieldIndex("rms")))
      assert(!r.isNullAt(r.fieldIndex("n_bytes")))
    }
  }

  test("a structurally valid but EMPTY wav quarantines instead of " +
    "emitting NaN features") {
    // a real WAV container with a zero-length data chunk
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      16000f, 16, 1, 2, 16000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array.emptyByteArray), fmt, 0L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val out = Audio.decodeOne(7L, bos.toByteArray)
    // decodeOne rows are positional (schema attaches in decodeWav):
    // (media_id, n_bytes, n_samples, sample_rate, duration_ms, rms, peak)
    assert(out.isNullAt(5), s"empty clip must quarantine (rms): $out")
    assert(out.isNullAt(2), s"empty clip must quarantine (n_samples): $out")
  }

  test("clip lengths vary by id class and durations are the exact " +
    "50/60/70/80/90 ms grid") {
    val d = Audio.decodeWav(spark, packed)
      .select(col("duration_ms")).distinct().collect()
      .map(_.getDouble(0)).sorted.toSeq
    assert(d.forall(Seq(50.0, 60.0, 70.0, 80.0, 90.0).contains(_)))
  }
}
