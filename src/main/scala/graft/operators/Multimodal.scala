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

  /** Generate REAL PNG payloads (deterministic pixels from the id) through
    * the same batched mapPartitions shape the decode path uses — the codec
    * (`javax.imageio`, pure JVM) runs executor-side, driver never sees
    * bytes. Dimensions follow the same formula as [[packMedia]] so metadata
    * stays the prunable source of truth.
    */
  def packImages(spark: SparkSession, df: DataFrame, idCol: String,
                 batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", mediaMetaSchema)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val w = (id % 64 + 16).toInt
          val h = (id % 48 + 16).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // deterministic pseudo-content: id-seeded per-pixel mix
              val v = (id * 1103515245L + x * 31L + y * 131L) & 0xFFFFFF
              img.setRGB(x, y, v.toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray,
            Row("image/png", w, h, 1))
        }
      }
    }(enc)
  }

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

  /** Decode + feature-extract with a REAL codec (`javax.imageio`, PNG/BMP
    * — pure JVM, no native deps), batched per partition. Payloads that are
    * not a supported image (no PNG/BMP magic, or codec failure) fall back
    * to the byte-histogram stub features with null dimensions — the same
    * quarantine-not-crash posture as PERMISSIVE ingest (A13).
    *
    * Output: (media_id, n_bytes, width, height, features[3] = mean RGB in
    * [0,1]). Scale note: the per-image codec call IS the hot path — batch
    * boundaries exist so a vectorized/Arrow transport (mapInArrow on the
    * PySpark side) or a pooled native codec slots in without changing the
    * plan shape; everything around the codec is straight-line primitive
    * code, no per-pixel boxing (grabs the raster once per image).
    */
  def decodeImages(spark: SparkSession, packed: DataFrame,
                   batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = packed.select(col("media_id").cast("long"), col("media"))
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val isImage = bytes.length > 4 &&
            ((bytes(0) == PngMagic(0) && bytes(1) == PngMagic(1) &&
              bytes(2) == PngMagic(2) && bytes(3) == PngMagic(3)) ||
             (bytes(0) == 'B' && bytes(1) == 'M') ||
             (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte &&
              bytes(2) == 0xFF.toByte) ||
             (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
              bytes(3) == '8'))
          val decoded =
            if (!isImage) null
            else try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (decoded != null) {
            val w = decoded.getWidth; val h = decoded.getHeight
            // one raster grab per image; tight primitive loop over pixels
            val px = decoded.getRGB(0, 0, w, h, null, 0, w)
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < px.length) {
              val p = px(i)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              i += 1
            }
            val n = math.max(px.length, 1) * 255.0
            Row(id, bytes.length, w, h,
              Seq(sr / n, sg / n, sb / n))
          } else {
            val hist = new Array[Double](histBins)
            var i = 0
            while (i < bytes.length) {
              hist((bytes(i) & 0xFF) * histBins / 256) += 1.0
              i += 1
            }
            val total = math.max(bytes.length, 1).toDouble
            Row(id, bytes.length, null, null, hist.map(_ / total).toSeq)
          }
        }
      }
    }(enc)
  }

  /** [[packImages]] with the per-image codec overhead stripped out — the
    * "vectorized transport" the r4 review asked for, in the form the JVM
    * actually rewards:
    *   - `ImageIO.setUseCache(false)`: the default ImageIO path spools
    *     every encode/decode through a TEMP FILE on disk; per-partition
    *     in-memory streams remove a file create+write+delete per image;
    *   - ONE `ImageWriter` instance per partition (`ImageIO.write` scans
    *     the registry and instantiates a fresh writer per call);
    *   - pixels written straight into the image's backing `int[]`
    *     (`DataBufferInt`) instead of per-pixel `setRGB` calls — for
    *     TYPE_INT_RGB `setRGB` stores the same int, so the payload is
    *     BIT-IDENTICAL, minus a virtual call + bounds check per pixel.
    * An Arrow/ColumnarBatch transport would change how rows REACH this
    * loop, not the codec cost inside it — batching stays at the
    * mapPartitions boundary, which is where a columnar exchange would
    * plug in.
    *
    * The codec stage is additionally sized by CORES, not by the source
    * file's split count: a codec is CPU-bound per row, so partitioning
    * inherited from a small parquet scan (one split for a sub-128 MB
    * file) would serialize the whole stage behind one task. The id frame
    * is widened to defaultParallelism when narrower — a shuffle of bare
    * longs, nothing next to the per-image work it unlocks. (Downstream
    * [[decodeImagesBatched]] inherits this partitioning and stays
    * payload-local.)
    */
  def packImagesBatched(spark: SparkSession, df: DataFrame, idCol: String,
                        batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", mediaMetaSchema)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val narrow = df.select(col(idCol).cast("long").as("media_id"))
    val target = spark.sparkContext.defaultParallelism
    val in = if (narrow.rdd.getNumPartitions < target)
      narrow.repartition(target) else narrow
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val w = (id % 64 + 16).toInt
          val h = (id % 48 + 16).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val px = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferInt].getData
          var y = 0
          while (y < h) {
            var x = 0
            val row = y * w
            while (x < w) {
              px(row + x) =
                ((id * 1103515245L + x * 31L + y * 131L) & 0xFFFFFF).toInt
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(img)
          ios.close()
          Row(id, bos.toByteArray, Row("image/png", w, h, 1))
        }
      }
    }(enc)
  }

  /** [[decodeImages]] with the same per-partition codec amortization as
    * [[packImagesBatched]]: no ImageIO temp-file cache, ONE reused
    * `ImageReader` per partition, and channel sums taken straight off the
    * decoded raster's backing byte/int array (PNG decodes to
    * TYPE_3BYTE_BGR on the JDK codec; `getRGB` would re-convert every
    * pixel through the color model). Output and quarantine semantics are
    * identical to [[decodeImages]] — same bit-exact DuckDB oracle.
    * The per-image decode lives in [[ImageDecoder]], shared verbatim with
    * the columnar transport ([[decodeImagesColumnar]]).
    */
  def decodeImagesBatched(spark: SparkSession, packed: DataFrame,
                          batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = packed.select(col("media_id").cast("long"), col("media"))
    in.mapPartitions { rows =>
      val dec = new ImageDecoder
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val d = dec.decode(bytes)
          if (d.width >= 0)
            Row(id, bytes.length, d.width, d.height,
              scala.collection.immutable.ArraySeq.unsafeWrapArray(d.features))
          else
            Row(id, bytes.length, null, null,
              scala.collection.immutable.ArraySeq.unsafeWrapArray(d.features))
        }
      }
    }(enc)
  }

  /** Columnar-transport variant of [[decodeImagesBatched]]: a custom
    * physical operator ([[graft.plans.DecodeImagesExec]], registered via
    * [[graft.plans.GraftExtensions]]) that consumes and produces
    * `ColumnarBatch`es — the JVM equivalent of the `mapInArrow` transport.
    * Catalyst inserts the transitions: a columnar child (the vectorized
    * parquet reader, when packed media is read from disk) feeds the codec
    * WITHOUT ever pivoting payload bytes through rows, and a single
    * codegen'd `ColumnarToRowExec` sits above. Row-producing children get
    * a `RowToColumnarExec` staged in by Spark (still cheaper than the
    * per-row `RowEncoder` serialization of the mapPartitions path, which
    * allocates a GenericRow + copies the feature array per image).
    * Decode semantics are [[ImageDecoder]] — byte-identical features,
    * same oracle.
    */
  def decodeImagesColumnar(spark: SparkSession, packed: DataFrame): DataFrame = {
    val in = packed.select(col("media_id").cast("long").as("media_id"),
      col("media"))
    org.apache.spark.sql.classic.GraftColumnBridge.ofRows(spark,
      graft.plans.DecodeImagesNode(in.queryExecution.analyzed))
  }

  /** Result of one image decode: `width < 0` means the payload was not a
    * decodable image and `features` holds the histogram-stub fallback.
    */
  final case class DecodeResult(width: Int, height: Int,
                                features: Array[Double])

  /** The per-image decode, shared verbatim between the row transport
    * ([[decodeImagesBatched]]) and the columnar transport
    * ([[decodeImagesColumnar]]) so the two are bit-identical by
    * construction. One instance per partition: owns the reused PNG
    * `ImageReader` and disables the ImageIO temp-file cache once.
    */
  final class ImageDecoder {
    javax.imageio.ImageIO.setUseCache(false)
    private val pngReader = javax.imageio.ImageIO
      .getImageReadersByFormatName("png").next()

    def decode(bytes: Array[Byte]): DecodeResult = {
      val isPng = bytes.length > 4 &&
        bytes(0) == PngMagic(0) && bytes(1) == PngMagic(1) &&
        bytes(2) == PngMagic(2) && bytes(3) == PngMagic(3)
      val isBmp = bytes.length > 4 && bytes(0) == 'B' && bytes(1) == 'M'
      // JPEG (FF D8 FF) and GIF ("GIF8") ride the JDK's own ImageIO
      // plugins — no native deps; lossy JPEG means features are
      // codec-true, not formula-pinned, so the oracle stays on PNG and
      // the JPEG path is spec-gated by round-trip tolerance instead
      val isJpg = bytes.length > 4 && bytes(0) == 0xFF.toByte &&
        bytes(1) == 0xD8.toByte && bytes(2) == 0xFF.toByte
      val isGif = bytes.length > 4 && bytes(0) == 'G' &&
        bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'
      val decoded =
        if (isPng) {
          try {
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            pngReader.setInput(iis, true, true)
            val img = pngReader.read(0)
            iis.close()
            img
          } catch { case _: java.io.IOException => null }
        } else if (isBmp || isJpg || isGif) {
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        } else null
      if (decoded != null) {
        val w = decoded.getWidth; val h = decoded.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        decoded.getRaster.getDataBuffer match {
          case db: java.awt.image.DataBufferByte
              if decoded.getType ==
                java.awt.image.BufferedImage.TYPE_3BYTE_BGR =>
            val a = db.getData
            var i = 0
            while (i < a.length) {
              sb += a(i) & 0xFF; sg += a(i + 1) & 0xFF; sr += a(i + 2) & 0xFF
              i += 3
            }
          case db: java.awt.image.DataBufferInt
              if decoded.getType ==
                java.awt.image.BufferedImage.TYPE_INT_RGB =>
            val a = db.getData
            var i = 0
            while (i < a.length) {
              val p = a(i)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              i += 1
            }
          case _ =>
            val px = decoded.getRGB(0, 0, w, h, null, 0, w)
            var i = 0
            while (i < px.length) {
              val p = px(i)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              i += 1
            }
        }
        val n = math.max(w * h, 1) * 255.0
        DecodeResult(w, h, Array(sr / n, sg / n, sb / n))
      } else {
        val hist = new Array[Double](histBins)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xFF) * histBins / 256) += 1.0
          i += 1
        }
        val total = math.max(bytes.length, 1).toDouble
        var i2 = 0
        while (i2 < histBins) { hist(i2) /= total; i2 += 1 }
        DecodeResult(-1, -1, hist)
      }
    }
  }

  /** 8-color exact palette for the animated-GIF path: every frame uses
    * only these colors, so the GIF encoder never quantizes and the
    * container round trip is LOSSLESS — what makes the multi-frame
    * decode formula-replicable by the oracle instead of structure-only.
    */
  private[graft] val GifPalette: Array[(Int, Int, Int)] =
    Array.tabulate(8)(k => (36 * k, 252 - 36 * k, 31 * k))

  private[graft] def gifFrames(id: Long): Int = (id % 4 + 1).toInt
  private[graft] def gifW(id: Long): Int = (id % 16 + 16).toInt
  private[graft] def gifH(id: Long): Int = (id % 8 + 16).toInt
  private[graft] def gifColorIdx(id: Long, f: Int, x: Int, y: Int): Int =
    ((x + 3 * y + 5 * f + id) % 8).toInt

  /** Synthesize REAL multi-frame media: animated GIFs written frame by
    * frame through ImageIO's sequence writer (`prepareWriteSequence` /
    * `writeToSequence` — the actual GIF89a animation structure, pure
    * JDK). The "video" surface of the multimodal stack: n_frames rides
    * prunable metadata, payload bytes stay opaque. Frames draw from the
    * exact 8-color [[GifPalette]] so encoding is provably lossless.
    */
  def packAnimatedGifs(spark: SparkSession, df: DataFrame, idCol: String,
                       batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", mediaMetaSchema)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val narrow = df.select(col(idCol).cast("long").as("media_id"))
    val target = spark.sparkContext.defaultParallelism
    val in = if (narrow.rdd.getNumPartitions < target)
      narrow.repartition(target) else narrow
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val (w, h, nf) = (gifW(id), gifH(id), gifFrames(id))
          val bos = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val px = img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferInt].getData
            var y = 0
            while (y < h) {
              var x = 0
              val row = y * w
              while (x < w) {
                val (cr, cg, cb) = GifPalette(gifColorIdx(id, f, x, y))
                px(row + x) = (cr << 16) | (cg << 8) | cb
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          Row(id, bos.toByteArray, Row("image/gif", w, h, nf))
        }
      }
    }(enc)
  }

  /** Frame-sampled decode of multi-frame media (the real-container
    * upgrade of [[sampleFrames]]'s byte slicing): ImageIO's GIF reader
    * reports the frame count from the container (`getNumImages`) and
    * decodes every `stride`-th frame; per kept frame the mean-RGB
    * features, via the same color-model-safe accumulation as
    * [[ImageDecoder]]. Unparseable payloads quarantine to a single
    * (frame_idx = -1, null dims) row — the A13 rule. Output:
    * (media_id, n_frames, frame_idx, width, height, mean_r/g/b).
    */
  def decodeGifFrames(spark: SparkSession, packed: DataFrame,
                      stride: Int = 2, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", IntegerType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = packed.select(col("media_id").cast("long"), col("media"))
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val isGif = bytes.length > 4 && bytes(0) == 'G' &&
            bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'
          val frames =
            if (!isGif) null
            else try {
              val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(bytes))
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              val out = (0 until n by stride).map { f =>
                val img = reader.read(f)
                val w = img.getWidth; val h = img.getHeight
                var sr = 0L; var sg = 0L; var sb = 0L
                val px = img.getRGB(0, 0, w, h, null, 0, w)
                var i = 0
                while (i < px.length) {
                  val p = px(i)
                  sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF
                  sb += p & 0xFF
                  i += 1
                }
                val d = math.max(w * h, 1) * 255.0
                (n, f, w, h, sr / d, sg / d, sb / d)
              }
              iis.close()
              out
            } catch { case _: java.io.IOException => null }
          if (frames == null)
            Seq(Row(id, null, -1, null, null, null, null, null))
          else frames.map { case (n, f, w, h, mr, mg, mb) =>
            Row(id, n, f, w, h, mr, mg, mb) }
        }
      }
    }(enc)
  }

  /** Frame-DIFFERENCE features over multi-frame media — the motion
    * signal [[decodeGifFrames]] stops short of: per consecutive pair of
    * KEPT frames (stride-sampled, same as the decode path), the
    * pixel-wise mean absolute difference per channel. This is the
    * scene-change / static-clip discriminator a video curation pipeline
    * filters on (a slideshow and a tracking shot have identical
    * per-frame means but wildly different MADs).
    *
    * Exactness contract: each |Δ| sum is an exact integer (≤ w·h·255 ≤
    * 32·24·255 < 2^18), so mad_* = Σ|Δ| / (w·h·255.0) is a
    * deterministic double — the oracle recomputes it from the palette
    * formula with no tolerance. Clips with fewer than two kept frames
    * contribute no rows (nothing to difference); unparseable payloads
    * quarantine to a (prev_idx = -1, null mads) row — the A13 rule.
    * Output: (media_id, n_frames, prev_idx, frame_idx, width, height,
    * mad_r, mad_g, mad_b).
    */
  def gifFrameDeltas(spark: SparkSession, packed: DataFrame,
                     stride: Int = 2, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", IntegerType),
      StructField("prev_idx", IntegerType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mad_r", DoubleType),
      StructField("mad_g", DoubleType),
      StructField("mad_b", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = packed.select(col("media_id").cast("long"), col("media"))
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val isGif = bytes.length > 4 && bytes(0) == 'G' &&
            bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'
          val deltas =
            if (!isGif) null
            else try {
              val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(bytes))
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              var prevPx: Array[Int] = null
              var prevIdx = -1
              val out = (0 until n by stride).flatMap { f =>
                val img = reader.read(f)
                val w = img.getWidth; val h = img.getHeight
                val px = img.getRGB(0, 0, w, h, null, 0, w)
                val res =
                  if (prevPx == null || prevPx.length != px.length) Nil
                  else {
                    var dr = 0L; var dg = 0L; var db = 0L
                    var i = 0
                    while (i < px.length) {
                      val p = px(i); val q = prevPx(i)
                      dr += math.abs(((p >> 16) & 0xFF) - ((q >> 16) & 0xFF))
                      dg += math.abs(((p >> 8) & 0xFF) - ((q >> 8) & 0xFF))
                      db += math.abs((p & 0xFF) - (q & 0xFF))
                      i += 1
                    }
                    val d = math.max(w * h, 1) * 255.0
                    Seq((n, prevIdx, f, w, h, dr / d, dg / d, db / d))
                  }
                prevPx = px
                prevIdx = f
                res
              }
              iis.close()
              out
            } catch { case _: java.io.IOException => null }
          if (deltas == null)
            Seq(Row(id, null, -1, null, null, null, null, null, null))
          else deltas.map { case (n, pf, f, w, h, mr, mg, mb) =>
            Row(id, n, pf, f, w, h, mr, mg, mb) }
        }
      }
    }(enc)
  }

  /** Decode + feature-extract, batched per partition.
    *
    * >>> STUB CODEC <<< — kept as the declared stand-in for codecs the
    * container lacks (JPEG/video/audio): features are a deterministic byte
    * histogram (16 bins, L1-normalized) + payload length. For PNG/BMP the
    * REAL codec path is [[decodeImages]] (javax.imageio). The Spark-side
    * contract (schema, batching, partition-locality, no shuffle) is
    * identical in both.
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
