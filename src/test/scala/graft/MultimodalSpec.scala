package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = Tables(spark, sfDir(), "documents").limit(50)
  private lazy val packed = Multimodal.packMedia(docs, "doc_id", "text")

  test("c12e: animated GIFs are real multi-frame containers and the " +
    "palettized round trip is lossless") {
    val ids = docs.select("doc_id").limit(20)
    val gifs = Multimodal.packAnimatedGifs(spark, ids, "doc_id")
    val rows = gifs.collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      assert(new String(bytes.take(4), "US-ASCII") === "GIF8")
      // container-reported frame count == metadata ground truth
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      reader.setInput(iis, false, true)
      assert(reader.getNumImages(true) === Multimodal.gifFrames(id))
      // losslessness: every pixel of frame 0 equals the palette formula
      val img = reader.read(0)
      val (w, h) = (Multimodal.gifW(id), Multimodal.gifH(id))
      assert(img.getWidth === w && img.getHeight === h)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val (cr, cg, cb) = Multimodal.GifPalette(
            Multimodal.gifColorIdx(id, 0, x, y))
          val p = img.getRGB(x, y)
          assert(((p >> 16) & 0xFF) === cr && ((p >> 8) & 0xFF) === cg &&
            (p & 0xFF) === cb, s"id=$id pixel ($x,$y) not lossless")
        }
      }
      iis.close()
    }
    // stride-2 sampling keeps ceil(nf/2) frames; junk quarantines
    val dec = Multimodal.decodeGifFrames(spark, gifs, stride = 2)
    val perDoc = dec.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(perDoc(id) === (Multimodal.gifFrames(id) + 1) / 2, s"id=$id")
    }
    val junk = gifs.select(col("media_id"),
      encode(lit("definitely not a gif"), "UTF-8").as("media"))
    val q = Multimodal.decodeGifFrames(spark, junk).collect()
    assert(q.forall(r => r.getInt(2) === -1 && r.isNullAt(3)))
  }

  test("c12f: frame deltas match the palette formula exactly, singletons " +
    "emit nothing, junk quarantines") {
    val ids = docs.select("doc_id").limit(20)
    val gifs = Multimodal.packAnimatedGifs(spark, ids, "doc_id")
    val out = Multimodal.gifFrameDeltas(spark, gifs, stride = 2).collect()
    val byId = out.groupBy(_.getLong(0))
    ids.collect().map(_.getLong(0)).foreach { id =>
      val nf = Multimodal.gifFrames(id)
      if (nf < 3) // kept frames under stride 2: {0} — nothing to diff
        assert(!byId.contains(id), s"id=$id nf=$nf must emit no delta rows")
      else {
        val rows = byId(id)
        assert(rows.length === 1 && rows.head.getInt(2) === 0 &&
          rows.head.getInt(3) === 2, s"id=$id expects exactly pair (0,2)")
        // exact recomputation from the color-index formula:
        // |Δr|=|Δg|=36|Δk|, |Δb|=31|Δk|
        val (w, h) = (Multimodal.gifW(id), Multimodal.gifH(id))
        var dk = 0L
        (0 until h).foreach { y =>
          (0 until w).foreach { x =>
            dk += math.abs(Multimodal.gifColorIdx(id, 2, x, y) -
              Multimodal.gifColorIdx(id, 0, x, y))
          }
        }
        val d = w * h * 255.0
        assert(rows.head.getDouble(6) === 36 * dk / d, s"id=$id mad_r")
        assert(rows.head.getDouble(7) === 36 * dk / d, s"id=$id mad_g")
        assert(rows.head.getDouble(8) === 31 * dk / d, s"id=$id mad_b")
      }
    }
    val junk = gifs.select(col("media_id"),
      encode(lit("definitely not a gif"), "UTF-8").as("media"))
    val q = Multimodal.gifFrameDeltas(spark, junk).collect()
    assert(q.forall(r => r.getInt(2) === -1 && r.isNullAt(6)))
  }

  test("packMedia: opaque binary payload + typed prunable metadata") {
    val schema = packed.schema
    assert(schema("media").dataType.typeName === "binary")
    val metaFields = schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields ===
      Multimodal.mediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    // metadata-only query never touches payload bytes
    val widths = packed.select("meta.width").collect().map(_.getInt(0))
    assert(widths.forall(w => w >= 16 && w < 80))
  }

  test("sampleFrames: every stride-th of n_frames byte slices") {
    val frames = Multimodal.sampleFrames(packed, stride = 2)
    val perDoc = frames.groupBy("media_id").count()
      .join(packed.select(col("media_id"), col("meta.n_frames").as("nf")), "media_id")
      .collect()
    perDoc.foreach { r =>
      val got = r.getAs[Long]("count")
      val nf = r.getAs[Int]("nf")
      assert(got === (nf + 1) / 2, s"media ${r.get(0)}: $got frames of $nf")
    }
    assert(frames.schema("frame").dataType.typeName === "binary")
  }

  test("real codec: packImages round-trips PNG bytes to correct dimensions") {
    val imgs = Multimodal.packImages(spark, docs, "doc_id", batchSize = 16)
    val out = Multimodal.decodeImages(spark, imgs, batchSize = 16)
      .join(imgs.select(col("media_id"), col("meta.width").as("mw"),
        col("meta.height").as("mh")), "media_id")
    val rows = out.collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      // decoded-by-codec dimensions must equal the metadata ground truth
      assert(r.getAs[Int]("width") === r.getAs[Int]("mw"))
      assert(r.getAs[Int]("height") === r.getAs[Int]("mh"))
      val feats = r.getAs[scala.collection.Seq[Double]]("features")
      assert(feats.length === 3) // mean RGB
      assert(feats.forall(f => f >= 0.0 && f <= 1.0))
      assert(r.getAs[Int]("n_bytes") > 8) // a real PNG, not raw text
    }
    // the payloads really are PNGs: magic bytes present
    imgs.select("media").limit(5).collect().foreach { r =>
      val b = r.getAs[Array[Byte]](0)
      assert(b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
    }
  }

  test("batched codec transport is bit-identical to the per-call path") {
    // encode: same deterministic pixels → byte-identical PNG payloads
    val slow = Multimodal.packImages(spark, docs, "doc_id", batchSize = 16)
      .select(col("media_id"), md5(col("media")).as("m"))
    val fast = Multimodal.packImagesBatched(spark, docs, "doc_id", batchSize = 16)
      .select(col("media_id"), md5(col("media")).as("m"))
    assert(slow.join(fast, Seq("media_id", "m")).count() === 50,
      "batched encoder must produce byte-identical PNGs")
    // decode: identical features from either decoder over either payload
    val imgs = Multimodal.packImagesBatched(spark, docs, "doc_id")
    val a = Multimodal.decodeImages(spark, imgs, batchSize = 16)
    val b = Multimodal.decodeImagesBatched(spark, imgs, batchSize = 16)
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L,
      "raster-direct decode must match the getRGB path exactly")
    // quarantine posture identical too: non-image payloads → stub histogram
    val q = Multimodal.decodeImagesBatched(spark, packed, batchSize = 16)
    val qa = Multimodal.decodeImages(spark, packed, batchSize = 16)
    assert(q.exceptAll(qa).count() === 0L && qa.exceptAll(q).count() === 0L)
  }

  test("columnar decode transport is bit-identical to the row path, on " +
       "image AND quarantined payloads, and plans as a columnar operator") {
    val imgs = Multimodal.packImagesBatched(spark, docs, "doc_id")
    val row = Multimodal.decodeImagesBatched(spark, imgs, batchSize = 16)
    val colr = Multimodal.decodeImagesColumnar(spark, imgs)
    assert(colr.schema === row.schema)
    assert(colr.exceptAll(row).count() === 0L &&
           row.exceptAll(colr).count() === 0L,
      "columnar transport must be bit-identical to the row transport")
    // quarantine path (non-image payloads → null dims + histogram stub)
    val rowQ = Multimodal.decodeImagesBatched(spark, packed, batchSize = 16)
    val colQ = Multimodal.decodeImagesColumnar(spark, packed)
    assert(colQ.exceptAll(rowQ).count() === 0L &&
           rowQ.exceptAll(colQ).count() === 0L)
    // plan shape: the decode node executes columnar, with exactly one
    // ColumnarToRow transition above it (no row pivot inside). Execute
    // first — under AQE the final plan (with transitions) only
    // materializes then.
    colr.collect()
    val plan = colr.queryExecution.executedPlan.toString
    assert(plan.contains("DecodeImages"), plan)
    assert(plan.contains("ColumnarToRow"), plan)
    // parquet round-trip: reading packed media back from disk feeds the
    // decode from the vectorized reader's columnar batches
    val dir = java.nio.file.Files
      .createTempDirectory("graft_colr").toString
    imgs.write.mode("overwrite").parquet(dir)
    val fromDisk = Multimodal.decodeImagesColumnar(
      spark, spark.read.parquet(dir))
    assert(fromDisk.exceptAll(row).count() === 0L &&
           row.exceptAll(fromDisk).count() === 0L)
  }

  test("codec breadth: JPEG and GIF payloads decode through the JDK " +
       "ImageIO plugins — dimensions exact, JPEG features within lossy " +
       "tolerance, row and columnar transports agree") {
    val s = spark
    import s.implicits._
    // deterministic 32x24 gradient, encoded to JPEG and GIF executor-free
    def img(): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(
        32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32)
        im.setRGB(x, y, ((x * 8) << 16) | ((y * 10) << 8) | 0x40)
      im
    }
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img(), fmt, bos)
      bos.toByteArray
    }
    val jpg = enc("jpg"); val gif = enc("gif")
    assert(jpg.length > 4 && gif.length > 4)
    val px = img().getRGB(0, 0, 32, 24, null, 0, 32)
    val trueMeans = Seq(16, 8, 0).map(sh =>
      px.map(p => (p >> sh) & 0xFF).map(_.toLong).sum / (px.length * 255.0))
    val packed = Seq((1L, jpg), (2L, gif)).toDF("media_id", "media")
    for (out <- Seq(
        Multimodal.decodeImagesBatched(spark, packed, batchSize = 4),
        Multimodal.decodeImagesColumnar(spark, packed))) {
      val rows = out.orderBy("media_id").collect()
      assert(rows.length === 2)
      rows.foreach { r =>
        assert(r.getInt(2) === 32 && r.getInt(3) === 24,
          "decoded dimensions must be exact for both formats")
        val feats = r.getAs[scala.collection.Seq[Double]]("features")
        assert(feats.length === 3, "decoded (not quarantined) features")
        // JPEG is lossy, GIF palettizes: means within 3% of the source
        feats.zip(trueMeans).foreach { case (got, want) =>
          assert(math.abs(got - want) < 0.03, s"$got vs $want") }
      }
    }
    // the two transports agree bit-for-bit on the lossy formats too
    val a = Multimodal.decodeImagesBatched(spark, packed, batchSize = 4)
    val b = Multimodal.decodeImagesColumnar(spark, packed)
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }

  test("real codec: non-image payloads quarantine to stub features") {
    val out = Multimodal.decodeImages(spark, packed, batchSize = 16)
    val rows = out.collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3), "no fake dimensions")
      val feats = r.getAs[scala.collection.Seq[Double]]("features")
      assert(feats.length === 16 && math.abs(feats.sum - 1.0) < 1e-9)
    }
  }

  test("decodeStub: batched partition-local decode keeps schema contract") {
    val out = Multimodal.decodeStub(spark, packed, batchSize = 16)
    val rows = out.collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      val feats = r.getSeq[Double](2)
      assert(feats.length === 16)
      assert(math.abs(feats.sum - 1.0) < 1e-9) // L1-normalized histogram
      assert(r.getInt(1) > 0)
    }
  }
}
