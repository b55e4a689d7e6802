package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.GraftColumnBridge.{column => c, expression => x}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Cross-corpus membership flagging via a bloom filter — the Dolma/CCNet
  * "have we seen this document before" primitive for incremental corpus
  * builds: yesterday's crawl is summarized into ONE constant-size bit
  * array, and today's crawl is flagged against it with a map-only scan.
  * The alternatives at 100 TB are a full anti-join of two corpora (a
  * corpus-sized shuffle per increment) or keeping every historical
  * fingerprint hot; the bloom trades them for a sketch that is MBs per
  * BILLION documents (~14.4 bits/key at 1% fpp) with one-sided error:
  * NO false negatives ever — a true overlap is always flagged — and
  * false positives at a calibrated, bounded rate.
  *
  * Built on Spark's own mergeable `BloomFilterAggregate` (the runtime-
  * filter machinery of SPARK-32268, surfaced here as a first-class
  * operator): partials are built map-side per partition and bit-OR
  * merged, so the build is one pass, shuffle-free except the final
  * KB-MB merge.
  *
  * The probe side does NOT ride the plan as a binary literal. At 1 B
  * reference keys the sketch is ~1.7 GB; a `Literal(bytes)` of that size
  * is re-serialized into every stage's task binary and rendered into
  * every plan string. Instead the sketch travels as a
  * `Broadcast[Array[Byte]]` HANDLE inside a codegen expression
  * ([[BloomProbeExpr]]) — the plan stays KBs no matter how big the
  * sketch is, the bytes move once per executor over the torrent
  * broadcast path, and each executor JVM deserializes the filter exactly
  * once ([[BloomRef]]'s process-wide cache). The probe itself is a
  * codegen'd double-hash: no join, no shuffle, no per-row allocation.
  *
  * Keys are `xxhash64` of the content column on BOTH sides (the 64-bit
  * pre-hash the bloom expects); a cross-engine-checkable fingerprint
  * (md5) can be layered underneath when the flag itself must be
  * oracle-replicable — the c34 gate instead checks the CONTRACT: the
  * exact overlap is computed independently and the no-false-negative
  * equality + fp-rate bound ride the result row.
  */
object BloomDedup {

  /** Bits for `expectedItems` at `fpp` (standard -n·ln p / ln²2). */
  def bitsFor(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong.max(64L)
  }

  /** One-pass bloom build over `key` (any type; xxhash64'd internally).
    * The returned sketch is constant-size driver state (~`bits/8`
    * bytes) — store it beside the corpus snapshot and reuse it for
    * every future increment.
    */
  def bloomOf(reference: DataFrame, key: Column, expectedItems: Long,
              fpp: Double = 0.01): Array[Byte] = {
    val agg = new BloomFilterAggregate(x(xxhash64(key.cast("string"))),
      Literal(expectedItems), Literal(bitsFor(expectedItems, fpp)))
      .toAggregateExpression()
    reference.select(c(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Exact row count from parquet footers — metadata-only, no data scan.
    * The bloom's capacity parameter needs the reference corpus size
    * BEFORE the build pass; for a parquet-backed snapshot that number is
    * already sitting in the file footers, so sizing the sketch costs a
    * driver-side footer sweep instead of a full count() scan of the
    * corpus (at 100 TB: milliseconds vs a second full-table job).
    * Returns None when the frame isn't file-backed (derived frames) —
    * callers fall back to count().
    */
  def footerRowCount(df: DataFrame): Option[Long] = {
    val files = df.inputFiles.filter(_.endsWith(".parquet"))
    if (files.isEmpty) None
    else {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      Some(files.map { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f), conf))
        try r.getRecordCount finally r.close()
      }.sum)
    }
  }

  /** Bit-OR two sketches built with the SAME (expectedItems, numBits)
    * parameters — the mergeability that makes blooms generational state:
    * a corpus summarized epoch-by-epoch folds into one constant-size
    * filter whose probe semantics equal a single build over the union
    * (`BloomFilter.mergeInPlace` — rejects incompatible geometries).
    */
  def mergeBlooms(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val bos = new java.io.ByteArrayOutputStream()
    fa.writeTo(bos)
    bos.toByteArray
  }

  /** Flag each probe row: `flagCol` is true iff `key` MIGHT be in the
    * reference (never-false-negative; false positives at the build's
    * fpp). Map-only — compose with a filter to drop, or keep the flag
    * for downstream exact verification of just the flagged slice. The
    * sketch ships via broadcast (see object doc), not as a plan literal.
    */
  def flagOverlap(probe: DataFrame, key: Column, bloom: Array[Byte],
                  flagCol: String = "maybe_seen"): DataFrame = {
    val bcast = probe.sparkSession.sparkContext.broadcast(bloom)
    probe.withColumn(flagCol, c(BloomProbeExpr(
      x(xxhash64(key.cast("string"))), new BloomRef(bcast))))
  }
}

/** Serializable handle to a broadcast bloom sketch. Only the broadcast
  * ID travels in the task binary; `value` is fetched once per executor
  * by the broadcast machinery, and the deserialized [[BloomFilter]] is
  * cached process-wide per broadcast ID so repeated task deserialization
  * of the expression tree never re-parses the bit array. (The cache
  * retains one filter per broadcast for the executor's lifetime — the
  * same lifecycle as the broadcast block itself.)
  */
class BloomRef(bcast: Broadcast[Array[Byte]]) extends Serializable {
  def probe(h: Long): Boolean = BloomRef.filterFor(bcast).mightContainLong(h)
}

object BloomRef {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, BloomFilter]
  private[operators] def filterFor(b: Broadcast[Array[Byte]]): BloomFilter =
    cache.computeIfAbsent(b.id, _ =>
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(b.value)))
}

/** `bloom.probe(xxhash64(key))` as a codegen'd predicate. The child must
  * produce the 64-bit pre-hash (LongType); the sketch is reached through
  * the [[BloomRef]] broadcast handle — ONE referenced object in the
  * generated class, constant codegen size regardless of sketch size
  * (the [[graft.operators.CentroidIndex]] pattern).
  */
case class BloomProbeExpr(child: Expression, bloom: BloomRef)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects the xxhash64 LongType pre-hash, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType

  override def nullSafeEval(h: Any): Any = bloom.probe(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomRef].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.probe($h);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BloomProbeExpr = copy(child = newChild)
}
