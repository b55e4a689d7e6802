package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

/** Columnar transport for the image-decode operator (VERDICT r4/r6 ask):
  * a whole-operator `LogicalPlan` + `SparkStrategy` + columnar
  * `SparkPlan`, registered through [[GraftExtensions]] — the JVM
  * equivalent of PySpark's `mapInArrow` decode stage.
  *
  * Why columnar matters here: the mapPartitions row path pays, per image,
  * an InternalRow→Row pivot on the way in and a `RowEncoder`
  * serialization (GenericRow + feature-array copy + UnsafeRow write) on
  * the way out — pure transport, no codec work. `DecodeImagesExec`
  * declares `supportsColumnar`, so Catalyst's transition rule
  * (`ApplyColumnarRulesAndInsertTransitions`) wires `ColumnarBatch`es
  * straight through:
  *
  *   - when packed media comes off parquet, the VECTORIZED reader's
  *     binary column vectors feed the codec directly — payload bytes
  *     never exist as rows at all;
  *   - a row-producing child (the in-plan PNG generator) gets one
  *     staged `RowToColumnarExec`;
  *   - one codegen'd `ColumnarToRowExec` sits above the operator for
  *     row-based consumers, and vanishes entirely if the consumer is
  *     itself columnar.
  *
  * The decode itself is [[graft.operators.Multimodal.ImageDecoder]] —
  * the identical code object the row path runs, so the two transports
  * are bit-identical by construction (locked in MultimodalSpec; same
  * DuckDB oracle as c12/c12b).
  */
case class DecodeImagesNode(output: Seq[Attribute], child: LogicalPlan)
    extends UnaryNode {
  // the whole output is produced here, not derived from child attributes
  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the operator consumes BOTH child columns positionally (id, media) —
  // without this, ColumnPruning sees zero references and empties the child
  override def references
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(
      newChild: LogicalPlan): DecodeImagesNode = copy(child = newChild)
}

object DecodeImagesNode {
  /** Child contract: column 0 = media_id long, column 1 = media binary. */
  // all-nullable to match the row transport's RowEncoder schema exactly
  def apply(child: LogicalPlan): DecodeImagesNode = DecodeImagesNode(Seq(
    AttributeReference("media_id", LongType)(),
    AttributeReference("n_bytes", IntegerType)(),
    AttributeReference("width", IntegerType)(),
    AttributeReference("height", IntegerType)(),
    AttributeReference("features", ArrayType(DoubleType))()), child)
}

object MultimodalStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DecodeImagesNode(out, child) =>
      DecodeImagesExec(out, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class DecodeImagesExec(output: Seq[Attribute], child: SparkPlan)
    extends UnaryExecNode {

  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override def supportsColumnar: Boolean = true

  override protected def doExecute(): RDD[InternalRow] =
    throw new UnsupportedOperationException(
      "DecodeImagesExec is columnar-only; Catalyst inserts ColumnarToRowExec")

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val outTypes = output.map(_.dataType).toArray
    child.executeColumnar().mapPartitions { batches =>
      val dec = new graft.operators.Multimodal.ImageDecoder
      batches.map { batch => DecodeImagesExec.transform(batch, dec, outTypes) }
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): DecodeImagesExec = copy(child = newChild)
}

object DecodeImagesExec {
  /** One input batch → one output batch; per-row work is ONLY the codec
    * call plus direct column-vector writes (no row objects, no encoder).
    */
  private[plans] def transform(
      batch: ColumnarBatch, dec: graft.operators.Multimodal.ImageDecoder,
      outTypes: Array[DataType]): ColumnarBatch = {
    val n = batch.numRows()
    val ids = batch.column(0)
    val media = batch.column(1)
    val out = outTypes.map(t => new OnHeapColumnVector(math.max(n, 1), t))
    val Array(idV, nbV, wV, hV, fV) = out
    val fData = fV.arrayData()
    var off = 0
    var i = 0
    while (i < n) {
      val bytes = media.getBinary(i)
      val d = dec.decode(bytes)
      idV.putLong(i, ids.getLong(i))
      nbV.putInt(i, bytes.length)
      if (d.width >= 0) { wV.putInt(i, d.width); hV.putInt(i, d.height) }
      else { wV.putNull(i); hV.putNull(i) }
      val feats = d.features
      fData.reserve(off + feats.length)
      var j = 0
      while (j < feats.length) { fData.putDouble(off + j, feats(j)); j += 1 }
      fV.putArray(i, off, feats.length)
      off += feats.length
      i += 1
    }
    new ColumnarBatch(out.map(_.asInstanceOf[ColumnVector]), n)
  }
}
