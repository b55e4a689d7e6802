package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D31: ingest from a REAL external byte stream — the last untested leg
  * of the streaming story (every other D-surface spec drives
  * MemoryStream or file arrival). The sandbox cannot host a Kafka
  * broker, so the transport is Spark's own TCP socket source — a real
  * network source with a real reader thread, connection lifecycle and
  * line framing — and the engine surface is the WIRE-FORMAT DECODER
  * below plus the gate composition behind it, both transport-agnostic:
  * swapping `format("socket")` for `format("kafka")` changes only the
  * source options and `value` arriving as binary instead of string.
  *
  * Wire format: one event per line, `user_id,epoch_sec,event_id,
  * event_type,value` (CSV, no quoting — the fields are numeric + an
  * enum). Malformed lines are NOT dropped silently: they surface with
  * `parse_ok = false` and null fields, the A13 quarantine rule at the
  * decode layer (a dead-letter split can route them; dropping them
  * here would hide producer bugs).
  *
  * Scale/backpressure notes (the Kafka-shaped contract, documented
  * where the sandbox can't measure it): a socket source is
  * single-reader and unreplayable, so it is a TEST transport only; on
  * Kafka the same pipeline sizes triggers with `maxOffsetsPerTrigger`
  * (rows per micro-batch ≈ offsets/partitions balanced by the
  * receiver), gets replay from offsets + checkpoint instead of the
  * socket's none, and parallelizes by topic partition where the socket
  * pins to one task. The decode + gate stages below are stateless
  * map-only, so their throughput scales with whatever the source
  * fans out.
  */
object SocketIngest {

  val wireSchema: StructType = StructType(Seq(
    StructField("user_id", LongType), StructField("sec", LongType),
    StructField("event_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Decode the line protocol: split, arity+numeric check, typed cast.
    * `from_csv` would PERMISSIVE-null individual fields; the explicit
    * form keeps one boolean verdict per line so the dead-letter split
    * is a single filter.
    */
  def decodeLines(lines: DataFrame): DataFrame = {
    val p = split(col("value"), ",")
    val ok = size(p) === 5 &&
      element_at(p, 1).cast("long").isNotNull &&
      element_at(p, 2).cast("long").isNotNull &&
      element_at(p, 3).cast("long").isNotNull &&
      element_at(p, 5).cast("double").isNotNull
    lines.select(
      when(ok, element_at(p, 1).cast("long")).as("user_id"),
      when(ok, to_timestamp(from_unixtime(element_at(p, 2).cast("long"))))
        .as("ts"),
      when(ok, element_at(p, 3).cast("long")).as("event_id"),
      when(ok, element_at(p, 4)).as("event_type"),
      when(ok, element_at(p, 5).cast("double")).as("value"),
      ok.as("parse_ok"))
  }

  /** The full D31 pipeline over a line stream: decode, then the D16
    * quality verdict on well-formed rows (malformed lines are
    * quarantined by construction — a line that didn't parse cannot
    * pass a content gate).
    */
  def gatedDecode(lines: DataFrame): DataFrame =
    EventStreams.gateVerdict(decodeLines(lines))
      .withColumn("quarantined", col("quarantined") || !col("parse_ok"))
}
