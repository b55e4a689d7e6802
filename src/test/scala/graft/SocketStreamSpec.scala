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
}
