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

  test("multi-connection fan-in soak: 4 concurrent producers through " +
       "the D31 pipeline, per-connection quarantine split exact, " +
       "per-source parallelism visible in progress metrics") {
    // The r10 verdict's remaining broker-shaped slice: the single soak
    // drives ONE socket (one source task); a broker fans consumption
    // across topic partitions. Four independent TCP servers, each with
    // its own producer and its own socket SOURCE (four reader tasks),
    // union into the one decode+gate pipeline — the fan-in shape a
    // 4-partition topic would give the same query, minus offsets.
    val conns = 4
    val perConn = 30000
    val servers = Seq.fill(conns)(new ServerSocket(0))
    @volatile var done = false
    val producers = servers.zipWithIndex.map { case (server, c) =>
      val t = new Thread(() => {
        val sock = server.accept()
        val out = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(sock.getOutputStream), 1 << 16)
        var i = 0
        while (i < perConn) {
          // same wire mix as the single soak: 1/16 malformed, a further
          // 1/16 out-of-range (i%8==7 minus the malformed overlap) →
          // exactly 1/8 quarantined per connection
          if (i % 16 == 15) out.write(s"malformed line $c-$i\n")
          else {
            val typ = Seq("view", "click", "purchase")(i % 3)
            val v = if (i % 8 == 7) 999.0 else (i % 90).toDouble
            out.write(s"${i % 97},${1000 + i},${c * 10000000 + i},$typ,$v\n")
          }
          i += 1
        }
        out.flush()
        while (!done) Thread.sleep(50)
        sock.close(); server.close()
      })
      t.setDaemon(true); t.start(); t
    }

    // one stream PER CONNECTION (its own source → its own reader task),
    // each gated then tagged, unioned into one query — decode/gate are
    // stateless map stages, so the union is the whole fan-in story
    val gatedPerConn = servers.zipWithIndex.map { case (server, c) =>
      SocketIngest.gatedDecode(spark.readStream
          .format("socket")
          .option("host", "localhost").option("port", server.getLocalPort)
          .load())
        .withColumn("conn", lit(c))
    }
    val counted = gatedPerConn.reduce(_ unionByName _)
      .groupBy("conn", "quarantined")
      .agg(count(lit(1)).as("cnt"))
    val n = (conns * perConn).toLong
    val t0 = System.nanoTime()
    val q = counted.writeStream.format("memory").queryName("d31_fanin")
      .outputMode("complete").start()
    try {
      val deadline = System.currentTimeMillis() + 240000
      def total(): Long = spark.table("d31_fanin")
        .agg(sum("cnt")).collect().head.getLong(0)
      var seen = 0L
      while ({ seen = try total() catch { case _: Exception => 0L }
               seen < n && System.currentTimeMillis() < deadline }) {
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      assert(seen === n, s"drained $seen of $n lines")
      val rowsPerSec = (n / secs).toLong
      val byConn = spark.table("d31_fanin").collect()
        .map(r => (r.getInt(0), r.getBoolean(1)) -> r.getLong(2)).toMap
      // EXACT per-connection split: 1/8 quarantined, 7/8 passed
      (0 until conns).foreach { c =>
        assert(byConn((c, true)) === perConn / 8L,
          s"conn $c quarantine split: $byConn")
        assert(byConn((c, false)) === perConn * 7L / 8L,
          s"conn $c passed split: $byConn")
      }
      // per-source-task parallelism, from the query's own progress
      // metrics: every micro-batch reports all 4 sources; each source
      // must have moved rows (no connection starved behind another)
      val progresses = q.recentProgress.toSeq
      val nSources = progresses.map(_.sources.length).max
      assert(nSources === conns,
        s"expected $conns sources in progress metrics, saw $nSources")
      val perSourceRows = progresses.flatMap(_.sources.toSeq)
        .groupBy(_.description)
        .view.mapValues(_.map(_.numInputRows).sum).toMap
      assert(perSourceRows.size === conns,
        s"source descriptions collapsed: ${perSourceRows.keys}")
      assert(perSourceRows.values.forall(_ > 0L),
        s"a source task never moved rows: $perSourceRows")
      info(f"fan-in soak: $n%d rows over $conns connections in " +
        f"$secs%.2f s = $rowsPerSec%d rows/sec")
      val perConnJson = (0 until conns).map { c =>
        s""""$c":{"quarantined":${byConn((c, true))},"passed":${byConn((c, false))}}"""
      }.mkString("{", ",", "}")
      val out = java.nio.file.Paths.get("target/d31_soak_multi.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out,
        s"""{"op":"d31_multi_socket_soak","connections":$conns,"rows":$n,"secs":${"%.3f".format(secs)},"rows_per_sec":$rowsPerSec,"n_source_tasks":$nSources,"per_conn":$perConnJson}""" + "\n")
      assert(rowsPerSec > 2000,
        s"throughput collapsed: $rowsPerSec rows/sec")
    } finally { done = true; q.stop() }
  }
}
