package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.io.PrintWriter
import java.net.ServerSocket

/** Socket text-stream source (ref: StreamExecutionEnvironment
  * .socketTextStream:1329 — SocketTextStreamFunction). Spark ships the
  * equivalent built in (`readStream.format("socket")`), so the exercise
  * here is wiring + proof, on a loopback `ServerSocket`: lines pushed by
  * the server arrive as streaming rows and flow through a normal
  * aggregate. (Debug-grade source on both engines — single connection,
  * no replay — so correctness coverage is this spec, not an oracle
  * query; the driver's parquet-based verify can't host a live socket.)
  */
class SocketSourceSpec extends SparkSpec {

  test("socket source streams lines pushed over loopback") {
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    val pusher = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      (1 to 50).foreach(i => out.println(s"evt,$i"))
      out.flush()
      // hold the connection open until the reader is done; closing early
      // can race the source's final poll
      Thread.sleep(30000)
      sock.close()
    })
    pusher.setDaemon(true)
    pusher.start()

    val lines = spark.readStream
      .format("socket")
      .option("host", "127.0.0.1")
      .option("port", port)
      .load()
    val counted = lines
      .select(split(col("value"), ",").getItem(1).cast("long").as("n"))
    val q = counted.writeStream
      .format("memory")
      .queryName("socket_rows")
      .outputMode("append")
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      def total: Long = spark.table("socket_rows").count()
      while (total < 50 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      assert(total === 50L)
      val agg = spark.table("socket_rows").agg(sum("n"), max("n")).head()
      assert(agg.getLong(0) === (1 to 50).map(_.toLong).sum)
      assert(agg.getLong(1) === 50L)
    } finally {
      q.stop()
      server.close()
      spark.catalog.dropTempView("socket_rows")
    }
  }
}
