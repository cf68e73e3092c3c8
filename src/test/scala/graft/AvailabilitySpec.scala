package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

import org.apache.spark.sql.Row
import graft.operators.Availability

/** S8 probe kernel: correctness of the HTTP/file classification and the
  * latency batching of the per-partition thread pool (reference hides HEAD
  * latency with a cpu_count pool, `utils/image.py:107-117`).
  */
class AvailabilitySpec extends SparkSpec {

  private def withSlowServer(delayMs: Long)(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        Thread.sleep(delayMs)
        val code = if (ex.getRequestURI.getPath.startsWith("/missing")) 404 else 200
        ex.sendResponseHeaders(code, -1)
        ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16))
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  test("probe pool overlaps HEAD latency; order and outcomes preserved") {
    withSlowServer(delayMs = 200) { port =>
      val rows = (0 until 16).map { i =>
        val path = if (i == 5) "missing" else s"asset$i"
        Row(i, s"http://127.0.0.1:$port/$path")
      }
      val t0 = System.nanoTime()
      val out = Availability.probeRows(rows.iterator, urlIdx = 1,
        apiKey = None, concurrency = 8).toSeq
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      // sequential would be >= 16 * 200 = 3200 ms; 8-way is ~2 waves
      assert(elapsedMs < 1600, s"probes did not overlap: ${elapsedMs}ms")
      assert(out.map(_.getInt(0)) == (0 until 16), "input order must hold")
      assert(out.count(r => r.getBoolean(2)) == 15)
      val miss = out(5)
      assert(!miss.getBoolean(2) && miss.getInt(3) == 404)
    }
  }

  test("sequential path (concurrency=1) gives identical outcomes") {
    withSlowServer(delayMs = 1) { port =>
      val rows = (0 until 4).map(i => Row(i, s"http://127.0.0.1:$port/a$i"))
      val fast = Availability.probeRows(rows.iterator, 1, None, 8).toSeq
      val slow = Availability.probeRows(rows.iterator, 1, None, 1).toSeq
      assert(fast == slow)
    }
  }

  test("local file probe classifies readable vs missing") {
    val f = java.nio.file.Files.createTempFile("avail", ".tif")
    val ok = Availability.probeUrl(f.toString)
    assert(ok.ok && ok.status == 0)
    val gone = Availability.probeUrl("/no/such/path.tif")
    assert(!gone.ok && gone.status == 404)
    java.nio.file.Files.delete(f)
  }

  test("distributed probe appends columns through mapPartitions") {
    import spark.implicits._
    val df = Seq((1, "/no/such/a.tif"), (2, "other-scheme://x")).toDF("id", "link")
    val got = Availability.probe(df, "link").orderBy("id").collect()
    assert(!got(0).getBoolean(2) && got(0).getInt(3) == 404)
    assert(got(1).getBoolean(2)) // non-HTTP schemes pass like the reference
  }
}
