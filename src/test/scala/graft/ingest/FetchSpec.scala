package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import java.io.{ByteArrayInputStream, IOException, InputStream}
import java.net.InetSocketAddress
import java.nio.file.Files

/** S4 — fetch retry/backoff/skip-existing semantics, offline: the
  * transport is injected for the retry-path tests, and a loopback
  * com.sun.net.httpserver stub exercises the real [[Fetch.openHttp]]
  * transport (status mapping, streamed body) without egress. */
class FetchSpec extends AnyFunSuite {

  private def tmpOut() =
    Files.createTempDirectory("graft-fetch").resolve("out.tsv.gz")

  private def bytes(s: String): InputStream =
    new ByteArrayInputStream(s.getBytes("UTF-8"))

  test("downloads stream to the target path (no .part left behind)") {
    val out = tmpOut()
    val res = Fetch.downloadFile("http://x/f", out, open = _ => bytes("data"))
    assert(res == Fetch.Downloaded)
    assert(new String(Files.readAllBytes(out), "UTF-8") == "data")
    assert(!Files.exists(out.resolveSibling("out.tsv.gz.part")))
  }

  test("retry-then-success: connection errors retried with backoff") {
    val out = tmpOut()
    var calls = 0
    val sleeps = scala.collection.mutable.Buffer[Long]()
    val res = Fetch.downloadFile("http://x/f", out,
      open = { _ =>
        calls += 1
        if (calls < 3) throw new IOException("connection refused")
        bytes("eventually")
      },
      sleep = sleeps += _)
    assert(res == Fetch.Downloaded)
    assert(calls == 3)
    // tenacity wait_exponential(min=4, max=10): 4 s then 8 s
    assert(sleeps.toSeq == Seq(4000L, 8000L))
    assert(new String(Files.readAllBytes(out), "UTF-8") == "eventually")
  }

  test("the last connection error is rethrown (reraise), nothing written") {
    val out = tmpOut()
    var calls = 0
    intercept[IOException] {
      Fetch.downloadFile("http://x/f", out, attempts = 3,
        open = { _ => calls += 1; throw new IOException("down") },
        sleep = _ => ())
    }
    assert(calls == 3)
    assert(!Files.exists(out))
  }

  test("mid-stream failure on the last attempt leaves no .part behind") {
    val out = tmpOut()
    intercept[IOException] {
      Fetch.downloadFile("http://x/f", out, attempts = 1,
        open = { _ =>
          new InputStream {
            private var n = 0
            override def read(): Int = {
              n += 1
              if (n > 3) throw new IOException("reset") else 'x'
            }
          }
        },
        sleep = _ => ())
    }
    assert(!Files.exists(out))
    assert(!Files.exists(out.resolveSibling("out.tsv.gz.part")))
  }

  test("HTTP error status is terminal — no retry") {
    val out = tmpOut()
    var calls = 0
    val res = Fetch.downloadFile("http://x/f", out,
      open = { u => calls += 1; throw Fetch.HttpStatusError(u, 404) },
      sleep = _ => fail("must not sleep on a terminal status"))
    assert(res == Fetch.Failed(404))
    assert(calls == 1)
  }

  test("skip-existing: no request is made when the file is present") {
    val out = tmpOut()
    Files.createDirectories(out.getParent)
    Files.writeString(out, "already here")
    val res = Fetch.downloadFile("http://x/f", out,
      open = _ => fail("transport must not be invoked"))
    assert(res == Fetch.SkippedExisting)
    assert(new String(Files.readAllBytes(out), "UTF-8") == "already here")
  }

  test("mid-stream failure retries and the .part file never becomes out") {
    val out = tmpOut()
    var calls = 0
    val res = Fetch.downloadFile("http://x/f", out,
      open = { _ =>
        calls += 1
        if (calls == 1) new InputStream {
          private var n = 0
          override def read(): Int = {
            n += 1
            if (n > 3) throw new IOException("reset") else 'x'
          }
        } else bytes("clean")
      },
      sleep = _ => ())
    assert(res == Fetch.Downloaded)
    assert(new String(Files.readAllBytes(out), "UTF-8") == "clean")
  }

  test("fetchDaily lays files out per type; one failure doesn't stop others") {
    val dest = Files.createTempDirectory("graft-fetch-daily")
    val date = java.time.LocalDate.of(2025, 8, 20)
    val res = Fetch.fetchDaily("http://host/dumps", "bitcoin",
      Seq("blocks", "transactions"), date, dest,
      open = { u =>
        if (u.contains("transactions")) throw Fetch.HttpStatusError(u, 404)
        else bytes("blockdata")
      },
      sleep = _ => ())
    assert(res("blocks") == Fetch.Downloaded)
    assert(res("transactions") == Fetch.Failed(404))
    val blocksFile = dest.resolve("blocks")
      .resolve("blockchair_bitcoin_blocks_20250820.tsv.gz")
    assert(Files.exists(blocksFile))
  }

  test("openHttp against a loopback stub: 200 streams, 404 is terminal") {
    val server = com.sun.net.httpserver.HttpServer
      .create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext("/ok", { ex =>
        val body = "stub-body".getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      })
      server.createContext("/missing", { ex =>
        ex.sendResponseHeaders(404, -1)
        ex.close()
      })
      server.start()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"

      val out = tmpOut()
      assert(Fetch.downloadFile(s"$base/ok", out) == Fetch.Downloaded)
      assert(new String(Files.readAllBytes(out), "UTF-8") == "stub-body")

      val out2 = tmpOut()
      assert(Fetch.downloadFile(s"$base/missing", out2) == Fetch.Failed(404))
      assert(!Files.exists(out2))
    } finally server.stop(0)
  }
}
