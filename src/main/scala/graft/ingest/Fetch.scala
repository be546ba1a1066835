package graft.ingest

import java.io.{IOException, InputStream}
import java.nio.file.{Files, Path, StandardCopyOption}

/** S4 — driver-side daily fetch: streamed download with bounded retries,
  * exponential backoff, and skip-if-present (reference:
  * download_blockchair_data.py:181-215 — requests.get(stream=True,
  * timeout=30), 8 KiB chunks, tenacity stop_after_attempt(3) +
  * wait_exponential(min=4, max=10) on connection/timeout errors only;
  * an HTTP error status is terminal, not retried).
  *
  * This is deliberately driver-side I/O, not a Spark job: one file per
  * table per day is a handful of sequential GETs; the cluster enters at
  * [[Tsv.read]]. The transport is injectable so zero-egress environments
  * test the retry/skip/stream logic against a local stub.
  */
object Fetch {

  sealed trait Result
  /** File streamed to disk (atomically, via a `.part` temp + move). */
  case object Downloaded extends Result
  /** `skipExisting` and the target already exists — no request made. */
  case object SkippedExisting extends Result
  /** Terminal HTTP error status (4xx/5xx) — not retried. */
  final case class Failed(status: Int) extends Result

  /** Terminal (non-retryable) HTTP status, thrown by the transport. */
  final case class HttpStatusError(url: String, status: Int)
    extends IOException(s"HTTP $status for $url")

  /** tenacity wait_exponential(multiplier=1, min=4, max=10) in millis:
    * 4 s after the first failure, 8 s, then 10 s capped. */
  def defaultBackoffMillis(attempt: Int): Long =
    math.min(10L, math.max(4L, 1L << (attempt + 1))) * 1000L

  /** Default transport: HTTP GET with 30 s connect/read timeouts.
    * Connection/timeout failures surface as plain IOExceptions
    * (retryable); error statuses as [[HttpStatusError]] (terminal). */
  def openHttp(url: String): InputStream = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(30000)
    val status = conn.getResponseCode
    if (status >= 400) {
      conn.disconnect()
      throw HttpStatusError(url, status)
    }
    conn.getInputStream
  }

  /** Download `url` to `out`. Retries connection-level IOExceptions up to
    * `attempts` times with exponential backoff; an [[HttpStatusError]]
    * fails immediately (a 404 for a not-yet-published daily dump will not
    * succeed on retry). The last attempt's connection error is rethrown
    * (tenacity reraise=True). Writes stream through an 8 KiB buffer to a
    * sibling `.part` file, then move — a killed download never leaves a
    * truncated file that `skipExisting` would later trust. */
  def downloadFile(url: String, out: Path, skipExisting: Boolean = true,
      attempts: Int = 3,
      backoffMillis: Int => Long = defaultBackoffMillis,
      sleep: Long => Unit = Thread.sleep,
      open: String => InputStream = openHttp): Result = {
    if (skipExisting && Files.exists(out)) return SkippedExisting
    var attempt = 1
    while (true) {
      try {
        val in = open(url)
        try {
          if (out.getParent != null) Files.createDirectories(out.getParent)
          val tmp = out.resolveSibling(out.getFileName.toString + ".part")
          try {
            val os = Files.newOutputStream(tmp)
            try {
              val buf = new Array[Byte](8192)
              var n = in.read(buf)
              while (n >= 0) {
                if (n > 0) os.write(buf, 0, n)
                n = in.read(buf)
              }
            } finally os.close()
            Files.move(tmp, out, StandardCopyOption.REPLACE_EXISTING)
          } catch { case e: Throwable =>
            Files.deleteIfExists(tmp) // no orphaned .part on failure
            throw e
          }
          return Downloaded
        } finally in.close()
      } catch {
        case HttpStatusError(_, status) => return Failed(status)
        case e: IOException =>
          if (attempt >= attempts) throw e
          sleep(backoffMillis(attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One day's fetch across table types, laid out
    * `destDir/<type>/blockchair_<coin>_<type>_<yyyyMMdd>.tsv.gz`
    * (download_blockchair_data.py:306-314 + the per-type subdirectory
    * convention of clean_old_files). Returns per-type results; a terminal
    * failure of one type does not stop the others. */
  def fetchDaily(baseUrl: String, coin: String, tableTypes: Seq[String],
      date: java.time.LocalDate, destDir: Path,
      skipExisting: Boolean = true,
      open: String => InputStream = openHttp,
      sleep: Long => Unit = Thread.sleep,
      apiKey: Option[String] = None): Map[String, Result] =
    tableTypes.map { t =>
      val url = Tsv.dailyFileUrl(baseUrl, coin, t, date, apiKey)
      val out = destDir.resolve(t).resolve(Tsv.dailyFileName(coin, t, date))
      val res =
        try downloadFile(url, out, skipExisting, open = open, sleep = sleep)
        catch { case _: IOException => Failed(-1) }
      t -> res
    }.toMap
}
