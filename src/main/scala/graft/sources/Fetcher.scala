package graft.sources

import java.io.{File, FileInputStream, FileOutputStream, InputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.zip.ZipInputStream
import scala.util.matching.Regex

/** Raw-stage fetch + archive utilities (SURVEY.md §2.1 R1/R2/R4/R5).
  *
  * Driver-side by design: the raw stage is a handful of archive/dump files
  * staged once per source (`alexandria.py:33-41`, `mc3d.py:70-86`); the
  * distributed work starts at `Loader.load()` where executors parse the
  * staged files in parallel. The HTTP path (status handling, redirects,
  * streaming body, fan-out) is exercised in FetcherSpec against a loopback
  * JDK HttpServer — real client/server HTTP without egress; only the
  * public-internet endpoints themselves are unreachable from the build
  * environment.
  */
object Fetcher {

  /** Streaming GET with chunked writes and skip-if-exists caching
    * (`alexandria.py:33-41` `_stream_download`: 1 MiB chunks, skip when the
    * output exists). Returns the output file.
    */
  def streamDownload(url: String, outputPath: String,
                     timeoutSeconds: Int = 60): File = {
    val out = new File(outputPath)
    Option(out.getParentFile).foreach(_.mkdirs())
    if (out.exists()) return out
    val in = open(url, timeoutSeconds)
    // write to a temp sibling then rename: a killed download must not leave
    // a half-file that skip-if-exists would later treat as complete
    val tmp = new File(out.getParentFile, out.getName + ".part")
    try {
      val os = new FileOutputStream(tmp)
      try copy(in, os, 1024 * 1024) finally os.close()
    } finally in.close()
    if (!tmp.renameTo(out))
      throw new java.io.IOException(s"rename failed: $tmp -> $out")
    out
  }

  /** HTML index listing → hrefs matching a pattern (`alexandria.py:44-52`:
    * scrape the directory index for `alexandria_*.json.bz2` links). A full
    * HTML parser is deliberately out of scope — directory indexes are
    * machine-generated `<a href="...">` lists.
    */
  def listIndex(indexUrl: String, hrefPattern: Regex,
                timeoutSeconds: Int = 60): Seq[String] = {
    val in = open(indexUrl, timeoutSeconds)
    val html = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    HrefRe.findAllMatchIn(html).map(_.group(1))
      .filter(h => hrefPattern.pattern.matcher(h).matches()).toSeq
  }

  private val HrefRe = """href\s*=\s*["']([^"']+)["']""".r

  /** Parallel fan-out of `streamDownload` over a worker pool
    * (`alexandria.py:106-127`: ThreadPoolExecutor over the index listing;
    * `LoaderConfig.num_workers` default 8).
    */
  def downloadAll(urlToPath: Seq[(String, String)], numWorkers: Int = 8,
                  timeoutSeconds: Int = 60): Seq[File] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, numWorkers))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = urlToPath.map { case (url, path) =>
        (() => streamDownload(url, path, timeoutSeconds)): java.util.concurrent.Callable[File]
      }
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
    } finally pool.shutdown()
  }

  /** Extract every `*.zip` directly under `dir` into `dir`, deleting each
    * archive afterwards (`mc3d.py:79-85`, `jarvis.py:50-59`: extractall +
    * unlink). Returns the extracted file paths.
    */
  def unzipAll(dir: String): Seq[String] = {
    val d = new File(dir)
    if (!d.isDirectory) return Nil
    Option(d.listFiles()).getOrElse(Array.empty[File]).toSeq
      .filter(f => f.isFile && f.getName.endsWith(".zip"))
      .sortBy(_.getName)
      .flatMap { z => val extracted = unzip(z, d); z.delete(); extracted }
  }

  /** Extract one zip archive under destDir. Entries that would escape
    * destDir (path traversal) fail loudly rather than write outside it.
    */
  def unzip(zip: File, destDir: File): Seq[String] = {
    val destRoot = destDir.getCanonicalPath + File.separator
    val in = new ZipInputStream(new FileInputStream(zip))
    val written = Seq.newBuilder[String]
    try {
      var e = in.getNextEntry
      while (e != null) {
        val target = new File(destDir, e.getName)
        if (!(target.getCanonicalPath + File.separator).startsWith(destRoot))
          throw new SecurityException(s"zip entry escapes destination: ${e.getName}")
        if (e.isDirectory) target.mkdirs()
        else {
          Option(target.getParentFile).foreach(_.mkdirs())
          val os = new FileOutputStream(target)
          try copy(in, os, 64 * 1024) finally os.close()
          written += target.getPath
        }
        in.closeEntry()
        e = in.getNextEntry
      }
    } finally in.close()
    written.result()
  }

  // one lazily-built client; HttpClient handles redirects, timeouts,
  // connection reuse. file:// URIs bypass it (HttpClient rejects them).
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** One-shot GET for protocol METADATA (API pages, tree listings): returns
    * (status, response headers, body). File payloads keep using
    * [[streamDownload]] — this buffers the whole body, which is right for
    * the KB-sized JSON the REST clients page through and wrong for archives.
    */
  private[sources] def get(url: String, headers: Seq[(String, String)] = Nil,
      timeoutSeconds: Int = 60): (Int, Map[String, Seq[String]], Array[Byte]) = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    import scala.jdk.CollectionConverters._
    val hs = resp.headers().map().asScala.map { case (k, vs) =>
      k.toLowerCase -> vs.asScala.toSeq
    }.toMap
    (resp.statusCode(), hs, resp.body())
  }

  /** [[get]] that fails loudly on non-2xx with a body snippet — the one
    * error contract both REST clients share. */
  private[sources] def getChecked(url: String, headers: Seq[(String, String)] = Nil,
      timeoutSeconds: Int = 60): (Map[String, Seq[String]], Array[Byte]) = {
    val (status, hs, body) = get(url, headers, timeoutSeconds)
    if (status / 100 != 2)
      throw new java.io.IOException(
        s"GET $url -> HTTP $status: ${new String(body, java.nio.charset.StandardCharsets.UTF_8).take(200)}")
    (hs, body)
  }

  /** One-shot POST under the same error contract as [[getChecked]] —
    * the write half of the REST clients (hub commit API). */
  private[sources] def postChecked(url: String, payload: Array[Byte],
      contentType: String, headers: Seq[(String, String)] = Nil,
      timeoutSeconds: Int = 60): Array[Byte] = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .header("Content-Type", contentType)
      .POST(HttpRequest.BodyPublishers.ofByteArray(payload))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"POST $url -> HTTP ${resp.statusCode()}: " +
          new String(resp.body(), java.nio.charset.StandardCharsets.UTF_8).take(200))
    resp.body()
  }

  private def open(url: String, timeoutSeconds: Int): InputStream = {
    val uri = URI.create(url)
    if (uri.getScheme == "file") {
      new FileInputStream(new File(uri))
    } else {
      val req = HttpRequest.newBuilder(uri)
        .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
      if (resp.statusCode() / 100 != 2) {
        resp.body().close()
        throw new java.io.IOException(s"GET $url -> HTTP ${resp.statusCode()}")
      }
      resp.body()
    }
  }

  private def copy(in: InputStream, out: java.io.OutputStream, bufBytes: Int): Unit = {
    val buf = new Array[Byte](bufBytes)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
  }
}
