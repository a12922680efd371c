package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Loopback round trips for the two third-party wire protocols the
  * reference speaks — the Materials Project REST API (mp.py:33-97) and the
  * Hugging Face hub snapshot API (download.py:11-18) — served by a JDK
  * HttpServer on 127.0.0.1 so the production HttpClient path runs without
  * egress. The MP test closes the loop into [[MpLoader]]: protocol-staged
  * pages are the loader's raw stage, so REST fetch → canonical schema is
  * one tested path.
  */
class ProtocolClientsSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val dir = s"target/tmp/protocol/$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
    Files.createDirectories(Paths.get(dir))
    dir
  }

  private def withServer(handlers: Map[String, HttpExchange => Unit])(f: String => Unit): Unit = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    handlers.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => try h(ex) finally ex.close())
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String,
      headers: (String, String)*): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private def queryParam(ex: HttpExchange, key: String): Option[String] =
    Option(ex.getRequestURI.getQuery).toSeq.flatMap(_.split("&"))
      .map(_.split("=", 2)).collectFirst { case Array(`key`, v) => v }

  // ---- Materials Project REST ------------------------------------------

  /** 3 summary docs at perPage=2: page 1 full, page 2 short → stop. */
  private def mpHandler(apiKey: String): HttpExchange => Unit = { ex =>
    if (ex.getRequestHeaders.getFirst("X-API-KEY") != apiKey)
      respond(ex, 401, """{"detail":"API key missing or invalid"}""")
    else if (!queryParam(ex, "_fields").exists(_.contains("material_id")))
      // contract violations answer 400 rather than assert on the server
      // dispatch thread — the client surfaces the body in its IOException,
      // so a regression names itself instead of hiding behind a closed
      // connection
      respond(ex, 400, """{"detail":"missing _fields projection"}""")
    else {
      val page = queryParam(ex, "_page").map(_.toInt).getOrElse(1)
      val docs = Seq(
        """{"material_id":"mp-1","band_gap":1.0,"total_energy":-2.0}""",
        """{"material_id":"mp-2","band_gap":0.0,"total_energy":-3.0}""",
        """{"material_id":"mp-3","band_gap":2.5,"total_energy":-4.0}""")
      val pageDocs = docs.slice((page - 1) * 2, (page - 1) * 2 + 2)
      respond(ex, 200,
        s"""{"data":[${pageDocs.mkString(",")}],"meta":{"total_doc":3}}""")
    }
  }

  test("MpRestClient pages /materials/summary/ with X-API-KEY and stages MpLoader's raw stage") {
    val dataDir = freshDir("mp_rest")
    withServer(Map("/materials/summary/" -> mpHandler("test-key"))) { base =>
      val loader = MpLoader(spark, LoaderConfig(dataDir))
      val staged = MpRestClient.fetchSummary(base, "test-key",
        Seq("material_id", "band_gap", "total_energy"), perPage = 2,
        destDir = loader.rawDir)
      assert(staged.map(_.getName) === Seq("summary_page1.json", "summary_page2.json"))

      // protocol-staged pages ARE the production raw stage: run the loader
      val out = loader.run()
      assert(out.count() === 3)
      assert(out.select("source_id").orderBy("source_id").collect().map(_.getString(0)).toSeq
        === Seq("mp-1", "mp-2", "mp-3"))
      assert(out.filter(col("source_id") === "mp-3")
        .select(col("data.band_gap")).head().getDouble(0) === 2.5)
    }
  }

  test("MpRestClient fails loudly on a bad key (401), a missing key, and runaway pagination") {
    withServer(Map("/materials/summary/" -> mpHandler("right-key"))) { base =>
      val e = intercept[java.io.IOException] {
        MpRestClient.fetchSummary(base, "wrong-key", Seq("material_id"), 2, freshDir("mp_401"))
      }
      assert(e.getMessage.contains("401"))
    }
    intercept[IllegalArgumentException] {
      MpRestClient.fetchSummary("http://127.0.0.1:1", "", Seq("material_id"), 2, freshDir("mp_nokey"))
    }
    // a server that ignores _page and always returns a FULL first page:
    // total_doc cross-check stops the loop with a named error, not a spin
    val evil: HttpExchange => Unit = { ex =>
      respond(ex, 200,
        """{"data":[{"material_id":"mp-1"},{"material_id":"mp-2"}],"meta":{"total_doc":3}}""")
    }
    withServer(Map("/materials/summary/" -> evil)) { base =>
      val e = intercept[java.io.IOException] {
        MpRestClient.fetchSummary(base, "k", Seq("material_id"), 2, freshDir("mp_evil"))
      }
      assert(e.getMessage.contains("pagination is inconsistent"))
    }
    // under-delivery: the server declares total_doc=5 but ends after 3
    // docs — a truncated dataset must not stage as if complete
    val short: HttpExchange => Unit = { ex =>
      val page = queryParam(ex, "_page").map(_.toInt).getOrElse(1)
      val body =
        if (page == 1) """{"data":[{"material_id":"mp-1"},{"material_id":"mp-2"}],"meta":{"total_doc":5}}"""
        else """{"data":[{"material_id":"mp-3"}],"meta":{"total_doc":5}}"""
      respond(ex, 200, body)
    }
    withServer(Map("/materials/summary/" -> short)) { base =>
      val e = intercept[java.io.IOException] {
        MpRestClient.fetchSummary(base, "k", Seq("material_id"), 2, freshDir("mp_short"))
      }
      assert(e.getMessage.contains("partial dataset"))
    }
  }

  // ---- Hugging Face hub snapshot ---------------------------------------

  test("HubClient.snapshotDownload walks the paginated tree and stages files by resolve path") {
    val local = freshDir("hub_snap")
    // mutated on server dispatch threads, read on the test thread
    val treeHits = new java.util.concurrent.atomic.AtomicInteger(0)
    // the Link header embeds the server's own base URL, so the server is
    // built first and the contexts reference its bound port
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    val handlers: Map[String, HttpExchange => Unit] = Map(
      "/api/datasets/acme/corpus/tree/main" -> { ex =>
        treeHits.incrementAndGet()
        queryParam(ex, "cursor") match {
          case None if !queryParam(ex, "recursive").contains("true") =>
            respond(ex, 400, """{"error":"tree listing must be recursive"}""")
          case None =>
            respond(ex, 200,
              """[{"type":"file","path":"a.txt","size":9},{"type":"directory","path":"sub","size":0}]""",
              "Link" -> s"""<$base/api/datasets/acme/corpus/tree/main?recursive=true&cursor=p2>; rel="next"""")
          case Some("p2") =>
            respond(ex, 200, """[{"type":"file","path":"sub/b.bin","size":4}]""")
          case other =>
            respond(ex, 400, s"""{"error":"unexpected cursor $other"}""")
        }
      },
      "/datasets/acme/corpus/resolve/main/a.txt" -> (respond(_, 200, "payload-a")),
      "/datasets/acme/corpus/resolve/main/sub/b.bin" -> (respond(_, 200, "abcd")))
    handlers.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => try h(ex) finally ex.close())
    }
    server.start()
    try {
      val files = HubClient.snapshotDownload(base, "acme/corpus", local, numWorkers = 2)
      assert(files.map(_.getName) === Seq("a.txt", "b.bin"))
      assert(Files.readString(Paths.get(s"$local/a.txt")) === "payload-a")
      assert(Files.readString(Paths.get(s"$local/sub/b.bin")) === "abcd")

      // incremental re-run: both files exist → skip-if-exists, no re-fetch
      val before = treeHits.get()
      HubClient.snapshotDownload(base, "acme/corpus", local, numWorkers = 2)
      assert(treeHits.get() === before + 2) // tree is re-listed (2 pages), payloads are not re-read
    } finally server.stop(0)
  }

  test("HubClient rejects traversal paths and size-mismatched transfers") {
    withServer(Map(
      "/api/datasets/acme/evil/tree/main" -> (respond(_, 200,
        """[{"type":"file","path":"../escape.txt","size":1}]""")))) { base =>
      intercept[SecurityException] {
        HubClient.snapshotDownload(base, "acme/evil", freshDir("hub_evil"))
      }
    }
    withServer(Map(
      "/api/datasets/acme/trunc/tree/main" -> (respond(_, 200,
        """[{"type":"file","path":"t.txt","size":100}]""")),
      "/datasets/acme/trunc/resolve/main/t.txt" -> (respond(_, 200, "short")))) { base =>
      val e = intercept[java.io.IOException] {
        HubClient.snapshotDownload(base, "acme/trunc", freshDir("hub_trunc"))
      }
      assert(e.getMessage.contains("tree lists 100"))
    }
  }

  test("HubClient.uploadAll commits each file via the NDJSON commit API under a Bearer token") {
    val received = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val handler: HttpExchange => Unit = { ex =>
      if (ex.getRequestHeaders.getFirst("Authorization") != "Bearer tok-1")
        respond(ex, 401, """{"error":"invalid token"}""")
      else if (ex.getRequestHeaders.getFirst("Content-Type") != "application/x-ndjson")
        respond(ex, 400, """{"error":"commit body must be x-ndjson"}""")
      else {
        val lines = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val parsed = lines.map(mapper.readTree)
        if (parsed.headOption.exists(_.path("key").asText != "header"))
          respond(ex, 400, """{"error":"first NDJSON line must be the commit header"}""")
        else {
          parsed.drop(1).foreach { n =>
            if (n.path("key").asText == "file" &&
                n.path("value").path("encoding").asText == "base64")
              received.put(n.path("value").path("path").asText,
                java.util.Base64.getDecoder.decode(n.path("value").path("content").asText))
          }
          respond(ex, 200, """{"commitUrl":"http://h/c/1"}""")
        }
      }
    }
    withServer(Map("/api/datasets/acme/sink/commit/main" -> handler)) { base =>
      val dir = freshDir("hub_up")
      val files = Seq("part-0.parquet", "part-1.parquet", "meta/manifest.json").map { name =>
        val f = new java.io.File(dir, name.replace('/', '_'))
        Files.write(f.toPath, s"payload-of-$name".getBytes(StandardCharsets.UTF_8))
        name -> f
      }
      val done = HubClient.uploadAll(base, "tok-1", "acme/sink", files, numWorkers = 2)
      assert(done === files.map(_._1))
      assert(received.size === 3)
      assert(new String(received.get("meta/manifest.json"), StandardCharsets.UTF_8)
        === "payload-of-meta/manifest.json")

      val bad = intercept[java.io.IOException] {
        HubClient.uploadFile(base, "wrong", "acme/sink", "x.txt", Array[Byte](1))
      }
      assert(bad.getMessage.contains("401"))
      intercept[IllegalArgumentException] {
        HubClient.uploadFile(base, "tok-1", "acme/sink", "../escape.txt", Array[Byte](1))
      }
    }
  }

  test("HubClient.nextLink parses the standard Link header and ignores other rels") {
    assert(HubClient.nextLink(Map("link" ->
      Seq("""<http://h/page2>; rel="next", <http://h/page9>; rel="last""""))) ===
      Some("http://h/page2"))
    assert(HubClient.nextLink(Map("link" -> Seq("""<http://h/x>; rel="prev""""))) === None)
    assert(HubClient.nextLink(Map.empty) === None)
    // a comma is legal INSIDE a URI — it must not be read as a Link
    // separator (naive split-on-comma silently ends pagination here)
    assert(HubClient.nextLink(Map("link" ->
      Seq("""<http://h/tree?cursor=a,b&recursive=true>; rel="next""""))) ===
      Some("http://h/tree?cursor=a,b&recursive=true"))
  }

  test("HubClient.encodePath percent-encodes segments, preserving '/' (r10 advice)") {
    // space would make the request URI invalid; '#'/'?'/'%' would truncate
    // or alter it; '/' is the segment separator and must survive
    assert(HubClient.encodePath("data/train-00000-of-00001.parquet") ===
      "data/train-00000-of-00001.parquet")
    assert(HubClient.encodePath("a b/c#d.parquet") === "a%20b/c%23d.parquet")
    assert(HubClient.encodePath("q?x/p%1/r+s") === "q%3Fx/p%251/r%2Bs")
  }
}
