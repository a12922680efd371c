package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** Fetcher unit tests: file:// staging plus a REAL HTTP round trip against
  * a JDK HttpServer on 127.0.0.1 (loopback needs no egress) — download,
  * caching, redirects, error statuses, index scrape, and the worker-pool
  * fan-out all run through the production HttpClient path.
  */
class FetcherSpec extends AnyFunSuite {

  private def freshDir(name: String): File = {
    val d = new File(s"target/tmp/fetcher/$name")
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rm)
      f.delete()
    }
    rm(d); d.mkdirs(); d
  }

  private def writeZip(zip: File, entries: (String, String)*): Unit = {
    val out = new ZipOutputStream(new FileOutputStream(zip))
    try entries.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }

  test("streamDownload stages a file:// URL and skips when the output exists") {
    val dir = freshDir("dl")
    val src = new File(dir, "src.json")
    Files.writeString(src.toPath, """{"k":1}""")
    val dest = s"$dir/staged/out.json"

    val out = Fetcher.streamDownload(src.toURI.toString, dest)
    assert(Files.readString(out.toPath) === """{"k":1}""")
    assert(!new File(s"$dest.part").exists()) // no temp residue

    // skip-if-exists: a changed source must NOT overwrite the staged copy
    Files.writeString(src.toPath, """{"k":2}""")
    Fetcher.streamDownload(src.toURI.toString, dest)
    assert(Files.readString(Paths.get(dest)) === """{"k":1}""")
  }

  test("downloadAll fans out over the worker pool") {
    val dir = freshDir("fan")
    val plan = (1 to 5).map { i =>
      val src = new File(dir, s"s$i.txt")
      Files.writeString(src.toPath, s"payload$i")
      (src.toURI.toString, s"$dir/out/f$i.txt")
    }
    val outs = Fetcher.downloadAll(plan, numWorkers = 3)
    assert(outs.size === 5)
    assert(Files.readString(Paths.get(s"$dir/out/f3.txt")) === "payload3")
  }

  test("listIndex extracts hrefs matching the pattern from an HTML index") {
    val dir = freshDir("idx")
    val idx = new File(dir, "index.html")
    Files.writeString(idx.toPath,
      """<html><body><a href="../">up</a>
        |<a href="alexandria_000.json.bz2">alexandria_000.json.bz2</a>
        |<a href='alexandria_001.json.bz2'>alexandria_001.json.bz2</a>
        |<a href="readme.txt">readme</a></body></html>""".stripMargin)
    val hrefs = Fetcher.listIndex(idx.toURI.toString, """^alexandria_.*\.json\.bz2$""".r)
    assert(hrefs === Seq("alexandria_000.json.bz2", "alexandria_001.json.bz2"))
  }

  test("unzipAll extracts nested entries and deletes the archive") {
    val dir = freshDir("unzip")
    writeZip(new File(dir, "bundle.zip"),
      "MC3D-cifs/mc3d/a.cif" -> "data_a", "MC3D-cifs/mc3d/b.cif" -> "data_b")
    val extracted = Fetcher.unzipAll(dir.getPath)
    assert(extracted.size === 2)
    assert(Files.readString(Paths.get(s"$dir/MC3D-cifs/mc3d/a.cif")) === "data_a")
    assert(!new File(dir, "bundle.zip").exists())
  }

  test("unzip rejects path-traversal entries") {
    val dir = freshDir("slip")
    writeZip(new File(dir, "evil.zip"), "../escape.txt" -> "nope")
    intercept[SecurityException](Fetcher.unzipAll(dir.getPath))
    assert(!new File(dir.getParentFile, "escape.txt").exists())
  }

  // ---- real-HTTP round trip on the loopback interface -------------------
  // The zero-egress build cannot reach the network, but 127.0.0.1 is local:
  // a JDK HttpServer exercises the SAME HttpClient code path (status
  // handling, redirects, streaming body) the production fetch uses — the
  // fetch layer is no longer file://-only-tested.

  private def withHttpServer(routes: Map[String, Array[Byte]])(f: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, body) =>
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.sendResponseHeaders(200, body.length.toLong)
        try ex.getResponseBody.write(body) finally ex.close()
      })
    }
    // a redirect and a guaranteed 404 for the error-path tests
    server.createContext("/redirect", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getResponseHeaders.set("Location",
        s"http://127.0.0.1:${server.getAddress.getPort}${routes.keys.head}")
      ex.sendResponseHeaders(302, -1L)
      ex.close()
    })
    server.createContext("/missing", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(404, -1L)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("streamDownload fetches over real HTTP, follows redirects, and caches") {
    val dir = freshDir("http_dl")
    val payload = Array.tabulate[Byte](3 * 1024 * 1024)(i => (i * 31).toByte) // > 1 chunk
    withHttpServer(Map("/data.bin" -> payload)) { base =>
      val out = Fetcher.streamDownload(s"$base/data.bin", s"$dir/data.bin")
      assert(Files.readAllBytes(out.toPath).sameElements(payload))
      assert(!new File(dir, "data.bin.part").exists(), "temp file left behind")
      // skip-if-exists: a second fetch of a CHANGED url must not re-download
      val again = Fetcher.streamDownload(s"$base/missing", s"$dir/data.bin")
      assert(Files.readAllBytes(again.toPath).sameElements(payload))
      // redirect handling (HttpClient Redirect.NORMAL)
      val red = Fetcher.streamDownload(s"$base/redirect", s"$dir/red.bin")
      assert(Files.readAllBytes(red.toPath).sameElements(payload))
    }
  }

  test("HTTP error statuses fail loudly and leave no output file") {
    val dir = freshDir("http_err")
    withHttpServer(Map("/ok" -> "x".getBytes("UTF-8"))) { base =>
      val e = intercept[java.io.IOException](
        Fetcher.streamDownload(s"$base/missing", s"$dir/nope.bin"))
      assert(e.getMessage.contains("404"))
      assert(!new File(dir, "nope.bin").exists())
      assert(!new File(dir, "nope.bin.part").exists())
    }
  }

  test("listIndex + downloadAll run the index-scrape fan-out over real HTTP") {
    val dir = freshDir("http_fan")
    val files = (0 until 4).map(i => s"/alexandria_$i.json.bz2" -> s"payload$i".getBytes("UTF-8")).toMap
    val index = files.keys.toSeq.sorted
      .map(h => s"""<a href="$h">$h</a>""").mkString("<html>", "\n", "</html>")
    withHttpServer(files + ("/index.html" -> index.getBytes("UTF-8"))) { base =>
      val hrefs = Fetcher.listIndex(s"$base/index.html", """/alexandria_\d+\.json\.bz2""".r)
      assert(hrefs.size === 4)
      val fetched = Fetcher.downloadAll(
        hrefs.map(h => s"$base$h" -> s"$dir${h.replace("/", s"${File.separator}")}"), numWorkers = 4)
      assert(fetched.size === 4)
      hrefs.zipWithIndex.foreach { case (h, _) =>
        val i = h.replaceAll(".*_(\\d+).*", "$1")
        assert(new String(Files.readAllBytes(Paths.get(s"$dir$h")), "UTF-8") === s"payload$i")
      }
    }
  }
}
