package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** Fetcher unit tests — file:// URLs only (zero-egress build). */
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
}
