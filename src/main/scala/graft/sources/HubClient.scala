package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

/** Hugging Face Hub snapshot client — the wire protocol behind the
  * reference's `snapshot_download(repo_id, repo_type="dataset", local_dir)`
  * (`crystpqdb/download.py:11-18`), re-implemented from the PUBLIC hub HTTP
  * API (huggingface.co/docs/hub/api):
  *
  *   - tree listing: `GET {endpoint}/api/{type}s/{repo}/tree/{rev}?recursive=true`
  *     returning `[{"type":"file"|"directory","path":…,"size":…}, …]`,
  *     paginated via the standard `Link: <url>; rel="next"` response header,
  *   - file payloads: `GET {endpoint}/datasets/{repo}/resolve/{rev}/{path}`
  *     (the `datasets/` prefix is the dataset-repo form; models resolve at
  *     the bare repo path), streamed through [[Fetcher.streamDownload]]'s
  *     temp-then-rename + skip-if-exists caching,
  *   - fan-out: [[Fetcher.downloadAll]]'s worker pool, like the
  *     reference's threaded uploads (`download.py:21-29`).
  *
  * After the fan-out every staged file's on-disk length is cross-checked
  * against the tree listing's `size` — the same trust-but-verify step
  * `ParquetDatabase.pushTo` applies to replicas. Loopback-exercised in
  * ProtocolClientsSpec; only the live hub endpoint is unreachable from the
  * zero-egress build environment.
  */
object HubClient {

  private val mapper = new ObjectMapper()

  final case class TreeEntry(path: String, size: Long)

  /** Percent-encode a repo-relative path for URL embedding, one segment at
    * a time with '/' preserved — the same per-segment quoting the
    * reference's huggingface_hub client applies. Without it a space in a
    * tree entry makes the request URI invalid, and '#'/'?'/'%' silently
    * truncate or alter the request (real dataset repos do contain such
    * filenames, and the size cross-check would then hard-fail the whole
    * snapshot).
    */
  private[sources] def encodePath(path: String): String =
    path.split("/", -1).map { seg =>
      // URLEncoder is form encoding: '+' means space there, %20 on a path
      java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20")
    }.mkString("/")

  /** List every FILE in the repo tree at `revision` (directories recursed
    * server-side via `recursive=true`), following `Link rel="next"` pages.
    */
  def listTree(endpoint: String, repoId: String, repoType: String = "dataset",
      revision: String = "main", timeoutSeconds: Int = 60,
      maxPages: Int = 10000): Seq[TreeEntry] = {
    val first =
      s"$endpoint/api/${repoType}s/${encodePath(repoId)}/tree/${encodePath(revision)}?recursive=true"
    val out = Seq.newBuilder[TreeEntry]
    var next: Option[String] = Some(first)
    var pages = 0
    while (next.isDefined) {
      pages += 1
      if (pages > maxPages)
        throw new java.io.IOException(
          s"HubClient: tree listing still paging after $maxPages pages — refusing to loop forever")
      val url = next.get
      val (headers, body) = Fetcher.getChecked(url, Nil, timeoutSeconds)
      val root = mapper.readTree(body)
      if (!root.isArray)
        throw new java.io.IOException(
          s"HubClient: tree page was not a JSON array: ${new String(body, StandardCharsets.UTF_8).take(200)}")
      root.forEach { n =>
        if (n.path("type").asText == "file")
          out += TreeEntry(n.path("path").asText, n.path("size").asLong)
      }
      next = nextLink(headers)
    }
    out.result()
  }

  /** Download the full repo snapshot into `localDir`, preserving the tree's
    * relative paths. Returns the staged files in tree order. Re-runs are
    * incremental (skip-if-exists per file). Tree paths that would escape
    * `localDir` fail loudly — same traversal guard as [[Fetcher.unzip]].
    */
  def snapshotDownload(endpoint: String, repoId: String, localDir: String,
      repoType: String = "dataset", revision: String = "main",
      numWorkers: Int = 8, timeoutSeconds: Int = 60,
      maxPages: Int = 10000): Seq[File] = {
    val entries = listTree(endpoint, repoId, repoType, revision, timeoutSeconds, maxPages)
    val resolveBase = repoType match {
      case "dataset" => s"$endpoint/datasets/${encodePath(repoId)}"
      case "space"   => s"$endpoint/spaces/${encodePath(repoId)}"
      case _         => s"$endpoint/${encodePath(repoId)}" // model repos resolve at the bare path
    }
    val destRoot = new File(localDir).getCanonicalPath + File.separator
    val plan = entries.map { e =>
      val dest = new File(localDir, e.path)
      if (!(dest.getCanonicalPath + File.separator).startsWith(destRoot))
        throw new SecurityException(s"tree entry escapes local_dir: ${e.path}")
      (s"$resolveBase/resolve/${encodePath(revision)}/${encodePath(e.path)}", dest.getPath)
    }
    val files = Fetcher.downloadAll(plan, numWorkers, timeoutSeconds)
    // trust-but-verify: a truncated transfer that slipped past the
    // temp-then-rename (e.g. a server that closed early with 200) must not
    // be silently cached forever by skip-if-exists
    entries.zip(files).foreach { case (e, f) =>
      if (f.length != e.size)
        throw new java.io.IOException(
          s"HubClient: ${e.path} staged ${f.length} bytes but the tree lists ${e.size} — " +
            "delete the file and re-run to re-fetch")
    }
    files
  }

  /** Upload ONE file to the hub via the public commit API — the write half
    * of the reference's replication (`download.py:21-29` runs one
    * `upload_file` per parquet shard): `POST {endpoint}/api/{type}s/{repo}
    * /commit/{revision}` with an `application/x-ndjson` body — a `header`
    * line (commit summary) then a `file` line carrying the base64 payload —
    * under `Authorization: Bearer {token}`. Returns the server's commit
    * response body (opaque JSON).
    *
    * SIZE LIMITATION (documented, not yet implemented): the live hub's
    * commit API accepts inline base64 only for small text-ish payloads —
    * large/binary files (parquet shards, the reference's exact use case)
    * must go through the LFS preupload leg (`POST …/preupload/{revision}`
    * to learn each file's upload mode, then the S3 multipart dance, then a
    * `lfsFile` commit line carrying the OID instead of content). This
    * client implements only the inline leg, and it buffers the whole file
    * (×~1.33 as base64) in heap — [[uploadAll]] holds up to `numWorkers`
    * such buffers concurrently. Fine for the loopback tests and small
    * metadata files; a production push of parquet shards needs the LFS leg
    * added here.
    */
  def uploadFile(endpoint: String, token: String, repoId: String,
      pathInRepo: String, data: Array[Byte], repoType: String = "dataset",
      revision: String = "main", summary: String = "upload",
      timeoutSeconds: Int = 60): Array[Byte] = {
    require(token.nonEmpty, "HubClient.uploadFile: token not provided")
    require(!pathInRepo.split('/').contains(".."),
      s"HubClient.uploadFile: path escapes the repo: $pathInRepo")
    val header = mapper.createObjectNode()
    header.put("key", "header")
    header.putObject("value").put("summary", summary)
    val file = mapper.createObjectNode()
    file.put("key", "file")
    val fv = file.putObject("value")
    fv.put("path", pathInRepo)
    fv.put("content", java.util.Base64.getEncoder.encodeToString(data))
    fv.put("encoding", "base64")
    val ndjson = (mapper.writeValueAsString(header) + "\n" +
      mapper.writeValueAsString(file) + "\n").getBytes(StandardCharsets.UTF_8)
    Fetcher.postChecked(
      s"$endpoint/api/${repoType}s/${encodePath(repoId)}/commit/${encodePath(revision)}", ndjson,
      "application/x-ndjson", Seq("Authorization" -> s"Bearer $token"),
      timeoutSeconds)
  }

  /** Threaded per-file upload fan-out — the reference's
    * `_upload_file_thread` pool (`download.py:21-39`: one commit per
    * file, files in parallel). Returns the paths uploaded, in input order.
    */
  def uploadAll(endpoint: String, token: String, repoId: String,
      files: Seq[(String, java.io.File)], repoType: String = "dataset",
      revision: String = "main", numWorkers: Int = 8,
      timeoutSeconds: Int = 60): Seq[String] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, numWorkers))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = files.map { case (pathInRepo, f) =>
        (() => {
          uploadFile(endpoint, token, repoId, pathInRepo,
            java.nio.file.Files.readAllBytes(f.toPath), repoType, revision,
            summary = s"upload $pathInRepo", timeoutSeconds = timeoutSeconds)
          pathInRepo
        }): java.util.concurrent.Callable[String]
      }
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
    } finally pool.shutdown()
  }

  /** `Link: <url1>; rel="..."` header → the rel="next" URL, if any.
    * Scans for `<url>; rel="…"` pairs instead of splitting on commas —
    * a comma is legal INSIDE a URI (query values), and `[^>]+` cannot
    * run past the closing angle bracket, so comma-bearing next-URLs
    * parse instead of silently ending pagination early.
    */
  private[sources] def nextLink(headers: Map[String, Seq[String]]): Option[String] =
    headers.getOrElse("link", Nil).iterator
      .flatMap(LinkRe.findAllMatchIn)
      .collectFirst { case m if m.group(2) == "next" => m.group(1) }

  private val LinkRe = """<([^>]+)>\s*;\s*rel="([^"]+)"""".r
}
