package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Materials Project REST staging client — the wire protocol behind the
  * reference's `MPRester(api_key).materials.summary.search()`
  * (`crystpqdb/loaders/mp.py:33-97`), re-implemented from the PUBLIC
  * Materials Project API surface (api.materialsproject.org):
  *
  *   - auth: `X-API-KEY` request header,
  *   - endpoint: `GET {base}/materials/summary/`,
  *   - field projection: `_fields=a,b,c` (the reference's 31-field pull),
  *   - pagination: `_page` / `_per_page`, response envelope
  *     `{"data": [...], "meta": {"total_doc": N}}`.
  *
  * Each page's `data` array stages to `destDir/summary_page{i}.json`, which
  * is exactly the multiline-JSON raw stage [[MpLoader]] ingests — so the
  * loopback-tested protocol path feeds the production loader end-to-end
  * (ProtocolClientsSpec). Driver-side by design like the rest of the raw
  * stage (Fetcher scaladoc): distributed work starts at `Loader.load()`.
  * Only the live third-party endpoint is unreachable from the zero-egress
  * build environment; the protocol logic itself is exercised.
  */
object MpRestClient {

  private val mapper = new ObjectMapper()

  /** Page through `/materials/summary/` and stage every page's `data`
    * array under `destDir`. Stops when a page comes back short (or empty),
    * cross-checked against `meta.total_doc` when the server sends it.
    * Fails loudly on non-2xx (401 ⇒ the reference's missing-API-key error
    * path, mp.py:38-42) and on a server that pages forever (`maxPages`).
    */
  def fetchSummary(baseUrl: String, apiKey: String, fields: Seq[String],
      perPage: Int, destDir: String, maxPages: Int = 10000,
      timeoutSeconds: Int = 60): Seq[File] = {
    require(apiKey.nonEmpty,
      "MpRestClient: API key not provided (the reference raises the same, mp.py:38-42)")
    require(perPage >= 1, s"MpRestClient: perPage must be >= 1, got $perPage")
    val destRoot = new File(destDir)
    destRoot.mkdirs()
    // a previous longer run's pages must not survive into this staging:
    // MpLoader globs $rawDir/*.json, so stale summary_page files would be
    // silently ingested alongside the fresh ones
    Option(destRoot.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.getName.startsWith("summary_page") && f.getName.endsWith(".json"))
      .foreach(_.delete())
    val fieldsParam =
      if (fields.isEmpty) "" else s"&_fields=${fields.mkString(",")}"
    val staged = Seq.newBuilder[File]
    var page = 1
    var done = false
    var seen = 0L
    while (!done) {
      if (page > maxPages)
        throw new java.io.IOException(
          s"MpRestClient: server still paging after $maxPages pages — refusing to loop forever")
      val url = s"$baseUrl/materials/summary/?_page=$page&_per_page=$perPage$fieldsParam"
      val (_, body) = Fetcher.getChecked(url, Seq("X-API-KEY" -> apiKey), timeoutSeconds)
      val root = mapper.readTree(body)
      val data = root.path("data")
      if (!data.isArray)
        throw new java.io.IOException(
          s"MpRestClient: page $page carried no 'data' array: ${new String(body, StandardCharsets.UTF_8).take(200)}")
      if (data.size > 0) {
        val f = new File(destDir, s"summary_page$page.json")
        Files.write(f.toPath, mapper.writeValueAsBytes(data))
        staged += f
        seen += data.size
      }
      val total = totalDoc(root)
      done = data.size < perPage || total.exists(seen >= _)
      // the total_doc cross-check cuts BOTH ways: over-delivery means the
      // server is mis-paginating (duplicates would stage silently), and a
      // short final page below the declared total means a truncated
      // dataset would feed MpLoader as if complete
      total.foreach { t =>
        if (seen > t) throw new java.io.IOException(
          s"MpRestClient: staged $seen docs but meta.total_doc=$t — server pagination is inconsistent")
        if (done && seen < t) throw new java.io.IOException(
          s"MpRestClient: pagination ended at $seen docs but meta.total_doc=$t — partial dataset")
      }
      page += 1
    }
    staged.result()
  }

  private def totalDoc(root: JsonNode): Option[Long] = {
    val n = root.path("meta").path("total_doc")
    if (n.isNumber) Some(n.asLong) else None
  }
}
