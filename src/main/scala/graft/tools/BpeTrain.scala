package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions

/** Build-time generator for the LARGE checked-in BPE fixtures (dev tool,
  * run once per regeneration — not an operator):
  *
  * {{{
  * tools/runjava.sh graft.tools.BpeTrain <sfDir> <nMerges> <nProbe> \
  *   src/main/resources/graft/bpe_merges_large.tsv \
  *   src/main/resources/graft/bpe_probe_words_large.tsv
  * }}}
  *
  * Trains a standard BPE merges table (Sennrich et al. 2016) from the
  * `documents` fixture corpus — deterministically: word frequencies come
  * from an exact groupBy, each round merges the single most-frequent
  * adjacent symbol pair with a lexicographic tie-break, so the same corpus
  * always yields byte-identical output. No network, no RNG. The vocabulary
  * collect is driver-side by design: this is a fixture GENERATOR over the
  * sf0.01 corpus (a few thousand distinct words), not a 100 TB path — a
  * production train would keep pair counting distributed.
  *
  * Also emits the probe-word list the q_ext_tok3 oracle joins against: the
  * `nProbe` most frequent corpus words (count desc, word asc — stable),
  * one per line. Expected per-word token counts are NOT stored — both the
  * Spark plan and the DuckDB oracle derive them from the same
  * [[graft.functions.BpeTokenizer]] at run time, so the fixture cannot
  * drift from the algorithm.
  */
object BpeTrain {

  /** Deterministic BPE training over a word-frequency table. */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var vocab: Vector[(Array[String], Long)] =
      wordFreq.sortBy(_._1).map { case (w, f) => (w.map(_.toString).toArray, f) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val maxC = counts.valuesIterator.max
        // lexicographic tie-break on the pair — full determinism
        val best = counts.iterator.collect { case (p, c) if c == maxC => p }
          .minBy(p => (p._1, p._2))
        merges += best
        vocab = vocab.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val out = Array.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += (best._1 + best._2); j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), f)
          }
        }
        made += 1
      }
    }
    merges.result()
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, nMergesS, nProbeS, outMerges, outProbe) = args
    val (nMerges, nProbe) = (nMergesS.toInt, nProbeS.toInt)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def words(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(regexp_extract_all(lower(col("t")),
        lit(TextFunctions.bpeishPattern), lit(0))).as("w"))
    def freqOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      words(df).groupBy("w").agg(count(lit(1)).as("f"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        // control chars (tab/newline glyph pretokens) would corrupt the TSV
        // fixture format — they are corpus noise, not subword signal
        .filterNot { case (w, _) => w.exists(_.isControl) }
    // q_ext_tok3's input surfaces: documents text + customer names (the
    // digit runs are what give the table its multi-level number merges,
    // the same shape real trained tables carry for numerals)
    val tok3Corpus = Tables.load(spark, sfDir, "documents").select(col("text").as("t"))
      .unionByName(Tables.load(spark, sfDir, "customer").select(col("c_name").as("t")))
    // training additionally folds in the other fixture text surfaces for
    // letter-merge variety — all deterministic checked-in testdata
    val trainCorpus = tok3Corpus
      .unionByName(Tables.load(spark, sfDir, "supplier").select(col("s_name").as("t")))
      .unionByName(Tables.load(spark, sfDir, "part")
        .select(concat_ws(" ", col("p_name"), col("p_brand"), col("p_type")).as("t")))
    val freq = freqOf(trainCorpus)
    println(s"[bpe-train] vocabulary: ${freq.size} distinct words, " +
      s"${freq.map(_._2).sum} instances")
    val merges = train(freq, nMerges)
    println(s"[bpe-train] trained ${merges.size} merges")
    // probe words come from the tok3 input surfaces only, most frequent
    // first (count desc, word asc), emitted sorted
    val probe = freqOf(tok3Corpus).sortBy { case (w, f) => (-f, w) }
      .take(nProbe).map(_._1).sorted
    def write(path: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(path)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    write(outMerges, merges.map { case (l, r) => s"$l\t$r" })
    write(outProbe, probe)
    println(s"[bpe-train] wrote $outMerges (${merges.size}) and $outProbe (${probe.size})")
    spark.stop()
  }
}
