package graft

import org.apache.spark.sql.functions.col

/** Dual-runs every declared oracle SQL through SPARK's parser over the same
  * tables at sf0.001 and compares against the DataFrame program — a
  * correctness amplifier on top of the driver's DuckDB compare: it catches
  * Spark-SQL vs DataFrame divergence and proves the SQL entry point across
  * the whole inventory (not just the q_sub* parser exercises).
  *
  * Oracles written in DuckDB-only dialect are listed with the construct
  * that excludes them; everything else MUST parse and match.
  */
class OracleSqlSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val tableNames = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** DuckDB-dialect oracles Spark cannot run, with the offending construct. */
  private val duckdbOnly: Map[String, String] = Map(
    "q_set5" -> "UNION ALL BY NAME (DuckDB syntax; Spark only has the Dataset unionByName)",
    "q_ext_dedup5" -> "list_cosine_similarity/list_inner_product + MATERIALIZED (DuckDB dialect)",
    "q_ext_dedup10" -> "list_cosine_similarity + WITH RECURSIVE (DuckDB dialect)",
    "q_ext_dedup6" -> "WITH RECURSIVE (DuckDB recursive CTE form)",
    "q_ext_pipe1" -> "WITH RECURSIVE (DuckDB recursive CTE form)",
    "q_ext_pipe2" -> "WITH RECURSIVE (DuckDB recursive CTE form)",
    "q_arr1" -> "array_to_string (Spark: array_join)",
    "q_arr2" -> "DuckDB list slicing/literal syntax",
    "q_arr3" -> "DuckDB list slicing/literal syntax",
    "q_map1" -> "json_extract (Spark: get_json_object)",
    "q_json1" -> "json_extract_string (Spark: get_json_object)",
    "q_json2" -> "json_extract (Spark: get_json_object)",
    "q_date2" -> "date_diff('day', ...) quoted unit (Spark wants a bare keyword)",
    "q_agg8" -> "quantile_cont (Spark: percentile)",
    "q_agg8_approx" -> "quantile_cont (Spark: percentile)",
    "q_ext_txt1" -> "string_split (Spark: split)",
    "q_ext_txt2" -> "unnest (Spark: explode)",
    "q_ext_txt3" -> "list_filter (Spark: filter HOF, different lambda syntax)",
    "q_ext_txt4" -> "string_split/unnest + // integer division",
    "q_ext_txt5" -> "string_split/unnest (Spark: split/explode)",
    "q_ext_lang1" -> "DuckDB list literal [..] syntax",
    "q_ext_rank1" -> "string_split/unnest (Spark: split/explode)",
    "q_ext_rank2" -> "string_split/unnest + generate_series list indexing (Spark: split/explode)",
    "q_ext_tfidf1" -> "string_split/unnest (Spark: split/explode)",
    "q_ext_txt6" -> "string_split/unnest (Spark: split/explode)",
    "q_ext_anom1" -> "quantile_cont (Spark: percentile)",
    "q_ext_attr1" -> "IGNORE NULLS inside the call parens (Spark: last(expr) IGNORE NULLS)",
    "q_ext_stream11" -> "IGNORE NULLS inside the call parens (Spark: last(expr) IGNORE NULLS)",
    "q_ext_txt7" -> "string_split/unnest (Spark: split/explode)",
    "q_ext_coh1" -> "epoch() + // integer division (Spark: unix_timestamp/DIV)",
    "q_ext_ts1" -> "unnest(generate_series) + in-paren IGNORE NULLS",
    "q_ext_graph2" -> "// integer division (Spark: DIV)",
    "q_ext_quant1" -> "list_transform/list_sum/len (DuckDB list functions)",
    "q_ext_quant2" -> "list slicing + list_transform/list_sum (DuckDB list functions)",
    "q_ext_dedup2" -> "string_split (Spark: split)",
    "q_ext_decon1" -> "string_split/unnest (Spark: split/explode)",
    "q_ext_chunk1" -> "string_split/unnest/list_slice + // integer division",
    "q_ext_dedup3" -> "string_split (Spark: split)",
    "q_ext_dedup9" -> "string_split/unnest(generate_series)/list slicing (DuckDB list ops)",
    "q_ext_mix3" -> "// integer division (Spark: DIV)",
    "q_ext_dedup7" -> "string_split (Spark: split)",
    "q_ext_dedup8" -> "string_split (Spark: split)",
    "q_ext_stream14" -> "string_split (Spark: split)",
    "q_ext_search1" -> "string_split/unnest (Spark: split/explode)",
    "q_ext_tok1" -> "string_split/unnest (Spark: split/explode)",
    "q_ext_tok2" -> "string_split/unnest (Spark: split/explode)",
    "q_ext_tok3" -> "unnest + VALUES row-constructor probe table (DuckDB dialect)",
    "q_ext_stream15" -> "string_split (Spark: split)",
    "q_ext_pack1" -> "string_split (Spark: split)",
    "q_ext_pack2" -> "string_split (Spark: split)",
    "q_ext_mix2" -> "string_split (Spark: split)",
    "q_ext_pii1" -> "regexp_matches (Spark: RLIKE; DuckDB lacks the keyword)",
    "q_ext_sim1" -> "unnest (Spark: explode)",
    "q_ext_sim2" -> "unnest (Spark: explode)",
    "q_ext_sim3" -> "unnest (Spark: explode)",
    "q_ext_sim4" -> "list_cosine_similarity (DuckDB list function)",
    "q_ext_sim5" -> "unnest (Spark: explode)",
    "q_ext_stream16" -> "unnest (Spark: explode)",
    "q_ext_sim6" -> "unnest (Spark: explode)",
    "q_ext_dedup4" -> "string_split (Spark: split)",
    "q_ext_mm1" -> "CAST AS BLOB (Spark: BINARY)",
    "q_ext_mm6" -> "unnest(generate_series) (Spark: explode(sequence))",
    "q_ext_mm3" -> "CAST AS BLOB (Spark: BINARY)",
    "q_ext_evt1" -> "epoch() (Spark: unix_timestamp)",
    "q_ext_evt3" -> "unnest + epoch",
    "q_ext_stream1" -> "epoch() (Spark: unix_timestamp)",
    "q_ext_funnel1" -> "epoch_us (Spark: unix_micros)",
    "q_ext_evt4" -> "epoch_us (Spark: unix_micros)",
    "q_ext_stream7" -> "epoch_us (Spark: unix_micros)",
    "q_ext_stream8" -> "epoch_us (Spark: unix_micros)",
    "q_ext_stream9" -> "epoch_us (Spark: unix_micros)",
    "q_ext_cdc1" -> "epoch_us (Spark: unix_micros)",
    "q_ext_cdc2" -> "epoch_us (Spark: unix_micros)",
    "q_ext_diff1" -> "list_filter/array_to_string (Spark: filter HOF/array_join)",
    "q_ext_diff2" -> "list_filter/array_to_string (Spark: filter HOF/array_join)",
    "q_norm8" -> "list_filter/array_to_string (Spark: filter HOF/array_join)")

  /** Structural equality with float tolerance: Spark SQL and the DataFrame
    * API may aggregate in different orders, so doubles compare at 1e-6
    * relative tolerance; binary compares by content.
    */
  private def sameValue(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (x: org.apache.spark.sql.Row, y: org.apache.spark.sql.Row) =>
      x.length == y.length && x.toSeq.zip(y.toSeq).forall { case (u, v) => sameValue(u, v) }
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (u, v) => sameValue(u, v) }
    case (x: Double, y: Double) =>
      (x == y) || math.abs(x - y) <= 1e-6 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    case (x: Float, y: Float) => sameValue(x.toDouble, y.toDouble)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y) == 0
    case (x, y) => x == y
  }

  test("every Spark-expressible oracle SQL reproduces the DataFrame program at sf0.001") {
    tableNames.foreach(t => Tables.load(spark, sfDir, t).createOrReplaceTempView(t))
    val sweep = SparkEntry.registry.filter(q => q.oracle.isDefined && !duckdbOnly.contains(q.name))
    assert(sweep.size >= 74, s"sweep shrank to ${sweep.size} — exclusion list grew too broad?")
    val failures = scala.collection.mutable.ListBuffer[String]()
    sweep.foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val sq = spark.sql(q.oracle.get)
        val cols = df.columns.sorted.toSeq
        if (sq.columns.sorted.toSeq != cols)
          failures += s"${q.name}: columns ${sq.columns.sorted.toSeq} vs $cols"
        else {
          val a = df.select(cols.map(col): _*).collect()
          val b = sq.select(cols.map(col): _*).collect()
          if (a.length != b.length)
            failures += s"${q.name}: ${a.length} vs ${b.length} rows"
          else {
            val bad = a.zip(b).indexWhere { case (x, y) => !sameValue(x, y) }
            if (bad >= 0)
              failures += s"${q.name}: row $bad differs: ${a(bad)} vs ${b(bad)}"
          }
        }
      } catch {
        case e: Throwable =>
          failures += s"${q.name}: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ").take(300)}"
      }
    }
    assert(failures.isEmpty, s"${failures.size} oracle/DataFrame divergences:\n" +
      failures.mkString("\n"))
  }
}
