package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import scala.jdk.CollectionConverters._

/** Parquet physical-layout introspection — the ParquetDB stats surface
  * (`get_number_of_row_groups_per_file`, `get_file_sizes`,
  * `get_n_rows_per_row_group_per_file`, `get_row_group_sizes_per_file`;
  * reference call sites: examples/Creating-CrystPQDB.ipynb cell 23).
  *
  * Footer-only reads — no data pages touched, so this is metadata-cheap even
  * on a directory of thousands of files.
  *
  * Every method takes an explicit Hadoop `Configuration` (no defaults):
  * callers must route the SESSION conf (`spark.sessionState.newHadoopConf()`)
  * so session-configured filesystems resolve — a bare `new Configuration()`
  * silently reads none of the session's fs settings.
  */
object ParquetStats {

  final case class FileStats(
      path: String,
      fileBytes: Long,
      numRowGroups: Int,
      rowsPerGroup: Seq[Long],
      bytesPerGroup: Seq[Long]) {
    def numRows: Long = rowsPerGroup.sum
  }

  def listParquetFiles(dir: String, conf: Configuration): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p).toIndexedSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
  }

  def fileStats(dir: String, conf: Configuration): Seq[FileStats] =
    listParquetFiles(dir, conf).map { p =>
      val fs = p.getFileSystem(conf)
      val len = fs.getFileStatus(p).getLen
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val groups = reader.getFooter.getBlocks.asScala.toIndexedSeq
        FileStats(p.toString, len, groups.size,
          groups.map(_.getRowCount), groups.map(_.getCompressedSize))
      } finally reader.close()
    }

  def totalRows(dir: String, conf: Configuration): Long =
    fileStats(dir, conf).map(_.numRows).sum

  /** Per-FILE merged (min, max) footer statistics of an integral column —
    * the pruning index for file-scoped `upsert`: a file whose merged key
    * range misses every patch key provably contains no row to replace and
    * is left physically untouched. `None` for a file whose footer lacks
    * usable stats on the column (missing, non-integral, or all-null) —
    * callers must treat such files as always-touched.
    *
    * Restricted to INT32/INT64 physical types: `longValue` on a
    * float/double min/max would truncate and make pruning UNSOUND.
    */
  def fileKeyRanges(dir: String, column: String,
      conf: Configuration): Seq[(String, Option[(Long, Long)])] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{INT32, INT64}
    listParquetFiles(dir, conf).map { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      val perGroup =
        try reader.getFooter.getBlocks.asScala.toIndexedSeq.map { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column).flatMap { c =>
            val tpe = c.getPrimitiveType.getPrimitiveTypeName
            val st = c.getStatistics
            if ((tpe != INT32 && tpe != INT64) || st == null || !st.hasNonNullValue) None
            else (st.genericGetMin, st.genericGetMax) match {
              case (mn: java.lang.Number, mx: java.lang.Number) =>
                Some((mn.longValue, mx.longValue))
              case _ => None
            }
          }
        } finally reader.close()
      // every row group needs stats, else the file's range is unknown
      val merged =
        if (perGroup.isEmpty || perGroup.exists(_.isEmpty)) None
        else Some((perGroup.flatten.map(_._1).min, perGroup.flatten.map(_._2).max))
      (p.toString, merged)
    }
  }

  /** Per-row-group (min, max) footer statistics of a numeric column across
    * the table — exactly the stats the parquet reader's row-group skipping
    * consults. Footer-only; row groups without usable stats are omitted.
    */
  def columnRanges(dir: String, column: String,
      conf: Configuration): Seq[(Long, Long)] = {
    listParquetFiles(dir, conf).flatMap { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try reader.getFooter.getBlocks.asScala.toIndexedSeq.flatMap { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == column).flatMap { c =>
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue) None
          else (st.genericGetMin, st.genericGetMax) match {
            case (mn: java.lang.Number, mx: java.lang.Number) =>
              Some((mn.longValue, mx.longValue))
            case _ => None
          }
        }
      } finally reader.close()
    }
  }
}
