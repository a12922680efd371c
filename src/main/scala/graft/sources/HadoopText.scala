package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets.UTF_8

/** The one small-text read/write over a Hadoop `FileSystem` — used for every
  * sidecar file in the repo (table manifests, store `_params`, index
  * fingerprints, pending markers). Whole-file semantics: `read` loads the
  * full file (these are metadata-sized by contract — bytes, not blocks),
  * `write` truncates/overwrites atomically per HDFS create(overwrite=true).
  */
object HadoopText {
  def read(fs: FileSystem, p: Path): String = {
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    new String(buf, UTF_8)
  }

  def write(fs: FileSystem, p: Path, text: String): Unit = {
    val out = fs.create(p, true)
    try out.write(text.getBytes(UTF_8)) finally out.close()
  }

  /** Create-no-overwrite write: returns false (writing nothing) if the file
    * already exists. `create(overwrite = false)` is atomic on HDFS and
    * local FS — the poor-man's lock a rename-based commit protocol uses to
    * serialize two writers that both reached their commit step.
    */
  def writeIfAbsent(fs: FileSystem, p: Path, text: String): Boolean =
    try {
      val out = fs.create(p, false)
      try out.write(text.getBytes(UTF_8)) finally out.close()
      true
    } catch { case _: java.io.IOException => false }
}
