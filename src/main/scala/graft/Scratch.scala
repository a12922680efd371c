package graft

/** Process-scoped scratch space for streaming checkpoints, staged replay
  * sources, and other run-local state that should never pay disk latency.
  *
  * Prefers the RAM-backed tmpfs at /dev/shm: the bounded streaming replays
  * (Trigger.AvailableNow + checkpoint) are wall-clock-sensitive to
  * checkpoint/sink IO, and on a loaded host a disk-backed target/tmp makes
  * their measured times track OTHER processes' IO, not the plan under test.
  * Falls back to target/tmp when tmpfs is unavailable, so behavior is
  * identical either way — only latency differs.
  *
  * The root is keyed by pid (concurrent sbt processes cannot collide) and
  * removed by a JVM shutdown hook; roots orphaned by a killed JVM are
  * reclaimed opportunistically at next init by checking the owning pid.
  */
object Scratch {

  lazy val root: String = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) {
        // reclaim roots whose owning process is gone (kill -9 loses hooks)
        val prior = shm.listFiles()
        if (prior != null) prior.foreach { d =>
          if (d.getName.startsWith("graft-scratch-")) {
            val pid = d.getName.stripPrefix("graft-scratch-").toLongOption
            if (pid.exists(p => !ProcessHandle.of(p).isPresent())) deleteRec(d)
          }
        }
        new java.io.File(shm, s"graft-scratch-${ProcessHandle.current().pid()}")
      } else
        // the fallback is pid-scoped too: a shared dir plus this root's
        // shutdown-hook delete would race concurrent sbt processes
        new java.io.File(s"target/tmp/scratch-${ProcessHandle.current().pid()}")
    base.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(base)))
    base.getAbsolutePath
  }

  /** Stable named dir under the root (caller manages its lifecycle). */
  def dir(name: String): String = s"$root/$name"

  /** Unique dir per call — for checkpoint locations, which must be fresh
    * per stream start (a reused checkpoint resumes instead of replaying).
    */
  def fresh(name: String): String = s"$root/$name-${java.util.UUID.randomUUID()}"

  def deleteRec(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRec)
    f.delete(): Unit
  }

  def delete(path: String): Unit = deleteRec(new java.io.File(path))
}
