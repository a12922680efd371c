package graft.sources

import graft.SparkSpec

/** Gate for the CROSS-PROCESS multi-writer drill: forks a second JVM (its
  * own SparkSession, its own filesystem view, its own kernel-level
  * O_CREAT|O_EXCL syscalls) and races it against this suite's session on
  * one set of store dirs — the claim the in-JVM thread drills cannot test.
  * See graft.tools.ConcurrencyDrill for the surfaces and invariants.
  */
class ConcurrencyDrillSpec extends SparkSpec {

  test("two JVMs racing the pqdb/IVF/HLL mutation surfaces converge with every committed write applied") {
    val results = graft.tools.ConcurrencyDrill.run(spark, "target/tmp/ccdrill/spec")
    // run() throws on any invariant breach; assert all three surfaces reported
    assert(results.size === 3, results.mkString("; "))
    assert(results.exists(_.startsWith("pqdb:")), results.mkString("; "))
    assert(results.exists(_.startsWith("ivf:")), results.mkString("; "))
    assert(results.exists(_.startsWith("hll:")), results.mkString("; "))
  }
}
