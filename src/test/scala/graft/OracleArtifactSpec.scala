package graft

import graft.queries.OracleArtifact
import org.scalatest.funsuite.AnyFunSuite

/** The tag-keyed on-disk slot vs the (tag, sfDir) build: one JVM
  * touching the same tag at TWO scale factors must read back each
  * scale's OWN values — the r13 aliasing nit (a memo hit at scale A
  * after a rebuild at scale B silently served B's data). The slot is
  * still tag-keyed (the oracle SQL references the path literally), so
  * the contract is rebuild-on-scale-change, not two slots. */
class OracleArtifactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("same tag at two sfDirs in one JVM reads back distinct values") {
    val tag = "spec_alias_probe"
    def build(v: String) = Seq((1L, v)).toDF("id", "v")
    def readBack(sf: String, v: String): String =
      OracleArtifact(spark, tag, sf)(build(v)).collect().head.getString(1)

    assert(readBack("/sf/A", "valA") == "valA")
    // a different scale factor REBUILDS the slot instead of memo-hitting
    assert(readBack("/sf/B", "valB") == "valB")
    // and returning to the first scale rebuilds again — never serves B
    assert(readBack("/sf/A", "valA") == "valA")
    // same scale twice IS a memo hit: the build closure must not run
    var built = false
    val df = OracleArtifact(spark, tag, "/sf/A") { built = true; build("other") }
    assert(!built && df.collect().head.getString(1) == "valA")
  }
}
