package graft

import graft.queries.OracleArtifact
import org.scalatest.funsuite.AnyFunSuite

/** The oracle-artifact store vs the (tag, sfDir) build: one JVM
  * touching the same tag at TWO scale factors must read back each
  * scale's OWN values — the r13 aliasing nit (a memo hit at scale A
  * after a rebuild at scale B silently served B's data). Since r15
  * (ADVICE r14) each (tag, sfDir) build lands in its own immutable
  * scale-suffixed directory and engine-side frames read that concrete
  * path, so even a frame CONSUMED after a later build at another scale
  * still reads its own scale's data; the tag-keyed path the oracle SQL
  * references is a symlink atomically repointed to the LAST-requested
  * scale (the driver's sequential Verify-then-compare contract). */
class OracleArtifactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("same tag at two sfDirs in one JVM reads back distinct values") {
    val tag = "spec_alias_probe"
    def build(v: String) = Seq((1L, v)).toDF("id", "v")
    def readBack(sf: String, v: String): String =
      OracleArtifact(spark, tag, sf)(build(v)).collect().head.getString(1)

    assert(readBack("/sf/A", "valA") == "valA")
    // a different scale factor gets its own build, never A's bytes
    assert(readBack("/sf/B", "valB") == "valB")
    // returning to the first scale serves A's own directory
    assert(readBack("/sf/A", "valA") == "valA")
    // same scale twice IS a memo hit: the build closure must not run
    var built = false
    val df = OracleArtifact(spark, tag, "/sf/A") { built = true; build("other") }
    assert(!built && df.collect().head.getString(1) == "valA")
  }

  test("a frame consumed AFTER a later build at another scale keeps its own data") {
    val tag = "spec_alias_lazy"
    def build(v: String) = Seq((1L, v)).toDF("id", "v")
    // obtain (but do not consume) the scale-A frame
    val frameA = OracleArtifact(spark, tag, "/sf/A")(build("lazyA"))
    // build + consume scale B — under the single-slot design this
    // overwrote the bytes frameA would later read
    assert(OracleArtifact(spark, tag, "/sf/B")(build("lazyB"))
      .collect().head.getString(1) == "lazyB")
    // the deferred consumption still reads A's data
    assert(frameA.collect().head.getString(1) == "lazyA")
  }

  test("the oracle path is a symlink to the last-requested scale's build") {
    val tag = "spec_alias_link"
    def build(v: String) = Seq((1L, v)).toDF("id", "v")
    OracleArtifact(spark, tag, "/sf/A")(build("oa"))
    OracleArtifact(spark, tag, "/sf/B")(build("ob"))
    val link = java.nio.file.Paths.get(OracleArtifact.dir(tag))
    assert(java.nio.file.Files.isSymbolicLink(link))
    // what DuckDB would read through the literal path = B's values
    assert(spark.read.parquet(OracleArtifact.dir(tag))
      .collect().head.getString(1) == "ob")
    // repoint back on a memo-hit request: last-requested wins
    OracleArtifact(spark, tag, "/sf/A")(build("oa"))
    assert(spark.read.parquet(OracleArtifact.dir(tag))
      .collect().head.getString(1) == "oa")
  }
}
