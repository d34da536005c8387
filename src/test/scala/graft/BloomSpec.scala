package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native bloom pair: build is order/partitioning-independent
  * (byte-identical filters), contains has no false negatives and a
  * bounded false-positive rate, nulls follow the SQL contract, and
  * bloomDecontaminate is output-identical to the exact path. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NumBits = 1 << 14
  private val NumHashes = 5

  private def buildBytes(keys: Seq[Long], parts: Int): Array[Byte] =
    keys.toDF("h").repartition(parts)
      .agg(call_function("bloom_build", col("h"), lit(NumBits), lit(NumHashes)))
      .head.getAs[Array[Byte]](0)

  test("build is byte-identical at any parallelism or row order (distributive OR)") {
    val keys = (1L to 500L).map(i => i * 0x9e3779b97f4a7c15L)
    val a = buildBytes(keys, 1)
    val b = buildBytes(scala.util.Random.shuffle(keys), 8)
    assert(java.util.Arrays.equals(a, b))
  }

  test("no false negatives; false-positive rate near the design point") {
    val members = (1L to 1000L).map(i => i * 7919L)
    val bloom = lit(buildBytes(members, 4))
    val hits = members.toDF("h")
      .filter(call_function("bloom_contains", bloom, col("h"))).count()
    assert(hits == members.size, "a member was missed — bloom false negative")
    // n=1000 in m=16384 bits, k=5 → theoretical fpp ≈ 0.9% — allow 3×
    val nonMembers = (1L to 20000L).map(i => i * 104729L + 3L).filterNot(members.contains(_))
    val fp = nonMembers.toDF("h")
      .filter(call_function("bloom_contains", bloom, col("h"))).count()
    assert(fp.toDouble / nonMembers.size < 0.03, s"fp rate ${fp.toDouble / nonMembers.size}")
  }

  test("null contract: null keys skipped in build; null probe/bloom yield null") {
    val withNull = Seq(Some(42L), None).toDF("h")
    val bytes = withNull
      .agg(call_function("bloom_build", col("h"), lit(NumBits), lit(NumHashes)))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bytes, buildBytes(Seq(42L), 1)))
    val probe = Seq(Option.empty[Long]).toDF("h")
      .select(call_function("bloom_contains", lit(bytes), col("h")))
    assert(probe.head.isNullAt(0))
  }

  test("empty input yields the match-nothing filter") {
    val bytes = Seq.empty[Long].toDF("h")
      .agg(call_function("bloom_build", col("h"), lit(NumBits), lit(NumHashes)))
      .head.getAs[Array[Byte]](0)
    val hits = (1L to 1000L).toDF("h")
      .filter(call_function("bloom_contains", lit(bytes), col("h"))).count()
    assert(hits == 0)
  }

  test("whole-stage codegen survives bloom_contains (range source, real filter stage)") {
    val bytes = buildBytes(Seq(3L, 5L, 7L), 1)
    val got = spark.range(0, 100)
      .filter(call_function("bloom_contains", lit(bytes), col("id")))
      .collect().map(_.longValue).toSet
    assert(Set(3L, 5L, 7L).subsetOf(got), s"false negative in codegen path: $got")
    assert(got.size <= 10, s"fp explosion: $got")
  }

  test("malformed bloom blobs fail with a descriptive error, not an executor AIOOBE") {
    def probe(bytes: Array[Byte]) =
      Seq(1L).toDF("h").select(call_function("bloom_contains", lit(bytes), col("h"))).collect()
    val tooShort = intercept[Exception] { probe(Array[Byte](1, 2, 3)) }
    assert(tooShort.getMessage.contains("not a bloom filter")
      || tooShort.getCause.getMessage.contains("not a bloom filter"))
    // plausible length, nonsense header (numHashes=0)
    val badHeader = intercept[Exception] { probe(new Array[Byte](24)) }
    assert(badHeader.getMessage.contains("malformed")
      || badHeader.getCause.getMessage.contains("malformed"))
  }

  test("bad argument types / non-literal sizing fail analysis loudly") {
    intercept[Exception] {
      spark.range(1).select(call_function("bloom_build", col("id"), col("id").cast("int"), lit(3)))
        .collect()
    }
    intercept[Exception] {
      spark.range(1).select(call_function("bloom_contains", lit("not binary"), col("id"))).collect()
    }
  }

  test("bloomDecontaminate output equals the exact decontaminate path") {
    val docs = (1L to 300L)
      .map(i => (i, s"alpha bravo charlie delta echo ${i % 37} foxtrot golf hotel india juliet"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, col("doc_id"), col("text"), n = 3, w = 4).cache()
    val evalFps = fps.filter(pmod(col("id"), lit(50)) === 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = ids(Dedup.decontaminate(docs, col("doc_id"), fps, evalFps))
    val bloomed = ids(Dedup.bloomDecontaminate(docs, col("doc_id"), fps, evalFps))
    assert(bloomed == exact)
    // and the eval docs themselves are definitely gone
    assert(bloomed.intersect((1L to 300L).filter(_ % 50 == 0).toSet).isEmpty)
    fps.unpersist()
  }

  test("2^27-bit filter rides a BroadcastRef: output identical, plan free of multi-MB literals") {
    val docs = (1L to 200L)
      .map(i => (i, s"kilo lima mike november oscar ${i % 23} papa quebec romeo sierra tango"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, col("doc_id"), col("text"), n = 3, w = 4).cache()
    val evalFps = fps.filter(pmod(col("id"), lit(40)) === 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = ids(Dedup.decontaminate(docs, col("doc_id"), fps, evalFps))
    // 2^27 bits = a 16 MiB filter — the regime the operator exists for;
    // the default literalMaxBytes (512 KiB) must push it onto the bus
    val big = Dedup.bloomDecontaminate(docs, col("doc_id"), fps, evalFps, numBits = 1 << 27)
    assert(ids(big) == exact, "broadcast-backed probe diverged from the exact path")
    val plan = big.queryExecution.optimizedPlan
    val bigBinaryLits = plan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.dataType == org.apache.spark.sql.types.BinaryType && l.value != null &&
             l.value.asInstanceOf[Array[Byte]].length >= 1024 => l
      })
    }.flatten
    assert(bigBinaryLits.isEmpty,
      s"filter leaked into the plan as ${bigBinaryLits.map(_.value.asInstanceOf[Array[Byte]].length)}-byte literal(s)")
    val refs = plan.collect { case p =>
      p.expressions.flatMap(_.collect { case b: graft.expressions.BroadcastRef => b })
    }.flatten
    assert(refs.nonEmpty, "expected the probe to read a BroadcastRef")
    fps.unpersist()
  }

  test("BroadcastRef survives java serialization (the executor path) and evals to the value") {
    val payload = Array.tabulate[Byte](64)(_.toByte)
    val ref = graft.expressions.BroadcastRef(
      spark.sparkContext.broadcast(payload), org.apache.spark.sql.types.BinaryType)
    val bytes = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes)
    oos.writeObject(ref); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray))
      .readObject().asInstanceOf[graft.expressions.BroadcastRef]
    assert(java.util.Arrays.equals(
      back.eval(null).asInstanceOf[Array[Byte]], payload))
    // the handle serializes small — the value rides the torrent bus,
    // not the task closure (the whole point vs a literal)
    assert(bytes.size() < 4096, s"BroadcastRef serialized to ${bytes.size()} bytes")
  }

  test("below literalMaxBytes the probe stays a plan literal (codegen-inlined small-model path)") {
    val fps = (1L to 100L).map(i => (i, i * 31L)).toDF("id", "fp")
    val evalFps = fps.filter(col("id") <= 10).select(col("fp"))
    val docs = (1L to 100L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val small = Dedup.bloomDecontaminate(docs, col("doc_id"), fps, evalFps) // default 2^20 bits
    val refs = small.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect { case b: graft.expressions.BroadcastRef => b })
    }.flatten
    assert(refs.isEmpty, "a KB-scale filter should inline as a literal, not a broadcast")
  }
}
