package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native nearest_centroid expression: hand-computed argmax, the
  * lowest-index tie rule, the null contract (null vec/element → null;
  * corrupt model → throw), shape misuse, and codegen/eval agreement via
  * a BroadcastRef-delivered model. */
class NearestCentroidSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two 2-dim centroids: c0 = (1, 0)·1e6, c1 = (0, 1)·1e6
  private val cents = Seq(1000000L, 0L, 0L, 1000000L)
  private val cnorms = Seq(1000000.0, 1000000.0)

  private def assignOf(vec: Seq[java.lang.Long]): org.apache.spark.sql.Row =
    Seq(Tuple1(vec)).toDF("v")
      .select(call_function("nearest_centroid",
        col("v"), sqrt(call_function("quantized_dot", col("v"), col("v")).cast("double")),
        typedLit(cents), typedLit(cnorms)))
      .head()

  test("argmax by cosine; equidistant ties go to the LOWEST index") {
    assert(assignOf(Seq(900000L, 100000L)).getInt(0) == 0)
    assert(assignOf(Seq(100000L, 900000L)).getInt(0) == 1)
    assert(assignOf(Seq(500000L, 500000L)).getInt(0) == 0, "tie must pick the lowest index")
  }

  test("null vector and null element yield null; corrupt model and bad shape throw") {
    val nullVec = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("v")
      .select(call_function("nearest_centroid", col("v"), lit(1.0),
        typedLit(cents), typedLit(cnorms))).head()
    assert(nullVec.isNullAt(0))
    assert(assignOf(Seq(null, 100000L)).isNullAt(0))
    val badShape = intercept[Throwable](assignOf(Seq(1L, 2L, 3L)))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(badShape).exists(_.contains("not k=")), msgs(badShape))
  }

  test("zero-norm vector is null (undefined data); non-positive centroid norm throws (corrupt model)") {
    // a zero vector has no cosine direction — the assignment is null,
    // never a NaN-driven arbitrary index
    val zeroVec = Seq(Tuple1(Seq(0L, 0L))).toDF("v")
      .select(call_function("nearest_centroid",
        col("v"), sqrt(call_function("quantized_dot", col("v"), col("v")).cast("double")),
        typedLit(cents), typedLit(cnorms))).head()
    assert(zeroVec.isNullAt(0))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val badNorm = intercept[Throwable] {
      Seq(Tuple1(Seq(1000000L, 0L))).toDF("v")
        .select(call_function("nearest_centroid", col("v"), lit(1000000.0),
          typedLit(cents), typedLit(Seq(1000000.0, 0.0)))).head()
    }
    assert(msgs(badNorm).exists(_.contains("non-positive norm")), msgs(badNorm))
    // the double-centroid variant shares the contract
    val zeroDbl = Seq(Tuple1(Seq(0L, 0L))).toDF("v")
      .select(call_function("nearest_centroid_dbl", col("v"), lit(0.0),
        typedLit(Seq(1.0, 0.0, 0.0, 1.0)), typedLit(Seq(1.0, 1.0)))).head()
    assert(zeroDbl.isNullAt(0))
  }

  test("BroadcastRef-delivered model matches the literal model (the big-index path)") {
    val pts = (0L until 50L).map { i =>
      (i, Seq(1000000L - i * 7000L, i * 7000L))
    }.toDF("id", "v").repartition(3)
      .withColumn("n", sqrt(call_function("quantized_dot", col("v"), col("v")).cast("double")))
    val viaLit = pts.select(col("id"), call_function("nearest_centroid",
      col("v"), col("n"), typedLit(cents), typedLit(cnorms)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bCents = graft.expressions.BroadcastRef.column(
      spark.sparkContext.broadcast(cents.toArray),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false))
    val bNorms = graft.expressions.BroadcastRef.column(
      spark.sparkContext.broadcast(cnorms.toArray),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, false))
    val viaBcast = pts.select(col("id"), call_function("nearest_centroid",
      col("v"), col("n"), bCents, bNorms).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaBcast == viaLit)
  }
}
