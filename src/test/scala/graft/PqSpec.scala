package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization primitives: the native pq_encode / pq_adc
  * expressions against hand-computed codes and distances, their null
  * and misuse contracts, and the self-consistency of the operator's
  * three pieces (encode = argmin of the ADC table; a vector assembled
  * from codewords scores its EXACT distance). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // dim=4, m=2 subspaces of 2, ksub=2 codewords:
  //   sub0: c0=[0,0]  c1=[10,10]     sub1: c0=[5,5]  c1=[0,0]
  // flattened cb[(j*ksub + c)*dsub + i]
  private val cb = Array(0L, 0L, 10L, 10L, 5L, 5L, 0L, 0L)
  private val M = 2
  private val Ksub = 2

  test("encode: hand-computed argmin per subspace") {
    val out = Seq(
      Tuple1(Array(9L, 9L, 1L, 1L)),   // sub0: 162 vs 2 -> 1; sub1: 32 vs 2 -> 1
      Tuple1(Array(1L, 2L, 4L, 5L)))   // sub0: 5 vs 145 -> 0; sub1: 1 vs 41 -> 0
      .toDF("v")
      .select(Pq.encode(col("v"), cb, M).as("codes"))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(out.toSeq == Seq(Seq(1, 1), Seq(0, 0)))
  }

  test("encode: equidistant codewords tie to the LOWEST index") {
    // sub codewords [0,0] and [2,0]; [1,0] is distance 1 from both
    val tieCb = Array(0L, 0L, 2L, 0L)
    val codes = Seq(Tuple1(Array(1L, 0L))).toDF("v")
      .select(Pq.encode(col("v"), tieCb, 1)).head.getSeq[Int](0)
    assert(codes == Seq(0))
  }

  test("encode: null array and null element yield null; bad shape throws") {
    val nullArr = Seq(Tuple1(Option.empty[Array[Long]])).toDF("v")
      .select(Pq.encode(col("v"), cb, M)).head
    assert(nullArr.isNullAt(0))
    val nullElem = Seq(Tuple1(Array[java.lang.Long](9L, null, 1L, 1L))).toDF("v")
      .select(Pq.encode(col("v"), cb, M)).head
    assert(nullElem.isNullAt(0))
    // local mode may surface the IAE directly or wrapped in SparkException
    val err = intercept[Throwable] {
      Seq(Tuple1(Array(1L, 2L, 3L, 4L))).toDF("v")
        .select(Pq.encode(col("v"), cb, 3)).collect() // dim 4 % m 3 != 0
    }
    assert(Iterator.iterate(err)(_.getCause).takeWhile(_ != null).take(5)
      .exists(_.getMessage.contains("pq_encode")), s"unexpected failure: $err")
  }

  test("adc: table lookup sum; out-of-range code throws") {
    // m=2, ksub=2 table [t00,t01,t10,t11]
    val v = Seq((Array(1, 0), Array(7L, 9L, 11L, 13L))).toDF("c", "t")
      .select(Pq.adc(col("c"), col("t"))).head.getLong(0)
    assert(v == 9L + 11L) // codes [1,0] -> t01 + t10
    val err = intercept[Throwable] {
      Seq((Array(2, 0), Array(7L, 9L, 11L, 13L))).toDF("c", "t")
        .select(Pq.adc(col("c"), col("t"))).collect()
    }
    assert(Iterator.iterate(err)(_.getCause).takeWhile(_ != null).take(5)
      .exists(_.getMessage.contains("pq_adc")), s"unexpected failure: $err")
  }

  test("self-consistency: encode is the argmin of the ADC table, and a codeword-assembled row scores its exact distance") {
    val vecs = Seq(
      Array(9L, 9L, 1L, 1L), Array(1L, 2L, 4L, 5L), Array(0L, 0L, 5L, 5L),
      Array(10L, 10L, 0L, 0L), Array(-3L, 7L, 2L, 2L))
    val df = vecs.map(Tuple1(_)).toDF("v").select(
      col("v"),
      Pq.encode(col("v"), cb, M).as("codes"),
      Pq.adcTable(col("v"), cb, M, Ksub).as("tbl"))
    df.collect().foreach { r =>
      val codes = r.getSeq[Int](1)
      val tbl = r.getSeq[Long](2)
      // argmin of each subspace's table slice (ties -> lowest) == code
      (0 until M).foreach { j =>
        val slice = tbl.slice(j * Ksub, (j + 1) * Ksub)
        assert(slice.indexOf(slice.min) == codes(j),
          s"subspace $j: table $slice vs code ${codes(j)}")
      }
    }
    // row [10,10,0,0] IS (c1, c1): ADC distance == exact squared L2
    val q = Array(1L, 2L, 4L, 5L)
    val exact = q.zip(Array(10L, 10L, 0L, 0L)).map { case (a, b) => (a - b) * (a - b) }.sum
    val adc = Seq((Array(10L, 10L, 0L, 0L), q)).toDF("x", "q")
      .select(Pq.adc(Pq.encode(col("x"), cb, M), Pq.adcTable(col("q"), cb, M, Ksub)))
      .head.getLong(0)
    assert(adc == exact)
  }

  test("strideCodebook: layout is subspace-major and fails loudly on a missing sample id") {
    val prepped = (0L until 10L).map(id =>
      (id, Array(id * 100L, id * 100L + 1L, id * 100L + 2L, id * 100L + 3L)))
      .toDF("id", "q")
    val got = Pq.strideCodebook(prepped, stride = 3, ksub = 3, m = 2)
    // codeword c = row 3c; cb[(j*ksub + c)*dsub + i] = vecs(c)(j*dsub + i)
    val vecs = Array(Array(0L, 1L, 2L, 3L), Array(300L, 301L, 302L, 303L), Array(600L, 601L, 602L, 603L))
    val want = for (j <- 0 until 2; c <- 0 until 3; i <- 0 until 2)
      yield vecs(c)(j * 2 + i)
    assert(got.toSeq == want)
    intercept[IllegalArgumentException] {
      Pq.strideCodebook(prepped, stride = 6, ksub = 3, m = 2) // id 12 missing
    }
  }

  // ---- planted-cluster corpora for the training/residual contracts ----
  // MAGNITUDE clusters (training tests): 64 vectors, dim 8, group g =
  // id/16 at magnitude g·1000, offset o = id%16 added to EVERY position
  // — so a group's true neighbor order is exactly offset order, and the
  // tie rule (lower id) agrees with it. stride=1 init samples ids 0..3:
  // ALL group 0, a deliberately bad codebook training must escape.
  private val Dim = 8
  private def plantedMag(id: Long): Array[Long] =
    Array.fill(Dim)((id / 16) * 1000L + (id % 16))
  private lazy val magDf = {
    val df = (0L until 64L).map(id => (id, plantedMag(id))).toDF("id", "q")
      .withColumn("norm", graft.operators.Similarity.normQ(col("q")))
    df.cache(); df
  }
  // DIRECTION clusters (residual/IVF tests — the coarse quantizer is
  // cosine-based, so clusters must separate in angle, not magnitude):
  // group g's mass sits on positions {2g, 2g+1}; anchors (o=0) at ids
  // g·16 become the stride-16 coarse centroids, and every residual is
  // exactly o·(1,...,1) — tight around zero, the IVFADC argument.
  private def plantedDir(id: Long): Array[Long] = {
    val g = (id / 16).toInt; val o = id % 16
    Array.tabulate(Dim)(p => if (p / 2 == g) 1000L + o else o)
  }
  private lazy val dirDf = {
    val df = (0L until 64L).map(id => (id, plantedDir(id))).toDF("id", "q")
      .withColumn("norm", graft.operators.Similarity.normQ(col("q")))
    df.cache(); df
  }

  test("trainedCodebook: Lloyd rounds strictly cut distortion from a bad stride init and never regress") {
    val init = Pq.strideCodebook(magDf, stride = 1, ksub = 4, m = 2)
    val d0 = Pq.distortion(magDf, init, m = 2, ksub = 4)
    var prev = d0
    for (it <- Seq(1, 2, 5)) {
      val d = Pq.distortion(magDf, Pq.trainedCodebook(magDf, init, m = 2, ksub = 4, iters = it), 2, 4)
      assert(d <= prev + 1e-9, s"distortion rose at iters=$it: $prev -> $d")
      prev = d
    }
    assert(prev < d0 * 0.5, s"training barely helped: $d0 -> $prev (init misses 3 of 4 clusters)")
    // determinism: no RNG anywhere in init or refinement
    assert(Pq.trainedCodebook(magDf, init, 2, 4, 3).toSeq ==
      Pq.trainedCodebook(magDf, init, 2, 4, 3).toSeq)
  }

  test("recall@3 on planted clusters: trained codebook >= stride codebook, queries from every cluster") {
    val vecs = (0L until 64L).map(id => id -> plantedMag(id)).toMap
    def sqL2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => { val d = a(i) - b(i); d * d }).sum
    val queries = Seq(0L, 16L, 32L, 48L) // one per cluster
    val truth: Map[Long, Set[Long]] = queries.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (sqL2(vecs(q), vecs(n)), n)).take(3).toSet
    }.toMap
    def recall(cb: Array[Long]): Double = {
      val codes = magDf.select(col("id"), Pq.encode(col("q"), cb, 2).as("codes"))
      val qs = magDf.filter(col("id") % 16 === 0)
        .select(col("id").as("query_id"), Pq.adcTable(col("q"), cb, 2, 4).as("tbl"))
      val got = Pq.topKAdc(codes, qs, k = 3).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      queries.map(q => got(q).intersect(truth(q)).size.toDouble / 3).sum / queries.size
    }
    val stride = Pq.strideCodebook(magDf, stride = 1, ksub = 4, m = 2)
    val trained = Pq.trainedCodebook(magDf, stride, m = 2, ksub = 4, iters = 5)
    val (rs, rt) = (recall(stride), recall(trained))
    assert(rt >= rs, s"trained recall $rt fell below stride recall $rs")
    assert(rt > 0.5, s"trained recall $rt too weak on trivially-clustered data")
  }

  test("residual IVF-PQ: residual coding beats raw coding on clustered data; neighbors stay in-cell") {
    import graft.operators.Similarity
    // stride-16 coarse centroids = the four direction anchors
    val cells = Similarity.ivfCells(dirDf, stride = 16).cache()
    val cents = Similarity.strideCentroids(dirDf, stride = 16)
    val res = Pq.residuals(cells, cents).cache()
    val rawCb = Pq.strideCodebook(dirDf, stride = 1, ksub = 4, m = 2)
    val resCb = Pq.trainedCodebook(res, Pq.strideCodebook(res, 1, 4, 2), m = 2, ksub = 4, iters = 3)
    val dRaw = Pq.distortion(dirDf, rawCb, 2, 4)
    val dRes = Pq.distortion(res, resCb, 2, 4)
    assert(dRes <= dRaw,
      s"residual distortion $dRes should not exceed raw distortion $dRaw on clustered data")
    val out = Pq.topKAdcResidual(cells, cents, resCb, _ % 16 === 0, k = 3, m = 2, ksub = 4).collect()
    assert(out.length == 4 * 3, s"expected 3 neighbors per query, got ${out.length}")
    val cellOf = cells.select("id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(cellOf(r.getLong(0)) == cellOf(r.getLong(1)),
        s"neighbor ${r.getLong(1)} outside query ${r.getLong(0)}'s cell")
    }
    // direction clusters make cells == planted groups, so every in-cell
    // hit is a true near neighbor (a group-mate)
    out.foreach(r => assert(r.getLong(0) / 16 == r.getLong(1) / 16))
    cells.unpersist(); res.unpersist()
  }

  test("trainedCodebook: one corpus job per Lloyd round regardless of m (all subspaces train together)") {
    val spark0 = spark
    val init = Pq.strideCodebook(magDf, stride = 1, ksub = 4, m = 2)
    magDf.count() // materialize the cache outside the counted window
    def jobsFor(iters: Int): Int = {
      val gid = s"pq-train-jobcount-$iters"
      spark0.sparkContext.setJobGroup(gid, "trainedCodebook job count")
      try Pq.trainedCodebook(magDf, init, m = 2, ksub = 4, iters = iters)
      finally spark0.sparkContext.clearJobGroup()
      var n = -1; var stable = 0
      while (stable < 2) { // status store applies events asynchronously
        Thread.sleep(100)
        val m = spark0.sparkContext.statusTracker.getJobIdsForGroup(gid).length
        if (m == n) stable += 1 else { n = m; stable = 0 }
      }
      n
    }
    val j2 = jobsFor(2); val j6 = jobsFor(6)
    // each round is ONE collect (AQE may count its shuffle-stage
    // materializations individually — allow a few per round, but the
    // growth must be per-ROUND, not per-round-per-subspace-per-codeword
    val perRound = (j6 - j2) / 4.0
    assert(perRound <= 4, s"a Lloyd round cost $perRound jobs — assign/update split into extra passes")
    assert(jobsFor(0) == 0, "iters=0 must not touch the cluster")
  }

  test("multi-probe residual IVF-PQ: nprobe=1 reproduces the single-cell path; top-k never worsens with nprobe") {
    import graft.operators.Similarity
    val cells = Similarity.ivfCells(dirDf, stride = 16).cache()
    val cents = Similarity.strideCentroids(dirDf, stride = 16)
    val res = Pq.residuals(cells, cents)
    val cb = Pq.strideCodebook(res, 1, 4, 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getLong(3))).toSet
    val single = rows(Pq.topKAdcResidual(cells, cents, cb, _ % 16 === 0, k = 3, m = 2, ksub = 4))
    val probe1 = rows(Pq.topKAdcResidualProbe(cells, cents, cb, _ % 16 === 0, k = 3, nprobe = 1, m = 2, ksub = 4))
    assert(probe1 == single, "nprobe=1 must reproduce the own-cell residual path exactly")
    // widening the probe can only improve (or hold) each query's top-k:
    // the candidate set grows monotonically under the same scoring
    def worst(s: Set[(Long, Long, Long, Long)]): Map[Long, Long] =
      s.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val w1 = worst(probe1)
    for (np <- Seq(2, 4)) {
      val wn = worst(rows(Pq.topKAdcResidualProbe(cells, cents, cb, _ % 16 === 0, k = 3, nprobe = np, m = 2, ksub = 4)))
      wn.foreach { case (q, w) =>
        assert(w <= w1(q), s"query $q: nprobe=$np worst adist $w exceeds nprobe=1's ${w1(q)}")
      }
    }
    cells.unpersist()
  }

  test("broadcast codebook forms are byte-identical to the literal forms, no codebook literal in plan") {
    val cbB = spark.sparkContext.broadcast(cb)
    // repartition keeps ConvertToLocalRelation from constant-evaluating
    // the projection at optimize time (which would erase the very
    // expressions the plan assertions below inspect)
    val vecs = Seq(
      Tuple1(Array(9L, 9L, 1L, 1L)), Tuple1(Array(1L, 2L, 4L, 5L)),
      Tuple1(Array(0L, 0L, 5L, 5L)), Tuple1(Array(10L, 10L, 0L, 0L))).toDF("v")
      .repartition(2)
    val lit_ = vecs.select(
      Pq.encode(col("v"), cb, M).as("codes"),
      Pq.adcTable(col("v"), cb, M, Ksub).as("tbl")).collect()
    val bcast = vecs.select(
      Pq.encodeBroadcast(col("v"), cbB, M).as("codes"),
      Pq.adcTableBroadcast(col("v"), cbB, M, Ksub).as("tbl"))
    assert(bcast.collect().map(_.toString).toSeq == lit_.map(_.toString).toSeq)
    // the plan must carry the broadcast handle, not ksub·dim literal longs
    val exprs = bcast.queryExecution.optimizedPlan.collect { case p => p.expressions }.flatten
    assert(exprs.exists(_.collect { case b: graft.expressions.BroadcastRef => b }.nonEmpty))
    val arrayLits = exprs.flatMap(_.collect {
      case l: org.apache.spark.sql.catalyst.expressions.Literal
        if l.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
           l.value != null &&
           l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements() >= cb.length => l
    })
    assert(arrayLits.isEmpty, s"codebook leaked into the plan as array literal(s)")
  }
}
