package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.999f, 0.01f, 0.0f)), // near-parallel to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),    // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)))   // anti-parallel to 0
    .toDF("vec_id", "embedding")

  test("quantized cosine: parallel ≈ 1, orthogonal = 0, anti-parallel = -1") {
    val p = Similarity.prep(frame, col("vec_id"), col("embedding"))
    val top = Similarity.bruteTopK(p, p.filter(col("id") === 0), k = 3)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cos")).toMap
    assert(top(1L) > 0.99)
    assert(math.abs(top(2L)) < 1e-9)
    assert(math.abs(top(3L) + 1.0) < 1e-9)
  }

  test("top-k ranks by cosine desc with id tie-break and caps at k") {
    val p = Similarity.prep(frame, col("vec_id"), col("embedding"))
    val rows = Similarity.bruteTopK(p, p.filter(col("id") === 0), k = 2)
      .orderBy("rk").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L))
  }

  test("identical vectors share an LSH signature; signature length = planes") {
    val df = Seq((0L, Array(0.5f, -0.25f)), (1L, Array(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val p = Similarity.prep(df, col("vec_id"), col("embedding"))
    val sigs = p.select(Similarity.lshSignature(col("q"), 8, 2).as("s"))
      .collect().map(_.getString(0))
    assert(sigs.distinct.length == 1)
    assert(sigs.head.length == 8 && sigs.head.forall(c => c == '0' || c == '1'))
    val pairs = Similarity.lshPairs(p, 8, 2).collect()
    assert(pairs.length == 1 && math.abs(pairs.head.getAs[Double]("cos") - 1.0) < 1e-9)
    spark.catalog.clearCache() // lshPairs pins its signature frame
  }

  test("a wrong-width vector raises instead of hashing into a wrong bucket") {
    val df = Seq((0L, Array(0.5f, -0.25f, 0.125f))).toDF("vec_id", "embedding")
    val p = Similarity.prep(df, col("vec_id"), col("embedding"))
    val e = intercept[Exception] {
      p.select(Similarity.lshSignature(col("q"), 4, 2)).collect()
    }
    assert(e.getMessage.contains("expected a 2-dim vector"),
      s"wanted the loud dim guard, got: ${e.getMessage}")
  }

  test("plane weights are not periodic: requesting p planes yields p distinct patterns") {
    // the retired arithmetic rule repeated every 7 planes (plane 7 ==
    // plane 0), capping any signature at 128 buckets; the md5 rule must
    // give pairwise-distinct weight rows at practical widths
    val dim = 64
    val rows = (0 until 44).map(p => (0 until dim).map(i => Similarity.planeWeight(p, i)))
    assert(rows.distinct.length == rows.length, "duplicate hyperplanes within 44 planes")
    // and the coin is roughly fair per row (a constant row buckets nothing)
    rows.foreach(r => assert(math.abs(r.sum) <= dim / 2, s"degenerate plane: $r"))
  }

  test("adaptiveBits: exact integer ceil-log2 with a floor") {
    import Similarity.adaptiveBits
    assert(adaptiveBits(0, 4) == 4 && adaptiveBits(1, 4) == 4 && adaptiveBits(2, 1) == 1)
    assert(adaptiveBits(3, 1) == 2 && adaptiveBits(4, 1) == 2 && adaptiveBits(5, 1) == 3)
    assert(adaptiveBits(500, 8) == 9 && adaptiveBits(512, 8) == 9 && adaptiveBits(513, 8) == 10)
    assert(adaptiveBits(2000, 8) == 11)
    assert(adaptiveBits(1L << 40, 8) == 40)
  }

  test("adaptive planes: max bucket occupancy stays flat as the corpus doubles") {
    def maxOccupancy(n: Int): Long = {
      val dim = 8
      // deterministic pseudo-random directions (spec-local generator)
      val pts = (0 until n).map { i =>
        (i.toLong, Array.tabulate(dim)(j => math.sin(i * 12.9898 + j * 78.233).toFloat))
      }
      val p = Similarity.prep(pts.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"))
      p.select(Similarity.lshSignature(col("q"), Similarity.adaptiveBits(n, 8), dim).as("s"))
        .groupBy("s").count().agg(max("count")).head.getLong(0)
    }
    val at256 = maxOccupancy(256)
    val at512 = maxOccupancy(512)
    // fixed planes would double the biggest bucket; adaptive planes keep
    // expected occupancy constant (allow generous noise headroom)
    assert(at512 <= at256 * 1.5 + 3,
      s"occupancy grew linearly: $at256 -> $at512 despite doubling buckets")
  }

  test("banded LSH: near-identical vectors survive banding; each pair scored exactly once") {
    val dim = 8
    // 3 exact duplicates of one direction + 40 scattered vectors
    val dups = Seq(0L, 1L, 2L).map(i => (i, Array.tabulate(dim)(j => if (j == 0) 1.0f else 0.01f)))
    val rest = (10L until 50L).map(i =>
      (i, Array.tabulate(dim)(j => math.sin(i * 3.77 + j * 1.31).toFloat)))
    val p = Similarity.prep((dups ++ rest).toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding")).cache()
    val pairs = Similarity.lshBandedPairs(p, dim, bands = 4, minWidth = 4).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length, "a multi-band collision was scored twice")
    // identical vectors agree on every band, so all 3 duplicate pairs appear
    val dupPairs = keys.filter { case (a, b) => a < 3 && b < 3 }
    assert(dupPairs.toSet == Set((0L, 1L), (0L, 2L), (1L, 2L)), s"lost duplicates: ${keys.toSeq}")
    pairs.filter(r => r.getLong(0) < 3 && r.getLong(1) < 3)
      .foreach(r => assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9))
    p.unpersist(); spark.catalog.clearCache()
  }

  test("incremental banded ANN equals the full pair set restricted to the batch; no old-x-old") {
    val dim = 8
    // old corpus: a dup family (0,1) + scatter; new batch: a dup of old
    // vector 0 (id 100) + an internal new dup pair (101,102) + scatter
    def v(seed: Double) = Array.tabulate(dim)(j => math.sin(seed * 3.77 + j * 1.31).toFloat)
    val dupDir = Array.tabulate(dim)(j => if (j == 0) 1.0f else 0.01f)
    val newDir = Array.tabulate(dim)(j => if (j == 1) 1.0f else 0.02f)
    val oldRows = Seq((0L, dupDir), (1L, dupDir)) ++ (10L until 40L).map(i => (i, v(i.toDouble)))
    val newRows = Seq((100L, dupDir), (101L, newDir), (102L, newDir)) ++
      (110L until 120L).map(i => (i, v(i.toDouble)))
    val oldP = Similarity.prep(oldRows.toDF("vec_id", "embedding"), col("vec_id"), col("embedding")).cache()
    val newP = Similarity.prep(newRows.toDF("vec_id", "embedding"), col("vec_id"), col("embedding")).cache()
    val allP = Similarity.prep((oldRows ++ newRows).toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding")).cache()
    val w = Similarity.adaptiveBits(oldRows.size + newRows.size, 4)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cos"))).toSet
    val full = pairSet(Similarity.lshBandedPairs(allP, dim, bands = 4, minWidth = 4))
    val newIds = newRows.map(_._1).toSet
    val wantTouchingNew = full.filter { case (a, b, _) => newIds(a) || newIds(b) }
    val state = Similarity.bandAssignments(oldP, dim, 4, w)
    Seq(true, false).foreach { bc =>
      val inc = pairSet(Similarity.incrementalBandedPairs(
        newP, oldP, state, dim, 4, w, broadcastNew = bc))
      assert(inc == wantTouchingNew, s"broadcastNew=$bc:\n inc=$inc\n want=$wantTouchingNew")
      assert(inc.forall { case (a, b, _) => newIds(a) || newIds(b) })
    }
    // the planted relationships specifically
    val incKeys = pairSet(Similarity.incrementalBandedPairs(newP, oldP, state, dim, 4, w))
      .map { case (a, b, _) => (a, b) }
    assert(Set((0L, 100L), (1L, 100L), (101L, 102L)).subsetOf(incKeys))
    assert(!incKeys.contains((0L, 1L)), "old-x-old pair leaked")
    spark.catalog.clearCache()
  }

  test("semanticPairs: blob-exact within-cell pairs; blocked == naive; composed keep drops non-reps") {
    // 4 orthogonal blobs of 10; stride 10 → one centroid per blob, so
    // within-blob cosine ≈ 0.999 and cross-blob ≈ 0.03 — at 0.9 the
    // semantic pairs must be EXACTLY the 4 × C(10,2) within-blob pairs
    val pts = (0L until 40L).map { i =>
      val v = Array.fill(4)(0.01f * (i % 3))
      v((i / 10).toInt) = 1.0f
      (i, v)
    }
    val p = Similarity.prep(pts.toDF("vec_id", "embedding"), col("vec_id"), col("embedding")).cache()
    def keys(df: org.apache.spark.sql.DataFrame) = df.select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for (blob <- 0 until 4; a <- 0 until 10; b <- a + 1 until 10)
      yield (blob * 10L + a, blob * 10L + b)).toSet
    val pairs = Similarity.semanticPairs(p, stride = 10, threshold = 0.9)
    assert(keys(pairs) == expected)
    // forcing every cell through the triangular blocks changes nothing
    assert(keys(Similarity.semanticPairs(p, stride = 10, threshold = 0.9, blockSize = 3))
      == expected)
    // the composed SemDeDup keep: clusters == blobs, canon = blob min id
    val labels = Dedup.clusters(
        pairs.select(col("vec_a").as("id_a"), col("vec_b").as("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 40 && labels.forall { case (id, c) => c == (id / 10) * 10 })
    spark.catalog.clearCache()
  }

  test("maxCosExpr: exact max cosine vs a broadcast reference set, equals brute force") {
    graft.GraftFunctions.ensure(spark)
    val rows = (0L until 30L).map { i =>
      val v = Array.fill(4)(0.05f * ((i % 7) + 1))
      v((i % 4).toInt) = 1.0f
      (i, v)
    }
    val p = Similarity.prep(rows.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"))
      .cache()
    val refs = p.filter(col("id") % 5 === 0).select("id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq
    val got = p.withColumn("m", Similarity.maxCosExpr(refs, col("q"), col("norm")))
      .select("id", "m").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // brute force with the same exact-integer arithmetic
    val qs = p.select("id", "q", "norm").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getDouble(2))).toSeq
    val refNorms = refs.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum.toDouble) }.toMap
    qs.foreach { case (id, q, n) =>
      val brute = refs.map { case (rid, rv) =>
        q.zip(rv).map { case (a, b) => a * b }.sum.toDouble / (n * refNorms(rid)) }.max
      assert(got(id) == brute, s"id=$id: ${got(id)} != $brute")
    }
    spark.catalog.clearCache()
  }

  test("incrementalSemanticPairs == full semanticPairs restricted to batch-touching pairs") {
    // old ids 0..19 hold the only stride multiples, so the union's
    // frozen model == the old corpus's model and the comparison is
    // under ONE cell assignment
    val mk = (ids: Seq[Long]) => ids.map { i =>
      val v = Array.fill(4)(0.01f * (i % 3))
      v((i % 4).toInt) = 1.0f
      (i, v)
    }
    val old = Similarity.prep(mk(0L until 20L).toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding")).cache()
    val fresh = Similarity.prep(mk(Seq(101L, 102L, 103L)).toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding")).cache()
    val model = Similarity.strideCentroids(old, stride = 10)
      .select("cent_id", "cq").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    val stateCells = old.withColumn("cell",
      Similarity.cellAssignExpr(model, col("q"), col("norm")))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = rows(Similarity.incrementalSemanticPairs(fresh, stateCells, model, 0.9))
    val freshIds = Set(101L, 102L, 103L)
    val full = rows(Similarity.semanticPairs(old.unionByName(fresh), stride = 10,
        threshold = 0.9))
      .filter { case (a, b, _) => freshIds(a) || freshIds(b) }
    assert(inc == full && inc.nonEmpty)
    // forcing the blocked paths changes nothing
    assert(rows(Similarity.incrementalSemanticPairs(fresh, stateCells, model, 0.9,
      blockSize = 2)) == inc)
    spark.catalog.clearCache()
  }

  test("ivfTopKProbe: nprobe=1 matches the single-cell probe; nprobe=#cells recovers brute force") {
    // 40 vectors in 4 orthogonal-ish blobs; stride 10 → 4 centroids
    val pts = (0L until 40L).map { i =>
      val v = Array.fill(4)(0.01f * (i % 3))
      v((i / 10).toInt) = 1.0f
      (i, v)
    }
    val p = Similarity.prep(pts.toDF("vec_id", "embedding"), col("vec_id"), col("embedding")).cache()
    val cells = Similarity.ivfCells(p, stride = 10).cache()
    val cents = Similarity.strideCentroids(p, stride = 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val one = rows(Similarity.ivfTopKProbe(cells, cents, id => id < 3, k = 3, nprobe = 1))
    assert(one == rows(Similarity.ivfTopK(cells, id => id < 3, k = 3)))
    val all = rows(Similarity.ivfTopKProbe(cells, cents, id => id < 3, k = 3, nprobe = 4))
    assert(all == rows(Similarity.bruteTopK(p, p.filter(col("id") < 3), k = 3)),
      "probing every cell must equal exact search")
    p.unpersist(); cells.unpersist()
  }

  test("map-side cell assignment equals the aggregate path, with zero exchanges, and routes a stream") {
    val pts = (0L until 40L).map { i =>
      val v = Array.fill(4)(0.01f * (i % 3))
      v((i / 10).toInt) = 1.0f
      (i, v)
    }
    val p = Similarity.prep(pts.toDF("vec_id", "embedding"), col("vec_id"), col("embedding")).cache()
    val agg = Similarity.ivfCells(p, stride = 10)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mapSide = Similarity.ivfCellsMapSide(p, stride = 10)
    assert(mapSide.select("id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == agg, "map-side argmax diverged from the aggregate argmax (tie rule?)")
    // the assignment itself adds NO exchange: only the model collect ran
    val shuffles = mapSide.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, s"map-side assignment grew an exchange:\n${mapSide.queryExecution.executedPlan}")

    // streaming member: the same expression routes a live stream of
    // vectors to cells — stateless narrow map, append mode, no state
    val model = Similarity.strideCentroids(p, stride = 10)
      .select("cent_id", "cq").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val routed = in.toDF().toDF("id", "embedding")
    val prepped = Similarity.prep(routed, col("id"), col("embedding"))
      .withColumn("cell", Similarity.cellAssignExpr(model, col("q"), col("norm")))
    val q = prepped.select("id", "cell").writeStream.format("memory")
      .queryName("cells_stream").outputMode("append").start()
    try {
      in.addData(pts.take(25).map { case (i, v) => (i, v.toSeq) }: _*)
      q.processAllAvailable()
      in.addData(pts.drop(25).map { case (i, v) => (i, v.toSeq) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("cells_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == agg, "streamed routing diverged from batch assignment")
    } finally q.stop()
    p.unpersist()
  }

  test("k-means: well-separated blobs land in distinct cells; cost never increases per round") {
    // three tight blobs on orthogonal axes, 20 points each, deterministic jitter
    val pts = for {
      (axis, base) <- Seq(0 -> 0L, 1 -> 100L, 2 -> 200L)
      i <- 0 until 20
    } yield {
      val v = Array.fill(3)(0.02f * ((i * 7 + axis * 3) % 5))
      v(axis) = 1.0f
      (base + i, v)
    }
    val p = Similarity.prep(pts.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"))
      .cache()
    // cost is monotone non-increasing in training rounds
    val costs = (0 to 3).map(it =>
      Similarity.kmeansCost(p, Similarity.kmeansCentroids(p, k = 3, iters = it)))
    costs.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-12, s"cost rose: $costs") }
    // trained cells separate the blobs exactly
    val cents = Similarity.kmeansCentroids(p, k = 3, iters = 4)
    val cells = Similarity.ivfCellsTrained(p, cents)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byBlob = cells.groupBy(_._1 / 100).view.mapValues(_.map(_._2).distinct.toSeq).toMap
    assert(byBlob.values.forall(_.size == 1), s"a blob split across cells: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3, s"blobs share a cell: $byBlob")
    // the trained quantizer beats the untrained stride rule on the objective
    val strideAsCents = p.filter(col("id") % 67 === 0)
      .select(col("id").as("cent_id"),
        org.apache.spark.sql.functions.transform(col("q"), x => x.cast("double")).as("cvec"),
        col("norm").as("cnorm"))
    assert(Similarity.kmeansCost(p, cents) <= Similarity.kmeansCost(p, strideAsCents) + 1e-12)
    p.unpersist()
  }

  test("k-means|| init: corpus passes grow logarithmically with k, not linearly") {
    // 200 scattered directions; count Spark jobs per init via job groups
    val pts = (0L until 200L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 5.17 + j * 2.71).toFloat))
    }
    val p = Similarity.prep(pts.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"))
      .cache()
    p.count() // materialize the cache outside the counted window
    def jobsForInit(k: Int): Int = {
      val gid = s"kmpp-jobcount-$k"
      spark.sparkContext.setJobGroup(gid, "kmeansParInit job count")
      try {
        val cents = Similarity.kmeansParInit(p, k)
        assert(cents.size == k, s"expected $k centroids, got ${cents.size}")
      } finally spark.sparkContext.clearJobGroup()
      // the status store applies listener events asynchronously
      var n = -1; var stable = 0
      while (stable < 2) {
        Thread.sleep(100)
        val m = spark.sparkContext.statusTracker.getJobIdsForGroup(gid).length
        if (m == n) stable += 1 else { n = m; stable = 0 }
      }
      n
    }
    val at4 = jobsForInit(4)
    val at64 = jobsForInit(64)
    // Under AQE each round costs ~6 jobs (broadcast + shuffle-stage
    // materializations count individually). k-means|| adds
    // ceil(log2 64) - ceil(log2 4) = 4 rounds between these two;
    // farthest-first ran k-1 SEQUENTIAL corpus rounds — 60 more rounds
    // (hundreds of jobs). Allow 4 rounds' worth plus slack.
    assert(at64 - at4 <= 40, s"init jobs grew linearly with k: $at4 -> $at64")
    assert(at64 <= 70, s"k=64 init used $at64 corpus jobs — not O(log k)")
    p.unpersist()
  }

  test("k-means guards: empty input fails loudly; k beyond distinct vectors stops without duplicate centroids") {
    val empty = Similarity.prep(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"), col("vec_id"), col("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(empty, k = 2)
    }
    assert(e.getMessage.contains("empty input"))
    // 6 points but only 2 distinct vectors: farthest-first must stop at 2,
    // not loop re-picking the same point into duplicate centroids
    val two = (0L until 6L).map(i =>
      (i, if (i % 2 == 0) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val p2 = Similarity.prep(two, col("vec_id"), col("embedding"))
    val cents = Similarity.kmeansCentroids(p2, k = 5, iters = 2)
      .select("cent_id", "cvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(cents.length == 2, s"expected 2 centroids, got ${cents.length}")
    assert(cents.map(_._2).distinct.length == 2, "duplicate centroids emitted")
  }
}
