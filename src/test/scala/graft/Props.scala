package graft

import graft.operators.{Enrich, EnrichConfig, MinMax, StableAgg}
import graft.queries.{Rnd, SentimentScorer}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property tests (SURVEY.md §5.3) as raw ScalaCheck Properties (sbt runs
  * these natively; the scalatest bridge is not in the offline cache).
  * Spark-backed properties keep sample counts small — each case is a job.
  */
object MinMaxProps extends Properties("MinMax") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val values = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))

  property("output ∈ [0,1], or all-0.0 when degenerate") = Prop.forAll(values) { vs =>
    val out = MinMax.normalize(vs.toDF("v"), "v", "n")
      .collect().map(_.getAs[Double]("n"))
    if (vs.max == vs.min) out.forall(_ == 0.0)
    else out.forall(n => n >= 0.0 && n <= 1.0) && out.contains(0.0) && out.contains(1.0)
  }
}

object EnrichProps extends Properties("Enrich") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sizes = Gen.chooseNum(1, 120)

  property("batching preserves the id multiset under null-fill") =
    Prop.forAll(sizes) { n =>
      val items = (1 to n).map(i => (i.toLong, i % 2 == 0)).toDF("item_id", "signal")
      val out = Enrich.enrich(items,
        SentimentScorer("signal", failEvery = 3, flakyEvery = 0),
        EnrichConfig(batchSize = 7))
      out.collect().map(_.getAs[Long]("item_id")).sorted.toSeq == (1L to n.toLong)
    }

  property("drop mode removes exactly the failed batches' ids") =
    Prop.forAll(sizes) { n =>
      val items = (1 to n).map(i => (i.toLong, true)).toDF("item_id", "signal")
      val out = Enrich.enrich(items,
        SentimentScorer("signal", failEvery = 3, flakyEvery = 0),
        EnrichConfig(batchSize = 7, onFailure = graft.operators.FailureMode.Drop))
      val surviving = out.collect().map(_.getAs[Long]("item_id")).toSet
      val expected = (1L to n.toLong).filterNot(id => ((id - 1) / 7) % 3 == 2).toSet
      surviving == expected
    }
}

object OperatorProps extends Properties("Operators") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  property("salted aggregation equals the direct aggregate exactly (incl. AVG null-skip)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 5),
      Gen.option(Gen.chooseNum(-1e5, 1e5))))) { kvs =>
      val df = kvs.map { case (k, v) => (k, v.map(Double.box).orNull) }.toDF("k", "v")
      val salted = graft.operators.Salt.saltedSumCountAvg(df, col("k"), col("v"), salts = 4)
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
      val direct = df.groupBy("k")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(30,8)")).cast("double").as("t"),
          (sum(col("v").cast("decimal(30,8)")).cast("double") / count(col("v"))).as("m"))
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
      salted == direct
    }

  property("winnowed fingerprints are a subset of the shingle hashes; identical docs agree") =
    Prop.forAll(Gen.chooseNum(3, 40), Gen.chooseNum(1L, 1000L)) { (nTokens, seed) =>
      // deterministic pseudo-text from the seed
      val words = (0 until nTokens).map(i => s"w${(seed * 31 + i * 7) % 13}")
      val text = words.mkString(" ")
      val df = Seq((1L, text), (2L, text)).toDF("id", "text")
      val fps = graft.operators.Dedup.winnowFingerprints(df, col("id"), col("text"), 3, 4)
        .collect().map(r => r.getLong(0) -> r.getString(1))
      val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val allShingleHashes = graft.operators.Dedup.shingles(df.filter(col("id") === 1), col("id"), col("text"), 3)
        .select(md5(col("shingle").cast("binary"))).collect().map(_.getString(0)).toSet
      byDoc.getOrElse(1L, Set.empty) == byDoc.getOrElse(2L, Set.empty) &&
        byDoc.getOrElse(1L, Set.empty).subsetOf(allShingleHashes)
    }

  property("clusters equals a brute-force union-find on random pair graphs") =
    Prop.forAll(Gen.chooseNum(1, 12), Gen.listOfN(10, Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))) {
      (n, rawPairs) =>
        val pairs = rawPairs.collect { case (a, b) if a != b && a <= n && b <= n =>
          (math.min(a, b), math.max(a, b))
        }.distinct
        pairs.isEmpty || {
          // brute-force union-find reference
          val parent = scala.collection.mutable.Map[Long, Long]()
          def find(x: Long): Long = {
            val p = parent.getOrElse(x, x)
            if (p == x) x else { val r = find(p); parent(x) = r; r }
          }
          pairs.foreach { case (a, b) =>
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
          val expected = nodes.map(v => v -> find(v)).toMap
          val got = graft.operators.Dedup.clusters(pairs.toDF("id_a", "id_b"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          got == expected
        }
    }

  property("pool assignment over one full cycle uses every pool member equally") =
    Prop.forAll(Gen.chooseNum(2, 12), Gen.oneOf(7L, 11L, 13L, 104729L)) { (poolSize, a) =>
      (a % poolSize == 0) || {
        val records = (1 to poolSize * 2).map(i => Tuple1(i.toLong)).toDF("idx")
        val pool = (0 until poolSize).map(i => s"m$i").toDF("k")
        val out = graft.operators.PoolAssign.assign(records, col("idx"), pool, "k", "u", a, 3L)
          .collect().map(_.getAs[String]("u"))
        out.groupBy(identity).values.map(_.size).toSet == Set(2)
      }
    }
}

object RndProps extends Properties("Rnd") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  property("floor-based rounding matches the reference formula bit-for-bit") =
    Prop.forAll(Gen.chooseNum(-1e9, 1e9), Gen.chooseNum(0, 6)) { (x: Double, d: Int) =>
      val p = math.pow(10.0, d)
      val expected = math.floor(x * p + 0.5) / p
      val spark = TestSpark.spark
      import spark.implicits._
      val got = Seq(x).toDF("x").select(Rnd.r(org.apache.spark.sql.functions.col("x"), d)).head.getDouble(0)
      got == expected || (got.isNaN && expected.isNaN)
    }

  property("StableAgg.ssum is exact and order-independent") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))) { vs =>
      val spark = TestSpark.spark
      import spark.implicits._
      def sumOf(xs: List[Double]): Double =
        xs.toDF("v").agg(StableAgg.ssum(org.apache.spark.sql.functions.col("v"))).head.getDouble(0)
      sumOf(vs) == sumOf(vs.reverse)
    }
}

/** The union+window as-of join must equal the naive (unscalable)
  * inequality-join + per-left-row argmax spelling on arbitrary data —
  * keys that hit/miss, duplicate left timestamps, unmatched lefts. */
object AsofJoinProps extends Properties("AsofJoin") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val smallTs = Gen.chooseNum(0L, 50L)
  private val key = Gen.chooseNum(0L, 4L)
  private val lefts = Gen.nonEmptyListOf(Gen.zip(key, smallTs))
  // right unique per (key, ts) — the operator's documented precondition
  private val rights = Gen.nonEmptyListOf(Gen.zip(key, smallTs)).map(_.distinct)

  property("equals the naive inequality-join argmax spelling") =
    Prop.forAll(lefts, rights) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs.map { case (k, t) => (k, t, s"p${k}_$t") }
        .toDF("rk", "rt", "payload")
      val got = graft.operators.AsofJoin
        .asofLast(left, "k", "t", right, "rk", "rt", Seq("payload"))
        .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("payload"))).toMap
      // naive: join all rt <= t pairs, keep the max-rt match per left row
      val rByKey = rs.groupBy(_._1)
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val best = rByKey.getOrElse(k, Nil).filter(_._2 <= t)
          .sortBy(_._2).lastOption.map { case (bk, bt) => s"p${bk}_$bt" }
        i.toLong -> best
      }.toMap
      got == expected
    }
}

object JdbcMergeProps extends Properties("JdbcMerge") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each case is a table + several real MERGEs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftprops;create=true"
  private val tableId = new java.util.concurrent.atomic.AtomicInteger(0)

  // sequences of keyed batches: each batch has unique keys drawn from a
  // small domain so batches genuinely collide across the sequence
  private val batchGen = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(-100, 100)))
    .map(_.groupBy(_._1).map { case (k, vs) => (k, vs.head._2) }.toList)
  private val seqGen = Gen.nonEmptyListOf(batchGen).map(_.take(4))

  property("folding batches through real MERGE equals folding upsertByKey") =
    Prop.forAll(seqGen) { batches =>
      val table = s"prop_tbl_${tableId.incrementAndGet()}"
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.execute(s"CREATE TABLE $table (k BIGINT NOT NULL PRIMARY KEY, v INT)")
        finally st.close()
      } finally conn.close()
      val frames = batches.map(_.toDF("k", "v"))
      frames.foreach(b => graft.sinks.JdbcMerge.mergeInto(b, url, table, Seq("k")))
      val want = frames.reduceLeft((acc, b) => graft.sinks.Sinks.upsertByKey(acc, b, Seq("k")))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = spark.read.jdbc(url, table, new java.util.Properties)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      got == want
    }
}

object SnapshotDiffProps extends Properties("SnapshotDiff") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // values stress the digest framing: nulls, empties, the separator and
  // sentinel characters themselves, and ':' digits (netstring noise)
  private val valueGen: Gen[Option[String]] = Gen.oneOf(
    Gen.const(None), Gen.const(Some("")), Gen.const(Some("\u0001")),
    Gen.const(Some("\u0002")), Gen.const(Some("1:")),
    Gen.alphaNumStr.map(s => Some(s.take(6))))
  private val snapGen: Gen[Map[Long, (Option[String], Option[String])]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 12L), Gen.zip(valueGen, valueGen)))
      .map(_.toMap)

  private def toDf(m: Map[Long, (Option[String], Option[String])]) =
    m.toSeq.map { case (k, (a, b)) => (k, a, b) } match {
      case Nil => Seq.empty[(Long, Option[String], Option[String])].toDF("k", "v1", "v2")
      case rows => rows.toDF("k", "v1", "v2")
    }
  private def dig = graft.operators.SnapshotDiff.rowDigest(
    Seq(org.apache.spark.sql.functions.col("v1"), org.apache.spark.sql.functions.col("v2")))

  property("applyChanges(old, diffWithPayload(old,new)) == new, for any snapshots") =
    Prop.forAll(snapGen, snapGen) { (oldM, newM) =>
      val feed = graft.operators.SnapshotDiff.diffWithPayload(toDf(oldM), toDf(newM), Seq("k"), dig)
      val applied = graft.operators.SnapshotDiff.applyChanges(toDf(oldM), feed, Seq("k"))
        .collect().map(r => (r.getLong(0), (Option(r.getString(1)), Option(r.getString(2))))).toMap
      applied == newM
    }

  property("diff classification matches the reference map compare") =
    Prop.forAll(snapGen, snapGen) { (oldM, newM) =>
      val got = graft.operators.SnapshotDiff.diff(toDf(oldM), toDf(newM), Seq("k"), dig)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want =
        (newM.keySet -- oldM.keySet).map(_ -> "added").toMap ++
        (oldM.keySet -- newM.keySet).map(_ -> "removed").toMap ++
        (oldM.keySet & newM.keySet).filter(k => oldM(k) != newM(k)).map(_ -> "changed").toMap
      got == want
    }
}

object MatViewProps extends Properties("MatView") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  // snapshots: key -> (group, cents). Few groups + a small value range
  // force group birth/death, moves, and genuine-zero sums to occur.
  private val snapGen: Gen[Map[Long, (String, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 15L),
      Gen.zip(Gen.oneOf("g1", "g2", "g3"), Gen.chooseNum(-300L, 300L))))
      .map(_.toMap)

  private def toDf(m: Map[Long, (String, Long)]) =
    m.toSeq.map { case (k, (g, c)) => (k, g, BigDecimal(c) / 100) } match {
      case Nil => Seq.empty[(Long, String, BigDecimal)].toDF("id", "grp", "v")
      case rows => rows.toDF("id", "grp", "v")
    }
  private def dig = graft.operators.SnapshotDiff.rowDigest(
    Seq(col("grp"), col("v").cast("decimal(18,2)")))
  private val sums = Seq("sv" -> col("v").cast("decimal(18,2)"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("grp"), col("cnt"), col("sv").cast("decimal(28,2)"))
      .collect().map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2)))).toSet

  property("deltaRefresh(view(old), feed) == build(new), for any snapshots") =
    Prop.forAll(snapGen, snapGen) { (oldM, newM) =>
      val (o, n) = (toDf(oldM), toDf(newM))
      val feed = graft.operators.SnapshotDiff.diffWithPayload(o, n, Seq("id"), dig)
      val view = graft.operators.MatView.build(o, Seq("grp"), sums)
      val refreshed = graft.operators.MatView
        .deltaRefresh(view, o, feed, Seq("id"), Seq("grp"), sums)
      canon(refreshed) == canon(graft.operators.MatView.build(n, Seq("grp"), sums))
    }
}

object SetSimJoinProps extends Properties("SetSimJoin") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // small vocab + small sets: high collision rate stresses every branch
  // (dense buckets, boundary ratios, singleton sets)
  private val corpusGen: Gen[Map[Long, Set[String]]] =
    Gen.mapOf(Gen.zip(Gen.chooseNum(0L, 9L),
      Gen.nonEmptyContainerOf[Set, String](Gen.oneOf("a", "b", "c", "d", "e", "f"))))
  private val thresholdGen: Gen[Double] = Gen.oneOf(0.3, 0.5, 0.6, 0.75, 1.0)

  property("pair set equals brute force at any threshold") =
    Prop.forAll(corpusGen, thresholdGen) { (sets, t) =>
      val df = sets.toSeq.flatMap { case (id, ts) => ts.map(id -> _) } match {
        case Nil => Seq.empty[(Long, String)].toDF("id", "token")
        case rows => rows.toDF("id", "token")
      }
      val got = graft.operators.SetSimJoin.similarPairs(df, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b
        j = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
        if j >= t
      } yield (a, b)).toSet
      got == want
    }
}

object SetSimJoinCrossProps extends Properties("SetSimJoinCross") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpusGen: Gen[Map[Long, Set[String]]] =
    Gen.mapOf(Gen.zip(Gen.chooseNum(0L, 7L),
      Gen.nonEmptyContainerOf[Set, String](Gen.oneOf("a", "b", "c", "d", "e"))))
  private val thresholdGen: Gen[Double] = Gen.oneOf(0.3, 0.5, 0.6, 1.0)

  private def toDf(sets: Map[Long, Set[String]]) =
    sets.toSeq.flatMap { case (id, ts) => ts.map(id -> _) } match {
      case Nil => Seq.empty[(Long, String)].toDF("id", "token")
      case rows => rows.toDF("id", "token")
    }

  property("cross-join pair set equals brute force (overlapping ids allowed)") =
    Prop.forAll(corpusGen, corpusGen, thresholdGen) { (l, r, t) =>
      val got = graft.operators.SetSimJoin.similarJoin(toDf(l), toDf(r), t)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for {
        a <- l.keys; b <- r.keys
        j = l(a).intersect(r(b)).size.toDouble / l(a).union(r(b)).size
        if j >= t
      } yield (a, b)).toSet
      got == want
    }
}

object SpansProps extends Properties("Spans") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val N = 3
  // tiny alphabet + short docs: cross-doc gram repeats are common and
  // overlap/adjacency/island edge cases all get generated
  private val word = Gen.oneOf("aa", "bb", "cc", "dd")
  private val docGen = Gen.chooseNum(0, 12)
    .flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
  private val corpusGen = Gen.chooseNum(2, 6).flatMap(d => Gen.listOfN(d, docGen))

  /** Covered token positions per doc, by brute force: every n-gram
    * occurring in >= 2 distinct docs covers its n positions. */
  private def refCovered(docs: Seq[String]): Map[Long, Set[Int]] = {
    val toks = docs.map(_.split(" ", -1).toSeq)
    val grams = toks.zipWithIndex.flatMap { case (t, d) =>
      if (t.length >= N) (0 to t.length - N).map(p => (t.slice(p, p + N).mkString(" "), d, p))
      else Seq.empty }
    val repeated = grams.groupBy(_._1)
      .filter { case (_, occ) => occ.map(_._2).distinct.size >= 2 }.keySet
    grams.filter(g => repeated(g._1))
      .groupBy(_._2.toLong)
      .view.mapValues(_.flatMap { case (_, _, p) => p until p + N }.toSet).toMap
  }

  /** Maximal runs of consecutive covered positions — provably equal to
    * the operator's merged-anchor-interval islands (adjacent windows
    * merge in both formulations). */
  private def runs(ps: Set[Int]): Set[(Long, Long, Long)] = {
    val sorted = ps.toSeq.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var start = -1; var prev = -2
    for (p <- sorted) {
      if (p != prev + 1) { if (start >= 0) out += ((start.toLong, prev.toLong, (prev - start + 1).toLong)); start = p }
      prev = p
    }
    if (start >= 0) out += ((start.toLong, prev.toLong, (prev - start + 1).toLong))
    out.toSet
  }

  property("repeatedSpans equals brute-force covered-position runs") =
    Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = graft.operators.Dedup.repeatedSpans(df, col("id"), col("text"), N)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet).toMap
      val want = refCovered(docs).collect { case (d, ps) if ps.nonEmpty => d -> runs(ps) }
      got == want
    }

  property("removeRepeatedSpans drops exactly the covered positions") =
    Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = graft.operators.Dedup.removeRepeatedSpans(df, col("id"), col("text"), N)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      val covered = refCovered(docs)
      docs.zipWithIndex.forall { case (t, i) =>
        val cov = covered.getOrElse(i.toLong, Set.empty)
        val toks = t.split(" ", -1).toSeq
        val wantText = toks.zipWithIndex.collect { case (tok, p) if !cov(p) => tok }.mkString(" ")
        got(i.toLong) == ((wantText, cov.size.toLong))
      }
    }
  property("incrementalRepeatedSpans == full-corpus spans restricted to the batch") =
    Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val isNew = col("id") % 2 === 0
      def spanSet(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val full = spanSet(graft.operators.Dedup.repeatedSpans(df, col("id"), col("text"), N)
        .filter(col("id") % 2 === 0).collect())
      val state = graft.operators.Dedup.spanDigestState(
        df.filter(!isNew), col("id"), col("text"), N)
      val incr = spanSet(graft.operators.Dedup.incrementalRepeatedSpans(
        df.filter(isNew), col("id"), col("text"), state, N).collect())
      incr == full
    }
}


object EditDistProps extends Properties("EditDist") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  // 3-letter alphabet, lengths 0-14: dense near-pairs, periodic strings
  // (the distinct-gram prefix's adversarial case), and the short pool
  // all get generated
  private val strGen = Gen.chooseNum(0, 14)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val corpusGen = Gen.chooseNum(2, 14).flatMap(n => Gen.listOfN(n, strGen))
  private val kGen = Gen.oneOf(1, 2)

  property("pair set equals brute force at k = 1 and 2 (no false negatives)") =
    Prop.forAll(corpusGen, kGen) { (strs, k) =>
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = graft.operators.EditDist.similarPairs(
          rows.toDF("id", "s"), col("id"), col("s"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib && math.abs(sa.length - sb.length) <= k
        d = lev(sa, sb) if d <= k
      } yield (ia, ib, d.toLong)).toSet
      got == want
    }

  property("cross-collection join equals brute force at k = 1 and 2") =
    Prop.forAll(corpusGen, corpusGen, kGen) { (ls, rs, k) =>
      val left = ls.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val right = rs.zipWithIndex.map { case (s, i) => (1000L + i, s) }
      val got = graft.operators.EditDist.similarJoin(
          left.toDF("id", "s"), col("id"), col("s"),
          right.toDF("id", "s"), col("id"), col("s"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (ia, sa) <- left; (ib, sb) <- right
        d = lev(sa, sb) if d <= k
      } yield (ia, ib, d.toLong)).toSet
      got == want
    }

  property("frozen-order accumulated state over 3 batches: pair union == brute force") =
    Prop.forAll(corpusGen, kGen) { (strs, k) =>
      // the FuzzyStream semantics: the gram-frequency order FREEZES at
      // the first batch; each later batch probes the ACCUMULATED state
      // (all prior batches' gramStateUnder rows, same frozen order).
      // The union of per-batch reports must equal brute force over the
      // whole corpus — the cross-epoch prefix-lemma claim, generatively.
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val step = math.max(1, (rows.size + 2) / 3)
      val batches = rows.grouped(step).toSeq
      val ed = graft.operators.EditDist
      val freq = ed.gramFreqState(batches.head.toDF("id", "s"), col("id"), col("s"), k)
      var state = ed.gramStateUnder(
        batches.head.toDF("id", "s"), col("id"), col("s"), freq, k).limit(0)
      var got = Set.empty[(Long, Long, Long)]
      batches.foreach { b =>
        val df = b.toDF("id", "s")
        got ++= ed.incrementalSimilarPairs(df, col("id"), col("s"), state, freq, k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        state = state.unionByName(ed.gramStateUnder(df, col("id"), col("s"), freq, k))
      }
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib && math.abs(sa.length - sb.length) <= k
        d = lev(sa, sb) if d <= k
      } yield (ia, ib, d.toLong)).toSet
      got == want
    }

  property("incremental == full-corpus pairs touching the batch at k = 1 and 2") =
    Prop.forAll(corpusGen, kGen) { (strs, k) =>
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val (old, batch) = rows.partition(_._1 % 2 == 0)
      val state = graft.operators.EditDist.gramState(
        old.toDF("id", "s"), col("id"), col("s"), k)
      val freq = graft.operators.EditDist.gramFreqState(
        old.toDF("id", "s"), col("id"), col("s"), k)
      val got = graft.operators.EditDist.incrementalSimilarPairs(
          batch.toDF("id", "s"), col("id"), col("s"), state, freq, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batchIds = batch.map(_._1).toSet
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib && (batchIds(ia) || batchIds(ib))
        d = lev(sa, sb) if d <= k
      } yield (ia, ib, d.toLong)).toSet
      got == want
    }
}


object NgramLmProps extends Properties("NgramLm") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  // 3-word alphabet plus "" (joined with spaces, empty words exercise
  // the empty-token filter and double-space handling); 0-6 words/doc
  private val docGen = Gen.chooseNum(0, 6)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "")).map(_.mkString(" ")))
  private val corpusGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, docGen))

  private def refScores(ref: Seq[String], docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    def bigramsOf(t: String): Seq[(String, String)] = {
      val toks = "<s>" +: t.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq
      toks.zip(toks.drop(1))
    }
    val model = ref.flatMap(bigramsOf).groupMapReduce(identity)(_ => 1L)(_ + _)
    val ctx = model.groupMapReduce(_._1._1)(_._2)(_ + _)
    val v = model.keysIterator.map(_._2).toSet.size.toLong
    docs.flatMap { case (id, t) =>
      val bg = bigramsOf(t)
      if (bg.isEmpty) None
      else {
        val ss = bg.map { p =>
          1000000L * (ctx.getOrElse(p._1, 0L) + v) / (model.getOrElse(p, 0L) + 1L)
        }
        Some(id -> ((bg.size.toLong, ss.sum / bg.size)))
      }
    }.toMap
  }

  property("score equals the local reference (counts, smoothing, floor mean)") =
    Prop.forAll(corpusGen, corpusGen) { (ref, texts) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val model = graft.operators.NgramLm.bigramModel(
        ref.zipWithIndex.map { case (t, i) => (1000L + i, t) }.toDF("id", "text"),
        col("id"), col("text"))
      val got = graft.operators.NgramLm.score(
          docs.toDF("id", "text"), col("id"), col("text"), model)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      got == refScores(ref, docs)
    }
}
