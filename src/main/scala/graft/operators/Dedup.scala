package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact (hash /
  * keyed), MinHash + banded LSH with n-gram-Jaccard verification, and
  * SimHash fingerprints.
  *
  * Scale design: near-dup detection NEVER does all-pairs. Shingling and
  * signatures are per-row map work; the only shuffles are the signature
  * group-by and the LSH bucket self-join, whose fan-out is bounded by
  * bucket size (pairs only form inside a (band, value) bucket). This is
  * the standard banded-MinHash layout (Broder's scheme as used in every
  * large dedup system; see PAPERS.md).
  *
  * Determinism/portability: hashes are md5 hex strings and signature
  * mins are STRING minima — identical in any engine — so the whole
  * family sits on the DuckDB-oracled path. (At pure-Spark scale one
  * would swap md5 for xxhash64 minima over int64; the operator keeps
  * md5 because cross-engine verifiability is part of this harness's
  * contract.)
  */
object Dedup {

  /** Exact full-row dedup — Spark-native. */
  def exactRows(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Exact keyed dedup with a deterministic representative: one hash
    * aggregate keeps min attributes + the duplicate count. */
  def exactByKey(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"), aggs: _*)

  /** Word n-gram shingles, lower-cased, distinct per id:
    * (id, shingle). Single-space tokenization to match the oracle. */
  def shingles(df: DataFrame, idCol: Column, textCol: Column, n: Int): DataFrame = {
    val toks = split(lower(textCol), " ")
    df.select(idCol.as("id"), toks.as("toks"))
      // a small doc table often arrives as ONE file split, and the
      // explode below multiplies rows ~100×: spread by id FIRST so the
      // heavy per-doc work parallelizes (and the per-id aggregates
      // downstream are already co-partitioned)
      .repartition(col("id"))
      .select(col("id"), explode(
        when(size(col("toks")) >= n,
          transform(sequence(lit(0), size(col("toks")) - n),
            i => array_join(slice(col("toks"), i + lit(1), lit(n)), " ")))
          .otherwise(array().cast("array<string>"))).as("shingle"))
      .distinct()
  }

  /** k-function MinHash signature per id: column m0..m{k-1}, where
    * m_i = MIN(md5("i:" ++ shingle)) as a hex string. */
  def minhashSignature(shingles: DataFrame, k: Int): DataFrame = {
    val hashes = (0 until k).map(i =>
      min(md5(concat_ws(":", lit(i.toString), col("shingle")).cast("binary"))).as(s"m$i"))
    shingles.groupBy("id").agg(hashes.head, hashes.tail: _*)
  }

  /** Banded LSH: k/bandWidth bands, band value = concat of its minhash
    * columns → (id, band_idx, band_val). */
  def lshBands(signature: DataFrame, k: Int, bandWidth: Int): DataFrame = {
    require(k % bandWidth == 0, s"k=$k not divisible by bandWidth=$bandWidth")
    val bandStructs = (0 until k / bandWidth).map { bx =>
      val cols = (bx * bandWidth until (bx + 1) * bandWidth).map(i => col(s"m$i"))
      struct(lit(bx).as("band_idx"), concat(cols: _*).as("band_val"))
    }
    signature
      .select(col("id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("id"), col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))
  }

  /** Candidate pairs = ids sharing any (band_idx, band_val) bucket;
    * the self-join shuffles once on the bucket key — never all-pairs. */
  def candidatePairs(bands: DataFrame): DataFrame =
    bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

  /** Exact n-gram Jaccard for candidate pairs only; keeps pairs with
    * similarity ≥ threshold. */
  def jaccardVerify(candidates: DataFrame, shingles: DataFrame, threshold: Double): DataFrame = {
    val counts = shingles.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(shingles.as("sa"), col("id_a") === col("sa.id"))
      .join(shingles.as("sb"),
        col("id_b") === col("sb.id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.as("ca"), col("id_a") === col("ca.id"))
      .join(counts.as("cb"), col("id_b") === col("cb.id"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("ca.n") + col("cb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Winnowing fingerprint selection (Schleimer et al.): hash every
    * positional shingle, take the MIN hash of each sliding window of
    * `w` consecutive positions, and keep the distinct minima — a
    * guaranteed-coverage sub-sample of the shingle set, the standard
    * scale trick for document fingerprint indexes. The window is
    * PARTITIONED BY document (bounded, parallel — never whole-frame).
    */
  def winnowFingerprints(df: DataFrame, idCol: Column, textCol: Column, n: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(lower(textCol), " ")
    // repartition BEFORE building the shingles array: the array holds
    // ~n copies of every token, so shuffling first moves the raw text
    // instead of the n×-inflated payload; the shuffle also parallelizes
    // the explode and co-partitions the per-id window below.
    val positioned = df
      .select(idCol.as("id"), lower(textCol).as("__t"))
      .repartition(col("id"))
      .select(col("id"),
        when(size(split(col("__t"), " ")) >= n,
          transform(sequence(lit(0), size(split(col("__t"), " ")) - n),
            i => array_join(slice(split(col("__t"), " "), i + lit(1), lit(n)), " ")))
          .otherwise(array().cast("array<string>")).as("shingles"))
      .select(col("id"), posexplode(col("shingles")).as(Seq("pos", "shingle")))
      .withColumn("h", md5(col("shingle").cast("binary")))
    val win = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    positioned
      .withColumn("fp", min(col("h")).over(win))
      .select(col("id"), col("fp"))
      .distinct()
  }

  /** Streaming exact dedup: state-backed duplicate drop bounded by the
    * event-time watermark (the streaming member of the family). */
  def streamingDedup(events: DataFrame, tsCol: String, keyCols: Seq[String], delay: String): DataFrame =
    events.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** 16-bit SimHash over distinct lower-cased tokens: bit j is 1 iff the
    * sum over tokens of ±1 (md5 hex digit j ≥ 8 → +1) is positive.
    * Near-identical token sets land on identical signatures. */
  def simhash(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = df.select(idCol.as("id"), array_distinct(split(lower(textCol), " ")).as("ts"))
      .repartition(col("id")) // parallelize the explode; co-partition the group-by
      .select(col("id"), explode(col("ts")).as("tok"))
      .withColumn("h", md5(col("tok").cast("binary")))
    val bitSums = (0 until 16).map(j =>
      sum(when(substring(col("h"), j + 1, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)).as(s"b$j"))
    toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        concat((0 until 16).map(j => when(col(s"b$j") > 0, "1").otherwise("0")): _*).as("simhash"))
  }
}
