package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT edit-distance similarity self-join — the fuzzy entity-
  * resolution operator (near-identical names/titles/SKUs differing by
  * typos): every pair with `levenshtein(a, b) <= maxDist`, no false
  * negatives.
  *
  * Scale shape (the q-gram count-filter prefix of ED-Join, Xiao et al.
  * 2008 — published algorithm only):
  *  - one edit destroys at most `q` of a string's positional q-grams,
  *    so two strings within `maxDist` edits share all but at most
  *    `maxDist·q` grams. Order all grams GLOBALLY (rarest first, one
  *    bounded frequency aggregate) and take each string's
  *    `maxDist·q + 1` rarest grams as its PREFIX: a within-distance
  *    pair must collide on at least one prefix gram. Candidates come
  *    from one equi-join on prefix grams plus the `|len_a − len_b| ≤
  *    maxDist` length filter — never all-pairs, and the rarest-first
  *    order keeps stopword-like grams ("er", "00") out of the join
  *    keys exactly as [[SetSimJoin]]'s prefix filter does.
  *  - strings with at most `maxDist·q` grams (too short for the
  *    pigeonhole) fall into a SHORT POOL paired by length band alone.
  *    The pool is bounded by the measured count against
  *    `maxShortPool` and fails LOUDLY over it (the [[AnnJoin]] hot-
  *    cell discipline) — name-like domains keep it tiny; a corpus of
  *    2-char strings genuinely is an all-pairs problem.
  *  - verification is the built-in codegen'd `levenshtein` on the
  *    candidate pairs only.
  *
  * Output: `(id_a, id_b, dist)`, `id_a < id_b`, dist ≤ maxDist as
  * BIGINT. Deduplicate upstream if the id column carries duplicate
  * strings — entity resolution matches DISTINCT values and maps back.
  */
object EditDist {

  def similarPairs(df: DataFrame, idCol: Column, strCol: Column, maxDist: Int,
                   q: Int = 2, maxShortPool: Long = 100000L,
                   scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(maxDist >= 1, s"similarPairs: maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"similarPairs: gram size q must be >= 1, got $q")
    val prefixLen = maxDist * q + 1
    // gramCount = len - q + 1; short = can't carry a full pigeonhole
    val shortLen = maxDist * q + q - 1
    val base = scope.pin(
      df.select(idCol.as("id"), strCol.as("s")).filter(col("s").isNotNull))

    // ---- short pool: length-band pairing, loud bound ----
    // partners of a true-short sit within maxDist of its length, so the
    // pairing pool extends to shortLen + maxDist; a pair qualifies only
    // if at least one side is a TRUE short (long-long pairs belong to
    // the prefix join)
    val pool = base.filter(length(col("s")) <= shortLen + maxDist)
    val nPool = pool.count()
    require(nPool <= maxShortPool,
      s"similarPairs: $nPool strings shorter than ${shortLen + maxDist + 1} chars — " +
        "the short pool pairs by length band alone (quadratic); raise q, " +
        "pre-filter trivial strings, or raise maxShortPool knowingly")
    val isShort = length(col("s")) <= shortLen
    val shortCands = pool.as("a").join(pool.as("b"),
        col("a.id") < col("b.id") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= maxDist &&
          (length(col("a.s")) <= shortLen || length(col("b.s")) <= shortLen))
      .select(col("a.id").as("id_a"), col("a.s").as("sa"),
        col("b.id").as("id_b"), col("b.s").as("sb"))

    // ---- prefix join for the rest ----
    val longs = base.filter(!isShort)
    val grams = longs.select(col("id"), col("s"),
      explode(array_distinct(transform(
        sequence(lit(1), length(col("s")) - q + 1),
        i => col("s").substr(i, lit(q))))).as("g"))
    val freq = grams.groupBy("g").agg(count(lit(1)).as("__f"))
    import org.apache.spark.sql.expressions.Window
    val byRarity = Window.partitionBy("id").orderBy(col("__f"), col("g"))
    val prefix = grams.join(freq, Seq("g"))
      .withColumn("__rk", row_number().over(byRarity))
      .filter(col("__rk") <= prefixLen)
      .select(col("id"), col("s"), col("g"))
    val longCands = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= maxDist)
      .select(col("a.id").as("id_a"), col("a.s").as("sa"),
        col("b.id").as("id_b"), col("b.s").as("sb"))
      .distinct()

    shortCands.union(longCands)
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("bigint").as("dist"))
  }
}
