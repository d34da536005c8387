package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J4 + F4 + F5 — the collector's surrogate-key decoration
  * (`collect/collector.py:41-86`): row i takes entry `i mod poolSize` of
  * a fixed key pool that was shuffled once with a seed (42 for the
  * 5k-user pool, 24 for the 10k-shop pool).
  *
  * Spark-native reformulation: the pool is ranked once (dense 0-based
  * index over its natural key), each record computes
  * `perm(pmod(idx-1, n))` and broadcast-joins the pool on that index.
  * The seeded Fisher-Yates shuffle is replaced by a deterministic affine
  * permutation `perm(s) = (s·a + b) mod n` with gcd(a, n) = 1 — a
  * documented divergence: `rand(seed)` sequences are engine-specific, so
  * a Fisher-Yates could never be mirrored by the DuckDB oracle, while an
  * affine permutation is exactly one line of portable integer SQL and
  * has the same contract (a seed-determined bijection pool→pool).
  * `a` prime and larger than any realistic pool keeps the gcd condition
  * true for free.
  *
  * Scale: records never shuffle — the pool (thousands of rows) is
  * broadcast, the modulo is a map-side expression. The reference's
  * python loop is O(rows) driver-side; this is O(rows/tasks) per task.
  */
object PoolAssign {

  /** Decorate `records` (carrying a dense 1-based `idxCol`) with the
    * pool's key column, assigned by seeded-permutation modulo. */
  def assign(
      records: DataFrame,
      idxCol: Column,
      pool: DataFrame,
      poolKey: String,
      outCol: String,
      a: Long,
      b: Long): DataFrame = {
    val n = pool.count()
    require(n > 0, "empty pool")
    require(java.math.BigInteger.valueOf(a).gcd(java.math.BigInteger.valueOf(n)).longValueExact() == 1L,
      s"a=$a must be coprime with pool size $n for a bijection")
    val ranked = DenseId.withDenseId(pool.select(col(poolKey)), Seq(col(poolKey)), "__rank")
      .select(col(poolKey).as(outCol), (col("__rank") - 1).as("__pool_idx"))
    val slot = pmod(pmod(idxCol - 1, lit(n)) * a + b, lit(n))
    records
      .withColumn("__pool_idx", slot)
      .join(broadcast(ranked), Seq("__pool_idx"))
      .drop("__pool_idx")
  }
}
