package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavily
  * skewed (the 100 TB failure mode AQE's skew-join handles only for
  * sort-merge joins; salting also covers aggregations and cases where a
  * handful of keys dominate entire executors).
  *
  * Salted join: the skewed (large) side gets a random salt in
  * [0, saltFactor); the small side is replicated saltFactor× with an
  * exploded salt column; the join key becomes (key, salt), spreading each
  * hot key over saltFactor reducers. Replication cost is
  * |small| × saltFactor — choose saltFactor ≈ hottest-key share ×
  * shuffle partitions.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted to spread hot keys.
    * Semantics identical to `large.join(small, key)` (inner). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    val salted = large.withColumn("__salt", (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-k hottest keys with their row share — the diagnostic that decides
    * whether salting is warranted and what saltFactor to use (the
    * measured doctrine, PLANS.md "Skewed-key doctrine": broadcast
    * first; salt only when the head key's share exceeds ~3× the mean
    * partition share). Ordering tie-breaks on the key so the top-k cut
    * is deterministic on uniform corpora, where every key ties. */
  def keySkewProfile(df: DataFrame, key: String, k: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("rows"))
      .withColumn("share", col("rows") / lit(total.toDouble))
      .orderBy(col("rows").desc, col(key))
      .limit(k)
  }
}
