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

  /** Doctrine-driven equi-join — the measured skew doctrine (PLANS.md
    * "Skewed-key doctrine", STRESS_r13 §1) as an executable operator.
    * Decision order, exactly as the sf10 A/B sweep ranked it:
    *
    *   1. BROADCAST when the dim side fits (`small` row count ≤
    *      `maxBroadcastRows`): no fact shuffle at all, wall-time flat in
    *      skew (4.4–6.6 s across 1%→25% hot share in the sweep).
    *   2. SALTED when broadcast can't cover and the hottest key's share
    *      of the large side exceeds `hotShareThreshold`: the salt's
    *      fixed ~20–30% cost (dim replicate + wider shuffle key) pays
    *      only past the measured ~10–12% crossover on 32 partitions,
    *      but salted wall-time stays FLAT as the hot share grows while
    *      plain degrades linearly — the property that matters at 100 TB,
    *      where a 12% key is millions of rows in ONE task.
    *   3. PLAIN (+AQE) otherwise.
    *
    * The profile pass is `keySkewProfile`'s aggregate reduced to two
    * scalars (head-key rows, total rows): one map-side-combined hash-agg,
    * O(distinct keys) shuffled, never row data to the driver. On a
    * 100 TB fact, pass a pre-sampled `profileOn` (e.g.
    * `large.sample(0.001)` — the head share is scale-free) or reuse
    * table statistics; the default profiles `large` exactly so the
    * decision is deterministic for the oracle to replay.
    *
    * Semantics are identical to `large.join(small, key)` (inner) in all
    * three branches; the chosen branch is recorded in a
    * `join_strategy` literal column so pipelines (and tests) can audit
    * the decision. */
  def adaptiveJoin(large: DataFrame, small: DataFrame, key: String,
      maxBroadcastRows: Long = 1000000L, hotShareThreshold: Double = 0.10,
      saltFactor: Int = 16, profileOn: Option[DataFrame] = None): DataFrame = {
    if (small.count() <= maxBroadcastRows)
      large.join(broadcast(small), Seq(key))
        .withColumn("join_strategy", lit("broadcast"))
    else {
      val prof = profileOn.getOrElse(large)
        .groupBy(col(key)).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("hot"), sum(col("n")).as("total"))
        .head()
      // Empty large side: no head key, nothing to salt.
      val share =
        if (prof.isNullAt(0)) 0.0
        else prof.getLong(0).toDouble / prof.getLong(1).toDouble
      if (share > hotShareThreshold)
        saltedJoin(large, small, key, saltFactor)
          .withColumn("join_strategy", lit("salted"))
      else
        large.join(small, Seq(key))
          .withColumn("join_strategy", lit("plain"))
    }
  }

  /** Deterministic row sample for skew PROFILING at scale — the sampled
    * `profileOn` the [[adaptiveJoin]] scale story promises (its exact
    * default profile is an eager full-fact aggregate; at 100 TB the
    * profile should read a fraction of the fact, and a hot key's SHARE
    * is scale-free, so a uniform row sample estimates it with tight
    * relative error on exactly the keys that matter — a 10% head key is
    * ~10% of any uniform sample). The sample is an md5 bucket of a
    * row-unique id (`Splits.hashBucket`), NOT `rand()`: the kept set is
    * a pure function of the data, so the strategy decision is
    * deterministic and an external engine replays it — the property the
    * j20 gate verifies on both uniform and skewed corpora. `bps` is
    * basis points out of 10000 (100 = a 1% sample). Pure filter
    * projection: no shuffle, evaluated at scan speed. */
  def profileSample(df: DataFrame, rowIdCol: String, bps: Int = 100,
      salt: String = "skewprof"): DataFrame = {
    require(bps > 0 && bps <= 10000, "bps must be in (0, 10000]")
    df.filter(graft.llm.Splits.hashBucket(col(rowIdCol), 10000, salt) < bps)
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
