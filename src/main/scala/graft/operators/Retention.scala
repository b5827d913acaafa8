package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analytics over an event stream — the engagement
  * matrix (cohort × offset → active share) every event warehouse
  * derives, and a natural consumer of the events table this engine
  * ingests (reference behavior anchor: the migration suite's event
  * freshness/row-count checks, `MIGRATION_PLAYBOOK.md:243,247`, feed
  * exactly this kind of downstream usage analytics).
  *
  * Scale shape: everything reduces through (user) or (cohort, offset)
  * keys — three hash aggregates and one join, all with map-side partial
  * aggregation. The activity frame is deduped to (user, bucket) FIRST,
  * so the join and the retention aggregate see at most
  * |users| × |buckets| rows regardless of raw event volume; a 100 TB
  * event log collapses at the first aggregate. The cohort-size frame is
  * |cohorts| rows — broadcast by AQE into the final join. All-integer
  * bucket arithmetic: engine-portable, no timestamp/float drift.
  */
object Retention {

  /** Retention matrix: one row per (cohort_bucket, offset) with the
    * distinct active users, the cohort's size, and the retention share.
    * `bucketCol` must already be an integer time bucket (e.g. epoch
    * seconds `div` 604800 for weekly cohorts); a user's cohort is their
    * MINIMUM bucket, and `offset` counts buckets since that cohort.
    * Offset 0 rows carry retention 1.0 by construction (every cohort
    * member is active in their first bucket). */
  def cohortRetention(df: DataFrame, userCol: String, bucketCol: Column): DataFrame = {
    val act = df.select(col(userCol).as("_user"), bucketCol.cast("long").as("_bucket"))
      .distinct()
    val cohorts = act.groupBy("_user").agg(min("_bucket").as("cohort_bucket"))
    val sizes = cohorts.groupBy("cohort_bucket")
      .agg(count(lit(1)).as("cohort_users"))
    act.join(cohorts, "_user")
      .groupBy(col("cohort_bucket"),
        (col("_bucket") - col("cohort_bucket")).as("offset"))
      .agg(countDistinct(col("_user")).as("active_users"))
      .join(sizes, "cohort_bucket")
      .select(col("cohort_bucket"), col("offset"), col("active_users"),
        col("cohort_users"),
        (col("active_users").cast("double") / col("cohort_users").cast("double"))
          .as("retention"))
  }
}
