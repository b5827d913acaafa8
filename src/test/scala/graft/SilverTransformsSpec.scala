package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.SilverTransforms

/** Port of `tests/test_silver_transforms.py:17-87`. */
class SilverTransformsSpec extends SparkTestBase {

  private lazy val policies = SilverTransforms.transformPolicies(samplePolicies)
  private lazy val claims = SilverTransforms.transformClaims(sampleClaims)

  test("null policy_ids are filtered") {
    assert(policies.filter(col("policy_id").isNull).count() === 0)
  }

  test("row count after filter is 2") {
    assert(policies.count() === 2)
  }

  test("names are trimmed") {
    val john = policies.filter(col("policy_id") === "POL-001").head()
    assert(john.getAs[String]("policyholder_first_name") === "John")
    assert(john.getAs[String]("policyholder_last_name") === "Smith")
  }

  test("full name is constructed") {
    val john = policies.filter(col("policy_id") === "POL-001").head()
    assert(john.getAs[String]("policyholder_full_name") === "John Smith")
  }

  test("status is uppercased") {
    val john = policies.filter(col("policy_id") === "POL-001").head()
    assert(john.getAs[String]("status") === "ACTIVE")
  }

  test("coverage code is uppercased") {
    val jane = policies.filter(col("policy_id") === "POL-002").head()
    assert(jane.getAs[String]("coverage_type_code") === "HO5")
  }

  test("dates are cast to DateType") {
    assert(policies.schema("effective_date").dataType === DateType)
    assert(policies.schema("expiration_date").dataType === DateType)
  }

  test("premium is cast to DecimalType(12,2)") {
    assert(policies.schema("annual_premium").dataType === DecimalType(12, 2))
  }

  test("metadata column added") {
    assert(policies.columns.contains("_cleaned_timestamp"))
  }

  test("claim types are uppercased") {
    val types = claims.select("claim_type").collect().map(_.getString(0))
    assert(types.forall(t => t == t.toUpperCase))
  }

  test("empty closed_date becomes NULL") {
    val open = claims.filter(col("claim_id") === "CLM-002").head()
    assert(open.isNullAt(open.fieldIndex("closed_date")))
  }

  test("bronze lineage columns pass through silver") {
    val bronze = samplePolicies
      .withColumn("_ingestion_timestamp", current_timestamp())
      .withColumn("_source_file", lit("raw_policies.csv"))
      .withColumn("_batch_id", lit(42L))
    val silver = SilverTransforms.transformPolicies(bronze)
    assert(Seq("_ingestion_timestamp", "_source_file", "_batch_id")
      .forall(silver.columns.contains))
    assert(silver.select("_batch_id").head().getLong(0) === 42L)
  }

  test("clock injection pins _cleaned_timestamp") {
    val fixed = SilverTransforms.transformPolicies(samplePolicies,
      to_timestamp(lit("2026-01-01 00:00:00")))
    val ts = fixed.select(col("_cleaned_timestamp").cast("string")).distinct().collect()
    assert(ts.map(_.getString(0)).toSeq === Seq("2026-01-01 00:00:00"))
  }
}
