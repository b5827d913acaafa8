package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Registry

class RegistrySpec extends SparkTestBase {
  import spark.implicits._

  test("decimalsToDouble rewrites top-level and NESTED decimal columns") {
    val df = Seq((1, BigDecimal("12.34"), BigDecimal("5.60"), Seq(BigDecimal("1.10"))))
      .toDF("id", "flat", "inner", "arr")
      .select(col("id"), col("flat"),
        struct(col("inner").as("amount"), lit("x").as("tag")).as("s"),
        col("arr"))
    val out = Registry.decimalsToDouble(df)
    def hasDecimal(dt: DataType): Boolean = dt match {
      case _: DecimalType => true
      case s: StructType  => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType   => hasDecimal(a.elementType)
      case m: MapType     => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _              => false
    }
    assert(!out.schema.fields.exists(f => hasDecimal(f.dataType)),
      s"decimal survived: ${out.schema.treeString}")
    // Values preserved (not just types rewritten).
    val row = out.head()
    assert(row.getAs[Double]("flat") === 12.34)
    assert(row.getAs[org.apache.spark.sql.Row]("s").getAs[Double]("amount") === 5.6)
    assert(row.getAs[Seq[Double]]("arr") === Seq(1.1))
    // Non-decimal columns pass through untouched.
    assert(out.schema("id").dataType === IntegerType)
  }
}
