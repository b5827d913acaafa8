package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-sketch membership probe — the native replacement for
  * the Scala-UDF probe `operators/BloomPrune` used through round 10
  * (Spark's own `BloomFilterMightContain` is internal-only and not
  * constructible from the public API, so the library carries its own).
  * NULL keys probe to false (an equi-join never matches NULL), which
  * also keeps the expression non-nullable and the codegen branch-free
  * on the null path.
  *
  * The sketch ships as its SERIALIZED bytes inside the expression (the
  * plan fragment each task deserializes once, via a transient lazy) —
  * the same transport Spark's runtime-filter rewrite uses — so the
  * expression is trivially Serializable and the probe stays inside
  * whole-stage codegen instead of breaking the span at a UDF call.
  */
case class BloomMightContain(child: Expression, bfBytes: Array[Byte])
  extends UnaryExpression {

  @transient private lazy val bf: BloomFilter = BloomFilter.readFrom(bfBytes)
  /** Codegen entry point (must be public for generated code). */
  def bloomFilter: BloomFilter = bf

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"bloom_might_contain expects BIGINT or STRING, got ${dt.sql}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else child.dataType match {
      case LongType => bf.mightContainLong(v.asInstanceOf[Long])
      // UTF8String bytes are exactly what putString hashed.
      case StringType => bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    val probe = child.dataType match {
      case LongType =>
        s"$self.bloomFilter().mightContainLong(${childGen.value})"
      case StringType =>
        s"$self.bloomFilter().mightContainBinary(${childGen.value}.getBytes())"
    }
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = $probe;
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Build from a live filter: serialize once on the driver. */
  def apply(child: Expression, bf: BloomFilter): BloomMightContain = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    BloomMightContain(child, bos.toByteArray)
  }
}
