package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Schema-contract enforcement between layers.
  *
  * Semantics: reference `lakehouse_pipelines/silver/utils/schema_validator.py`
  * (`validate_schema` :13-57, `compare_schemas` :60-94). Pure StructType
  * diffing — no Spark job.
  */
object SchemaValidator {

  final case class TypeMismatch(column: String, expected: String, actual: String)

  final case class ValidationResult(
      passed: Boolean,
      missingColumns: Seq[String],
      extraColumns: Seq[String],
      typeMismatches: Seq[TypeMismatch])

  final case class SchemaDiff(
      onlyInA: Seq[String],
      onlyInB: Seq[String],
      typeDifferences: Seq[TypeMismatch],
      nullableDifferences: Seq[String],
      compatible: Boolean)

  /** Validate a DataFrame against an expected schema; `strict` forbids
    * extra columns (`schema_validator.py:13-57`). */
  def validateSchema(df: DataFrame, expected: StructType, strict: Boolean = false): ValidationResult = {
    val actual = df.schema.fields.map(f => f.name -> f).toMap
    val exp = expected.fields.map(f => f.name -> f).toMap
    val missing = (exp.keySet -- actual.keySet).toSeq.sorted
    val extra = (actual.keySet -- exp.keySet).toSeq.sorted
    val mismatches = exp.toSeq.sortBy(_._1).flatMap { case (name, ef) =>
      actual.get(name).collect {
        case af if af.dataType != ef.dataType =>
          TypeMismatch(name, ef.dataType.toString, af.dataType.toString)
      }
    }
    val basePassed = missing.isEmpty && mismatches.isEmpty
    ValidationResult(if (strict) basePassed && extra.isEmpty else basePassed,
      missing, extra, mismatches)
  }

  /** Diff two schemas incl. nullability (`schema_validator.py:60-94`). */
  def compareSchemas(a: StructType, b: StructType): SchemaDiff = {
    val fa = a.fields.map(f => f.name -> f).toMap
    val fb = b.fields.map(f => f.name -> f).toMap
    val onlyA = (fa.keySet -- fb.keySet).toSeq.sorted
    val onlyB = (fb.keySet -- fa.keySet).toSeq.sorted
    val common = (fa.keySet & fb.keySet).toSeq.sorted
    val typeDiffs = common.flatMap { n =>
      if (fa(n).dataType != fb(n).dataType)
        Some(TypeMismatch(n, fa(n).dataType.toString, fb(n).dataType.toString))
      else None
    }
    val nullableDiffs = common.filter(n => fa(n).nullable != fb(n).nullable)
    SchemaDiff(onlyA, onlyB, typeDiffs, nullableDiffs,
      onlyA.isEmpty && typeDiffs.isEmpty)
  }
}
