package graft.sources

import java.sql.{DriverManager, SQLException, Types}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Embedded-Derby JDBC source/sink — the "legacy Redshift mart" stand-in.
  *
  * SURVEY §2.1 S4: the reference's reconciliation harness documents (as a
  * commented exemplar, `migration_validation/reconciliation.py:189`) reading
  * the legacy warehouse over JDBC to compare against the lakehouse twin.
  * This module makes that path REAL in-environment: Derby (on the Spark
  * jars classpath) plays the legacy system, seeded by plain JDBC inserts,
  * and the engine side is a genuine partitioned `spark.read.jdbc` scan.
  *
  * Scale notes:
  *   - [[loadTable]] is deliberately driver-side (`toLocalIterator`, one
  *     partition resident at a time, batched inserts): it SEEDS the legacy
  *     fixture, standing in for data that already lives in the external
  *     system. It is not an engine data path.
  *   - [[readPartitioned]] is the cluster-scale ingestion shape: Spark
  *     splits `[lowerBound, upperBound)` on `partitionColumn` into
  *     `numPartitions` range predicates and each task issues its own
  *     bounded query — the legacy extract parallelizes across executors
  *     instead of serializing through one connection. Filters on the
  *     result still push into the remote query (JDBC relation pushdown).
  *   - Embedded Derby lives inside this JVM, which works in `local[*]`
  *     (driver and executors share the process). Against a networked
  *     warehouse only the URL changes; the Spark surface is identical.
  */
object Jdbc {

  val driverClass = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Derby embedded URL for a database directory (must not pre-exist on
    * first `create=true` boot). */
  def url(dbDir: String): String = s"jdbc:derby:$dbDir"

  private def ddlType(dt: DataType): String = dt match {
    case IntegerType    => "INT"
    case LongType       => "BIGINT"
    case DoubleType     => "DOUBLE"
    case FloatType      => "REAL"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case DateType       => "DATE"
    case TimestampType  => "TIMESTAMP"
    case BooleanType    => "BOOLEAN"
    case StringType     => "VARCHAR(1024)"
    case other => throw new IllegalArgumentException(
      s"Jdbc.loadTable: unsupported column type $other")
  }

  private def jdbcType(dt: DataType): Int = dt match {
    case IntegerType    => Types.INTEGER
    case LongType       => Types.BIGINT
    case DoubleType     => Types.DOUBLE
    case FloatType      => Types.REAL
    case _: DecimalType => Types.DECIMAL
    case DateType       => Types.DATE
    case TimestampType  => Types.TIMESTAMP
    case BooleanType    => Types.BOOLEAN
    case StringType     => Types.VARCHAR
    case other => throw new IllegalArgumentException(
      s"Jdbc.loadTable: unsupported column type $other")
  }

  /** Create (or replace) Derby table `table` holding exactly `df`'s rows,
    * inserted via batched plain-JDBC statements. Fixture seeding only —
    * see the scale note in the object scaladoc. */
  def loadTable(dbDir: String, table: String, df: DataFrame,
      batchSize: Int = 1000): Unit = {
    Class.forName(driverClass)
    val conn = DriverManager.getConnection(url(dbDir) + ";create=true")
    try {
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $table")
      catch { case _: SQLException => () } // first load: table doesn't exist
      // Quoted identifiers: reserved-word column names (e.g. DEC, YEAR)
      // must survive, and Spark's DerbyDialect quotes identifiers in its
      // generated SELECTs, so the stored case must match exactly.
      val colsDdl = df.schema.fields
        .map(f => s""""${f.name}" ${ddlType(f.dataType)}""").mkString(", ")
      st.executeUpdate(s"CREATE TABLE $table ($colsDdl)")
      st.close()
      val types = df.schema.fields.map(f => jdbcType(f.dataType))
      val ph = df.columns.map(_ => "?").mkString(", ")
      val ps = conn.prepareStatement(s"INSERT INTO $table VALUES ($ph)")
      conn.setAutoCommit(false)
      var n = 0
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        var i = 0
        while (i < r.length) {
          val v = r.get(i)
          if (v == null) ps.setNull(i + 1, types(i)) else ps.setObject(i + 1, v)
          i += 1
        }
        ps.addBatch()
        n += 1
        if (n % batchSize == 0) ps.executeBatch()
      }
      ps.executeBatch()
      conn.commit()
      ps.close()
    } finally conn.close()
  }

  /** Range-partitioned JDBC scan: `numPartitions` parallel tasks, each
    * issuing its own `partitionColumn`-bounded remote query. Column names
    * come back in Derby's canonical UPPERCASE; they are lowercased here so
    * the frame lines up with its parquet twin for reconciliation. */
  def readPartitioned(s: SparkSession, dbDir: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame = {
    val props = new java.util.Properties()
    props.setProperty("driver", driverClass)
    val df = s.read.jdbc(url(dbDir), table, partitionColumn, lowerBound,
      upperBound, numPartitions, props)
    df.toDF(df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toIndexedSeq: _*)
  }

  /** Single-partition JDBC scan (small legacy dims). */
  def read(s: SparkSession, dbDir: String, table: String): DataFrame = {
    val props = new java.util.Properties()
    props.setProperty("driver", driverClass)
    val df = s.read.jdbc(url(dbDir), table, props)
    df.toDF(df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toIndexedSeq: _*)
  }
}
