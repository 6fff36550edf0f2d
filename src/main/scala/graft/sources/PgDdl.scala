package graft.sources

import org.apache.spark.sql.types._

/** Spark schema → Postgres DDL (the reference's fixed-DDL target model,
  * derived instead of hand-written). Semi-structured remainders
  * (structs/maps/nested arrays) map to JSONB — the standard pattern for
  * this tool class. Used with JdbcSink to pre-create target tables.
  */
object PgDdl {
  def pgType(dt: DataType): String = dt match {
    case ByteType | ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE PRECISION"
    case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
    case BooleanType => "BOOLEAN"
    case StringType => "TEXT"
    case BinaryType => "BYTEA"
    case DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    case ArrayType(e, _) if isScalar(e) => s"${pgType(e)}[]"
    case _ => "JSONB" // struct / map / nested array → semi-structured
  }

  private def isScalar(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: StructType | _: MapType => false
    case _ => true
  }

  private def quote(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** CREATE TABLE statement for a DataFrame schema. */
  def createTable(table: String, schema: StructType,
      primaryKey: Seq[String] = Nil): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"  ${quote(f.name)} ${pgType(f.dataType)}$nn"
    }
    val pk = if (primaryKey.nonEmpty)
      Seq(s"  PRIMARY KEY (${primaryKey.map(quote).mkString(", ")})")
    else Nil
    (s"CREATE TABLE IF NOT EXISTS ${quote(table)} (" +:
      (cols ++ pk).mkString(",\n") +: Seq(")")).mkString("\n")
  }
}
