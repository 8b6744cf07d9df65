package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-coerced CSV ingest (SURVEY.md §2.1 S1/S2; reference:
  * `Structured.load_csv` `finds/structured/structured.py:137-207` with
  * coercion rules `as_dtypes` `finds/database/sql.py:17-71`).
  *
  * Everything is read as string first, then coerced per the DECLARED
  * schema with the reference's rules:
  *   - column names lowercased and trimmed;
  *   - int/bool: blank/garbage → 0/false (not null);
  *   - float: to_numeric-coerce — unparseable → null (TRY_CAST);
  *   - string: non-ascii stripped, and the CRSP quirk of removing '-'
  *     inside digit strings (sql.py:58);
  *   - duplicate primary keys dropped (keep last by remaining columns).
  */
object Ingest {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              pk: Seq[String] = Nil, sep: String = ","): DataFrame = {
    val raw = spark.read
      .option("header", "true").option("sep", sep)
      .csv(path)
    val lowered = raw.columns.foldLeft(raw) { (df, c) =>
      df.withColumnRenamed(c, c.trim.toLowerCase)
    }
    val coerced = schema.fields.foldLeft(lowered) { (df, f) =>
      val name = f.name.toLowerCase
      if (!lowered.columns.contains(name)) df
      else df.withColumn(name, coerce(name, f.dataType))
    }
    val projected = coerced.select(
      schema.fields.map(f => col(f.name.toLowerCase)): _*)
    if (pk.isEmpty) projected
    else graft.ops.Dedup.keepLast(projected, pk,
      projected.columns.filterNot(pk.contains).map(col).toSeq)
  }

  /** Per-type coercion of a string column (as_dtypes sql.py:17-71). */
  def coerce(name: String, dt: DataType): Column = {
    val c = col(name)
    dt match {
      case IntegerType | LongType | ShortType =>
        coalesce(expr(s"try_cast(`$name` AS double)").cast(dt), lit(0).cast(dt))
      case BooleanType =>
        coalesce(expr(s"try_cast(`$name` AS boolean)"), lit(false))
      case DoubleType | FloatType =>
        expr(s"try_cast(`$name` AS ${dt.sql})")
      case StringType =>
        // ascii-strip, and the CRSP '-'-inside-digits removal (sql.py:58)
        regexp_replace(
          regexp_replace(c, "[^\\x00-\\x7F]", ""),
          "(?<=[0-9])-(?=[0-9])", "")
      case other => c.cast(other)
    }
  }

  /** Fama-French library value rules (`ffreader.py:179-180`): source
    * values ≤ −99.99 are missing-data sentinels → null; the rest are
    * percentages → decimals (÷100).
    */
  def ffScale(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, when(col(c) > -99.99, col(c) / 100.0)))

  /** Row screens applied at load (structured.py:177-201): drop rows whose
    * column is in `dropVals`, keep only rows whose column is in
    * `keepVals`.
    */
  def screen(df: DataFrame, dropIf: Map[String, Seq[Any]] = Map.empty,
             keepIf: Map[String, Seq[Any]] = Map.empty): DataFrame = {
    val dropped = dropIf.foldLeft(df) { case (d, (c, vals)) =>
      d.where(!col(c).isInCollection(vals) || col(c).isNull)
    }
    keepIf.foldLeft(dropped) { case (d, (c, vals)) =>
      d.where(col(c).isInCollection(vals))
    }
  }
}
