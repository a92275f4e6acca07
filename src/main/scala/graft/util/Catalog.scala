package graft.util

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog utilities (SURVEY.md §2.1 S7): the reference reconciles row
  * counts per pipeline stage via pg_stat/pg_class introspection
  * (reference README.md:240, :271-278) and a ClickHouse count(*) after
  * load (:902). Spark equivalent: exact counts over the registered
  * tables — cheap here because parquet footers carry row counts and a
  * `count(*)`-only scan reads no column data.
  */
object Catalog {

  /** Register every testdata table as a temp view so pure-SQL sessions
    * can query by name (`spark.sql("SELECT ... FROM lineitem")`). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Exact per-table row counts, one row per table. */
  def tableCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.names.map { t =>
      Tables.load(spark, sfDir, t).agg(count(lit(1)).as("cnt"))
        .select(lit(t).as("tbl"), col("cnt"))
    }.reduce(_.unionAll(_))

  /** Reconcile two stages of a pipeline: rows in, rows out, delta —
    * the check the reference does by eye between PostgreSQL and
    * ClickHouse loads. */
  def reconcile(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.agg(count(lit(1)).as("rows_before"))
    val a = after.agg(count(lit(1)).as("rows_after"))
    b.crossJoin(a).select(col("rows_before"), col("rows_after"),
      (col("rows_after") - col("rows_before")).as("delta"))
  }
}
