package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Design-for-scale notes (100 TB target):
  *   - Always `spark.read.parquet` with the schema already in the footer —
  *     no inference pass (SURVEY.md §1.2; reference declares all schemas,
  *     /root/reference/README.md:448-506).
  *   - Column pruning + predicate pushdown are preserved by returning the
  *     raw scan and letting callers select/filter declaratively.
  *   - `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  *     vectorized reader does not model natively; we normalize it to
  *     microsecond TimestampType once, here, so every downstream operator
  *     sees a standard column.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) — illegal for Spark's reader
      // unless read as Long (then converted to micros by normalizeEventTs).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The driver generator has shipped `events.ts` under several parquet
    * encodings across rounds; normalize all of them to session-TZ micros
    * TimestampType so every downstream operator sees one column type:
    *   - INT64 TIMESTAMP(NANOS) → LongType under `nanosAsLong` (nanos
    *     since epoch), converted to micros here;
    *   - INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZ,
    *     cast (UTC session timezone, so the instant is unchanged);
    *   - INT64 TIMESTAMP(MICROS, UTC) → already TimestampType. */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
