package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Gzipped-CSV staging source (SURVEY.md §2.1 S1+S2).
  *
  * The reference loads ~55-60 gzip shards through a three-process bash
  * pipe per shard (gunzip | null-normalizing python | client INSERT,
  * reference README.md:527-532 and src/trans.py:6-8). Here the whole
  * surface is one declarative scan:
  *   - `nullValue = "\N"` reproduces the `\N` NULL token,
  *   - `emptyValue -> null` subsumes trans.py's empty-field→`\N` pass,
  *   - gzip decompression is codec-automatic,
  *   - parallelism = one task per shard (gzip is non-splittable — the
  *     same per-file unit the reference's loop had, but concurrent; at
  *     100 TB shard count, not shard size, sets the parallelism, which
  *     is why the export writes many ~2 GB shards).
  */
object RawCsvSource {

  def read(spark: SparkSession, path: String,
      schema: StructType = TripsSchemas.tripsRaw): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "false")
      .option("nullValue", "\\N")
      .option("emptyValue", null: String)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .option("dateFormat", "yyyy-MM-dd")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Staging read that CAPTURES malformed rows instead of silently
    * nulling their fields — the accounting trans.py's manual loop gave
    * the reference. Rows that fail to parse keep their raw line in
    * `_corrupt_record` (null for clean rows), so a pipeline can route
    * rejects to a quarantine sink and prove every input line is either
    * loaded or quarantined — at 100 TB, silent row loss is the failure
    * mode this exists to prevent. */
  def readCaptureCorrupt(spark: SparkSession, path: String,
      schema: StructType = TripsSchemas.tripsRaw): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", "false")
      .option("nullValue", "\\N")
      .option("emptyValue", null: String)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .option("dateFormat", "yyyy-MM-dd")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
}
