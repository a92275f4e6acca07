package graft.etl

import org.apache.spark.sql.DataFrame

/** Sharded gzip CSV export sink (SURVEY.md §2.1 S5; reference
  * README.md:310-378): the reference pipes a PostgreSQL COPY through
  * `split -l 20000000 | gzip` to get ~2 GB/20 M-row shards. In Spark the
  * shard count is the partition count — `repartition(n)` replaces
  * `split`, the codec option replaces the gzip pipe, and `\N` nulls
  * reproduce the COPY NULL token read back by [[RawCsvSource]].
  */
object CsvExport {

  def write(df: DataFrame, path: String, shards: Int): Unit =
    df.repartition(shards)
      .write
      .mode("overwrite")
      .option("header", "false")
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .option("compression", "gzip")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)
}
