package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The last mile of a training-data pipeline: deterministic global
  * shuffle + sharded export with a manifest.
  *
  * Training runs don't read "the corpus in source order" — they read N
  * shard files whose contents and order are a pure function of the
  * data, so any re-run of the pipeline (any engine, any partition
  * layout, any day) produces byte-identical shards. Both properties
  * come from the same md5 order key used by [[Packing]] and
  * [[Sampling]]: shard = hash bucket, within-shard order = full hash.
  *
  * Scale shape: assigning shard/order is map-only; the write is one
  * hash shuffle (`repartition(shard)`) + per-partition sort — no global
  * sort, no driver collect. The manifest is a single small aggregate
  * (rows = shards) a resuming trainer reads instead of listing files.
  */
object ShardedExport {

  /** Shard assignment + within-shard training order for every row. */
  def withShardOrder(df: DataFrame, idCol: String, shards: Int,
      salt: String = "export"): DataFrame = {
    val ord = Packing.orderKey(col(idCol), salt)
    df.withColumn("_ord", ord)
      .withColumn("shard", Packing.shardOf(col("_ord"), shards))
  }

  /** Per-shard manifest: docs, tokens, and the order-key range — the
    * sanity row a trainer checks before consuming a shard. */
  def manifest(df: DataFrame, idCol: String, tokenCol: String,
      shards: Int, salt: String = "export"): DataFrame =
    withShardOrder(df, idCol, shards, salt)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol).cast("long")).as("n_tokens"),
        min(col("_ord")).as("first_key"),
        max(col("_ord")).as("last_key"))

  /** Write the corpus as `shards` parquet directories
    * (shard=K/part-*.parquet), each internally sorted by the order key.
    * One file per shard (repartition on the shard column first), so a
    * shard is one sequential read for the trainer. */
  def write(df: DataFrame, idCol: String, outDir: String, shards: Int,
      salt: String = "export"): Unit =
    withShardOrder(df, idCol, shards, salt)
      .repartition(col("shard"))
      // partition-col prefix keeps the within-file order stable (the
      // dynamic-partition writer re-sorts by partition cols alone if
      // the incoming order lacks them)
      .sortWithinPartitions(col("shard"), col("_ord"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outDir)
}
