package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (the lakehouse upsert write path): apply a changeset of
  * upserts and deletes to a base table in ONE full-outer join —
  * `WHEN MATCHED AND _delete THEN DELETE / WHEN MATCHED THEN UPDATE /
  * WHEN NOT MATCHED THEN INSERT`, the copy-on-write MERGE INTO every
  * table format (Delta/Iceberg/Hudi) implements on top of exactly this
  * plan shape.
  *
  * Scale shape: one key shuffle of |base| + |changes| into a sort-merge
  * full-outer join, then a map-side resolve — no driver state, no
  * per-row lookups. At 100 TB the refinement is to partition-prune the
  * rewrite to partitions the changeset touches first (the `dpp_join`
  * move applied to the write side); the resolve itself is unchanged.
  *
  * Semantics: change rows win wholesale (whole-row UPDATE — a change
  * row's NULL overwrites, it does not "keep old"); a delete for an
  * absent key is a no-op; keys must be unique on both sides (standard
  * MERGE precondition — violations would cartesian the match).
  */
object MergeInto {

  /** Apply `changes` to `base`. Both carry the same data columns;
    * `changes` additionally has boolean `deleteFlag`. Output schema =
    * `base` schema. */
  def merge(base: DataFrame, changes: DataFrame, key: String,
      deleteFlag: String): DataFrame = {
    val dataCols = base.columns
    val joined = base.alias("b").join(changes.alias("c"),
      col(s"b.$key") === col(s"c.$key"), "full_outer")
    joined
      // matched-or-orphan delete rows drop out; everything else survives
      .filter(!coalesce(col(s"c.$deleteFlag"), lit(false)))
      // change row present → its values win wholesale; else keep base
      .select(dataCols.toIndexedSeq.map { n =>
        when(col(s"c.$key").isNotNull, col(s"c.$n"))
          .otherwise(col(s"b.$n")).as(n)
      }: _*)
  }
}
