package graft.operators

import graft.etl.SnapshotStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level copy-on-write UPDATE and DELETE over snapshot tables —
  * the general-predicate complement to the metadata-only partition
  * DROP ([[SnapshotStore.dropPartitions]]) and the key-addressed MERGE
  * ([[MergeInto]]). Row mutations are ClickHouse operational practice
  * (`ALTER TABLE … UPDATE/DELETE`) — an extension here, not in the
  * reference's query set; the mutation is an atomic snapshot commit in
  * the standard Delta/Iceberg copy-on-write model, restating ONLY the
  * partitions containing affected rows:
  *
  *   1. discovery — scan `WHERE cond` (filter pushed into the parquet
  *      scan) and collect the distinct partition values holding
  *      matches; zero matches commits NOTHING (ids aren't burned by
  *      no-op statements, matching partition-DELETE semantics);
  *   2. rewrite — read exactly the touched partitions back
  *      (manifest-entry pruned, never a directory listing), apply the
  *      transform, and commit through the locked
  *      [[SnapshotStore.restatePartitions]]: untouched partitions
  *      carry by manifest reference, drained partitions drop, and the
  *      old snapshot stays time-travel-visible.
  *
  * At 100 TB the cost is proportional to the TOUCHED partitions (one
  * pushed-filter scan + a rewrite of affected months), never to table
  * size — the same shape Delta/Iceberg copy-on-write produces.
  *
  * CONTRACT: `cond` and every SET value must be DETERMINISTIC — they
  * are evaluated once for discovery and once for the rewrite, and a
  * `rand()`-dependent predicate would let the two passes disagree
  * (rows updated in partitions the discovery never claimed). The SQL
  * entry points ([[graft.plans.SnapshotUpdateRewrite]]) enforce this
  * at analysis; Scala callers own it. SQL NULL semantics: a NULL
  * condition row is NOT matched (`WHERE NULL` selects nothing), so the
  * condition is null-coalesced to false on both passes.
  *
  * PARTITION-SPEC EVOLUTION ([[SnapshotStore.evolvePartitionSpec]]):
  * on a table holding OUTGOING-spec vintages, discovery additionally
  * matches tokens PER ENTRY-SPEC (an old `month` entry is addressed by
  * its month token, not the current `month,bucket(n,id)` token), the
  * touched old-vintage entries' full content joins the rewrite, and
  * the restatement writes everything under the CURRENT spec — row
  * mutations MIGRATE the partitions they touch to the evolved
  * layout, entry by entry, no full rewrite needed. */
object RowLevelOps {

  /** Old-vintage entries the operation touches, per outgoing spec:
    * (canonical spec, value) keys for [[SnapshotStore
    * .restatePartitions]]'s `dropOld`, discovered by rendering the
    * matched rows' tokens under EACH outgoing spec (one distinct
    * aggregate per vintage — vintages are operator-bounded, the scans
    * are the already-pruned discovery frame). */
  private def discoverOldVintages(spark: SparkSession,
      m: SnapshotStore.Manifest, matched: DataFrame,
      what: String): Set[(String, String)] = {
    val oldSpecs = m.entries.filter(_.spec.isDefined).groupBy(_.spec.get)
    oldSpecs.iterator.flatMap { case (s, es) =>
      SnapshotStore.checkTokenRenderZone(spark, m, s, what)
      val sp = SnapshotStore.parseSpec(s)
      val toks = matched.select(sp.tokenExpr(col).as("__tok"))
        .distinct().collect().map(_.getString(0)).toSet
      es.iterator.filter(e => toks(e.value)).map(e => (s, e.value))
    }.toSet
  }

  /** Content + CURRENT-spec landing tokens of the touched old-vintage
    * entries: their rows (matched or not) restate under the current
    * layout, so every row's current token joins the touched set. */
  private def oldVintageScope(spark: SparkSession, root: String,
      dropOld: Set[(String, String)],
      spec: graft.etl.PartitionSpec): (Option[DataFrame], Set[String]) =
    if (dropOld.isEmpty) (None, Set.empty)
    else {
      val content = SnapshotStore.readEntriesWhere(spark, root,
        e => e.spec.exists(s => dropOld((s, e.value))))
      val landing = content.select(spec.tokenExpr(col).as("__tok"))
        .distinct().collect().map(_.getString(0)).toSet
      (Some(content), landing)
    }

  /** `UPDATE t SET col = v, … WHERE cond` as one atomic copy-on-write
    * commit. `sets` values see the OLD row (standard SQL UPDATE: all
    * assignments evaluate against pre-update values). Assigning the
    * partition column moves rows across partitions: the landing
    * partitions are restated together with the source partitions, so
    * a moved row lands exactly once. Returns the committed snapshot id
    * (the prior id when nothing matched — no commit). */
  def updateCommit(spark: SparkSession, root: String, cond: Column,
      sets: Seq[(String, Column)], partCol: String, sortCol: String)
      : Long =
    SnapshotStore.withTableLock(root) {
      val m = SnapshotStore.current(root).getOrElse(
        throw new IllegalStateException(s"no snapshot at $root to update"))
      // discovery matches RENDERED partition tokens against manifest
      // entry values — on a TZ-timestamp partition column that is only
      // sound when this session renders like the writer's (else the op
      // would "succeed" while restating nothing)
      SnapshotStore.checkTokenRenderZone(spark, m, partCol,
        "row-level UPDATE")
      val matchedCond = coalesce(cond, lit(false))
      val base = SnapshotStore.read(spark, root)
      val setMap = sets.toMap
      require(sets.size == setMap.size,
        s"duplicate SET column: ${sets.map(_._1).diff(setMap.keys.toSeq)}")
      val unknown = setMap.keySet.diff(base.columns.toSet)
      require(unknown.isEmpty, s"SET of unknown column(s): $unknown")
      // manifest-stats pruning: the discovery scan reads only the
      // partitions whose per-column min/max could satisfy the WHERE
      // clause — decided on the ~KB manifest, the same skip MERGE's
      // key discovery already had ([[graft.etl.StatsPruning]])
      val (disc, _) = graft.etl.StatsPruning.discoveryFrame(
        spark, root, m, base, matchedCond)
      val matched = disc.filter(matchedCond)
      // the partition layout may be a multi-transform SPEC
      // ([[graft.etl.PartitionSpec]]): tokens render through the
      // spec's own expression, so bucket components hash exactly as
      // the commit will write them
      val spec = graft.etl.SnapshotStore.parseSpec(partCol)
      val srcParts = matched.select(spec.tokenExpr(col).as("__tok"))
        .distinct().collect().map(_.getString(0)).toSet
      // spec evolution: matched rows living in OLD-vintage entries are
      // addressed by THEIR spec's tokens; those entries migrate
      val dropOld = discoverOldVintages(spark, m, matched,
        "row-level UPDATE")
      if (srcParts.isEmpty && dropOld.isEmpty) m.id
      else {
        // rows MOVE when SET assigns any partition source column:
        // their landing partitions are restated too (their untouched
        // prior content must carry into the rewrite, or the move would
        // shadow it). The landing token substitutes the SET value for
        // each assigned source column, CAST to the column's type first
        // — a bucket component hashes the stored representation, and
        // hash(100: int) ≠ hash(100L: long) would discover the wrong
        // landing bucket (the commit's stray-partition check would
        // catch it loudly, but the statement should just work).
        val landing: Set[String] =
          if (!spec.sourceCols.exists(setMap.contains)) Set.empty
          else matched.select(spec.tokenExpr(n =>
              setMap.get(n).map(_.cast(base.schema(n).dataType))
                .getOrElse(col(n))).as("__tok"))
            .distinct().collect().map(_.getString(0)).toSet
        // migrating old-vintage entries: ALL their rows restate under
        // the current spec, so their plain current tokens land too
        val (oldContent, oldLanding) =
          oldVintageScope(spark, root, dropOld, spec)
        val touched = srcParts ++ landing ++ oldLanding
        val curContent = SnapshotStore.readEntriesWhere(spark, root,
          e => e.spec.isEmpty && touched(e.value))
        val content = oldContent
          .map(curContent.unionByName(_)).getOrElse(curContent)
        val proj = content.columns.toSeq.map { n =>
          setMap.get(n) match {
            case Some(v) => when(matchedCond, v).otherwise(col(n)).as(n)
            case None => col(n)
          }
        }
        val resolved = content.select(proj: _*)
        // row-exact CDC sidecar: the matched rows' pre- and post-images
        // (Delta CDF semantics), persisted with the commit so the
        // change feed emits exactly the changed rows instead of the
        // wholesale restated partitions. The post-image reuses the
        // SAME projection (filtered to matches, where when() picks the
        // SET value), so its types are bit-identical to the restated
        // data. Cost: two more pushed-filter scans of the touched
        // partitions — proportional to the touched data, like the
        // rewrite itself.
        val pre = content.filter(matchedCond)
        val post = content.filter(matchedCond).select(proj: _*)
        val cdc = pre.withColumn("_change_type", lit("update_preimage"))
          .unionByName(
            post.withColumn("_change_type", lit("update_postimage")))
        SnapshotStore.restatePartitions(resolved, root, touched,
          partCol, sortCol, cdc = Some(cdc), dropOld = dropOld)
      }
    }

  /** `DELETE FROM t WHERE cond` for predicates the metadata-only
    * partition drop cannot express: restates the partitions containing
    * matching rows with those rows filtered out; a drained partition's
    * entry drops (deleted rows can never resurface). Returns the
    * committed snapshot id (the prior id when nothing matched). */
  def deleteRowsCommit(spark: SparkSession, root: String, cond: Column,
      partCol: String, sortCol: String): Long =
    SnapshotStore.withTableLock(root) {
      val m = SnapshotStore.current(root).getOrElse(
        throw new IllegalStateException(
          s"no snapshot at $root to delete from"))
      SnapshotStore.checkTokenRenderZone(spark, m, partCol,
        "row-level DELETE")
      val matchedCond = coalesce(cond, lit(false))
      val base = SnapshotStore.read(spark, root)
      // stats-pruned discovery, same as UPDATE
      val (disc, _) = graft.etl.StatsPruning.discoveryFrame(
        spark, root, m, base, matchedCond)
      val spec = graft.etl.SnapshotStore.parseSpec(partCol)
      val matched = disc.filter(matchedCond)
      val srcParts = matched
        .select(spec.tokenExpr(col).as("__tok"))
        .distinct().collect().map(_.getString(0)).toSet
      // spec evolution: deleted rows living in OLD-vintage entries are
      // addressed by THEIR spec's tokens; survivors migrate to the
      // current layout with the restatement
      val dropOld = discoverOldVintages(spark, m, matched,
        "row-level DELETE")
      if (srcParts.isEmpty && dropOld.isEmpty) m.id
      else {
        val (oldContent, oldLanding) =
          oldVintageScope(spark, root, dropOld, spec)
        val touched = srcParts ++ oldLanding
        val curContent = SnapshotStore.readEntriesWhere(spark, root,
          e => e.spec.isEmpty && touched(e.value))
        val content = oldContent
          .map(curContent.unionByName(_)).getOrElse(curContent)
        val resolved = content.filter(!matchedCond)
        // row-exact CDC sidecar: exactly the deleted rows
        val cdc = content.filter(matchedCond)
          .withColumn("_change_type", lit("delete"))
        SnapshotStore.restatePartitions(resolved, root, touched,
          partCol, sortCol, cdc = Some(cdc), dropOld = dropOld)
      }
    }
}
