package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ idea:
  * "unit tests for data" — Schelter et al., VLDB'18 — re-expressed as
  * pure DataFrame aggregation): a battery of table-level constraints
  * is verified in ONE full-table pass of conditional aggregates, plus
  * one anti-join pass per referential constraint. Nothing iterates
  * per-constraint over the data — adding a constraint adds a column to
  * the same aggregate, not a scan; at 100 TB the whole battery costs
  * exactly one read (the observe-metrics lane is the zero-extra-scan
  * streaming sibling of the same idea).
  *
  * Each constraint reports its violation COUNT (exact integer), not
  * just a flag — the number a data contract quotes in its error
  * budget. `passed` is `n_violations == 0`.
  */
object DataQuality {

  /** A named constraint evaluated as a per-row violation indicator
    * (0/1); aggregated by summation in the shared pass. */
  case class RowConstraint(name: String, violation: Column)

  def notNull(name: String, c: Column): RowConstraint =
    RowConstraint(name, when(c.isNull, 1L).otherwise(0L))

  def inRange(name: String, c: Column, lo: Double, hi: Double)
      : RowConstraint =
    RowConstraint(name,
      when(c.isNull || (c >= lo && c <= hi), 0L).otherwise(1L))

  def inSet(name: String, c: Column, values: Seq[String]): RowConstraint =
    RowConstraint(name,
      when(c.isNull || c.isin(values: _*), 0L).otherwise(1L))

  def nonNegative(name: String, c: Column): RowConstraint =
    RowConstraint(name, when(c.isNull || c >= 0, 0L).otherwise(1L))

  def matches(name: String, c: Column, regex: String): RowConstraint =
    RowConstraint(name,
      when(c.isNull || regexp_like(c, lit(regex)), 0L).otherwise(1L))

  /** Evaluate row constraints + a multi-column uniqueness constraint
    * (violations = rows − distinct keys) in one aggregation pass, plus
    * an optional referential-integrity constraint (violations =
    * distinct child keys absent from the parent key set — one
    * distinct + anti-join, the only second pass in the battery).
    *
    * @param uniqueKey (constraintName, keyExpr) — keyExpr must be a
    *                  single deterministic column expression (encode
    *                  composite keys arithmetically so every engine
    *                  distinct-counts the same values)
    * @param fk (constraintName, childKey, parentKeys) — parentKeys
    *           must be a SINGLE-column frame holding exactly the key
    *           domain (enforced; a wider frame would silently compare
    *           against whatever its first column happens to be) */
  def validate(df: DataFrame, rows: Seq[RowConstraint],
      uniqueKey: Option[(String, Column)] = None,
      fk: Option[(String, Column, DataFrame)] = None): DataFrame = {
    require(rows.nonEmpty || uniqueKey.nonEmpty || fk.nonEmpty,
      "validate: empty constraint battery — declare at least one " +
        "row constraint, a uniqueKey, or an fk")
    fk.foreach { case (n, _, parent) =>
      require(parent.columns.length == 1,
        s"validate: fk '$n' parent frame must have exactly one (key) " +
          s"column, got ${parent.columns.mkString(", ")} — select the " +
          "key column explicitly")
    }
    val aggs =
      (count(lit(1)).as("n_rows") +:
        rows.map(rc => sum(rc.violation).as(s"v_${rc.name}"))) ++
        uniqueKey.map { case (n, k) =>
          (count(lit(1)) - countDistinct(k)).as(s"v_$n")
        }.toSeq
    val base = df.agg(aggs.head, aggs.tail: _*)
    val withFk = fk match {
      case Some((n, childKey, parent)) =>
        val orphans = df.select(childKey.as("k")).distinct()
          .join(parent.select(col(parent.columns.head).as("k")).distinct(),
            Seq("k"), "left_anti")
          .agg(count(lit(1)).as(s"v_$n"))
        base.crossJoin(orphans)
      case None => base
    }
    val names = rows.map(_.name) ++ uniqueKey.map(_._1).toSeq ++
      fk.map(_._1).toSeq
    withFk.select(explode(array(names.map { n =>
      struct(lit(n).as("constraint_name"), col("n_rows"),
        col(s"v_$n").as("n_violations"))
    }: _*)).as("c"))
      .select(col("c.constraint_name"), col("c.n_rows"),
        col("c.n_violations"),
        (col("c.n_violations") === 0L).as("passed"))
  }
}
