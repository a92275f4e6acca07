package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed left as-of join — "for each left row, the most recent
  * right row with the same key and time ≤ the left time" — the classic
  * time-series operator relational engines lack (build brief / guide
  * example; absent from the reference, whose only joins are equi-joins,
  * SURVEY.md §2.3).
  *
  * Implementation (preference order (a): composed from built-ins, no
  * custom physical operator needed): union both sides tagged, one
  * shuffle on the join key, and a `last(_, ignoreNulls) OVER (ORDER BY
  * time, side)` window carries the latest right payload forward into
  * each left row. Right rows sort before left rows at equal timestamps,
  * giving inclusive (≥) semantics. Cost: ONE shuffle of |L|+|R| rows —
  * the same order as a regular sort-merge join, with no per-row point
  * lookups; this is the shape that survives 100 TB.
  *
  * Right-side (key, time) duplicates must be resolved by the caller
  * (e.g. keep one row per (key, time)) for deterministic results —
  * matching the determinism contract of DuckDB's ASOF JOIN, which the
  * oracle uses.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side, unique per (key, time)
    * @param leftKey    join key column on the left
    * @param rightKey   join key column on the right
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param rightCols  right columns to carry into matched rows
    * @param direction  "backward" (most recent right at or before the
    *                   left time — the default) or "forward" (earliest
    *                   right at or after it), the two merge_asof
    *                   directions; forward just flips the window's time
    *                   order, same single shuffle
    * @param toleranceMicros  optional max |left − matched right| time
    *                   gap; matches farther away revert to null (the
    *                   merge_asof tolerance contract)
    */
  def leftAsOf(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      rightCols: Seq[String], direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    val rightSchema = right.select(rightCols.map(col): _*).schema
    val leftSchema = left.schema
    // Join keys keep their NATIVE type when both sides agree; mixed
    // integral widths widen to long. Anything else (e.g. string vs
    // long) fails FAST — a blind cast would null every key and silently
    // match all left rows to the globally latest right row.
    val integral: Set[DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    val lkType = left.schema(leftKey).dataType
    val rkType = right.schema(rightKey).dataType
    val (lk, rk) =
      if (lkType == rkType) (col(leftKey), col(rightKey))
      else if (integral(lkType) && integral(rkType))
        (col(leftKey).cast(LongType), col(rightKey).cast(LongType))
      else throw new IllegalArgumentException(
        s"as-of join keys have incompatible types: $leftKey:$lkType vs " +
          s"$rightKey:$rkType (only identical or integral types join)")
    def timeCol(df: DataFrame, c: String): Column = {
      val dt = df.schema(c).dataType
      require(dt == TimestampType || dt == DateType || dt == TimestampNTZType,
        s"as-of time column $c must be a date/timestamp, got $dt")
      col(c).cast(TimestampType)
    }
    // Internal column names share a prefix no input column starts with,
    // so caller columns can never collide with the plumbing.
    val taken = (left.columns ++ right.columns).toSet
    val g = Iterator.iterate("_g")(_ + "_")
      .find(p => !taken.exists(_.startsWith(p))).get
    // flat columns, not structs: per-row struct copies through the
    // window frame measured ~4× slower than primitive last() carries,
    // and right columns are null together so per-column last(ignoreNulls)
    // still picks every value from the same matched row.
    val l = left.select(
      Seq(lk.as(s"${g}k"),
        timeCol(left, leftTime).as(s"${g}t"),
        lit(1).as(s"${g}side")) ++
        leftCols.map(col) ++
        rightSchema.map(f =>
          lit(null).cast(f.dataType).as(s"${g}r_${f.name}")): _*)
    val r = right.select(
      Seq(rk.as(s"${g}k"),
        timeCol(right, rightTime).as(s"${g}t"),
        lit(0).as(s"${g}side")) ++
        leftSchema.map(f =>
          lit(null).cast(f.dataType).as(f.name)) ++
        rightCols.map(c => col(c).as(s"${g}r_$c")): _*)
      // a null-time right row would sort FIRST (nulls-first ascending)
      // and its payload would be carried into EVERY left row of the key
      // — an un-timestamped reference row must never match anything
      .filter(col(s"${g}t").isNotNull)
    // backward: ascending time, latest right ≤ t wins. forward:
    // DESCENDING time, so the running last() sees ever-smaller times
    // and holds the earliest right ≥ t. Right rows (side 0) sort before
    // left at equal times either way — inclusive semantics.
    val tOrder =
      if (direction == "backward") col(s"${g}t").asc else col(s"${g}t").desc
    val w = Window.partitionBy(col(s"${g}k"))
      .orderBy(tOrder, col(s"${g}side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // carry the matched right TIME too, so tolerance can disqualify
    // (name "mt" cannot collide: right-col carries are all "m_"-prefixed)
    val base = l.withColumn(s"${g}tr", lit(null).cast(TimestampType))
      .unionByName(r.withColumn(s"${g}tr", col(s"${g}t")))
    val carried0 = rightCols.foldLeft(base) { (df, c) =>
      df.withColumn(s"${g}m_$c",
        last(col(s"${g}r_$c"), ignoreNulls = true).over(w))
    }
    val carried = carried0.withColumn(s"${g}mt",
      last(col(s"${g}tr"), ignoreNulls = true).over(w))
    val withinTol: Column = toleranceMicros match {
      case None => lit(true)
      case Some(tol) =>
        abs(unix_micros(col(s"${g}t")) - unix_micros(col(s"${g}mt"))) <= tol
    }
    carried.filter(col(s"${g}side") === 1)
      .select(
        leftCols.map(col) ++
          rightCols.map(c =>
            when(withinTol, col(s"${g}m_$c")).otherwise(lit(null)).as(c)): _*)
  }
}
