package graft.sources

import graft.etl.SnapshotStore
import graft.etl.SnapshotStore.{ColStats, EntryStats}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** MANIFEST-STATS FILE SKIPPING for the snapshot read path — the
  * Iceberg-manifest / Delta-data-skipping economics: a filter on a
  * DATA column prunes whole partition dirs whose per-entry `[min,max]`
  * provably cannot hold a matching row, BEFORE any task is scheduled
  * or parquet footer opened. At 100 TB a point lookup
  * (`WHERE order_id = …`) or a time-range probe on a sorted layout
  * touches a handful of entries instead of every file of the table.
  * (Reference analogue: ClickHouse's sparse primary-key index skipping
  * whole granules — README.md:547's ORDER BY design rationale.)
  *
  * Soundness contract: [[cannotMatch]] returns true ONLY when no row
  * of the entry can satisfy the filter. Everything unknown — missing
  * column stats (all-null or dropped-at-harvest, indistinguishable),
  * un-renderable values, unsupported filter shapes, NaN — keeps the
  * entry. Spark re-evaluates every data filter post-scan, so a missed
  * prune costs I/O, never rows; a WRONG prune loses rows silently,
  * hence every branch below is conservative. Deletion-vector entries
  * prune safely too: their stats cover a SUPERSET of live rows.
  *
  * Stat strings are the engine's canonical renderings compared under
  * [[SnapshotStore.statCompare]] — the same total order the DML
  * pruning paths bet on. The two float traps are handled explicitly:
  * NaN filter values never prune (`Double.compare` sorts NaN greatest,
  * SQL comparisons with NaN are not range-decidable), and `±0.0`
  * equality probes test BOTH renderings (`Double.compare(-0.0, 0.0)`
  * is -1 but SQL says they are equal — a naive range check would prune
  * an entry whose max is `-0.0` for `= 0.0`).
  */
private[graft] object GraftStatsPrune {

  /** True iff NO row of an entry with these stats can satisfy `f`.
    * `types` maps LOGICAL column names (what filter references spell —
    * entry stats are keyed the same way) to their CURRENT logical
    * types (safe across widening: int-rendered stat strings reparse
    * under the widened type; float→double widening drops stats, which
    * lands in the conservative missing-stat branch). */
  def cannotMatch(st: EntryStats, types: Map[String, DataType],
      f: Filter): Boolean =
    if (st.rows == 0) true else no(f, st.cols, types)

  private def no(f: Filter, cols: Map[String, ColStats],
      types: Map[String, DataType]): Boolean = f match {
    case AlwaysFalse() => true
    case And(l, r) => no(l, cols, types) || no(r, cols, types)
    case Or(l, r) => no(l, cols, types) && no(r, cols, types)
    case EqualTo(a, v) =>
      if (v == null) true // `= NULL` matches no row
      else outsideEq(a, v, cols, types)
    case EqualNullSafe(a, v) =>
      // <=> NULL matches null rows — stats carry no null counts
      v != null && outsideEq(a, v, cols, types)
    case In(a, vs) if vs != null =>
      // prune iff EVERY element provably misses (null elements match
      // no row); an un-renderable element keeps the entry
      rangeOf(a, cols, types).exists { case (dt, cs) =>
        vs.forall(v => v == null || outsideEqRange(dt, cs, v))
      }
    case LessThan(a, v) if v != null =>
      rangeOf(a, cols, types).exists { case (dt, cs) =>
        render(dt, v).exists(s =>
          SnapshotStore.statCompare(dt, cs.min, s) >= 0) }
    case LessThanOrEqual(a, v) if v != null =>
      rangeOf(a, cols, types).exists { case (dt, cs) =>
        render(dt, v).exists(s =>
          SnapshotStore.statCompare(dt, cs.min, s) > 0) }
    case GreaterThan(a, v) if v != null =>
      rangeOf(a, cols, types).exists { case (dt, cs) =>
        render(dt, v).exists(s =>
          SnapshotStore.statCompare(dt, cs.max, s) <= 0) }
    case GreaterThanOrEqual(a, v) if v != null =>
      rangeOf(a, cols, types).exists { case (dt, cs) =>
        render(dt, v).exists(s =>
          SnapshotStore.statCompare(dt, cs.max, s) < 0) }
    // `a <> v` kills the entry only when every NON-NULL value IS v
    // (min==max==v) — null rows fail `<>` anyway (result is NULL).
    // The ±0.0 eq-class can't fire here (compare(min,max)==0 first).
    case Not(EqualTo(a, v)) if v != null =>
      rangeOf(a, cols, types).exists { case (dt, cs) =>
        SnapshotStore.statCompare(dt, cs.min, cs.max) == 0 &&
          render(dt, v).exists(s =>
            SnapshotStore.statCompare(dt, s, cs.min) == 0) }
    // a matching s has p as prefix ⇒ s ≥ p bytewise; and if min's
    // |p|-prefix exceeds p, everything ≥ min exceeds every p-prefixed
    // string. ASCII-only: String.compareTo (UTF-16) and the stats'
    // UTF-8 byte order agree exactly there; exotic planes keep the
    // entry rather than risk an order divergence.
    case StringStartsWith(a, p) if p != null =>
      rangeOf(a, cols, types).exists { case (dt, cs) =>
        dt == StringType &&
          isAscii(p) && isAscii(cs.min) && isAscii(cs.max) &&
          (cs.max.compareTo(p) < 0 ||
            cs.min.take(p.length).compareTo(p) > 0) }
    case _ => false // IsNull/IsNotNull/unknown shapes: undecidable
  }

  /** UNIFORM three-valued decision of `f` over an entry: Some(true) =
    * EVERY live row of the entry satisfies f, Some(false) = NO row
    * does, None = mixed/undecidable. Exact TRUE/FALSE come from
    * `const` — the entry's IDENTITY partition components (per-entry
    * constant, provably non-null by the commit guard), valued by their
    * canonical stat strings; a leaf that can't decide exactly may
    * still decide FALSE through the range pruner ([[cannotMatch]]).
    * Used by the metadata-only aggregate rewrite to answer
    * `count(*) … WHERE <partition-decidable predicate>` without a
    * scan. NOT: only the exact (identity) decision inverts — a
    * "no row satisfies x" verdict says nothing about ¬x on null-valued
    * rows. Float/double identity comparisons refuse (±0.0/NaN ordering
    * diverges from SQL equality). */
  def decideUniform(st: EntryStats, const: Map[String, String],
      types: Map[String, DataType], f: Filter): Option[Boolean] =
    f match {
      case And(l, r) =>
        (decideUniform(st, const, types, l),
          decideUniform(st, const, types, r)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), o) => o
          case (o, Some(true)) => o
          case _ => None
        }
      case Or(l, r) =>
        (decideUniform(st, const, types, l),
          decideUniform(st, const, types, r)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), o) => o
          case (o, Some(false)) => o
          case _ => None
        }
      case Not(x) => exactDecide(x, const, types).map(!_)
      case leaf =>
        exactDecide(leaf, const, types).orElse(
          if (st.rows == 0 || no(leaf, st.cols, types)) Some(false)
          else None)
    }

  /** Exact two-valued decision on identity-constant components only
    * (non-null ⇒ SQL comparisons are two-valued there). */
  private def exactDecide(f: Filter, const: Map[String, String],
      types: Map[String, DataType]): Option[Boolean] = {
    // no float/double: Double.compare's ±0.0/NaN order diverges from
    // SQL equality, and an identity component of that type is already
    // refused by the writer paths
    def dtOf(a: String): Option[DataType] = types.get(a)
      .filter(SnapshotStore.supportedStatType)
      .filter(dt => dt != FloatType && dt != DoubleType)
    def cmp(a: String, v: Any): Option[Int] =
      for { dt <- dtOf(a); c <- const.get(a); s <- render(dt, v) }
        yield SnapshotStore.statCompare(dt, c, s)
    def strConst(a: String): Option[String] =
      types.get(a).filter(_ == StringType).flatMap(_ => const.get(a))
    f match {
      case AlwaysTrue() => Some(true)
      case AlwaysFalse() => Some(false)
      case And(l, r) =>
        (exactDecide(l, const, types), exactDecide(r, const, types)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), o) => o
          case (o, Some(true)) => o
          case _ => None
        }
      case Or(l, r) =>
        (exactDecide(l, const, types), exactDecide(r, const, types)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), o) => o
          case (o, Some(false)) => o
          case _ => None
        }
      case Not(x) => exactDecide(x, const, types).map(!_)
      case EqualTo(a, v) if v != null => cmp(a, v).map(_ == 0)
      case EqualNullSafe(a, v) =>
        if (v == null) const.get(a).map(_ => false)
        else cmp(a, v).map(_ == 0)
      case In(a, vs) if vs != null =>
        for {
          dt <- dtOf(a); c <- const.get(a)
          rendered = vs.toSeq.filter(_ != null).map(render(dt, _))
          r <- {
            if (rendered.exists(_.exists(s =>
              SnapshotStore.statCompare(dt, c, s) == 0))) Some(true)
            else if (rendered.forall(_.isDefined)) Some(false)
            else None
          }
        } yield r
      case LessThan(a, v) if v != null => cmp(a, v).map(_ < 0)
      case LessThanOrEqual(a, v) if v != null => cmp(a, v).map(_ <= 0)
      case GreaterThan(a, v) if v != null => cmp(a, v).map(_ > 0)
      case GreaterThanOrEqual(a, v) if v != null => cmp(a, v).map(_ >= 0)
      case IsNull(a) => const.get(a).map(_ => false)
      case IsNotNull(a) => const.get(a).map(_ => true)
      case StringStartsWith(a, p) if p != null =>
        strConst(a).map(_.startsWith(p))
      case StringEndsWith(a, p) if p != null =>
        strConst(a).map(_.endsWith(p))
      case StringContains(a, p) if p != null =>
        strConst(a).map(_.contains(p))
      case _ => None
    }
  }

  /** The column's (type, stats) when both sides are usable. */
  private def rangeOf(a: String, cols: Map[String, ColStats],
      types: Map[String, DataType]): Option[(DataType, ColStats)] =
    for {
      dt <- types.get(a)
      if SnapshotStore.supportedStatType(dt)
      cs <- cols.get(a)
    } yield (dt, cs)

  private def outsideEq(a: String, v: Any, cols: Map[String, ColStats],
      types: Map[String, DataType]): Boolean =
    rangeOf(a, cols, types).exists { case (dt, cs) =>
      outsideEqRange(dt, cs, v) }

  /** v provably outside [min,max] for equality purposes. */
  private def outsideEqRange(dt: DataType, cs: ColStats, v: Any)
      : Boolean = {
    def outside(s: String): Boolean =
      SnapshotStore.statCompare(dt, s, cs.min) < 0 ||
        SnapshotStore.statCompare(dt, s, cs.max) > 0
    dt match {
      case FloatType | DoubleType
          if v.isInstanceOf[Number] &&
            v.asInstanceOf[Number].doubleValue == 0.0d =>
        // SQL 0.0 = -0.0, Double.compare disagrees: both spellings
        // must miss before the entry may drop
        outside("0.0") && outside("-0.0")
      case _ => render(dt, v).exists(outside)
    }
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  /** Canonical stat-string rendering of a source-Filter value — each
    * branch the exact mirror of the harvest's `conv` (None = can't
    * render safely = never prune on it). Source filters carry EXTERNAL
    * Scala values (`DataSourceStrategy.translateFilter` converts
    * Catalyst literals), both legacy and java.time datetime flavors. */
  private def render(dt: DataType, v: Any): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => v match {
      case n @ (_: java.lang.Byte | _: java.lang.Short |
                _: java.lang.Integer | _: java.lang.Long) =>
        Some(n.asInstanceOf[Number].longValue.toString)
      case _ => None
    }
    case FloatType => v match {
      case f: java.lang.Float if !f.isNaN => Some(f.toString)
      case _ => None
    }
    case DoubleType => v match {
      case d: java.lang.Double if !d.isNaN => Some(d.toString)
      case _ => None
    }
    case StringType => v match {
      case s: String => Some(s)
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
      case _ => None
    }
    case DateType => v match {
      case d: java.sql.Date => Some(d.toString) // yyyy-MM-dd
      case d: java.time.LocalDate => Some(d.toString)
      case _ => None
    }
    case TimestampType => v match {
      case t: java.sql.Timestamp => Some(t.toInstant.toString)
      case i: java.time.Instant => Some(i.toString)
      case _ => None
    }
    case TimestampNTZType => v match {
      case l: java.time.LocalDateTime => Some(l.toString)
      case _ => None
    }
    case _: DecimalType => v match {
      // statCompare for decimals is numeric (BigDecimal.compare),
      // so scale differences between literal and stat don't matter
      case b: java.math.BigDecimal => Some(b.toString)
      case b: BigDecimal => Some(b.underlying.toString)
      case d: org.apache.spark.sql.types.Decimal => Some(d.toString)
      case _ => None
    }
    case BooleanType => v match {
      case b: java.lang.Boolean => Some(b.toString)
      case _ => None
    }
    case _ => None
  }
}
