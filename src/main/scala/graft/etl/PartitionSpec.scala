package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The PARTITION LAYOUT of a snapshot table, generalized from the
  * original single identity column to a sequence of TRANSFORMS — the
  * Iceberg-style partition spec (an extension: the reference's tables
  * are month-partitioned on one column, README.md's MergeTree DDL;
  * multi-tenant corpora at 100 TB need `(tenant, month)` or
  * `(month, bucket(n, id))` grains):
  *
  *   - `identity(col)` — the value itself (spelled as the bare column
  *     name, which is what every pre-existing layout prop contains);
  *   - `bucket(n, col)` — `pmod(hash(col), n)`, Spark's own Murmur3
  *     hash of the column value, so bucket routing is computed
  *     distributively by codegen'd expressions, never a UDF;
  *   - `years(ts)` / `months(ts)` / `days(ts)` / `hours(ts)` — the
  *     Iceberg time transforms over date/timestamp columns, rendered
  *     as `date_format` strings (`yyyy`, `yyyy-MM`, `yyyy-MM-dd`,
  *     `yyyy-MM-dd-HH`) — human-readable tokens, lexicographic order =
  *     time order; TZ-timestamp rendering is session-zone-dependent
  *     and therefore guarded exactly like identity tokens
  *     ([[SnapshotStore.checkTokenRenderZone]]);
  *   - `truncate(w, col)` — leading `w` characters of a STRING column
  *     (the Iceberg string-truncate; prefix grouping for id-like
  *     strings).
  *
  * The spec travels as its CANONICAL STRING (`"m"`,
  * `"m,bucket(16,id)"`) through every `partCol: String` parameter and
  * the `table.partCol` manifest prop — single-field identity specs
  * are byte-identical to the legacy layout strings, so existing
  * tables parse unchanged.
  *
  * TOKENS: a partition's manifest token is the rendered transform
  * values joined with '/'. A SINGLE-identity spec renders the bare
  * `cast(col as string)` — exactly the legacy token, so pre-existing
  * manifests stay addressable. Multi-field specs escape '%' and '/'
  * inside each component (`%25`/`%2F`, % first), making the join
  * unambiguous for any value; [[splitToken]] is the exact inverse.
  * A NULL in any component nulls the whole token (null-propagating
  * `concat`), which trips the commit's existing NULL-partition
  * rejection. */
final case class PartitionSpec(fields: Seq[PartitionSpec.Field]) {
  import PartitionSpec._

  require(fields.nonEmpty, "a partition spec needs at least one field")

  /** The canonical spec string (what layout props record; parse's
    * fixed point). */
  def canonical: String = fields.map(_.render).mkString(",")

  /** Distinct underlying table columns, spec order. */
  def sourceCols: Seq[String] = fields.map(_.col).distinct

  /** Columns partitioned by IDENTITY — the ones whose values are
    * exactly recoverable from a token (bucket/time/truncate
    * components are lossy). */
  def identityCols: Seq[String] =
    fields.collect { case Identity(c) => c }.distinct

  /** Columns whose token rendering depends on the SESSION TIMEZONE
    * when the column is a TZ timestamp: identity (cast-to-string) and
    * the time transforms (date_format). Bucket hashes the
    * zone-independent internal micros; truncate is strings-only. */
  def zoneSensitiveCols: Seq[String] =
    fields.collect {
      case Identity(c) => c
      case TimeUnit(_, c) => c
    }.distinct

  def isSingleIdentity: Boolean = fields match {
    case Seq(Identity(_)) => true
    case _ => false
  }

  def hasBucket: Boolean = fields.exists {
    case Bucket(_, _) => true
    case _ => false
  }

  /** Loud type validation against the frame being written: time
    * transforms need date/timestamp sources, truncate needs strings —
    * checked at the COMMIT boundary, not discovered as a garbage
    * token later. Columns absent from `schema` are checked by the
    * write itself (tokenExpr would fail to resolve them). */
  def validate(schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types._
    def typeOf(c: String): Option[DataType] =
      schema.fields.find(_.name == c).map(_.dataType)
    fields.foreach {
      case TimeUnit(u, c) => typeOf(c).foreach { t =>
        require(t == DateType || t == TimestampType ||
            t == TimestampNTZType,
          s"partition transform $u($c) needs a date/timestamp " +
            s"column, got ${t.simpleString}")
      }
      case Truncate(w, c) => typeOf(c).foreach { t =>
        require(t == StringType,
          s"partition transform truncate($w,$c) supports STRING " +
            s"columns, got ${t.simpleString}")
      }
      case _ => ()
    }
  }

  /** The partition-token EXPRESSION over a row, with `value(col)`
    * supplying each source column's (typed) value — `col(_)` for a
    * plain frame, a SET/INSERT substitution for DML landing
    * discovery. Single-identity = the legacy bare cast. */
  def tokenExpr(value: String => Column): Column = fields match {
    case Seq(Identity(c)) => value(c).cast("string")
    case fs =>
      def esc(c: Column): Column =
        // escape the join separator inside values: % first, then /
        regexp_replace(regexp_replace(c, "%", "%25"), "/", "%2F")
      val comps = fs.map {
        case Identity(c) => esc(value(c).cast("string"))
        case Bucket(n, c) =>
          // hash(NULL) would return the seed (a real bucket number):
          // null must stay null so the commit's NULL-partition guard
          // fires instead of silently filing nulls in bucket hash(seed)
          when(value(c).isNull, lit(null).cast("string"))
            .otherwise(pmod(hash(value(c)), lit(n)).cast("string"))
        case TimeUnit(u, c) =>
          // digits and dashes only — no escaping needed; null → null
          date_format(value(c), TimeUnit.pattern(u))
        case Truncate(w, c) =>
          // strings-only ([[validate]]); can hold anything — escape
          esc(substring(value(c).cast("string"), 1, w))
      }
      concat(comps.flatMap(c => Seq(lit(Sep), c)).tail: _*)
  }

  /** Split a (multi-field) token back into per-field component values
    * — the driver-side inverse of [[tokenExpr]]'s join+escape. None if
    * the token's arity does not match this spec (a legacy token, or a
    * corrupt manifest — callers treat as undecidable). Single-identity
    * tokens pass through whole. */
  def splitToken(token: String): Option[Seq[String]] = fields match {
    case Seq(Identity(_)) => Some(Seq(token))
    case fs =>
      // split KEEPS trailing empty components (an empty-string value
      // is legal); -1 limit does that
      val comps = token.split(Sep, -1).toSeq
      if (comps.size != fs.size) None
      else Some(comps.map(unescapeComponent))
  }

  /** Join per-field component values into a token — the driver-side
    * twin of [[tokenExpr]] for values already rendered as strings. */
  def joinComponents(comps: Seq[String]): String = fields match {
    case Seq(Identity(_)) => comps.head
    case _ => comps.map(escapeComponent).mkString(Sep)
  }
}

object PartitionSpec {

  sealed trait Field {
    /** The underlying table column. */
    def col: String
    /** Canonical spelling inside the spec string. */
    def render: String
  }
  /** The value itself (legacy layout = one of these). */
  final case class Identity(col: String) extends Field {
    def render: String = col
  }
  /** `bucket(n, col)` — pmod(hash(col), n). */
  final case class Bucket(n: Int, col: String) extends Field {
    require(n > 0, s"bucket count must be positive, got $n")
    def render: String = s"bucket($n,$col)"
  }
  /** `years/months/days/hours(col)` — Iceberg time transforms. */
  final case class TimeUnit(unit: String, col: String) extends Field {
    require(TimeUnit.Units.contains(unit),
      s"unknown time transform '$unit'")
    def render: String = s"$unit($col)"
  }
  object TimeUnit {
    val Units: Set[String] = Set("years", "months", "days", "hours")
    def pattern(unit: String): String = unit match {
      case "years" => "yyyy"
      case "months" => "yyyy-MM"
      case "days" => "yyyy-MM-dd"
      case "hours" => "yyyy-MM-dd-HH"
    }
  }
  /** `truncate(w, col)` — leading w chars of a string column. */
  final case class Truncate(w: Int, col: String) extends Field {
    require(w > 0, s"truncate width must be positive, got $w")
    def render: String = s"truncate($w,$col)"
  }

  private val Sep = "/"

  private val BucketRe = """(?i)bucket\s*\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r
  private val TruncRe =
    """(?i)truncate\s*\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r
  private val TimeRe =
    """(?i)(years|months|days|hours)\s*\(\s*([^)]+?)\s*\)""".r

  /** Parse a spec string. A bare column name is an identity field —
    * the legacy single-column layout strings parse to single-identity
    * specs, whose canonical form is the same string. */
  def parse(s: String): PartitionSpec = {
    val parts = splitTop(s)
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"empty partition spec (or empty field) in: '$s'")
    PartitionSpec(parts.map {
      case BucketRe(n, c) => Bucket(n.toInt, c)
      case TruncRe(w, c) => Truncate(w.toInt, c)
      case TimeRe(u, c) => TimeUnit(u.toLowerCase, c)
      case bare if !bare.contains("(") => Identity(bare.trim)
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform '$other' — supported: " +
          "identity (a bare column name), bucket(n, col), " +
          "years/months/days/hours(col), truncate(w, col)")
    })
  }

  /** Top-level comma split (commas inside bucket(...) don't split). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new java.lang.StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString.trim; cur.setLength(0)
      case c => cur.append(c)
    }
    out += cur.toString.trim
    out.toSeq
  }

  /** Driver-side component escaping — MUST match [[PartitionSpec
    * .tokenExpr]]'s regexp_replace pair exactly ('%' first). */
  private[etl] def escapeComponent(s: String): String =
    s.replace("%", "%25").replace("/", "%2F")

  private[etl] def unescapeComponent(s: String): String =
    s.replace("%2F", "/").replace("%25", "%")
}
