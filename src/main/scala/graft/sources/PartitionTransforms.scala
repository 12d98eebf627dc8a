package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg-style HIDDEN PARTITIONING: a partition spec is a list of
  * transforms over source columns — `days(ts)`, `hours(ts)`,
  * `months(ts)`, `years(ts)`, `bucket(n, c)`, `truncate(w, c)`, or a
  * bare column name (identity). The table stores row values only; the
  * partition LABEL is derived from the row at staging time, so writers
  * never materialize a day column and queries filter on the RAW column
  * — the scan prunes the raw predicate THROUGH the transform
  * (`ts BETWEEN a AND b` prunes day partitions; `user_id = k` prunes
  * to one bucket). Reference behavior: the reference engine has no
  * partitioning at all (it re-scans SQLite per query,
  * database.py:1-277); this is the standard shape its workloads need
  * at 100 TB, where event tables are always time-partitioned.
  *
  * Each transform declares its pruning contract:
  *   - `labelCol`: the label derivation as a codegen'd Column over the
  *     source (staging runs it once per row in the staging shuffle).
  *   - `applyLiteral`: the SAME derivation applied to a pushed-down
  *     Catalyst literal on the driver (must agree with `labelCol`
  *     bit-for-bit — a mismatch silently excludes matching files).
  *   - `monotonic`: order-preserving transforms (time buckets,
  *     truncate) admit RANGE pruning: x >= L implies t(x) >= t(L), so
  *     a file whose label < t(L) provably holds no match. `bucket` is
  *     not order-preserving — equality/IN only.
  *   - `numericLabel`: labels that compare as numbers (bucket ids,
  *     numeric truncate); time labels are fixed-width ISO strings
  *     whose code-point order IS chronological order.
  *
  * Time transforms are UTC-fixed (epoch arithmetic, like Iceberg) —
  * NEVER the session zone: two writers in different zones must derive
  * identical labels or pruning on one of their files is wrong.
  */
sealed trait PartitionTransform {
  def source: String
  /** Canonical spec text, e.g. "days(ts)" — what the manifest stores. */
  def spec: String
  def labelCol(c: Column): Column
  def applyLiteral(l: Literal): Option[String]
  def monotonic: Boolean
  def numericLabel: Boolean
  def isIdentity: Boolean = false
  /** Rebind to a renamed source column (ALTER TABLE RENAME). */
  def withSource(s: String): PartitionTransform
}

object PartitionTransforms {
  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** Exact floorDiv over a long Column (`/` alone would go through
    * DOUBLE division; subtracting the positive mod first makes the
    * dividend an exact multiple, so the division is exact).
    */
  private def floorDivCol(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast("long")

  private def epochDayCol(c: Column, dt: DataType): Column = dt match {
    case DateType => unix_date(c).cast("long")
    case TimestampType => floorDivCol(unix_micros(c), MicrosPerDay)
    case other => throw new IllegalArgumentException(
      s"time transforms need a DATE or TIMESTAMP source, got $other")
  }

  private def epochDayOf(l: Literal): Option[Long] =
    (l.value, l.dataType) match {
      case (null, _) => None
      case (d: Integer, DateType) => Some(d.longValue)
      case (us: java.lang.Long, TimestampType) =>
        Some(Math.floorDiv(us, MicrosPerDay))
      case _ => None // TimestampNTZ etc: unprunable, sound
    }

  final case class PIdentity(source: String) extends PartitionTransform {
    val spec: String = source
    override def isIdentity: Boolean = true
    def labelCol(c: Column): Column = c.cast("string")
    def applyLiteral(l: Literal): Option[String] = None // FileIndex
    // keeps its pre-existing exact-value path for identity columns
    def monotonic: Boolean = false
    def numericLabel: Boolean = false
    def withSource(s: String): PartitionTransform = copy(source = s)
  }

  final case class PDays(source: String, dt: DataType)
      extends PartitionTransform {
    val spec = s"days($source)"
    def labelCol(c: Column): Column =
      date_from_unix_date(epochDayCol(c, dt).cast("int")).cast("string")
    def applyLiteral(l: Literal): Option[String] =
      epochDayOf(l).map(d => java.time.LocalDate.ofEpochDay(d).toString)
    def monotonic = true
    def numericLabel = false
    def withSource(s: String): PartitionTransform = copy(source = s)
  }

  final case class PHours(source: String) extends PartitionTransform {
    val spec = s"hours($source)"
    // "yyyy-MM-dd-HH" (the Iceberg rendering): fixed-width zero-padded
    // components, so code-point order is chronological order
    def labelCol(c: Column): Column = {
      val h = floorDivCol(unix_micros(c), MicrosPerHour)
      concat(
        date_from_unix_date(floorDivCol(h, 24L).cast("int"))
          .cast("string"),
        lit("-"), lpad(pmod(h, lit(24L)).cast("string"), 2, "0"))
    }
    def applyLiteral(l: Literal): Option[String] =
      (l.value, l.dataType) match {
        case (us: java.lang.Long, TimestampType) =>
          val h = Math.floorDiv(us, MicrosPerHour)
          Some(java.time.LocalDate.ofEpochDay(Math.floorDiv(h, 24L))
            .toString + f"-${Math.floorMod(h, 24L)}%02d")
        case _ => None
      }
    def monotonic = true
    def numericLabel = false
    def withSource(s: String): PartitionTransform = copy(source = s)
  }

  final case class PMonths(source: String, dt: DataType)
      extends PartitionTransform {
    val spec = s"months($source)"
    // date_format over DateType is zone-free (no time component)
    def labelCol(c: Column): Column = date_format(
      date_from_unix_date(epochDayCol(c, dt).cast("int")), "yyyy-MM")
    def applyLiteral(l: Literal): Option[String] = epochDayOf(l).map {
      d =>
        val ld = java.time.LocalDate.ofEpochDay(d)
        f"${ld.getYear}%04d-${ld.getMonthValue}%02d"
    }
    def monotonic = true
    def numericLabel = false
    def withSource(s: String): PartitionTransform = copy(source = s)
  }

  final case class PYears(source: String, dt: DataType)
      extends PartitionTransform {
    val spec = s"years($source)"
    def labelCol(c: Column): Column = date_format(
      date_from_unix_date(epochDayCol(c, dt).cast("int")), "yyyy")
    def applyLiteral(l: Literal): Option[String] = epochDayOf(l).map(
      d => f"${java.time.LocalDate.ofEpochDay(d).getYear}%04d")
    def monotonic = true
    def numericLabel = false
    def withSource(s: String): PartitionTransform = copy(source = s)
  }

  final case class PBucket(n: Int, source: String, dt: DataType)
      extends PartitionTransform {
    val spec = s"bucket($n,$source)"
    // functions.hash IS Murmur3Hash(seed = 42) — the literal side
    // below must use the identical expression or equality pruning
    // silently excludes matching files
    def labelCol(c: Column): Column =
      pmod(hash(c), lit(n)).cast("string")
    def applyLiteral(l: Literal): Option[String] = l.value match {
      case null => None
      case _ =>
        val h = Murmur3Hash(Seq(Literal.create(l.value, l.dataType)), 42)
          .eval(InternalRow.empty).asInstanceOf[Int]
        Some((((h % n) + n) % n).toString)
    }
    def monotonic = false // hash destroys order: equality/IN only
    def numericLabel = true
    def withSource(s: String): PartitionTransform = copy(source = s)
  }

  final case class PTruncate(w: Int, source: String, dt: DataType)
      extends PartitionTransform {
    val spec = s"truncate($w,$source)"
    def labelCol(c: Column): Column = dt match {
      case StringType => substring(c, 1, w)
      case ByteType | ShortType | IntegerType | LongType =>
        (c.cast("long") - pmod(c.cast("long"), lit(w.toLong)))
          .cast("string")
      case other => throw new IllegalArgumentException(
        s"truncate() needs a STRING or integral source, got $other")
    }
    def applyLiteral(l: Literal): Option[String] =
      (l.value, l.dataType) match {
        case (null, _) => None
        case (u: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          // UTF8String.substringSQL counts CODE POINTS, exactly what
          // functions.substring does on the executor side
          Some(u.substringSQL(1, w).toString)
        case (v: java.lang.Number, ByteType | ShortType | IntegerType |
            LongType) =>
          val x = v.longValue
          Some((x - Math.floorMod(x, w.toLong)).toString)
        case _ => None
      }
    def monotonic = true // truncate is order-preserving (floor / prefix)
    def numericLabel: Boolean = dt != StringType
    def withSource(s: String): PartitionTransform = copy(source = s)
  }

  private val FnRe = """(?i)\s*(days|hours|months|years)\s*\(\s*([A-Za-z0-9_]+)\s*\)\s*""".r
  private val ArgFnRe = """(?i)\s*(bucket|truncate)\s*\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)\s*""".r
  private val BareRe = """\s*([A-Za-z0-9_]+)\s*""".r

  /** Parse one spec item against the table schema (the transform needs
    * the source type to pick its derivation and comparison domain).
    */
  def parseOne(s: String, schema: StructType): PartitionTransform = {
    def dtOf(c: String): DataType = {
      require(schema.fieldNames.contains(c),
        s"partition transform source $c is not a table column " +
          s"(${schema.fieldNames.mkString(", ")})")
      schema(c).dataType
    }
    s match {
      case FnRe(fn, c) => fn.toLowerCase match {
        case "days" => PDays(c, dtOf(c))
        case "hours" =>
          require(dtOf(c) == TimestampType,
            s"hours() needs a TIMESTAMP source, $c is ${dtOf(c)}")
          PHours(c)
        case "months" => PMonths(c, dtOf(c))
        case "years" => PYears(c, dtOf(c))
      }
      case ArgFnRe(fn, nStr, c) =>
        val n = nStr.toInt
        require(n > 0, s"$fn($nStr, $c): the width must be positive")
        if (fn.equalsIgnoreCase("bucket")) PBucket(n, c, dtOf(c))
        else PTruncate(n, c, dtOf(c))
      case BareRe(c) => PIdentity({ dtOf(c); c })
      case other => throw new IllegalArgumentException(
        s"cannot parse partition transform '$other' — expected " +
          "col, days(col), hours(col), months(col), years(col), " +
          "bucket(n, col), or truncate(w, col)")
    }
  }

  def parse(specs: Seq[String], schema: StructType)
      : Seq[PartitionTransform] = specs.map(parseOne(_, schema))
}
