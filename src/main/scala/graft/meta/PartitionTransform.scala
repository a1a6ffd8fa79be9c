package graft.meta

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style HIDDEN partition transforms (Iceberg spec §Partitioning;
  * the reference generator only ever uses identity specs): a partition
  * spec entry is a STRING — a bare column name (identity, the legacy
  * encoding, unchanged on disk) or `bucket(N, col)` / `truncate(W, col)` /
  * `day(col)`. The transform VALUE is derived at write time (the row keeps
  * only the source column — the partition is metadata, which is the
  * "hidden" in hidden partitioning) and lands in the file's partition map
  * under a derived name (`col_bucket`, `col_trunc`, `col_day`), so
  * everything downstream that treats partitions as opaque (name → value)
  * maps — dir naming, compaction grouping, the partitions metadata table —
  * works untouched.
  *
  * Pruning: a reader probing source-column VALUES maps each value through
  * [[apply]] (driver math, bit-identical to the write-side expression —
  * bucket hashes via the same `XxHash64Function` the `xxhash64` expression
  * calls) and keeps only files whose partition value matches; see
  * [[graft.read.MorReader.readValues]]. Range predicates don't consult
  * bucket transforms (a hash destroys order) but still prune `truncate`/
  * `day` via the per-file min/max metrics as before.
  */
sealed trait PartitionTransform {
  /** The DATA column the transform reads. */
  def source: String
  /** The partition-map key (and directory name prefix) for the value. */
  def partName: String
  /** Write-side derived value (cast to string for the partition map). */
  def valueExpr(dt: DataType): Column
  /** Driver-side transform of one canonical-string probe value — MUST
    * agree with [[valueExpr]] on every input, or pruning is unsound. */
  def apply(value: String, dt: DataType): Option[String]
  /** Re-render to the spec-string encoding (what the spec log stores). */
  def render: String
  def isIdentity: Boolean = this.isInstanceOf[PartitionTransform.Identity]
}

object PartitionTransform {

  final case class Identity(source: String) extends PartitionTransform {
    def partName: String = source
    def valueExpr(dt: DataType): Column = col(source)
    def apply(value: String, dt: DataType): Option[String] = Some(value)
    def render: String = source
  }

  /** `bucket(n, col)`: `pmod(xxhash64(col), n)` — bounded partition count
    * for unbounded-cardinality keys. Long/Int/String sources (the types
    * whose driver-side hash provably matches the expression). */
  final case class Bucket(n: Int, source: String) extends PartitionTransform {
    require(n >= 2, s"bucket($n, $source): need >= 2 buckets")
    def partName: String = s"${source}_bucket"
    def valueExpr(dt: DataType): Column = pmod(xxhash64(col(source)), lit(n.toLong))
    def apply(value: String, dt: DataType): Option[String] = {
      val h = dt match {
        case LongType => XxHash64Function.hash(value.toLong, LongType, 42L)
        case IntegerType => XxHash64Function.hash(value.toInt, IntegerType, 42L)
        case StringType =>
          XxHash64Function.hash(UTF8String.fromString(value), StringType, 42L)
        case _ => return None // unsupported: caller must not file-prune
      }
      Some(java.lang.Math.floorMod(h, n.toLong).toString)
    }
    def render: String = s"bucket($n,$source)"
  }

  /** `truncate(w, col)`: leading `w` chars of a string — prefix-clustered
    * layout that KEEPS order (range reads still prune via min/max). */
  final case class Truncate(w: Int, source: String) extends PartitionTransform {
    require(w >= 1, s"truncate($w, $source): width must be >= 1")
    def partName: String = s"${source}_trunc"
    def valueExpr(dt: DataType): Column = substring(col(source), 1, w)
    def apply(value: String, dt: DataType): Option[String] = dt match {
      case StringType => Some(value.take(w))
      case _ => None
    }
    def render: String = s"truncate($w,$source)"
  }

  /** `day(col)`: calendar date of a date/timestamp — the time-series
    * ingest layout. Canonical value `yyyy-MM-dd` (UTC, the session zone
    * the engine pins). */
  final case class Day(source: String) extends PartitionTransform {
    def partName: String = s"${source}_day"
    def valueExpr(dt: DataType): Column = date_format(col(source), "yyyy-MM-dd")
    def apply(value: String, dt: DataType): Option[String] = dt match {
      case DateType | TimestampType | TimestampNTZType => Some(value.take(10))
      case _ => None
    }
    def render: String = s"day($source)"
  }

  /** `month(col)`: `yyyy-MM` — coarser time-series granularity. */
  final case class Month(source: String) extends PartitionTransform {
    def partName: String = s"${source}_month"
    def valueExpr(dt: DataType): Column = date_format(col(source), "yyyy-MM")
    def apply(value: String, dt: DataType): Option[String] = dt match {
      case DateType | TimestampType | TimestampNTZType => Some(value.take(7))
      case _ => None
    }
    def render: String = s"month($source)"
  }

  /** `hour(col)`: `yyyy-MM-dd-HH` — finest Iceberg time granularity, the
    * streaming-ingest layout. */
  final case class Hour(source: String) extends PartitionTransform {
    def partName: String = s"${source}_hour"
    def valueExpr(dt: DataType): Column = date_format(col(source), "yyyy-MM-dd-HH")
    def apply(value: String, dt: DataType): Option[String] = dt match {
      case TimestampType | TimestampNTZType =>
        Some(value.take(13).replace(' ', '-')) // "yyyy-MM-dd HH:…" → "yyyy-MM-dd-HH"
      case _ => None
    }
    def render: String = s"hour($source)"
  }

  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r
  private val DayRe = """day\(\s*([^)\s]+)\s*\)""".r
  private val MonthRe = """month\(\s*([^)\s]+)\s*\)""".r
  private val HourRe = """hour\(\s*([^)\s]+)\s*\)""".r

  /** Bare names parse as identity, so every legacy spec round-trips. */
  def parse(spec: String): PartitionTransform = spec.trim match {
    case BucketRe(n, c) => Bucket(n.toInt, c)
    case TruncRe(w, c) => Truncate(w.toInt, c)
    case DayRe(c) => Day(c)
    case MonthRe(c) => Month(c)
    case HourRe(c) => Hour(c)
    case bare =>
      require(!bare.contains("("), s"unparseable partition transform: $spec")
      Identity(bare)
  }
}
