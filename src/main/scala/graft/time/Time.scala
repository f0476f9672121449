package graft.time

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.temporal.ChronoUnit

/** Time-step configuration sugar.
  *
  * Mirrors the reference's config grammar (kairos timeseries.py:26-63):
  * plain seconds (int or numeric string), `"<n>[hdwmy]"` with month=30d
  * and year=365d, or a Gregorian keyword (daily/weekly/monthly/yearly).
  */
sealed trait TimeStep {
  /** The bucket calculator for this step. */
  def calc: BucketCalc
}
final case class RelativeStep(seconds: Long) extends TimeStep {
  val calc: BucketCalc = RelativeTime(seconds)
}
final case class GregorianStep(unit: String) extends TimeStep {
  require(TimeStep.GregorianUnits.contains(unit), s"bad gregorian unit $unit")
  val calc: BucketCalc = GregorianTime(unit)
}

object TimeStep {
  val GregorianUnits: Set[String] = Set("daily", "weekly", "monthly", "yearly")
  private val Simple = "^(\\d+)([hdwmy])$".r
  private val Num = "^\\d+$".r
  /** Seconds per simple-suffix unit (timeseries.py:28-34). */
  val SimpleSeconds: Map[Char, Long] = Map(
    'h' -> 3600L, 'd' -> 86400L, 'w' -> 604800L,
    'm' -> 86400L * 30, 'y' -> 86400L * 365)

  def apply(value: Long): TimeStep = RelativeStep(value)
  def apply(value: String): TimeStep = value match {
    case Num()          => RelativeStep(value.toLong)
    case Simple(n, u)   => RelativeStep(n.toLong * SimpleSeconds(u.head))
    case g if GregorianUnits(g) => GregorianStep(g)
    case other => throw new IllegalArgumentException(s"Unsupported time format $other")
  }
}

/** Bucket calculator: maps timestamps (epoch seconds, UTC) to integer
  * bucket ids and back. Two implementations mirror the reference's
  * RelativeTime (timeseries.py:65-133) and GregorianTime (:135-264).
  */
sealed trait BucketCalc extends Serializable {
  def toBucket(ts: Double, steps: Int = 0): Long
  def fromBucket(bucket: Long): Long
  /** All bucket ids covering [start, end]. */
  def buckets(start: Long, end: Long): Seq[Long]
  /** Bucket-aligned timestamp, optionally offset by whole steps. */
  def normalize(ts: Double, steps: Int = 0): Long = fromBucket(toBucket(ts, steps))
  /** Seconds covered by a step (or by the aliased [t0,t1] bucket span). */
  def stepSize(t0: Option[Double] = None, t1: Option[Double] = None): Long
  /** Seconds until a record at relativeTime expires given a retention of
    * `steps` buckets; 0 when already past the horizon; None if unbounded.
    */
  def ttl(steps: Option[Int], relativeTime: Option[Double], now: Double): Option[Long]
}

/** Seconds-since-epoch buckets: bucket = floor(ts / step).
  * Reference: kairos timeseries.py:65-133. */
final case class RelativeTime(step: Long) extends BucketCalc {
  // floor (not truncate-toward-zero) so pre-1970 timestamps bucket the
  // same way as the column twin TimeColumns.bucket (floor(unix_ts/step))
  def toBucket(ts: Double, steps: Int = 0): Long = math.floor(ts / step).toLong + steps
  def fromBucket(bucket: Long): Long = bucket * step
  def buckets(start: Long, end: Long): Seq[Long] =
    toBucket(start.toDouble) to toBucket(end.toDouble)
  def stepSize(t0: Option[Double] = None, t1: Option[Double] = None): Long =
    (t0, t1) match {
      case (Some(a), Some(b)) =>
        val tb0 = toBucket(a)
        val tb1 = toBucket(b, steps = 1) // "end" of second bucket
        if (tb0 == tb1) step else fromBucket(tb1) - fromBucket(tb0)
      case _ => step
    }
  def ttl(steps: Option[Int], relativeTime: Option[Double], now: Double): Option[Long] =
    steps.filter(_ != 0).map { s =>
      relativeTime match {
        case Some(rt) =>
          val rtime = toBucket(rt)
          val ntime = toBucket(now)
          if (ntime - rtime > s) 0L else (s + rtime - ntime) * step
        case None => s.toLong * step
      }
    }
}

/** Calendar buckets encoded as the integer value of strftime formats
  * `%Y%m%d` / `%Y%U` / `%Y%m` / `%Y` — e.g. 2024-01-31 daily = 20240131.
  * Reference: kairos timeseries.py:135-264, including two quirks this
  * mirrors exactly:
  *  - weekly uses C-strftime `%U` (week of year, Sunday-start; days
  *    before the first Sunday are week 0), timeseries.py:145-150;
  *  - weekly fromBucket is Jan1 + week*7 days (NOT the week-0 Sunday),
  *    replicating the reference's strptime workaround, :191-206.
  * All math in UTC (the reference uses utcfromtimestamp on the read
  * path; the session timezone is pinned UTC in build.sbt).
  */
final case class GregorianTime(unit: String) extends BucketCalc {
  import GregorianTime._

  def toBucket(ts: Double, steps: Int = 0): Long = {
    var dt = LocalDateTime.ofEpochSecond(math.floor(ts).toLong,
      ((ts - math.floor(ts)) * 1e9).toInt, ZoneOffset.UTC)
    if (steps != 0) dt = unit match {
      case "daily"   => dt.plusDays(steps.toLong)
      case "weekly"  => dt.plusWeeks(steps.toLong)
      case "monthly" => dt.plusMonths(steps.toLong)
      case "yearly"  => LocalDateTime.of(dt.getYear + steps, 1, 1, 0, 0)
    }
    format(dt.toLocalDate)
  }

  private def format(d: LocalDate): Long = unit match {
    case "daily"   => d.getYear.toLong * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
    case "weekly"  => d.getYear.toLong * 100 + weekU(d)
    case "monthly" => d.getYear.toLong * 100 + d.getMonthValue
    case "yearly"  => d.getYear.toLong
  }

  /** Start-of-bucket date. Weekly replicates Jan1 + week*7d. */
  def fromBucketDate(bucket: Long): LocalDate = unit match {
    case "daily" =>
      LocalDate.of((bucket / 10000).toInt, ((bucket / 100) % 100).toInt, (bucket % 100).toInt)
    case "weekly" =>
      LocalDate.of((bucket / 100).toInt, 1, 1).plusWeeks(bucket % 100)
    case "monthly" =>
      LocalDate.of((bucket / 100).toInt, (bucket % 100).toInt, 1)
    case "yearly" =>
      LocalDate.of(bucket.toInt, 1, 1)
  }

  def fromBucket(bucket: Long): Long =
    fromBucketDate(bucket).atStartOfDay(ZoneOffset.UTC).toEpochSecond

  def buckets(start: Long, end: Long): Seq[Long] = {
    // walk whole steps from start until we pass end (timeseries.py:208-227)
    val rval = scala.collection.mutable.ArrayBuffer(toBucket(start.toDouble))
    var step = 1
    var done = false
    while (!done) {
      val bucket = toBucket(start.toDouble, step)
      val bucketTime = fromBucket(bucket)
      if (bucketTime >= end) {
        if (bucketTime == end) rval += bucket
        done = true
      } else {
        rval += bucket
        step += 1
      }
    }
    rval.toSeq
  }

  def stepSize(t0: Option[Double], t1: Option[Double] = None): Long = {
    val a = t0.getOrElse(throw new IllegalArgumentException("gregorian step_size needs t0"))
    val tb0 = toBucket(a)
    val tb1 = t1 match {
      case Some(b) => toBucket(b, steps = 1)
      case None    => toBucket(a, steps = 1)
    }
    val days = ChronoUnit.DAYS.between(fromBucketDate(tb0), fromBucketDate(tb1))
    days * 86400L
  }

  def ttl(steps: Option[Int], relativeTime: Option[Double], now: Double): Option[Long] =
    steps.filter(_ != 0).map { s =>
      val stepDiffDays = s.toLong * TimeStep.SimpleSeconds(unit.head) / 86400L
      relativeTime match {
        case Some(rt) =>
          val rb = toBucket(rt); val nb = toBucket(now)
          val dayDiff = ChronoUnit.DAYS.between(fromBucketDate(rb), fromBucketDate(nb))
          if (dayDiff > stepDiffDays) 0L else (stepDiffDays - dayDiff) * 86400L
        case None => stepDiffDays * 86400L
      }
    }
}

object GregorianTime {
  /** C-strftime %U: week of year, Sunday as first day; days before the
    * first Sunday are week 0. glibc: (yday + 7 - wday) / 7 with yday
    * 0-based and wday Sunday=0. */
  def weekU(d: LocalDate): Int = {
    val yday0 = d.getDayOfYear - 1
    val wdaySun0 = d.getDayOfWeek.getValue % 7 // MON=1..SUN=7 -> SUN=0
    (yday0 + 7 - wdaySun0) / 7
  }
}
