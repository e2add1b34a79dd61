package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Rewrites the IDIOMATIC time predicates into sargable ranges on the raw
 * timestamp column, inside `Filter` conditions:
 *
 *   - `date_trunc('DAY', ts) = TIMESTAMP'2024-01-05'` →
 *     `ts >= '2024-01-05' AND ts < '2024-01-06'`
 *   - `CAST(ts AS DATE) >= DATE'2024-01-05'` → `ts >= '2024-01-05'`
 *   (all comparison operators, plus literal IN-lists)
 *
 * Spark's V2ExpressionBuilder translates neither `date_trunc` nor (for
 * pruning purposes) the date-cast comparison, so the most natural
 * spelling of a time filter reaches no pushdown layer at all — no
 * parquet row-group skipping, no manifest stats pruning, no DPP — and a
 * 100 TB "one day of data" query silently scans the corpus. The
 * rewritten range is a plain predicate on the column, which every layer
 * already serves.
 *
 * Soundness:
 *  - Each rewritten leaf is THREE-VALUED-LOGIC equivalent to the
 *    original (null ts propagates null through the range comparisons
 *    exactly as it does through the trunc/cast), so the rewrite is safe
 *    anywhere in the condition tree, including under NOT. An unaligned
 *    equality literal (`date_trunc('DAY', ts) = '.. 10:30'`) becomes an
 *    empty range — false for non-null ts, null for null ts — which
 *    pruning then serves as "no files".
 *  - Zoned timestamps rewrite only when the expression's BAKED zone id
 *    is UTC (`date_trunc`/cast truncate in the session zone; the range
 *    arithmetic here is UTC-calendar). TIMESTAMP_NTZ is zone-free. The
 *    session-zone cast Spark wraps around an NTZ argument unwraps only
 *    when its own zone is UTC (a micros no-op), mirroring
 *    [[MetadataOnlyAgg]]'s gates.
 *  - `<=>` (null-safe equality) is NOT rewritten: its false-on-null
 *    semantics differ from the null-propagating range.
 */
object SargableTimePredicates extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      val rewritten = rewrite(f.condition)
      if (rewritten.fastEquals(f.condition)) f else f.copy(condition = rewritten)
  }

  /** Zone-id gate shared by every zoned rewrite here and by
   *  [[MetadataOnlyAgg]]: any id that NORMALIZES to UTC (`Etc/UTC`,
   *  `GMT`, `UT`, `+00:00`, `Z`, …) is semantically the UTC calendar —
   *  comparing the raw string to `"UTC"` would silently drop the
   *  rewrite for those sessions (missed optimization, never wrong). */
  private[sql] def isUtcZone(id: String): Boolean =
    try java.time.ZoneId.of(id).normalized() == java.time.ZoneOffset.UTC
    catch { case _: java.time.DateTimeException => false }

  private val DayMicros = 86400000000L

  /** (source timestamp expression, unit tag) when `e` is a rewritable
   *  trunc-like expression. The unit tag drives [[truncU]]/[[next]]. */
  private def truncOf(e: Expression): Option[(Expression, String)] = e match {
    case t @ TruncTimestamp(Literal(fmt: UTF8String, StringType), src, _) =>
      val unit = fmt.toString.toUpperCase(java.util.Locale.ROOT) match {
        case "YEAR" | "YYYY" | "YY" => Some("year")
        case "QUARTER" => Some("quarter")
        case "MONTH" | "MON" | "MM" => Some("month")
        case "WEEK" => Some("week")
        case "DAY" | "DD" => Some("day")
        case "HOUR" => Some("hour")
        case "MINUTE" => Some("minute")
        case "SECOND" => Some("second")
        case _ => None
      }
      for {
        u <- unit
        s <- unwrapTs(src, truncZoneOk = t.timeZoneId.forall(isUtcZone))
      } yield (s, u)
    case _ => None
  }

  /** The raw timestamp expression beneath a (possibly cast-wrapped)
   *  trunc argument, gated on UTC zone ids where zones matter. */
  private def unwrapTs(src: Expression, truncZoneOk: Boolean): Option[Expression] =
    src match {
      case s if s.dataType == TimestampNTZType => Some(s)
      case s if s.dataType == TimestampType && truncZoneOk => Some(s)
      case c: Cast
          if c.dataType == TimestampType && truncZoneOk &&
            c.timeZoneId.forall(isUtcZone) &&
            c.child.dataType == TimestampNTZType =>
        Some(c.child)
      case _ => None
    }

  /** `CAST(ts AS DATE)` — day-trunc in disguise (UTC-gated for zoned). */
  private def dateCastOf(e: Expression): Option[Expression] = e match {
    case c: Cast if c.dataType == DateType =>
      c.child match {
        case s if s.dataType == TimestampNTZType => Some(s)
        case s if s.dataType == TimestampType && c.timeZoneId.forall(isUtcZone) =>
          Some(s)
        case _ => None
      }
    case _ => None
  }

  private def truncU(micros: Long, unit: String): Long = unit match {
    case "second" => Math.floorDiv(micros, 1000000L) * 1000000L
    case "minute" => Math.floorDiv(micros, 60000000L) * 60000000L
    case "hour" => Math.floorDiv(micros, 3600000000L) * 3600000000L
    case "day" => Math.floorDiv(micros, DayMicros) * DayMicros
    case "week" =>
      java.time.LocalDate.ofEpochDay(Math.floorDiv(micros, DayMicros))
        .`with`(java.time.temporal.TemporalAdjusters
          .previousOrSame(java.time.DayOfWeek.MONDAY))
        .toEpochDay * DayMicros
    case "month" | "quarter" | "year" =>
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(micros, DayMicros))
      val t = unit match {
        case "month" => d.withDayOfMonth(1)
        case "quarter" => d.withDayOfMonth(1).withMonth((d.getMonthValue - 1) / 3 * 3 + 1)
        case "year" => d.withDayOfYear(1)
      }
      t.toEpochDay * DayMicros
  }

  /** The next unit boundary strictly after the ALIGNED micros `a`. */
  private def next(a: Long, unit: String): Long = unit match {
    case "second" => a + 1000000L
    case "minute" => a + 60000000L
    case "hour" => a + 3600000000L
    case "day" => a + DayMicros
    case "week" => a + 7 * DayMicros
    case "month" | "quarter" | "year" =>
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(a, DayMicros))
      val t = unit match {
        case "month" => d.plusMonths(1)
        case "quarter" => d.plusMonths(3)
        case "year" => d.plusYears(1)
      }
      t.toEpochDay * DayMicros
  }

  /** Literal micros of a comparison operand, when its type matches the
   *  trunc output (timestamp of either flavor) or is a DATE. */
  private def litMicros(e: Expression): Option[Long] = e match {
    case Literal(v: Long, TimestampType | TimestampNTZType) => Some(v)
    case Literal(v: Int, DateType) => Some(v.toLong * DayMicros)
    case _ => None
  }

  private def tsLit(micros: Long, ts: Expression): Literal = ts.dataType match {
    // DATE targets take the days value; every boundary that can reach a
    // DATE target (year starts) is day-aligned
    case DateType => Literal(Math.floorDiv(micros, DayMicros).toInt, DateType)
    case dt => Literal(micros, dt)
  }

  /** Range translation of `trunc(ts) <cmp> v` — see scaladoc derivation:
   *  with a = trunc(v), ceil = (v aligned ? v : next(a)):
   *  >= → ts >= ceil; < → ts < ceil; > → ts >= next(a);
   *  <= → ts < next(a); = → ts >= ceil AND ts < next(a). */
  private def range(ts: Expression, unit: String, v: Long, cmp: String): Expression = {
    val a = truncU(v, unit)
    val ceil = if (a == v) v else next(a, unit)
    cmp match {
      case ">=" => GreaterThanOrEqual(ts, tsLit(ceil, ts))
      case "<" => LessThan(ts, tsLit(ceil, ts))
      case ">" => GreaterThanOrEqual(ts, tsLit(next(a, unit), ts))
      case "<=" => LessThan(ts, tsLit(next(a, unit), ts))
      case "=" =>
        And(GreaterThanOrEqual(ts, tsLit(ceil, ts)),
          LessThan(ts, tsLit(next(a, unit), ts)))
    }
  }

  private def flip(cmp: String): String = cmp match {
    case ">=" => "<="
    case "<=" => ">="
    case ">" => "<"
    case "<" => ">"
    case "=" => "="
  }

  /** trunc-like side of a comparison: (ts, unit) for date_trunc, day
   *  unit for the date cast. */
  private def truncSide(e: Expression): Option[(Expression, String)] =
    truncOf(e).orElse(dateCastOf(e).map(_ -> "day"))

  /** `year(ts)` — the one EXTRACT whose value classes are contiguous
   *  time ranges (month/quarter/day-of-x repeat across periods and
   *  cannot become a single range). `year(ts)` analyzes as
   *  `Year(CAST(ts AS DATE))`; the int literal maps to the Jan-1
   *  boundary and the aligned-case range formulas apply verbatim. */
  private def yearSide(e: Expression): Option[Expression] = e match {
    case Year(c) => dateCastOf(c).orElse(c match {
      // a plain DATE column: rewriting to a date range is equally
      // sargable and zone-free
      case d if d.dataType == DateType => Some(d)
      case _ => None
    })
    case _ => None
  }

  private def yearMicros(y: Int): Long =
    java.time.LocalDate.of(y, 1, 1).toEpochDay * DayMicros

  /** Year literal of a `year(ts)` comparison/IN operand. The 1–9999
   *  bound keeps the range arithmetic inside LocalDate's comfort zone;
   *  out-of-range years simply keep the original predicate. */
  private def yearLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) if v >= 1 && v <= 9999 => Some(v)
    case _ => None
  }

  /** `date_format(ts, 'yyyy-MM-dd')` — the STRING spelling of the date
   *  cast, rewritable for EQUALITY only: lexicographic string order is
   *  NOT chronological once years leave four digits, so `>=`-class
   *  comparisons stay. The zone gates mirror [[dateCastOf]]. */
  private def dateFormatSide(e: Expression): Option[Expression] = e match {
    case d @ DateFormatClass(src, Literal(fmt: UTF8String, StringType), _)
        if fmt.toString == "yyyy-MM-dd" =>
      unwrapTs(src, truncZoneOk = d.timeZoneId.forall(isUtcZone))
    case _ => None
  }

  /** The canonical `yyyy-MM-dd` literal as a LocalDate. Only the strict
   *  zero-padded 4-digit-year form rewrites: that is the one shape the
   *  formatter's output can take for years 1–9999, so equality against
   *  anything else never constrains `ts` this rewrite could serve
   *  (non-canonical spellings keep the original predicate — sound, the
   *  comparison just stays unpushed). Spark's formatter prints proleptic
   *  years (BCE with a leading '-' — PlanSpec asserts the property, so a
   *  formatter-semantics change fails loudly), meaning a signless
   *  4-digit literal can only match a CE-year timestamp. */
  private val DateStr = "^(\\d{4})-(\\d{2})-(\\d{2})$".r
  private def dateStrLit(e: Expression): Option[java.time.LocalDate] = e match {
    case Literal(s: UTF8String, StringType) => s.toString match {
      case DateStr(y, m, d) =>
        try Some(java.time.LocalDate.of(y.toInt, m.toInt, d.toInt))
        catch { case _: java.time.DateTimeException => None }
      case _ => None
    }
    case _ => None
  }

  /** The rewrite over one Filter condition. (The `graft_scan_stats` TVF
   *  replays it by OPTIMIZING the pasted predicate against the table's
   *  frame — this rule is injected there — rather than calling in.) */
  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case cmp @ BinaryComparison(l, r) =>
      val op = cmp match {
        case _: EqualTo => Some("=")
        case _: GreaterThanOrEqual => Some(">=")
        case _: GreaterThan => Some(">")
        case _: LessThanOrEqual => Some("<=")
        case _: LessThan => Some("<")
        case _ => None // EqualNullSafe: false-on-null differs from the range
      }
      op.flatMap { o =>
        def dfmtEq(side: Expression, lit: Expression): Option[Expression] =
          if (o != "=") None
          else dateFormatSide(side).zip(dateStrLit(lit)).headOption
            .map { case (ts, d) => range(ts, "day", d.toEpochDay * DayMicros, "=") }
        truncSide(l).zip(litMicros(r)).headOption
          .map { case ((ts, u), v) => range(ts, u, v, o) }
          .orElse(truncSide(r).zip(litMicros(l)).headOption
            .map { case ((ts, u), v) => range(ts, u, v, flip(o)) })
          .orElse(yearSide(l).zip(yearLit(r)).headOption
            .map { case (ts, y) => range(ts, "year", yearMicros(y), o) })
          .orElse(yearSide(r).zip(yearLit(l)).headOption
            .map { case (ts, y) => range(ts, "year", yearMicros(y), flip(o)) })
          .orElse(dfmtEq(l, r))
          .orElse(dfmtEq(r, l))
      }.getOrElse(cmp)
    case in @ In(t, list) if list.nonEmpty && list.length <= 64 &&
        truncSide(t).isDefined && list.forall(litMicros(_).isDefined) =>
      val (ts, u) = truncSide(t).get
      list.map(l => range(ts, u, litMicros(l).get, "="))
        .reduceLeft[Expression](Or(_, _))
    // `year(ts) IN (2023, 2024)` — each member is its own year range;
    // 3VL matches the comparison case (null ts → every disjunct null)
    case in @ In(t, list) if list.nonEmpty && list.length <= 64 &&
        yearSide(t).isDefined && list.forall(yearLit(_).isDefined) =>
      val ts = yearSide(t).get
      list.map(l => range(ts, "year", yearMicros(yearLit(l).get), "="))
        .reduceLeft[Expression](Or(_, _))
    // null checks over the trunc-like family collapse onto the source
    // column (a recognized trunc/cast/year/date_format of `ts` is null
    // IFF `ts` is null — the format literal is known-valid, so no
    // null-producing path remains). InferFiltersFromConstraints derives
    // `IsNotNull(date_trunc(…))` from every rewritten comparison; in
    // that form the guard defeats stats pruning and the filtered
    // metadata serve, in this form both consume it.
    case inn @ IsNotNull(e) =>
      truncSide(e).map(_._1).orElse(yearSide(e)).orElse(dateFormatSide(e))
        .map(IsNotNull).getOrElse(inn)
    case isn @ IsNull(e) =>
      truncSide(e).map(_._1).orElse(yearSide(e)).orElse(dateFormatSide(e))
        .map(IsNull).getOrElse(isn)
  }
}
