package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression, TruncTimestamp}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.tables.SnapshotTable.FileEntry

/**
 * Metadata-only aggregates: a global `count(*)` / `min(col)` / `max(col)`
 * over an unfiltered graft relation is answered from the manifest's
 * per-file row counts and column bounds — zero tasks, zero bytes read —
 * instead of scanning every file (the optimization Delta ships for its
 * stats-bearing tables). At 100 TB the difference is a full-corpus scan
 * vs an O(files) driver-side fold that was already paid for at commit
 * time; `max(event_ts)` — the incremental-pipeline watermark query — is
 * the canonical beneficiary.
 *
 * Safety gates, each of which keeps the scan when unmet:
 *  - the relation is a [[GraftTable]] with NO pending MoR deltas;
 *  - every output column is a bare non-distinct unfiltered `count(*)`,
 *    `min(col)`, or `max(col)`;
 *  - count: every live file's row count is known;
 *  - min/max: the column is the RELATION's own attribute (matched by
 *    exprId — a projected alias shadowing a column name must not hit the
 *    stats of the column it shadows), of an exactly-representable stats
 *    type (integral/float/double/date/timestamp — strings are excluded:
 *    footer bounds are code-point ordered and may be truncated), and
 *    every live file carries harvested bounds for it or is provably
 *    all-NULL (`nullCount == rows`; NaN-bearing float chunks get no
 *    footer bounds at all, so they fail this gate rather than mis-answer).
 *
 * Runs in the operator-optimization batch, BEFORE V2ScanRelationPushDown
 * turns the relation into a scan. Shapes this rule refuses (e.g. a mix
 * involving `count(col)`) get a second chance at the DSv2 layer:
 * [[GraftScanBuilder]] implements `SupportsPushDownAggregates` with
 * conservative integral/date/timestamp gates, which also serves
 * catalog-only deployments that never install the extensions.
 */
object MetadataOnlyAgg extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // the expression-shape gate runs FIRST: an unanswerable aggregate
    // (sum, avg, grouping…) must not cost a manifest read on every
    // optimizer fixed-point iteration
    case agg @ Aggregate(groupless, exprs, child, _)
        if groupless.isEmpty && exprs.nonEmpty && exprs.forall(isSupportedShape) =>
      (for {
        rel <- relationOf(child)
        g <- rel.table match { case g: GraftTable => Some(g); case _ => None }
        files <- g.statsFiles
        values <- traverse(exprs.map(answer(_, rel, files)))
      } yield LocalRelation(agg.output, Seq(InternalRow.fromSeq(values))))
        .getOrElse(agg)
    // `GROUP BY date_trunc('day', ts)` — the idiomatic spelling of the
    // metadata time GROUP BY — and its MIXED form `GROUP BY state,
    // date_trunc('month', ts)`, the canonical reporting shape. Spark's
    // V2ExpressionBuilder never translates date_trunc, so the DSv2
    // aggregate-pushdown layer (which serves the `EXTRACT(F FROM
    // CAST(ts AS date))` spelling, identity keys included) never even
    // sees these; this Catalyst-level case serves them with the SAME
    // proofs: trunc keys by per-file period constancy (trunc(min) ==
    // trunc(max) at the format's nailing granularity — quarter/week
    // reconstruct from the months/days proof), identity keys by the
    // per-file single-value proof the SPJ layout derivation already
    // trusts (exact stats, min == max, zero nulls — writer-exact
    // strings included), UTC-session-gated for zoned timestamps
    // (date_trunc truncates in the session zone; the manifest's
    // truncation is UTC calendar). Anything unprovable keeps the
    // scan — never a wrong tuple.
    case agg @ Aggregate(groupExprs, exprs, _, _)
        if groupExprs.nonEmpty && exprs.nonEmpty =>
      serveTruncGrouped(agg).getOrElse(agg)
  }

  /** Group-key forms the grouped metadata serve accepts, each carrying
   *  its per-file proof obligation. At least one [[TruncKey]] is
   *  required before the manifest is consulted: identity-only GROUP
   *  BYs already serve (partially pushed) through the DSv2 aggregate
   *  path, and intercepting them here would churn plans that are
   *  already right. */
  private sealed trait KeyProof { def attr: AttributeReference }
  private final case class TruncKey(
      attr: AttributeReference, unit: String, rec: Long => Long) extends KeyProof
  private final case class IdentityKey(attr: AttributeReference) extends KeyProof

  /** The date_trunc grouped serve, or None to keep the plan. By the
   *  time user optimizer rules run, PullOutGroupingExpressions has
   *  hoisted complex group keys into a Project below the Aggregate
   *  (`_groupingexpression#N`), so keys arrive as attributes resolved
   *  through that Project's aliases. All syntactic gates run before the
   *  manifest is consulted. */
  private def serveTruncGrouped(agg: Aggregate): Option[LogicalPlan] = {
    val (aliases, inner) = agg.child match {
      case p: Project =>
        (p.projectList.collect {
          case a @ Alias(c, _) => a.exprId -> c
        }.toMap[org.apache.spark.sql.catalyst.expressions.ExprId, Expression],
          p.child)
      case other =>
        (Map.empty[org.apache.spark.sql.catalyst.expressions.ExprId, Expression], other)
    }
    def resolved(e: Expression): Expression = e match {
      case a: AttributeReference => aliases.getOrElse(a.exprId, a)
      case other => other
    }
    val keyParts = agg.groupingExpressions.map(e => keyProof(resolved(e)))
    if (keyParts.exists(_.isEmpty)) return None
    if (!keyParts.flatten.exists(_.isInstanceOf[TruncKey])) return None
    if (!agg.aggregateExpressions.forall(e =>
        isSupportedShape(e) || isGroupKeyOutput(e, agg.groupingExpressions) ||
          derivedOfKeys(e, agg.groupingExpressions)))
      return None
    for {
      rel <- relationOf(inner)
      g <- rel.table match { case g: GraftTable => Some(g); case _ => None }
      files <- g.statsFiles
      rows <- truncGroupedRows(keyParts.flatten, agg.groupingExpressions,
        agg.aggregateExpressions, rel, g, files)
    } yield LocalRelation(agg.output, rows)
  }

  /** date_trunc formats this rule can prove from per-file bounds:
   *  format → (granularity whose per-file constancy nails the key,
   *  reconstruction of the truncated value from that granularity's
   *  trunc micros). QUARTER proves at months and WEEK at days — finer
   *  than the key itself, so constancy transfers; files in the same
   *  quarter but different months simply land in the same group. */
  private def truncUnit(fmt: String): Option[(String, Long => Long)] = {
    val DayMicros = 86400000000L
    def dateOf(micros: Long) =
      java.time.LocalDate.ofEpochDay(Math.floorDiv(micros, DayMicros))
    fmt match {
      case "YEAR" | "YYYY" | "YY" => Some(("years", identity))
      case "MONTH" | "MON" | "MM" => Some(("months", identity))
      case "DAY" | "DD" => Some(("days", identity))
      case "HOUR" => Some(("hours", identity))
      case "QUARTER" => Some(("months", m => {
        val d = dateOf(m)
        d.withMonth((d.getMonthValue - 1) / 3 * 3 + 1).toEpochDay * DayMicros
      }))
      case "WEEK" => Some(("days", m =>
        dateOf(m).`with`(java.time.temporal.TemporalAdjusters
          .previousOrSame(java.time.DayOfWeek.MONDAY)).toEpochDay * DayMicros))
      case _ => None
    }
  }

  /** Syntactic gate: `date_trunc(<literal supported fmt>, <timestamp
   *  column>)`. Zone gates run on the expression's own BAKED zone ids
   *  (set at analysis) — a zoned trunc serves only when it truncates in
   *  UTC (the manifest's calendar). An NTZ column arrives wrapped in a
   *  session-zone `CAST(ts AS TIMESTAMP)` (date_trunc's NTZ semantics
   *  ARE zone-dependent in Spark); the cast is a micros no-op exactly
   *  when its zone is UTC, so that is the only form unwrapped. Relation
   *  identity is re-checked in [[truncGroupedRows]]. */
  private def truncParts(e: Expression)
      : Option[(AttributeReference, String, Long => Long)] = e match {
    case t @ TruncTimestamp(Literal(fmt: UTF8String, StringType), src, _) =>
      val attr: Option[AttributeReference] = src match {
        case a: AttributeReference
            if a.dataType == TimestampNTZType ||
              (a.dataType == TimestampType &&
                t.timeZoneId.forall(SargableTimePredicates.isUtcZone)) =>
          Some(a)
        case c: org.apache.spark.sql.catalyst.expressions.Cast
            if c.dataType == TimestampType &&
              c.timeZoneId.forall(SargableTimePredicates.isUtcZone) &&
              t.timeZoneId.forall(SargableTimePredicates.isUtcZone) =>
          c.child match {
            case a: AttributeReference if a.dataType == TimestampNTZType => Some(a)
            case _ => None
          }
        case _ => None
      }
      val up = fmt.toString.toUpperCase(java.util.Locale.ROOT)
      for { a <- attr; (unit, rec) <- truncUnit(up) } yield (a, unit, rec)
    case _ => None
  }

  /** The proof form of one group key: a trunc-like expression, or a
   *  bare relation attribute whose per-file single value
   *  [[graft.tables.SnapshotTable.fileSingleValue]] may prove (the
   *  file-level gates run later, against the manifest). Types
   *  fileSingleValue never serves (arrays, structs, non-exact-flagged
   *  strings of foreign files) refuse there, per file. */
  private def keyProof(e: Expression): Option[KeyProof] = e match {
    case a: AttributeReference => Some(IdentityKey(a))
    case other => truncParts(other).map { case (a, unit, rec) => TruncKey(a, unit, rec) }
  }

  /** Is this output column just (an alias of) one of the group keys? */
  private def isGroupKeyOutput(e: NamedExpression, keys: Seq[Expression]): Boolean =
    e match {
      case Alias(c, _) => keys.exists(_.semanticEquals(c))
      case c => keys.exists(_.semanticEquals(c))
    }

  /** An output that is a DETERMINISTIC pure function of the
   *  attribute-form group keys — `CAST(key AS STRING/DATE)`,
   *  `date_format(key, …)` — the shapes CollapseProject folds into the
   *  aggregate output list when users dress the key for display.
   *  Evaluated per group on the driver by substituting each key
   *  attribute with its group's literal value. */
  private def derivedOfKeys(e: NamedExpression, keys: Seq[Expression]): Boolean = {
    val keyIds = keys.collect { case a: AttributeReference => a.exprId }.toSet
    val body = e match { case Alias(c, _) => c; case c => c }
    body.deterministic && body.references.nonEmpty &&
      body.references.forall(r => keyIds.contains(r.exprId)) &&
      !body.exists(_.isInstanceOf[AggregateExpression])
  }

  /** One InternalRow per distinct group-key tuple, or None to keep the
   *  scan: refuses when any file's trunc value or identity value is
   *  unprovable, any key column isn't the relation's own attribute, or
   *  (for zoned-timestamp trunc keys) the session zone isn't UTC. */
  private def truncGroupedRows(
      keys: Seq[KeyProof],
      groupExprs: Seq[Expression],
      exprs: Seq[NamedExpression],
      rel: DataSourceV2Relation,
      g: GraftTable,
      files: Seq[FileEntry]): Option[Seq[InternalRow]] = {
    val zonedOk = keys.forall {
      case TruncKey(a, _, _) =>
        a.dataType == TimestampNTZType ||
          SargableTimePredicates.isUtcZone(
            g.table.spark.sessionState.conf.sessionLocalTimeZone)
      case _: IdentityKey => true // single-value proof is zone-free
    }
    if (!zonedOk) return None
    if (!keys.forall(k => rel.output.exists(_.exprId == k.attr.exprId)))
      return None
    val schema = g.schema()
    val keyed: Seq[(Seq[Any], FileEntry)] = files.map { f =>
      val tuple: Seq[Any] = keys.map {
        case TruncKey(a, unit, rec) =>
          g.table.fileTruncValue(f, a.name, unit, schema) match {
            case Some(m) => rec(m)
            case None => return None
          }
        case IdentityKey(a) =>
          g.table.fileSingleValue(f, a.name, schema) match {
            case Some(v) => v
            case None => return None
          }
      }
      (tuple, f)
    }
    val rows = keyed.groupBy(_._1).toSeq.sortBy(_._1.mkString("|"))
      .map { case (tuple, kfs) =>
        val sub = kfs.map(_._2)
        val keyIdx = groupExprs.zipWithIndex.collect {
          case (a: AttributeReference, i) => a.exprId -> i
        }.toMap
        val values = exprs.map { e =>
          if (isGroupKeyOutput(e, groupExprs)) {
            val keyExpr = e match { case Alias(c, _) => c; case c => c }
            val i = groupExprs.indexWhere(_.semanticEquals(keyExpr))
            Some(tuple(i): Any)
          } else if (derivedOfKeys(e, groupExprs)) {
            val body = e match { case Alias(c, _) => c; case c => c }
            val bound = body.transform {
              case a: AttributeReference if keyIdx.contains(a.exprId) =>
                Literal(tuple(keyIdx(a.exprId)), a.dataType)
            }
            try Some(bound.eval(InternalRow.empty))
            catch { case scala.util.control.NonFatal(_) => return None }
          } else answer(e, rel, sub)
        }
        traverse(values) match {
          case Some(vs) => InternalRow.fromSeq(vs)
          case None => return None
        }
      }
    Some(rows)
  }

  /** Cheap syntactic pre-filter: could this output column EVER be
   *  stats-answerable? (The full gates re-check against the files.) */
  private def isSupportedShape(e: NamedExpression): Boolean = {
    def ok(ae: AggregateExpression): Boolean =
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(_) => true
        case Min(_: AttributeReference) | Max(_: AttributeReference) => true
        case _ => false
      })
    e match {
      case Alias(ae: AggregateExpression, _) => ok(ae)
      case ae: AggregateExpression => ok(ae)
      case _ => false
    }
  }

  /** The bare graft relation beneath the aggregate — an intervening
   *  Project is fine (attribute identity is re-checked by exprId), an
   *  intervening Filter is not. */
  private def relationOf(plan: LogicalPlan): Option[DataSourceV2Relation] = plan match {
    case r: DataSourceV2Relation => Some(r)
    case Project(_, child) => relationOf(child)
    case _ => None
  }

  private def traverse(xs: Seq[Option[Any]]): Option[Seq[Any]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** The aggregate's exact answer from stats, or None to keep the scan.
   *  `Some(null)` is a real answer: min/max of an empty or all-NULL
   *  column is SQL NULL. */
  private def answer(
      e: NamedExpression,
      rel: DataSourceV2Relation,
      files: Seq[FileEntry]): Option[Any] = e match {
    case Alias(ae: AggregateExpression, _) => answerAgg(ae, rel, files)
    case ae: AggregateExpression => answerAgg(ae, rel, files)
    case _ => None
  }

  private def answerAgg(
      ae: AggregateExpression,
      rel: DataSourceV2Relation,
      files: Seq[FileEntry]): Option[Any] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case Count(children) if children.forall {
            case l: Literal => l.value != null
            case _ => false
          } =>
        if (files.forall(_.rows >= 0)) Some(files.map(_.rows).sum) else None
      case Min(a: AttributeReference) => bound(a, rel, files, takeMin = true)
      case Max(a: AttributeReference) => bound(a, rel, files, takeMin = false)
      case _ => None
    }
  }

  private val exactTypes: Set[DataType] = Set(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    DateType, TimestampType, TimestampNTZType)

  private def bound(
      a: AttributeReference,
      rel: DataSourceV2Relation,
      files: Seq[FileEntry],
      takeMin: Boolean): Option[Any] = {
    if (!rel.output.exists(_.exprId == a.exprId)) return None
    if (!exactTypes.contains(a.dataType)) return None
    val perFile = files.map { f =>
      f.stats.get(a.name).orElse {
        val matches = f.stats.keys.filter(_.equalsIgnoreCase(a.name))
        if (matches.size == 1) f.stats.get(matches.head) else None
      }.map(cs => (cs, f.rows))
    }
    if (perFile.exists(_.isEmpty)) return None // a file without harvested stats
    val bounds = perFile.flatten.flatMap { case (cs, rows) =>
      val b = if (takeMin) cs.min else cs.max
      b match {
        case Some(s) => Some(Some(s))
        // boundless entry: provably all-NULL (ignored by min/max) or
        // unusable stats (unsupported physical type, e.g. INT96 from a
        // converted table; NaN-bearing chunks) — only the former is safe
        case None if rows >= 0 && cs.nullCount.contains(rows) => None
        case None => Some(None)
      }
    }
    if (bounds.exists(_.isEmpty)) return None // some file's bound is unknown
    val parsed = bounds.flatten.map(parse(_, a.dataType))
    if (parsed.isEmpty) Some(null) // empty table or all rows NULL
    else Some(parsed.reduce((x, y) => pick(x, y, a.dataType, takeMin)))
  }

  /** Stats strings are written in the column's natural domain
   *  (integral/date/timestamp → long, float/double → double) by
   *  `readFooterStats`; the InternalRow value domain matches exactly
   *  (date = days int, timestamp = micros long). */
  private def parse(s: String, dt: DataType): Any = dt match {
    case ByteType => s.toLong.toByte
    case ShortType => s.toLong.toShort
    case IntegerType | DateType => s.toLong.toInt
    case LongType | TimestampType | TimestampNTZType => s.toLong
    case FloatType => s.toDouble.toFloat
    case DoubleType => s.toDouble
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  private def pick(x: Any, y: Any, dt: DataType, takeMin: Boolean): Any = {
    val cmp = dt match {
      case FloatType =>
        java.lang.Float.compare(x.asInstanceOf[Float], y.asInstanceOf[Float])
      case DoubleType =>
        java.lang.Double.compare(x.asInstanceOf[Double], y.asInstanceOf[Double])
      case _ => java.lang.Long.compare(
        x.asInstanceOf[Number].longValue(), y.asInstanceOf[Number].longValue())
    }
    if ((cmp <= 0) == takeMin) x else y
  }
}
