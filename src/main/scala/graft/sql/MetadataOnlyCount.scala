package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BinaryComparison, Expression, Literal, NamedExpression, TruncTimestamp}
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
 *    type (integral/float/double/date/timestamp, plus strings whose
 *    every bound carries the writer-exact flag — unflagged string
 *    bounds may be truncated and must not answer), and
 *    every live file carries harvested bounds for it or is provably
 *    all-NULL (`nullCount == rows`; NaN-bearing float chunks get no
 *    footer bounds at all, so they fail this gate rather than mis-answer);
 *  - count(col): every live file knows rows and the column's nullCount.
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
        (conjuncts, rel) <- unwrap(child)
        g <- rel.table match { case g: GraftTable => Some(g); case _ => None }
        files <- g.statsFiles
        accepted <- filterFiles(conjuncts, rel, g, files)
        values <- traverse(exprs.map(answer(_, rel, accepted)))
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
      (conjuncts, rel) <- unwrap(inner)
      g <- rel.table match { case g: GraftTable => Some(g); case _ => None }
      files <- g.statsFiles
      accepted <- filterFiles(conjuncts, rel, g, files)
      rows <- truncGroupedRows(keyParts.flatten, agg.groupingExpressions,
        agg.aggregateExpressions, rel, g, accepted)
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

  /** The graft relation beneath the aggregate plus the conjuncts of any
   *  intervening Filters — Projects are fine (attribute identity is
   *  re-checked by exprId), Filters are collected for the per-file
   *  all-or-nothing proof in [[filterFiles]], anything else refuses. */
  private def unwrap(plan: LogicalPlan)
      : Option[(Seq[Expression], DataSourceV2Relation)] = plan match {
    case r: DataSourceV2Relation => Some((Nil, r))
    case Project(_, child) => unwrap(child)
    case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
      unwrap(child).map { case (cs, r) => (conjunctsOf(cond) ++ cs, r) }
    case _ => None
  }

  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjunctsOf(l) ++ conjunctsOf(r)
    case other => Seq(other)
  }

  /** Exact-stats domains the all-in/all-out filter proof compares in.
   *  Float/double are EXCLUDED here even though min/max serves them:
   *  IEEE signed zero and Spark's NaN ordering make "does this
   *  comparison hold for every row" subtler than a bounds check, and a
   *  wrong all-in would return wrong rows (min/max only ever returns a
   *  value some row holds). Strings compare in UTF8String binary order
   *  (Spark's string ordering); footer bounds are CONSERVATIVE order
   *  bounds even when truncated (truncated min ≤ true min, incremented
   *  max ≥ true max), which every proof direction here tolerates except
   *  string-equality ALL-IN — that one requires the writer-exact flag,
   *  matching [[graft.tables.SnapshotTable.fileSingleValue]]'s
   *  discipline. */
  private val filterProofTypes: Set[DataType] = Set(
    ByteType, ShortType, IntegerType, LongType,
    DateType, TimestampType, TimestampNTZType, StringType)

  /** Pre-parsed proof tree of one filter condition: comparison /
   *  null-check / IN leaves over relation attributes, composed by
   *  And/Or. [[PUnknown]] marks an unprovable sub-shape — it can never
   *  decide a file by itself, but an Or whose OTHER branch proves
   *  all-in still decides (sound: all-in of one disjunct implies all-in
   *  of the Or). */
  private sealed trait PTree
  private case class PAnd(l: PTree, r: PTree) extends PTree
  private case class POr(l: PTree, r: PTree) extends PTree
  private case class PComp(attr: AttributeReference, op: String,
      lit: Either[Long, String]) extends PTree
  private case class PIn(attr: AttributeReference,
      lits: Seq[Either[Long, String]]) extends PTree
  private case class PNotNull(attr: AttributeReference) extends PTree
  private case object PUnknown extends PTree

  /** The subset of `files` a filtered aggregate may fold, or None to
   *  keep the scan. Serves the canonical time-bounded report —
   *  `WHERE ts >= A AND ts < B GROUP BY date_trunc('DAY', ts)` — and
   *  its IN/OR variants (`date_trunc IN (d1, d2)` arrives as the
   *  sargable rewrite's Or-of-ranges; `state IN ('CA','NY')` as an In
   *  leaf) from the manifest alone: every live file must prove it
   *  passes the filter WHOLLY (every row satisfies it: zero nulls and
   *  bounds deciding every needed branch) or fails it WHOLLY (no row
   *  can satisfy it — null rows fail every comparison, so an all-NULL
   *  file is wholly out). One file that could straddle refuses the
   *  whole serve. */
  private def filterFiles(
      conjuncts: Seq[Expression],
      rel: DataSourceV2Relation,
      g: GraftTable,
      files: Seq[FileEntry]): Option[Seq[FileEntry]] = {
    if (conjuncts.isEmpty) return Some(files)
    def litOf(v: Any): Option[Either[Long, String]] = v match {
      case s: UTF8String => Some(Right(s.toString))
      case n: Number => Some(Left(n.longValue()))
      case _ => None
    }
    def attrOk(a: AttributeReference): Boolean =
      filterProofTypes.contains(a.dataType) &&
        rel.output.exists(_.exprId == a.exprId)
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo, GreaterThan, GreaterThanOrEqual, In => CIn, IsNotNull => CIsNotNull, LessThan, LessThanOrEqual, Or => COr}
    def flip(op: String): String = op match {
      case ">=" => "<="; case "<=" => ">="; case ">" => "<"; case "<" => ">"
      case other => other
    }
    def shape(e: Expression): PTree = e match {
      case CAnd(l, r) => PAnd(shape(l), shape(r))
      case COr(l, r) => POr(shape(l), shape(r))
      case CIsNotNull(a: AttributeReference) if attrOk(a) => PNotNull(a)
      case CIn(a: AttributeReference, list) if attrOk(a) &&
          list.forall { case Literal(_, dt) => dt == a.dataType; case _ => false } =>
        // NULL members match no row (x IN (null, v) is null-or-match):
        // dropping them is exact for both proof directions
        val ls = list.collect { case Literal(v, _) if v != null => litOf(v) }
        if (ls.exists(_.isEmpty)) PUnknown else PIn(a, ls.flatten)
      case cmp @ BinaryComparison(l, r) =>
        val op = cmp match {
          case _: EqualTo => Some("=")
          case _: GreaterThanOrEqual => Some(">=")
          case _: GreaterThan => Some(">")
          case _: LessThanOrEqual => Some("<=")
          case _: LessThan => Some("<")
          case _ => None
        }
        def side(a: Expression, lit: Expression, o: String): Option[PTree] =
          (a, lit) match {
            case (attr: AttributeReference, Literal(v, dt))
                if v != null && dt == attr.dataType && attrOk(attr) =>
              litOf(v).map(PComp(attr, o, _))
            case _ => None
          }
        op.flatMap(o => side(l, r, o).orElse(side(r, l, flip(o))))
          .getOrElse(PUnknown)
      case _ => PUnknown
    }
    val trees = conjuncts.map(shape)
    // a top-level conjunct that is ENTIRELY unknown can never prove in,
    // so no file could be wholly in — refuse before touching the files
    if (trees.contains(PUnknown)) return None
    val schema = g.schema()
    // resolve per the SESSION's case sensitivity (this proof decides
    // row-affecting in/out verdicts, like provablyNoNulls): under a
    // case-sensitive session require the exact name; ambiguity (two
    // fields differing only in case) refuses — None = undecided, the
    // file keeps the scan
    val filterCaseSensitive =
      org.apache.spark.sql.internal.SQLConf.get.caseSensitiveAnalysis
    def statsOf(f: FileEntry, name: String)
        : Option[graft.tables.SnapshotTable.ColStats] = {
      val matches = schema.fields.filter(_.name.equalsIgnoreCase(name))
      val resolved =
        if (filterCaseSensitive) matches.find(_.name == name)
        else if (matches.length == 1) matches.headOption
        else None
      resolved.flatMap(fl => f.stats.get(fl.name))
    }
    // tri-state per (file, tree): Some(true)=every row satisfies,
    // Some(false)=no row satisfies, None=undecided
    def verdict(f: FileEntry, t: PTree): Option[Boolean] = t match {
      case PUnknown => None
      case PAnd(l, r) => (verdict(f, l), verdict(f, r)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case POr(l, r) => (verdict(f, l), verdict(f, r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case PNotNull(a) =>
        statsOf(f, a.name).flatMap(_.nullCount).flatMap { n =>
          if (n == 0L) Some(true)
          else if (f.rows >= 0 && n == f.rows) Some(false)
          else None
        }
      case PIn(a, lits) =>
        if (lits.isEmpty) Some(false) // only-NULL members: no row matches
        else {
          val per = lits.map(l => verdict(f, PComp(a, "=", l)))
          if (per.exists(_.contains(true))) Some(true)
          else if (per.forall(_.contains(false))) Some(false)
          else None
        }
      case PComp(a, op, lit) =>
        val cs = statsOf(f, a.name).getOrElse(return None)
        // an all-NULL file fails every comparison wholly (3VL: null
        // compares to null, filtered) — out, even with no bounds
        if (f.rows >= 0 && cs.nullCount.contains(f.rows)) return Some(false)
        // sign of (bound − lit) in the literal's domain; None when the
        // bound doesn't parse there
        def cmpB(bound: String): Option[Int] = lit match {
          case Left(l) => bound.toLongOption.map(java.lang.Long.compare(_, l))
          case Right(s) => Some(UTF8String.fromString(bound)
            .compareTo(UTF8String.fromString(s)))
        }
        val bounds = for {
          mnS <- cs.min; mxS <- cs.max
          mn <- cmpB(mnS); mx <- cmpB(mxS)
        } yield (mn, mx)
        bounds.flatMap { case (mnC, mxC) =>
          // string-equality all-in needs VERBATIM bounds (exact flag):
          // truncated bounds are only conservative order bounds
          val eqExactOk = lit.isLeft || cs.exact.contains(true)
          val in = cs.nullCount.contains(0L) && (op match {
            case ">=" => mnC >= 0
            case ">" => mnC > 0
            case "<=" => mxC <= 0
            case "<" => mxC < 0
            case "=" => mnC == 0 && mxC == 0 && eqExactOk
          })
          val out = op match {
            case ">=" => mxC < 0
            case ">" => mxC <= 0
            case "<=" => mnC > 0
            case "<" => mnC >= 0
            case "=" => mnC > 0 || mxC < 0
          }
          if (in) Some(true) else if (out) Some(false) else None
        }
    }
    val kept = Seq.newBuilder[FileEntry]
    for (f <- files) {
      val vs = trees.map(verdict(f, _))
      if (vs.contains(Some(false))) () // wholly out: excluded
      else if (vs.forall(_.contains(true))) kept += f
      else return None // could straddle: refuse the serve
    }
    Some(kept.result())
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
      // count(col) = Σ (rows − nullCount) — the DSv2 layer's rule,
      // served here too so FILTERED and trunc-GROUPED shapes get it
      case Count(Seq(a: AttributeReference))
          if rel.output.exists(_.exprId == a.exprId) =>
        val perFile = files.map { f =>
          if (f.rows < 0) None
          else f.stats.get(a.name).orElse {
            val m = f.stats.keys.filter(_.equalsIgnoreCase(a.name)).toSeq
            if (m.size == 1) f.stats.get(m.head) else None
          }.flatMap(_.nullCount).map(n => f.rows - n)
        }
        if (perFile.exists(_.isEmpty)) None else Some(perFile.flatten.sum)
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
    val isString = a.dataType == StringType
    if (!exactTypes.contains(a.dataType) && !isString) return None
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
        // string bounds serve ONLY writer-exact (verbatim) values:
        // parquet footer string bounds may be truncated/incremented,
        // and min/max must return a value some row actually holds
        // (q134's rule, here for the Catalyst grouped/filtered serves)
        case Some(_) if isString && !cs.exact.contains(true) => Some(None)
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
    else {
      val r = parsed.reduce((x, y) => pick(x, y, a.dataType, takeMin))
      Some(if (isString) UTF8String.fromString(r.asInstanceOf[String]) else r)
    }
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
    case StringType => s
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  private def pick(x: Any, y: Any, dt: DataType, takeMin: Boolean): Any = {
    val cmp = dt match {
      case FloatType =>
        java.lang.Float.compare(x.asInstanceOf[Float], y.asInstanceOf[Float])
      case DoubleType =>
        java.lang.Double.compare(x.asInstanceOf[Double], y.asInstanceOf[Double])
      // UTF8String binary order — exactly Spark's string comparison
      case StringType => UTF8String.fromString(x.asInstanceOf[String])
        .compareTo(UTF8String.fromString(y.asInstanceOf[String]))
      case _ => java.lang.Long.compare(
        x.asInstanceOf[Number].longValue(), y.asInstanceOf[Number].longValue())
    }
    if ((cmp <= 0) == takeMin) x else y
  }
}
