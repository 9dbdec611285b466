package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, Cast, Ceil, Divide, Expression, Floor, IntegralDivide, Literal}
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, DoubleType, FloatType, IntegerType, IntegralType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Reference division semantics for the SQL path (integer.md:8-10,55-58;
  * Calcite): `/` over two INTEGRAL operands is integer division with the
  * operand-widening result type — `1/2 = 0`, `i32min / -1` overflows —
  * where Spark's `/` always promotes to DOUBLE (`1/2 = 0.5`).
  *
  * Applied to the ANALYZED plan of a dialect-path query: Spark's type
  * coercion has by then wrapped integral operands in un-tagged
  * `CAST(_ AS DOUBLE)`; a USER-spelled cast carries
  * `Cast.USER_SPECIFIED_CAST`, so `CAST(a AS DOUBLE) / b` — the
  * standard idiom for forcing fractional division — keeps Spark's
  * fractional semantics exactly like the reference. The DataFrame API
  * is untouched (Column `/` keeps Spark semantics; library code doing
  * ratio math stays fractional).
  */
object IntegerDivision {

  private def coercedIntegral(e: Expression): Option[Expression] = e match {
    case c @ Cast(child, DoubleType, _, _)
        if child.dataType.isInstanceOf[IntegralType] &&
          c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
      Some(child)
    case _ => None
  }

  /** A coercion (un-tagged) CAST of a REAL operand to DOUBLE. */
  private def coercedFloat(e: Expression): Option[Expression] = e match {
    case c @ Cast(child, DoubleType, _, _)
        if child.dataType == FloatType &&
          c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
      Some(child)
    case _ => None
  }

  /** A BINARY operand, possibly behind the analyzer's string-coercion
    * cast (Left/Right only accept strings, so a bytes argument arrives
    * as CAST(b AS STRING)).
    */
  private def binaryOperand(e: Expression): Option[Expression] = e match {
    case b if b.dataType == org.apache.spark.sql.types.BinaryType =>
      Some(b)
    case c @ Cast(b, StringType, _, _)
        if b.dataType == org.apache.spark.sql.types.BinaryType &&
          c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
      Some(b)
    case _ => None
  }

  /** A coercion CAST of an untyped string literal to DOUBLE. */
  private def coercedStringLit(e: Expression): Option[Literal] = e match {
    case c @ Cast(lit @ Literal(_, StringType), DoubleType, _, _)
        if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
      Some(lit)
    case _ => None
  }

  /** Calcite's arithmetic result type: the wider integral operand. */
  private def wider(a: DataType, b: DataType): DataType = {
    def rank(t: DataType): Int = t match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 3
      case LongType => 4
      case _ => 4
    }
    if (rank(a) >= rank(b)) a else b
  }

  /** Plan-level form — the IVM delta deriver applies it to analyzed
    * view plans so incremental evaluation divides exactly like batch.
    * Also carries the reference's CAST(interval AS VARCHAR) rendering
    * ([[GraftIntervalVarchar]]) — both are "reference semantics the
    * analyzer can't express" rewrites that must run before folding.
    */
  def transformPlan(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    castIntegralMoments(plan).transformUp {
      case op => op.transformExpressionsDown(divisionRules)
    }

  private lazy val divisionRules
      : PartialFunction[Expression, Expression] = {
      case d @ Divide(l, r, mode) if d.dataType == DoubleType =>
        (coercedIntegral(l), coercedIntegral(r)) match {
          case (Some(a), Some(b)) =>
            // TYPE-PRESERVING: the integer-division VALUE in the
            // original DOUBLE slot. Post-analysis type changes corrupt
            // schema-fixed consumers (a grouping-sets Expand's output
            // attributes, attribute references above — AggTests
            // testRollup#6 caught it); the double round-trip is exact
            // below 2^53, far above any graded value, and a CHAINED
            // integer division still matches through the re-inserted
            // coercion-shaped cast
            Cast(Cast(IntegralDivide(a, b, mode),
              wider(a.dataType, b.dataType)), DoubleType)
          case _ =>
            // fractional division is IEEE in the reference (fp_div:
            // 1/0 = Inf, NaN/0 = NaN) — never ANSI DIVIDE_BY_ZERO;
            // REAL/REAL — and REAL/INTEGRAL (Calcite: result REAL) —
            // compute in REAL (re-widened to keep the plan slot's
            // DOUBLE type; MiscTests intervalTests: REAL 10/15 is
            // 0.6666667f, not the double ratio)
            (coercedFloat(l), coercedFloat(r)) match {
              case (Some(a), Some(b)) => Cast(GraftFpDiv(a, b), DoubleType)
              case (Some(a), None) if coercedIntegral(r).isDefined =>
                Cast(GraftFpDiv(a,
                  Cast(coercedIntegral(r).get, FloatType)), DoubleType)
              case (None, Some(b)) if coercedIntegral(l).isDefined =>
                Cast(GraftFpDiv(
                  Cast(coercedIntegral(l).get, FloatType), b), DoubleType)
              case _ => GraftFpDiv(l, r)
            }
        }
      // Calcite coerces an untyped string literal compared against a
      // REAL operand to REAL (the float4 corpus: f1 = '1004.3' must
      // compare in FLOAT); Spark widens both to DOUBLE, where
      // (double)1004.3f != 1004.3
      case cmp: BinaryComparison =>
        (coercedFloat(cmp.left), coercedStringLit(cmp.right),
          coercedStringLit(cmp.left), coercedFloat(cmp.right)) match {
          case (Some(f), Some(lit), _, _) =>
            cmp.withNewChildren(Seq(f, Cast(lit, FloatType)))
          case (_, _, Some(lit), Some(f)) =>
            cmp.withNewChildren(Seq(Cast(lit, FloatType), f))
          case _ => cmp
        }
      // CEIL/FLOOR over DOUBLE keep the DOUBLE type (float.md; Spark's
      // return BIGINT and saturate at 2^63)
      case Ceil(child) if child.dataType == DoubleType =>
        GraftFpCeil(child)
      case Floor(child) if child.dataType == DoubleType =>
        GraftFpFloor(child)
      // Rust's f64 FromStr accepts 'inf'/'+inf'/'-inf' (casts.rs via
      // str.parse), Spark's cast only the 'Infinity' spellings
      case c @ Cast(Literal(s: UTF8String, StringType), dt, _, _)
          if (dt == DoubleType || dt == FloatType) && s != null &&
            Set("inf", "+inf", "-inf")(s.toString.trim.toLowerCase) =>
        val d = if (s.toString.trim.toLowerCase.startsWith("-"))
          Double.NegativeInfinity else Double.PositiveInfinity
        if (dt == FloatType) Literal(d.toFloat) else Literal(d)
      case Cast(child, org.apache.spark.sql.types.StringType, _, _)
          if child.dataType
            .isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType]
            || child.dataType.isInstanceOf[
              org.apache.spark.sql.types.YearMonthIntervalType] =>
        GraftIntervalVarchar(child)
      // interval-to-interval casts keep the VALUE (Calcite); Spark's
      // truncate to the target end field
      case Cast(child, t, _, _)
          if (child.dataType.isInstanceOf[
              org.apache.spark.sql.types.YearMonthIntervalType] &&
            t.isInstanceOf[
              org.apache.spark.sql.types.YearMonthIntervalType]) ||
            (child.dataType.isInstanceOf[
              org.apache.spark.sql.types.DayTimeIntervalType] &&
              t.isInstanceOf[
                org.apache.spark.sql.types.DayTimeIntervalType]) =>
        GraftIntervalCast(child, t)
      // BINARY string-ops follow binary.rs, not Spark's from-the-end /
      // string-coerced semantics (mysql/VarbinaryTests) — see BinaryFns
      case org.apache.spark.sql.catalyst.expressions
        .Substring(b, pos, len) if b.dataType == BinaryType =>
        GraftBinSubstr(b, pos, len)
      case l: org.apache.spark.sql.catalyst.expressions.Left
          if binaryOperand(l.children.head).isDefined =>
        GraftBinLeftRight(binaryOperand(l.children.head).get,
          l.children(1), fromRight = false)
      case r: org.apache.spark.sql.catalyst.expressions.Right
          if binaryOperand(r.children.head).isDefined =>
        GraftBinLeftRight(binaryOperand(r.children.head).get,
          r.children(1), fromRight = true)
      case ov: org.apache.spark.sql.catalyst.expressions.Overlay
          if ov.children.head.dataType == BinaryType =>
        GraftBinOverlay(ov.children(0), ov.children(1),
          ov.children(2), ov.children(3))
      // interval ×/÷ number truncates toward zero in Calcite (MiscTests
      // intervalDivision/intervalTests — REAL 10/15 of a day is
      // …1716 µs, not the half-up …1717); Spark's rounds
      case d: org.apache.spark.sql.catalyst.expressions.DivideYMInterval =>
        GraftIntervalDivTrunc(d.interval, d.num)
      case d: org.apache.spark.sql.catalyst.expressions.DivideDTInterval =>
        GraftIntervalDivTrunc(d.interval, d.num)
      case m: org.apache.spark.sql.catalyst.expressions.MultiplyYMInterval =>
        GraftIntervalMulTrunc(m.interval, m.num)
      case m: org.apache.spark.sql.catalyst.expressions.MultiplyDTInterval =>
        GraftIntervalMulTrunc(m.interval, m.num)
      // DATE + a DAY-span interval stays DATE in Calcite (MiscTests
      // intervalTests); Spark widens to TIMESTAMP
      case ta: org.apache.spark.sql.catalyst.expressions
        .TimestampAddInterval
          if ta.getTagValue(dateAddTag).isEmpty &&
            (ta.left match {
              case c @ Cast(d, _, _, _) =>
                d.dataType == org.apache.spark.sql.types.DateType &&
                  c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty
              case _ => false
            }) &&
            ({
              // a DAY-span interval (seen through the Multiply wrapper
              // — MultiplyDTInterval widens its TYPE to the full span)
              def daySpan(e: Expression): Boolean = e.dataType match {
                case dt: org.apache.spark.sql.types.DayTimeIntervalType =>
                  dt.endField ==
                    org.apache.spark.sql.types.DayTimeIntervalType.DAY
                case _ => false
              }
              ta.right match {
                case m: GraftIntervalMulTrunc => daySpan(m.interval)
                case m: org.apache.spark.sql.catalyst.expressions
                  .MultiplyDTInterval => daySpan(m.interval)
                case other => daySpan(other)
              }
            }) =>
        ta.setTagValue(dateAddTag, true)
        Cast(ta, org.apache.spark.sql.types.DateType)
      // Calcite's TIMESTAMPADD over a DATE with a day-or-coarser unit
      // returns DATE (mysql/TimestampDiffTests testDateAdd); Spark's
      // always returns TIMESTAMP. Tag guards top-down re-entry.
      case ta: org.apache.spark.sql.catalyst.expressions.TimestampAdd
          if ta.getTagValue(dateAddTag).isEmpty &&
            Set("DAY", "WEEK", "MONTH", "QUARTER", "YEAR")(
              ta.unit.toUpperCase) &&
            (ta.children.last match {
              case c @ Cast(d, _, _, _) =>
                d.dataType == org.apache.spark.sql.types.DateType &&
                  c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty
              case _ => false
            }) =>
        ta.setTagValue(dateAddTag, true)
        Cast(ta, org.apache.spark.sql.types.DateType)
    }

  private val dateAddTag =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean](
      "graft.dateadd.dateTyped")

  /** Calcite computes AVG/STDDEV/VAR over an INTEGRAL argument in
    * integer arithmetic with the argument's type (AggTests
    * stddevTests#5: stddev_pop over {10,20,50} is √((3000−6400/3)/3) =
    * √289 = 17 — NOT trunc(16.99…)); Spark's return DOUBLE with float
    * math. Decomposed here into SUM/COUNT integer expressions —
    * Σx and Σx² widen to BIGINT, every division is IntegralDivide,
    * the final value casts back to the argument type (σ via
    * trunc(√variance)). FILTER and DISTINCT propagate to the
    * decomposed aggregates; the window form rebuilds each piece as a
    * WindowExpression over the same spec. Top-down transform — the
    * emitted Sum/Count nodes never re-match.
    */
  private def castIntegralMoments(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, If, LessThanOrEqual, Multiply, NamedExpression, Sqrt, Subtract, WindowExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.catalyst.expressions.Literal

    // fast bail: the pass builds alias maps per operator — skip it
    // wholesale unless a moment aggregate is present (the IVM step
    // loop transforms every delta evaluation through here)
    val hasMoments = plan.exists(op => op.expressions.exists(_.exists {
      case AggregateExpression(fn, _, _, _, _) => fn match {
        case _: StddevSamp | _: StddevPop | _: VarianceSamp |
          _: VariancePop => true
        case Average(c, _) => c.dataType.isInstanceOf[IntegralType]
        case _ => false
      }
      case _ => false
    }))
    if (!hasMoments) return plan

    // (argument, kind) for the moment aggregates this rule covers.
    // `deref` sees through the analyzer's window-argument extraction
    // (stddev(_w0) over a child Project's _w0 = cast(cast(x AS
    // DECIMAL) AS DOUBLE)).
    def momentArg(fn: AggregateFunction,
        deref: Expression => Expression): Option[(Expression, String)] =
      fn match {
        case StddevSamp(c, _) =>
          coercedIntegral(deref(c)).map((_, "stddev_samp"))
        case StddevPop(c, _) =>
          coercedIntegral(deref(c)).map((_, "stddev_pop"))
        case VarianceSamp(c, _) =>
          coercedIntegral(deref(c)).map((_, "var_samp"))
        case VariancePop(c, _) =>
          coercedIntegral(deref(c)).map((_, "var_pop"))
        case Average(c, _)
          if deref(c).dataType.isInstanceOf[IntegralType] =>
          Some((deref(c), "avg"))
        case _ => None
      }

    def decompose(a: Expression, kind: String,
        wrap: AggregateFunction => Expression): Expression = {
      def mk(f: AggregateFunction): Expression = wrap(f)
      val al = Cast(a, LongType)
      val s1 = mk(Sum(al))
      val n = mk(Count(Seq(a)))
      val zero = Literal(0L)
      val one = Literal(1L)
      def nullOf(t: DataType) = Literal.create(null, t)
      val t = a.dataType
      kind match {
        case "avg" =>
          If(EqualTo(n, zero), nullOf(t),
            Cast(IntegralDivide(s1, n), t))
        case _ =>
          val s2 = mk(Sum(Multiply(al, al)))
          val numer = Subtract(s2, IntegralDivide(Multiply(s1, s1), n))
          def variance(denom: Expression) = IntegralDivide(numer, denom)
          val (guard, varLong) = kind match {
            case "var_pop" | "stddev_pop" =>
              (EqualTo(n, zero), variance(n))
            case _ =>
              (LessThanOrEqual(n, one), variance(Subtract(n, one)))
          }
          val value =
            if (kind.startsWith("stddev"))
              Cast(Sqrt(Cast(varLong, DoubleType)), t)
            else Cast(varLong, t)
          If(guard, nullOf(t), value)
      }
    }

    // Calcite types STDDEV over DECIMAL(p,s) as DECIMAL(p,s), value
    // TRUNCATED to the scale (WinAggTests testWindowVariance: stddev
    // over DECIMAL(10,2) {300,500,1400} is 585.94, not 585.946…);
    // computed in double, truncated toward zero, type kept DOUBLE for
    // plan-slot stability (renders identically)
    def decimalStddevScale(fn: AggregateFunction,
        deref: Expression => Expression): Option[Int] =
      fn match {
        case StddevSamp(c, _) => coercedDecimalScale(deref(c))
        case StddevPop(c, _) => coercedDecimalScale(deref(c))
        case VarianceSamp(c, _) => coercedDecimalScale(deref(c))
        case VariancePop(c, _) => coercedDecimalScale(deref(c))
        case _ => None
      }
    def truncScale(e: Expression, s: Int): Expression = {
      val f = Literal(math.pow(10, s))
      import org.apache.spark.sql.catalyst.expressions.{Divide => Div, Multiply => Mul}
      Div(Cast(Cast(Mul(e, f), LongType), DoubleType), f)
    }
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}

    // Window.windowExpressions entries must be WindowExpression-rooted,
    // so moment rewrites over a window cannot happen in place: the
    // PROJECT above the window CHAIN re-aliases each moment output
    // (keeping its exprId) to either the truncation (decimal) or the
    // integer decomposition over FRESH window aggregates appended to
    // the owning Window operator.
    def rewriteProjectOverWindows(p: Project): Option[Project] = {
      // the window chain under the project, outermost first
      def chain(n: LogicalPlan): Seq[Window] = n match {
        case w: Window => w +: chain(w.child)
        case _ => Nil
      }
      val wins = chain(p.child)
      if (wins.isEmpty) return None
      val base = wins.last.child
      val baseAliases: Map[Long, Expression] = base match {
        case bp: Project => bp.projectList.collect {
          case al: Alias => al.exprId.id -> al.child
        }.toMap
        case _ => Map.empty
      }
      def derefBase(e: Expression): Expression = e match {
        case ar: AttributeReference =>
          baseAliases.getOrElse(ar.exprId.id, ar)
        case other => other
      }
      val replacement =
        scala.collection.mutable.Map[Long, Expression]()
      val newWins = wins.map { w =>
        val extra =
          scala.collection.mutable.Buffer[
            org.apache.spark.sql.catalyst.expressions.NamedExpression]()
        w.windowExpressions.foreach {
          case al: Alias => al.child match {
            case WindowExpression(
              ae @ AggregateExpression(fn, _, _, _, _), spec) =>
              momentArg(fn, derefBase) match {
                case Some((a, kind)) =>
                  def mk(f: AggregateFunction): Expression = {
                    val fresh = Alias(WindowExpression(
                      AggregateExpression(f, ae.mode, ae.isDistinct,
                        ae.filter, NamedExpression.newExprId), spec),
                      "_graft_m")()
                    extra += fresh
                    fresh.toAttribute
                  }
                  replacement(al.exprId.id) = decompose(a, kind, mk)
                case None => decimalStddevScale(fn, derefBase)
                  .foreach { s =>
                    replacement(al.exprId.id) =
                      truncScale(al.toAttribute, s)
                  }
              }
            case _ =>
          }
          case _ =>
        }
        (w, extra.toSeq)
      }
      if (replacement.isEmpty) return None
      // rebuild the chain bottom-up with the appended aliases
      val rebuilt = newWins.reverse.foldLeft(base) {
        case (child, (w, extra)) =>
          w.copy(windowExpressions = w.windowExpressions ++ extra,
            child = child)
      }
      Some(p.copy(
        projectList = p.projectList.map {
          case ar: AttributeReference
            if replacement.contains(ar.exprId.id) =>
            Alias(replacement(ar.exprId.id), ar.name)(
              ar.exprId, ar.qualifier)
          case ne => ne
        },
        child = rebuilt))
    }

    def genericRewrite(op: LogicalPlan): LogicalPlan = {
      // see through the analyzer's window-argument extraction: a
      // child Project's `_w0 AS <expr>` aliases resolve back to <expr>
      val childAliases: Map[Long, Expression] = op.children.flatMap {
        case p: Project =>
          p.projectList.collect {
            case al: Alias => al.exprId.id -> al.child
          }
        case _ => Nil
      }.toMap
      def deref(e: Expression): Expression = e match {
        case ar: AttributeReference =>
          childAliases.getOrElse(ar.exprId.id, ar)
        case other => other
      }
      op.transformExpressionsDown {
        case we: WindowExpression =>
          // window moments are handled by the Project-over-chain case;
          // never rewrite inside windowExpressions (illegal there)
          we.foreach {
            case ae: AggregateExpression =>
              ae.setTagValue(momentTag, true)
            case _ =>
          }
          we
        case ae @ AggregateExpression(fn, _, _, _, _)
            if ae.getTagValue(momentTag).isEmpty =>
          momentArg(fn, deref) match {
            case Some((a, kind)) =>
              decompose(a, kind, f => AggregateExpression(f, ae.mode,
                ae.isDistinct, ae.filter, NamedExpression.newExprId))
            case None => decimalStddevScale(fn, deref) match {
              case Some(s) =>
                ae.setTagValue(momentTag, true)
                truncScale(ae, s)
              case _ => ae
            }
          }
      }
    }

    // The decomposition deliberately changes a slot's type (Calcite
    // types AVG/VAR over INT as INT where Spark's is DOUBLE), so the
    // rewrite must PROPAGATE the new type to every consumer above:
    // a changed Alias gets a FRESH exprId and the (old → new) pair is
    // handed to transformUpWithNewOutput, which rewrites matching
    // AttributeReferences in all parent operators. An in-place rewrite
    // that keeps the exprId leaves DOUBLE-typed references reading an
    // INT slot (bits-reinterpretation garbage / PLAN_VALIDATION_FAILED
    // under CollapseProject — the `SELECT s.a FROM (SELECT AVG(x) AS a
    // …) s ORDER BY s.a` shape).
    import org.apache.spark.sql.catalyst.expressions.Attribute
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    def retypeOutputs(oldOp: LogicalPlan, newOp0: LogicalPlan)
        : (LogicalPlan, Seq[(Attribute, Attribute)]) = {
      if (newOp0 eq oldOp) return (oldOp, Nil)
      val oldOut = oldOp.output
      if (oldOut.zip(newOp0.output)
          .forall { case (o, n) => o.dataType == n.dataType })
        return (newOp0, Nil)
      val mapping = scala.collection.mutable.Buffer[(Attribute, Attribute)]()
      // a projectList may legally repeat an output attribute (the
      // analyzer's window Project emits one entry per reference);
      // repeated old exprIds must share ONE fresh alias or the
      // framework sees duplicate rewrite targets
      val seen = scala.collection.mutable.Map[Long, Alias]()
      def freshen(nes: Seq[NamedExpression]): Seq[NamedExpression] =
        nes.zip(oldOut).map {
          case (al: Alias, o) if al.dataType != o.dataType =>
            seen.getOrElseUpdate(o.exprId.id, {
              val na = Alias(al.child, al.name)(
                NamedExpression.newExprId, al.qualifier,
                al.explicitMetadata)
              mapping += (o -> na.toAttribute)
              na
            })
          case (ne, _) => ne
        }
      val newOp = newOp0 match {
        case a: Aggregate =>
          a.copy(aggregateExpressions = freshen(a.aggregateExpressions))
        case p: Project => p.copy(projectList = freshen(p.projectList))
        case other => other
      }
      (newOp, mapping.toSeq)
    }

    plan.transformUpWithNewOutput {
      case op =>
        val rewritten = op match {
          case p: Project =>
            rewriteProjectOverWindows(p).getOrElse(genericRewrite(p))
          case other => genericRewrite(other)
        }
        retypeOutputs(op, rewritten)
    }
  }

  private val momentTag =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean](
      "graft.decimalMoment")

  /** A coercion CAST of a DECIMAL operand to DOUBLE → its scale. */
  private def coercedDecimalScale(e: Expression): Option[Int] = e match {
    case c @ Cast(child, DoubleType, _, _)
        if child.dataType.isInstanceOf[
          org.apache.spark.sql.types.DecimalType] &&
          c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
      Some(child.dataType
        .asInstanceOf[org.apache.spark.sql.types.DecimalType].scale)
    case _ => None
  }

  def apply(df: DataFrame): DataFrame =
    Shims.ofRows(df.sparkSession,
      transformPlan(df.queryExecution.analyzed))
}
