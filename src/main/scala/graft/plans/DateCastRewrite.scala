package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Optimizer rule: rewrite day-granularity comparisons of the form
  * `CAST(ts AS DATE) <op> DATE 'd'` into raw-timestamp bounds
  * (SURVEY.md §4 "custom rules"; the reference's own SQL idiom is
  * `Date(timestamp) >= Date(%s)`, `viz.py:140-148`).
  *
  * `to_date(ts) >= d`  ⇒ `ts >= d 00:00:00`
  * `to_date(ts) <= d`  ⇒ `ts <  (d+1) 00:00:00`
  * `to_date(ts) = d`   ⇒ conjunction of both
  * (and the mirrored literal-on-the-left forms)
  *
  * Why: a function-wrapped column defeats parquet predicate pushdown,
  * row-group skipping, and date partition pruning; the rewritten bare-column
  * bounds reach the scan. Semantics are identical for non-null `ts` under
  * the engine's fixed UTC session zone (GraftSession) — the rule only fires
  * for UTC-or-unset cast time zones.
  */
object DateCastRewrite extends Rule[LogicalPlan] {

  private val MicrosPerDay = 86400000000L

  private def utcZone(tz: Option[String]): Boolean =
    tz.forall(z => z == "UTC" || z == "Etc/UTC" || z == "Z")

  /** Matches CAST(ts AS DATE) where ts is a TIMESTAMP column/expr. */
  private object DayCast {
    def unapply(e: Expression): Option[Expression] = e match {
      case c @ Cast(ts, DateType, _, _)
          if ts.dataType == TimestampType && utcZone(c.timeZoneId) => Some(ts)
      case _ => None
    }
  }

  private def tsLit(days: Int): Literal =
    Literal(days.toLong * MicrosPerDay, TimestampType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      f.copy(condition = cond.transformUp {
        case GreaterThanOrEqual(DayCast(ts), Literal(d: Int, DateType)) =>
          GreaterThanOrEqual(ts, tsLit(d))
        case LessThanOrEqual(DayCast(ts), Literal(d: Int, DateType)) =>
          LessThan(ts, tsLit(d + 1))
        case GreaterThan(DayCast(ts), Literal(d: Int, DateType)) =>
          GreaterThanOrEqual(ts, tsLit(d + 1))
        case LessThan(DayCast(ts), Literal(d: Int, DateType)) =>
          LessThan(ts, tsLit(d))
        case EqualTo(DayCast(ts), Literal(d: Int, DateType)) =>
          And(GreaterThanOrEqual(ts, tsLit(d)), LessThan(ts, tsLit(d + 1)))
        // mirrored literal-first forms
        case GreaterThanOrEqual(Literal(d: Int, DateType), DayCast(ts)) =>
          LessThan(ts, tsLit(d + 1))
        case LessThanOrEqual(Literal(d: Int, DateType), DayCast(ts)) =>
          GreaterThanOrEqual(ts, tsLit(d))
        case GreaterThan(Literal(d: Int, DateType), DayCast(ts)) =>
          LessThan(ts, tsLit(d))
        case LessThan(Literal(d: Int, DateType), DayCast(ts)) =>
          GreaterThanOrEqual(ts, tsLit(d + 1))
        case EqualTo(Literal(d: Int, DateType), DayCast(ts)) =>
          And(GreaterThanOrEqual(ts, tsLit(d)), LessThan(ts, tsLit(d + 1)))
      })
  }
}

/** `SparkSessionExtensions` entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DateCastRewrite)
    e.injectOptimizerRule(_ => BoundedLevenshteinRewrite)
    // SQL-name registration for the native vector expression, so
    // `SELECT dot_product_d(a, b)` works alongside the Column API.
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product_d"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.VectorExpressions.DotProductD].getName,
        "dot_product_d"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.VectorExpressions.DotProductD(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("l2sq_d"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.VectorExpressions.L2SqD].getName,
        "l2sq_d"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.VectorExpressions.L2SqD(exprs(0), exprs(1))))
    // The remaining native expressions, SQL-named so a pure-SQL user of
    // the library reaches every custom kernel without the Column API.
    def inject1(name: String, clazz: Class[_],
                b: org.apache.spark.sql.catalyst.expressions.Expression =>
                  org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          clazz.getName, name),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          b(exprs.head)))
    inject1("wkb_point_decode",
      classOf[graft.functions.GeoFunctions.WkbPointDecode],
      graft.functions.GeoFunctions.WkbPointDecode(_))
    inject1("image_header",
      classOf[graft.functions.MediaFunctions.ImageHeader],
      graft.functions.MediaFunctions.ImageHeader(_))
    inject1("audio_header",
      classOf[graft.functions.MediaFunctions.AudioHeader],
      graft.functions.MediaFunctions.AudioHeader(_))
    inject1("video_header",
      classOf[graft.functions.MediaFunctions.VideoHeader],
      graft.functions.MediaFunctions.VideoHeader(_))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("wkb_point_encode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.GeoFunctions.WkbPointEncode].getName,
        "wkb_point_encode"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GeoFunctions.WkbPointEncode(exprs(0), exprs(1))))
  }
}
