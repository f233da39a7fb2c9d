package graft.model

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

import graft.ops.CohortFilter
import graft.ops.CohortFilter.AttrFilter

/** Serializable cohort-analysis query (SURVEY.md §1.1 "Query-session state",
  * §3.1 step 1): the engine's IR for the reference input page's selections
  * (`viz.py:589-615`) and its replayable query history
  * (`script/query_history.py:2-19`).
  *
  * JSON round-trips via json4s (ships with Spark), so any frontend — the
  * reference's NL→filter LLM path included (`script/utils.py:105-176`,
  * out of engine scope) — can emit a QuerySpec.
  */
final case class QuerySpec(
    subjectSelection: CohortSelection,
    controlSelection: CohortSelection,
    startDate: String, // inclusive, "yyyy-MM-dd" (day granularity, S2)
    endDate: String,   // inclusive
    timeOfDayRanges: Seq[TodRange] = QuerySpec.DefaultTodRanges,
    realTime: Boolean = false,
    windowSizeSec: Int = 60,
    fastForward: Double = 1.0) {

  def toJson: String = Serialization.write(this)(QuerySpec.formats)
}

/** Subject/control selection mode: all, explicit ids, or attribute filters
  * (`viz.py:622-635`).
  */
sealed trait CohortSelection { def filters(): Seq[AttrFilter] }
case object AllUsers extends CohortSelection {
  def filters(): Seq[AttrFilter] = Seq.empty
}
final case class ByIds(idCol: String, ids: Seq[String]) extends CohortSelection {
  def filters(): Seq[AttrFilter] = Seq(CohortFilter.IdIn(idCol, ids))
}
final case class ByAttributes(attrFilters: Seq[AttrFilter]) extends CohortSelection {
  def filters(): Seq[AttrFilter] = attrFilters
}

/** Labeled time-of-day range, possibly crossing midnight (P11). */
final case class TodRange(label: String, start: String, end: String)

object QuerySpec {
  /** Reference defaults: Workout / afternoon / Sleep (`viz.py:542-547`). */
  val DefaultTodRanges: Seq[TodRange] = Seq(
    TodRange("Workout", "06:45:00", "09:30:00"),
    TodRange("Afternoon", "12:30:00", "16:00:00"),
    TodRange("Sleep", "20:00:00", "04:45:00"))

  // IdIn (Seq[Any]) is intentionally NOT a JSON hint — id selections
  // serialize through ByIds(Seq[String]); Spark coerces the comparison.
  private[model] implicit val formats: Formats =
    Serialization.formats(ShortTypeHints(List(
      classOf[ByIds], classOf[ByAttributes], AllUsers.getClass,
      classOf[CohortFilter.NumericRange], classOf[CohortFilter.CategoricalIn],
      classOf[CohortFilter.DateTimeRange], classOf[CohortFilter.BooleanEq],
      classOf[CohortFilter.Contains])))

  def fromJson(json: String): QuerySpec =
    JsonMethods.parse(json).extract[QuerySpec](formats, implicitly)
}
