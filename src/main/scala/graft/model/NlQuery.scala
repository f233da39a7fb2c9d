package graft.model

import graft.ops.CohortFilter.{AttrFilter, CategoricalIn, NumericRange}

/** Deterministic rule-based NL→[[QuerySpec]] frontend.
  *
  * The reference's NL path prompts an external LLM to fill the same
  * structured slots (`script/utils.py:105-176`: subject/control age,
  * weight and height ranges, states of residence, user ids, start/end
  * dates, defaults retained for unmentioned slots) — out of engine scope
  * per SURVEY §2.8 F16. This parser covers that extraction surface with
  * grammar rules so the engine ships a WORKING dependency-free NL path;
  * an LLM frontend can still emit `QuerySpec` JSON directly and bypass it.
  *
  * Contract mirrored from the reference prompt:
  *   - the query names what to SHOW (subjects) and optionally what to
  *     COMPARE WITH (control group);
  *   - any slot the text does not mention keeps its value from `defaults`;
  *   - open-ended comparisons ("over 60 kg") close against the attribute's
  *     slider bounds, exactly like the reference UI's range widgets.
  *
  * Pure driver-side string work — nothing here touches a DataFrame.
  */
object NlQuery {

  /** Column/bounds mapping for the subjects table (reference defaults). */
  final case class Schema(
      ageCol: String = "age",
      weightCol: String = "weight",
      heightCol: String = "height",
      stateCol: String = "state_of_residence",
      idCol: String = "user_id",
      states: Seq[String] = UsStates,
      bounds: Map[String, (Double, Double)] = Map(
        "age" -> (0.0, 120.0),
        "weight" -> (0.0, 500.0),
        "height" -> (0.0, 300.0)))

  /** US state names (public knowledge; the reference's residence widget). */
  val UsStates: Seq[String] = Seq(
    "Alabama", "Alaska", "Arizona", "Arkansas", "California", "Colorado",
    "Connecticut", "Delaware", "Florida", "Georgia", "Hawaii", "Idaho",
    "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky", "Louisiana",
    "Maine", "Maryland", "Massachusetts", "Michigan", "Minnesota",
    "Mississippi", "Missouri", "Montana", "Nebraska", "Nevada",
    "New Hampshire", "New Jersey", "New Mexico", "New York",
    "North Carolina", "North Dakota", "Ohio", "Oklahoma", "Oregon",
    "Pennsylvania", "Rhode Island", "South Carolina", "South Dakota",
    "Tennessee", "Texas", "Utah", "Vermont", "Virginia", "Washington",
    "West Virginia", "Wisconsin", "Wyoming")

  private val Num = """(\d+(?:\.\d+)?)"""
  private val DateRe = """(\d{4}-\d{2}-\d{2})""".r

  // Clause splitter: everything after a "compare(d) with/to/against" (or
  // "versus"/"vs") marker describes the CONTROL group.
  private val ControlSplit =
    """(?i)\b(?:compared?\s+(?:them\s+|it\s+)?(?:with|to|against)|versus|vs\.?|control\s+group(?:\s+of)?[:]?)\b""".r

  /** Parse `text` over `defaults`: mentioned slots override, everything
    * else is retained (the reference prompt's explicit contract).
    */
  def parse(text: String, defaults: QuerySpec,
            schema: Schema = Schema()): QuerySpec = {
    val (subjText, ctrlText) = ControlSplit.findFirstMatchIn(text) match {
      case Some(m) => (text.substring(0, m.start), text.substring(m.end))
      case None    => (text, "")
    }
    val subjSel = clauseSelection(subjText, schema)
      .getOrElse(defaults.subjectSelection)
    val ctrlSel = clauseSelection(ctrlText, schema)
      .getOrElse(defaults.controlSelection)
    val (start, end) = dateWindow(text)
      .getOrElse((defaults.startDate, defaults.endDate))
    defaults.copy(subjectSelection = subjSel, controlSelection = ctrlSel,
      startDate = start, endDate = end)
  }

  /** A clause's cohort selection: explicit ids win (the reference treats
    * `selected_users` the same way); otherwise collected attribute
    * filters; None when the clause mentions nothing recognizable.
    */
  private def clauseSelection(clause: String,
                              schema: Schema): Option[CohortSelection] = {
    val ids = userIds(clause)
    if (ids.nonEmpty) return Some(ByIds(schema.idCol, ids))
    val filters = numericFilters(clause, schema) ++ stateFilter(clause, schema)
    if (filters.nonEmpty) Some(ByAttributes(filters)) else None
  }

  private val AttrKeywords: Seq[(String, Seq[String])] = Seq(
    "age" -> Seq("aged", "ages", "age", "years old", "year-old",
      "older", "younger"),
    "weight" -> Seq("weighing", "weighs", "weight", "weigh", "kg",
      "kilograms", "heavier", "lighter"),
    "height" -> Seq("height", "tall", "cm", "centimeters",
      "taller", "shorter"))

  private def attrCol(key: String, schema: Schema): String = key match {
    case "age"    => schema.ageCol
    case "weight" => schema.weightCol
    case _        => schema.heightCol
  }

  /** "users 3, 5 and 9" / "user ids 1,2,3" → the id list. */
  private[model] def userIds(clause: String): Seq[String] = {
    val re = """(?i)\busers?\s*(?:ids?\s*)?[:]?\s*((?:#?\d+)(?:\s*(?:,|and|&)\s*#?\d+)*)""".r
    re.findFirstMatchIn(clause) match {
      case Some(m) => """\d+""".r.findAllIn(m.group(1)).toSeq
      case None    => Seq.empty
    }
  }

  /** A numeric-range mention: position plus optionally-open bounds (an
    * open side closes against the claiming attribute's slider bounds).
    */
  private[model] final case class RangeCand(start: Int, end: Int,
      lo: Option[Double], hi: Option[Double])

  /** Every range pattern in the clause — "between X and Y", "X to Y" /
    * "X-Y", one-sided "over/under X" — EXCLUDING anything overlapping an
    * ISO date (the span pattern would otherwise read "2024-01" inside
    * "2024-01-05" as the range 2024..1).
    */
  private[model] def rangeCandidates(lower: String): Seq[RangeCand] = {
    val between = s"""between\\s+$Num\\s+and\\s+$Num""".r
    val span = s"""$Num\\s*(?:-|to)\\s*$Num""".r
    val over =
      s"""(?:over|above|more\\s+than|at\\s+least|older\\s+than|heavier\\s+than|taller\\s+than|>=?)\\s*$Num""".r
    val under =
      s"""(?:under|below|less\\s+than|at\\s+most|younger\\s+than|lighter\\s+than|shorter\\s+than|<=?)\\s*$Num""".r
    val dates = DateRe.findAllMatchIn(lower).map(m => (m.start, m.end)).toSeq
    def clearOfDates(a: Int, b: Int) =
      !dates.exists { case (ds, de) => a < de && b > ds }
    val all: Seq[RangeCand] =
      between.findAllMatchIn(lower).map(m => RangeCand(m.start, m.end,
        Some(m.group(1).toDouble), Some(m.group(2).toDouble))).toSeq ++
      span.findAllMatchIn(lower).map(m => RangeCand(m.start, m.end,
        Some(m.group(1).toDouble), Some(m.group(2).toDouble))).toSeq ++
      over.findAllMatchIn(lower).map(m => RangeCand(m.start, m.end,
        Some(m.group(1).toDouble), None)).toSeq ++
      under.findAllMatchIn(lower).map(m => RangeCand(m.start, m.end,
        None, Some(m.group(1).toDouble))).toSeq
    // Two-sided patterns were collected first, so a same-position overlap
    // resolves to the more specific reading.
    all.filter(c => clearOfDates(c.start, c.end))
      .distinctBy(_.start).sortBy(_.start)
  }

  /** Attribute ranges with GLOBAL arbitration: each candidate belongs to
    * the attribute whose keyword sits nearest to it (within 32 chars) —
    * never to every attribute whose keyword happens to be nearby. "users
    * older than 60 weighing 70 kg" therefore yields ONE age filter, not a
    * fabricated weight range claimed by the adjacent "weighing".
    */
  private[model] def numericFilters(clause: String,
                                    schema: Schema): Seq[AttrFilter] = {
    val lower = clause.toLowerCase
    val cands = rangeCandidates(lower)
    if (cands.isEmpty) return Seq.empty
    // Word-boundary matching, not raw indexOf: "age" inside "messages"/
    // "average" or "kg" inside "background" must not claim a nearby
    // numeric range. Lookarounds (not \b) because keywords may contain
    // non-word chars ("year-old").
    val kwPositions: Seq[(String, Int)] = AttrKeywords.flatMap {
      case (attr, kws) => kws.flatMap { kw =>
        val re = ("(?<![a-z0-9])" + java.util.regex.Pattern.quote(kw) +
          "(?![a-z0-9])").r
        re.findAllMatchIn(lower).map(m => (attr, m.end)).toSeq
      }
    }
    if (kwPositions.isEmpty) return Seq.empty
    // candidate → owning attribute (nearest keyword, ≤ 32 chars; ties
    // break by AttrKeywords order via the stable minBy).
    val owned: Seq[(String, RangeCand)] = cands.flatMap { c =>
      val (attr, d) = AttrKeywords.flatMap { case (a, _) =>
        val ds = kwPositions.collect { case (`a`, kEnd) =>
          math.abs(c.start - kEnd) }
        if (ds.isEmpty) None else Some((a, ds.min))
      }.minBy(_._2)
      if (d <= 32) Some((attr, c)) else None
    }
    AttrKeywords.flatMap { case (attr, _) =>
      owned.collectFirst { case (`attr`, c) =>
        val colName = attrCol(attr, schema)
        val (defLo, defHi) = schema.bounds.getOrElse(colName, (0.0, 1e9))
        NumericRange(colName, c.lo.getOrElse(defLo), c.hi.getOrElse(defHi))
      }
    }
  }

  /** Any known state names in the clause (word-boundary, case-insensitive)
    * → a categorical filter, canonical capitalization preserved. An
    * occurrence lying INSIDE a longer matched state's occurrence is that
    * longer name's substring, not an independent mention ("West Virginia"
    * must not also select "Virginia" — but "Virginia and West Virginia"
    * keeps both, because the short name also occurs standalone).
    */
  private[model] def stateFilter(clause: String,
                                 schema: Schema): Option[AttrFilter] = {
    val lower = clause.toLowerCase
    val occs: Seq[(String, Int, Int)] = schema.states.flatMap { st =>
      s"""\\b${java.util.regex.Pattern.quote(st.toLowerCase)}\\b""".r
        .findAllMatchIn(lower).map(m => (st, m.start, m.end)).toSeq
    }
    val standalone = occs.filterNot { case (st, a, b) =>
      occs.exists { case (st2, a2, b2) =>
        st2 != st && (b2 - a2) > (b - a) && a2 <= a && b <= b2
      }
    }
    val hit = schema.states.filter(s => standalone.exists(_._1 == s))
    if (hit.nonEmpty) Some(CategoricalIn(schema.stateCol, hit)) else None
  }

  /** Date window: the first two ISO dates in the text (start, end); one
    * date alone means a single-day window.
    */
  private[model] def dateWindow(text: String): Option[(String, String)] =
    DateRe.findAllIn(text).toSeq match {
      case Seq()        => None
      case Seq(d)       => Some((d, d))
      case d +: rest    => Some((d, rest.last))
    }
}
