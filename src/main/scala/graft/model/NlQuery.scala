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
    val filters =
      numericFilter(clause, Seq("aged", "ages", "age", "years old", "year-old",
        "older", "younger"), schema.ageCol, schema) ++
      numericFilter(clause, Seq("weighing", "weighs", "weight", "weigh", "kg",
        "kilograms", "heavier", "lighter"), schema.weightCol, schema) ++
      numericFilter(clause, Seq("height", "tall", "cm", "centimeters",
        "taller", "shorter"), schema.heightCol, schema) ++
      stateFilter(clause, schema)
    if (filters.nonEmpty) Some(ByAttributes(filters.toSeq)) else None
  }

  /** "users 3, 5 and 9" / "user ids 1,2,3" → the id list. */
  private[model] def userIds(clause: String): Seq[String] = {
    val re = """(?i)\busers?\s*(?:ids?\s*)?[:]?\s*((?:#?\d+)(?:\s*(?:,|and|&)\s*#?\d+)*)""".r
    re.findFirstMatchIn(clause) match {
      case Some(m) => """\d+""".r.findAllIn(m.group(1)).toSeq
      case None    => Seq.empty
    }
  }

  /** Attribute range bound to the NEAREST of `keywords`: "between X and
    * Y", "X to Y" / "X-Y", or one-sided "over/under X" closed against the
    * attribute's slider bounds. Every range pattern in the clause is a
    * candidate; each keyword occurrence claims the candidate closest to
    * it (within 32 characters), so "aged 30 to 45 weighing between 60 and
    * 90 kg" binds each range to its own attribute even though both ranges
    * sit inside both keywords' neighborhoods.
    */
  private[model] def numericFilter(clause: String, keywords: Seq[String],
                                   colName: String,
                                   schema: Schema): Option[AttrFilter] = {
    val lower = clause.toLowerCase
    val (defLo, defHi) = schema.bounds.getOrElse(colName, (0.0, 1e9))
    val between = s"""between\\s+$Num\\s+and\\s+$Num""".r
    val span = s"""$Num\\s*(?:-|to)\\s*$Num""".r
    val over =
      s"""(?:over|above|more\\s+than|at\\s+least|older\\s+than|heavier\\s+than|taller\\s+than|>=?)\\s*$Num""".r
    val under =
      s"""(?:under|below|less\\s+than|at\\s+most|younger\\s+than|lighter\\s+than|shorter\\s+than|<=?)\\s*$Num""".r
    // All range candidates in the clause, with their positions. Two-sided
    // patterns are collected before one-sided ones so that at EQUAL
    // distance (e.g. "aged between 30 and 50", where the span "30 and"
    // does not match but "over"-less text could tie) the more specific
    // pattern wins.
    val candidates: Seq[(Int, NumericRange)] =
      between.findAllMatchIn(lower).map(m => m.start ->
        NumericRange(colName, m.group(1).toDouble, m.group(2).toDouble)).toSeq ++
      span.findAllMatchIn(lower).map(m => m.start ->
        NumericRange(colName, m.group(1).toDouble, m.group(2).toDouble)).toSeq ++
      over.findAllMatchIn(lower).map(m => m.start ->
        NumericRange(colName, m.group(1).toDouble, defHi)).toSeq ++
      under.findAllMatchIn(lower).map(m => m.start ->
        NumericRange(colName, defLo, m.group(1).toDouble)).toSeq
    if (candidates.isEmpty) return None
    val kwPositions = keywords.flatMap { kw =>
      var out = List.empty[Int]
      var from = lower.indexOf(kw)
      while (from >= 0) {
        out ::= from + kw.length
        from = lower.indexOf(kw, from + 1)
      }
      out
    }
    val claimed = kwPositions.flatMap { kEnd =>
      val best = candidates.minBy { case (mStart, _) =>
        math.abs(mStart - kEnd)
      }
      if (math.abs(best._1 - kEnd) <= 32) Some(best) else None
    }
    claimed.sortBy { case (mStart, _) => mStart }.headOption.map(_._2)
  }

  /** Any known state names in the clause (word-boundary, case-insensitive)
    * → a categorical filter, canonical capitalization preserved.
    */
  private[model] def stateFilter(clause: String,
                                 schema: Schema): Option[AttrFilter] = {
    val lower = clause.toLowerCase
    val hit = schema.states.filter { s =>
      s"""(?i)\\b${java.util.regex.Pattern.quote(s.toLowerCase)}\\b""".r
        .findFirstIn(lower).isDefined
    }
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
