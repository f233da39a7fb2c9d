package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.ops.CohortFilter.{CategoricalIn, NumericRange}

/** The rule-based NL frontend must fill the same slots the reference's
  * LLM prompt extracts (`script/utils.py:105-176`): subject/control
  * age/weight/height ranges, states, user ids, date window — and retain
  * defaults for anything unmentioned.
  */
class NlQuerySpec extends AnyFunSuite {

  private val defaults = QuerySpec(AllUsers, AllUsers,
    startDate = "2024-01-01", endDate = "2024-12-31")

  test("subject vs control clauses split at the compare marker") {
    val q = NlQuery.parse(
      "show users aged between 30 and 50 compared with users aged between 60 and 80",
      defaults)
    assert(q.subjectSelection == ByAttributes(Seq(NumericRange("age", 30, 50))))
    assert(q.controlSelection == ByAttributes(Seq(NumericRange("age", 60, 80))))
  }

  test("multiple attributes bind to their own ranges within one clause") {
    val q = NlQuery.parse(
      "people aged 30 to 45 weighing between 60 and 90 kg and height over 170 cm",
      defaults)
    val fs = q.subjectSelection.asInstanceOf[ByAttributes].attrFilters
    assert(fs.contains(NumericRange("age", 30, 45)))
    assert(fs.contains(NumericRange("weight", 60, 90)))
    assert(fs.contains(NumericRange("height", 170, 300)))
  }

  test("one-sided comparisons close against the slider bounds") {
    val q = NlQuery.parse("show everyone older than 65", defaults)
    assert(q.subjectSelection == ByAttributes(Seq(NumericRange("age", 65, 120))))
    val q2 = NlQuery.parse("subjects lighter than 80 kg", defaults)
    assert(q2.subjectSelection ==
      ByAttributes(Seq(NumericRange("weight", 0, 80))))
  }

  test("states of residence become a categorical filter") {
    val q = NlQuery.parse(
      "show people from California and Texas compared to people from New York",
      defaults)
    assert(q.subjectSelection == ByAttributes(Seq(
      CategoricalIn("state_of_residence", Seq("California", "Texas")))))
    assert(q.controlSelection == ByAttributes(Seq(
      CategoricalIn("state_of_residence", Seq("New York")))))
  }

  test("explicit user ids win over attribute mentions") {
    val q = NlQuery.parse("show users 3, 5 and 9 aged over 40", defaults)
    assert(q.subjectSelection == ByIds("user_id", Seq("3", "5", "9")))
  }

  test("date window from ISO dates; defaults retained otherwise") {
    val q = NlQuery.parse(
      "users from Ohio from 2024-03-01 to 2024-03-15", defaults)
    assert(q.startDate == "2024-03-01" && q.endDate == "2024-03-15")
    assert(q.timeOfDayRanges == QuerySpec.DefaultTodRanges)
    val q2 = NlQuery.parse("show everyone", defaults)
    assert(q2 == defaults, "nothing mentioned ⇒ defaults verbatim")
  }

  test("ISO dates are never swallowed as numeric ranges") {
    // The span pattern ("X to Y" / "X-Y") must not read "2024-01" inside
    // "2024-01-05" as a range: with no real comparator near "aged", the
    // age slot stays at its default instead of becoming 2024..1.
    val q = NlQuery.parse(
      "users aged 40 from 2024-01-05 to 2024-02-10", defaults)
    assert(q.subjectSelection == AllUsers,
      s"no fabricated range from date text: ${q.subjectSelection}")
    assert(q.startDate == "2024-01-05" && q.endDate == "2024-02-10")
  }

  test("a range binds to ONE attribute even when other keywords sit nearby") {
    // "weighing 70 kg" has no comparator, so weight has no candidate of
    // its own — and it must NOT claim the age range next door.
    val q = NlQuery.parse("users older than 60 weighing 70 kg", defaults)
    assert(q.subjectSelection ==
      ByAttributes(Seq(NumericRange("age", 60, 120))),
      s"got: ${q.subjectSelection}")
  }

  test("compound state names do not also select their substring states") {
    val q = NlQuery.parse("show people from West Virginia", defaults)
    assert(q.subjectSelection == ByAttributes(Seq(
      CategoricalIn("state_of_residence", Seq("West Virginia")))))
    val q2 = NlQuery.parse(
      "show people from Virginia and West Virginia", defaults)
    assert(q2.subjectSelection == ByAttributes(Seq(
      CategoricalIn("state_of_residence", Seq("Virginia", "West Virginia")))),
      "a standalone short-name mention must survive")
  }

  test("parsed spec round-trips through QuerySpec JSON") {
    val q = NlQuery.parse(
      "users aged between 30 and 50 from Texas compared with users older than 60",
      defaults)
    assert(QuerySpec.fromJson(q.toJson) == q)
  }
}
