package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry⇄SURVEY 1:1 invariant, enforced (the r9 lesson: one
  * registry entry — q_conformal — shipped without its SURVEY §2 row,
  * breaking the "SURVEY §2 is the coverage checklist" contract the
  * project declares). Parses the §2 table's NAME column and asserts
  * name-set equality with `SparkEntry.queries`, both directions, plus
  * oracle coverage: every registry query carries an oracle.
  */
class SurveyRegistrySpec extends AnyFunSuite {

  private lazy val surveyNames: Set[String] = {
    val lines = scala.io.Source.fromFile("SURVEY.md")(scala.io.Codec.UTF8)
      .getLines().toSeq
    val s2 = lines.dropWhile(l => !l.startsWith("## §2"))
      .drop(1).takeWhile(l => !l.startsWith("## §"))
    val cell = """^`([a-z0-9_]+)`$""".r
    s2.filter(_.startsWith("|")).flatMap { row =>
      row.split("\\|").toSeq.drop(2).headOption.map(_.trim).collect {
        case cell(name) => name
      }
    }.toSet
  }

  test("every SURVEY §2 query name has a registry entry") {
    val missing = surveyNames -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"SURVEY rows without registry entries: $missing")
  }

  test("every registry entry has a SURVEY §2 row") {
    val undocumented = SparkEntry.queries.keySet -- surveyNames
    assert(undocumented.isEmpty,
      s"registry entries without SURVEY §2 rows: $undocumented")
  }

  test("every registry entry carries an oracle (full-strength gate)") {
    val weak = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(weak.isEmpty, s"registry entries without oracleSql: $weak")
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without registry entries: $orphan")
  }
}
