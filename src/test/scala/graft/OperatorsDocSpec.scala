package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on OPERATORS.md — the user-facing operator manual
  * (VERDICT r15 item 5). SURVEY §2 is builder-facing forensics; the
  * manual is the README-level surface a new user reads, with a
  * generated per-row reference table (tools/gen_operators.py). These
  * tests pin the manual to the inventory so a §2 row added without a
  * manual regeneration breaks at the commit.
  */
class OperatorsDocSpec extends AnyFunSuite {

  private def readAll(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  // same slice + row-id convention as SurveySpec
  private lazy val surveyS2: Seq[String] = {
    val lines = scala.io.Source.fromFile("SURVEY.md")("UTF-8").getLines().toVector
    val start = lines.indexWhere(_.startsWith("## §2 "))
    assert(start >= 0, "SURVEY.md has no '## §2' header")
    val rest = lines.drop(start + 1)
    val end = rest.indexWhere(l => l.startsWith("## §") && !l.startsWith("## §2"))
    rest.take(if (end >= 0) end else rest.length)
  }
  private val RowId = """^\|\s*(\d+[a-z0-9]*)\s*\|""".r.unanchored

  test("OPERATORS.md carries every SURVEY §2 row id") {
    val surveyIds = surveyS2.collect { case RowId(id) => id }
    assert(surveyIds.length >= 343, s"parsed only ${surveyIds.length} §2 rows")
    val doc = readAll("OPERATORS.md")
    val parts = doc.split(java.util.regex.Pattern.quote("<!-- BEGIN GENERATED"))
    assert(parts.length == 2,
      "OPERATORS.md has no '<!-- BEGIN GENERATED' marker — " +
        "run `python3 tools/gen_operators.py` to restore the generated section")
    // scan only up to the END marker so a row id in trailing
    // hand-authored prose can't mask its absence from the table
    val gen = parts(1).split(java.util.regex.Pattern.quote("<!-- END GENERATED"))(0)
    val docIds = gen.linesIterator.collect { case RowId(id) => id }.toSet
    val missing = surveyIds.filterNot(docIds)
    assert(missing.isEmpty,
      s"SURVEY §2 rows missing from OPERATORS.md: ${missing.take(10).mkString(", ")}" +
        " — run `python3 tools/gen_operators.py`")
  }

  test("the manual's generated section names only real gate queries") {
    // the entry-point column inherits §2's qNN_name tokens; a renamed
    // query must not leave a dangling manual reference (SurveySpec
    // enforces the same on the SURVEY side)
    val QRef = """q\d+_[a-z0-9_]+""".r
    val referenced = QRef.findAllIn(readAll("OPERATORS.md")).toSet
    val dangling = referenced -- SparkEntry.queries.keySet
    assert(dangling.isEmpty,
      s"OPERATORS.md references unknown queries: ${dangling.toSeq.sorted.take(10).mkString(", ")}")
  }

  test("Examples cross-links the manual and the manual points at Examples") {
    assert(readAll("src/main/scala/graft/Examples.scala").contains("OPERATORS.md"),
      "Examples.scala must point readers at OPERATORS.md")
    assert(readAll("OPERATORS.md").contains("graft.Examples"),
      "OPERATORS.md must point readers at the runnable Examples")
  }
}
