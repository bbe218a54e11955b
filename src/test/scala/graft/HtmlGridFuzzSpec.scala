package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.parse.{HtmlGrid, MiniDom}

/** Property fuzz for the HTML grid parser: the golden files prove the 11
  * real inputs parse bug-for-bug; this spec proves the parser is TOTAL
  * and shape-stable on malformed-but-plausible table HTML — unclosed
  * tags, stray/garbage rowspan counts, comment interleavings (present in
  * the real corpus, e.g. fabric1910.html), truncated documents. The
  * invariants: never throw, every "data" row carries exactly the year's
  * expected column count with non-null cells, kinds stay in the closed
  * set, okrug rows always carry a context, and parsing is deterministic.
  */
class HtmlGridFuzzSpec extends AnyFunSuite {

  private val kinds = Set("okrug", "gubernia", "header", "data")

  // ---- generators ------------------------------------------------------

  private val word: Gen[String] = Gen.oneOf(
    "фабричный", "округъ", "Московскій  округъ", "губернія", "с.-петербургская",
    "инспекторъ", "участокъ", "г. Москва", "уѣздъ", "1234", "12 34",
    "*", "1)", "прим.", "см. выше", "†", "и. д.", "неим. чина",
    "&nbsp;", "&amp;", "&quot;", "&#1060;", "Ивановъ И.И.", "вакансія",
    "[*1]", "(съ 1 янв. 1899 г.)", "<br>", "мц", "")

  private val cellText: Gen[String] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private val attrGen: Gen[String] = Gen.frequency(
    5 -> Gen.const(""),
    2 -> Gen.oneOf("2", "3", "0", "-1", "99", "abc", " 4 ", "2.5", "")
      .map(v => s""" rowspan="$v""""),
    1 -> Gen.oneOf("2", "6", "x").map(v => s""" colspan="$v""""),
    1 -> Gen.oneOf("section-header", "okrug-header", "gubernia-header",
      "district-header", "data-row", "weird").map(c => s""" class="$c""""))

  private val comment: Gen[String] = Gen.oneOf(
    "<!-- row break -->", "<!-- <tr><td>ghost</td></tr> -->", "<!--->", "")

  /** One cell: td or th, sometimes left unclosed, sometimes self-noise. */
  private val cell: Gen[String] = for {
    tag <- Gen.frequency(8 -> Gen.const("td"), 1 -> Gen.const("th"))
    a <- attrGen
    t <- cellText
    closed <- Gen.frequency(6 -> Gen.const(true), 1 -> Gen.const(false))
    c <- comment
  } yield if (closed) s"<$tag$a>$t</$tag>$c" else s"<$tag$a>$t"

  private val row: Gen[String] = for {
    a <- attrGen
    n <- Gen.choose(0, 8)
    cs <- Gen.listOfN(n, cell)
    closed <- Gen.frequency(8 -> Gen.const(true), 1 -> Gen.const(false))
    c <- comment
  } yield (if (closed) s"<tr$a>${cs.mkString}</tr>" else s"<tr$a>${cs.mkString}") + c

  private val tableHtml: Gen[String] = for {
    nHead <- Gen.choose(0, 2)
    headRows <- Gen.listOfN(nHead, row)
    nBody <- Gen.choose(0, 12)
    bodyRows <- Gen.listOfN(nBody, row)
    useThead <- Gen.oneOf(true, false)
    useTbody <- Gen.oneOf(true, false)
    closeTable <- Gen.frequency(8 -> Gen.const(true), 1 -> Gen.const(false))
    pre <- comment
  } yield {
    val head = if (useThead) s"<thead>${headRows.mkString}</thead>" else headRows.mkString
    val body = if (useTbody) s"<tbody>${bodyRows.mkString}</tbody>" else bodyRows.mkString
    val t = s"<html><body>$pre<table>$head$body"
    (if (closeTable) s"$t</table>" else t) + "</body></html>"
  }

  /** Final input: a table doc, sometimes truncated mid-anything. */
  private val docGen: Gen[(String, Int)] = for {
    html <- tableHtml
    year <- Gen.oneOf(1899, 1901, 1910)
    cut <- Gen.frequency(
      5 -> Gen.const(Int.MaxValue),
      1 -> Gen.choose(0, math.max(1, html.length)))
  } yield (html.take(math.min(cut, html.length)), year)

  // ---- properties ------------------------------------------------------

  test("parseFile is total and shape-stable on malformed table HTML (property)") {
    val prop = Prop.forAll(docGen) { case (html, year) =>
      val expectedCols = if (year == 1901) 4 else 6
      val out = HtmlGrid.parseFile("fuzz.html", 0, year, html)
      val again = HtmlGrid.parseFile("fuzz.html", 0, year, html)
      out.forall(r => kinds.contains(r.kind)) &&
        out.filter(_.kind == "data").forall(r =>
          r.cells.length == expectedCols && r.cells.forall(_ != null)) &&
        out.filter(_.kind == "okrug").forall(_.okrugText != null) &&
        out == again
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("MiniDom.parse is total on arbitrary angle-bracket soup (property)") {
    val soupPiece = Gen.oneOf(
      "<", ">", "</", "<>", "< td>", "<td", "table", "=\"", "\"", "&", "&amp",
      "<!--", "-->", "<tr>", "</tr>", "<table>", "rowspan", " ", "текстъ", "\n")
    val soup = Gen.choose(0, 60)
      .flatMap(n => Gen.listOfN(n, soupPiece)).map(_.mkString)
    val prop = Prop.forAll(soup) { s =>
      val d1 = MiniDom.parse(s)
      val d2 = MiniDom.parse(s)
      // total + deterministic structure (text extraction must not throw)
      d1.getText(strip = true) == d2.getText(strip = true) &&
        d1.findAll("tr").length == d2.findAll("tr").length
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
