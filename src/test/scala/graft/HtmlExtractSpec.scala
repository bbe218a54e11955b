package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.Curation

/** d126 HTML visible-text extraction on planted markup: non-content
  * subtrees skipped whole, line breaks exactly at block boundaries and
  * <br>, inline tags seamless, entities decoded, whitespace normalized.
  */
class HtmlExtractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("html-extract-spec")
  override def afterAll(): Unit = spark.stop()

  private def extract(html: String): (String, Long) = {
    import spark.implicits._
    val r = Curation.htmlVisibleText(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().head
    (r.getString(1), r.getLong(2))
  }

  test("skips script/style/head/title subtrees whole") {
    val (t, n) = extract(
      "<html><head><title>nope</title><style>p { color: red }</style></head>" +
        "<body><script>var x = 1;</script><p>kept</p></body></html>")
    assert(t == "kept" && n == 1L)
  }

  test("block boundaries and <br> break lines; inline tags do not") {
    val (t, _) = extract(
      "<body><div>one</div><p>two <b>bold</b> <a href=\"#\">link</a></p>" +
        "<p>three<br>four</p></body>")
    assert(t == "one\ntwo bold link\nthree\nfour")
  }

  test("entities decode and whitespace normalizes") {
    val (t, n) = extract(
      "<body><p>  a &amp; b\t\tc  </p><p>   </p><p>d</p></body>")
    assert(t == "a & b c\nd" && n == 2L)
  }

  test("nested blocks emit no blank lines; empty/null input is empty") {
    val (t, _) = extract(
      "<body><div><div><p>inner</p></div></div></body>")
    assert(t == "inner")
    assert(extract("") == (("", 0L)))
    assert(extract("<body><style>x { }</style></body>") == (("", 0L)))
  }

  test("list and table rows come out one per line") {
    val (t, _) = extract(
      "<body><ul><li>a</li><li>b</li></ul>" +
        "<table><tr><td>c</td><td>d</td></tr></table></body>")
    assert(t == "a\nb\nc\nd")
  }
}
