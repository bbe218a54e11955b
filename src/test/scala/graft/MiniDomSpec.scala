package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.MiniDom

/** MiniDom behaviors that the golden fixtures depend on (html.parser
  * observable semantics — see MiniDom scaladoc).
  */
class MiniDomSpec extends AnyFunSuite {

  test("getText(strip) concatenates stripped strings with no separator") {
    val doc = MiniDom.parse("<td> A <span> B </span> C </td>")
    assert(doc.find("td").get.getText(strip = true) == "ABC")
  }

  test("decodeContents re-escapes text and serializes voids self-closed") {
    val doc = MiniDom.parse("<td>a &amp; b<br>c &lt;d&gt;</td>")
    assert(doc.find("td").get.decodeContents == "a &amp; b<br/>c &lt;d&gt;")
  }

  test("comments are stripped before tokenizing") {
    val doc = MiniDom.parse("<table><!-- note --><tr><td>x</td></tr></table>")
    assert(doc.find("td").get.getText(strip = true) == "x")
  }

  test("rowspan/colspan attributes parse in any order and quoting") {
    val doc = MiniDom.parse("""<tr><td rowspan=2 class="a b">x</td><td colspan="6">y</td></tr>""")
    val tds = doc.find("tr").get.findAll("td", recursive = false)
    assert(tds(0).attr("rowspan").contains("2"))
    assert(tds(0).classes == Vector("a", "b"))
    assert(tds(1).attr("colspan").contains("6"))
  }

  test("stray end tags are ignored; nested find_all(recursive=false)") {
    val doc = MiniDom.parse("<table><tbody><tr><td>a</td></tr></too><tr><td>b</td></tr></tbody></table>")
    val tbody = doc.find("tbody").get
    assert(tbody.findAll("tr", recursive = false).size == 2)
  }

  test("numeric and named character references decode") {
    assert(MiniDom.unescapeEntities("a&nbsp;b &#1090; &#x442; &amp;") == "a\u00a0b т т &")
    assert(MiniDom.unescapeEntities("no refs") == "no refs")
  }
}
