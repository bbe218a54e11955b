package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.text.RuText

/** F1/F2/E4 scalar fixtures (FIXTURES.md §2, verified against the
  * reference implementation) + ScalaCheck properties (SURVEY.md §5.2).
  */
class RuTextSpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (scalatestplus bridge is
    * not in the offline cache). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("standardizeText fixtures") {
    assert(RuText.standardizeText("С.-Петербургъ.") == "с.-петербург")
    assert(RuText.standardizeText("Нижній-Новгородъ") == "нижний-новгород")
    assert(RuText.standardizeText("Инж.-тех. Н. С. И. А. Федоровъ.") == "инж.-тех. н. с. и. а. федоров")
    assert(RuText.standardizeText("Архангельская губернія.") == "архангельская губерния")
    assert(RuText.standardizeText(null) == null)
    assert(RuText.standardizeText("   ") == null)
    assert(RuText.standardizeText("с.") == "с.") // guarded single abbreviation keeps its dot
  }

  test("cleanNumber fixtures") {
    assert(RuText.cleanNumber("5.896") == 5896)
    assert(RuText.cleanNumber("2,797") == 2797)
    assert(RuText.cleanNumber("3 144") == 3144)
    assert(RuText.cleanNumber("—") == null)
    assert(RuText.cleanNumber("-") == null)
    assert(RuText.cleanNumber(" 79 ") == 79)
    assert(RuText.cleanNumber("") == null)
    assert(RuText.cleanNumber(null) == null)
  }

  test("canonicalInspectorName fixtures (initials sorted — quirk Q4)") {
    assert(RuText.canonicalInspectorName("и. а. федоров") == "федоров а.и.")
    assert(RuText.canonicalInspectorName("федоров и. а.") == "федоров а.и.")
    assert(RuText.canonicalInspectorName("н. н. деревенко") == "деревенко н.н.")
  }

  private val ruChars: Gen[Char] = Gen.frequency(
    (10, Gen.oneOf("абвгдежзиклмнопрстуфхцчшщъыьэюяё".toSeq)),
    (3, Gen.oneOf("ѣіѳѵїАБВГДЕЖЗ".toSeq)),
    (3, Gen.oneOf(" .,-—;:!?()0123456789".toSeq)),
    (1, Gen.oneOf("abcXYZ †»«\"".toSeq)))
  private val ruStrings: Gen[String] = Gen.listOf(ruChars).map(_.mkString)

  // NOTE: full idempotence is FALSE for the reference function itself —
  // doubled terminal ъ/ь strip one layer per application ('ьь'→'ь'→None),
  // verified against the Python original. The true properties are
  // convergence (repeated application reaches a fixed point) and
  // idempotence on dictionary keys (what the ETL's double-standardization
  // of dim abbreviations relies on).
  test("standardizeText converges to a fixed point (property)") {
    check(Prop.forAll(ruStrings) { s =>
      var cur = RuText.standardizeText(s)
      var steps = 0
      var next = if (cur == null) null else RuText.standardizeText(cur)
      while (cur != next && steps < 50) {
        cur = next
        next = if (cur == null) null else RuText.standardizeText(cur)
        steps += 1
      }
      cur == next
    })
  }

  test("standardizeText is idempotent on standardized dictionary keys") {
    import graft.text.Dictionaries
    val keys = (Dictionaries.knownRanks ++ Dictionaries.knownProfessions ++
      Dictionaries.knownEducations).map(_._1)
    assert(keys.nonEmpty)
    keys.foreach(k => assert(RuText.standardizeText(k) == k, s"key '$k'"))
  }

  test("cleanNumber is total (property: never throws, digits or null)") {
    check(Prop.forAll(ruStrings) { s =>
      val r = RuText.cleanNumber(s)
      r == null || r >= 0
    })
  }

  test("canonicalInspectorName is invariant under initial permutation (property)") {
    val initials = Gen.someOf(Seq("а.", "и.", "н.", "п.")).map(_.toVector)
    check(Prop.forAll(initials) { is =>
      val surname = "федоров"
      val a = RuText.canonicalInspectorName((is :+ surname).mkString(" "))
      val b = RuText.canonicalInspectorName((is.reverse :+ surname).mkString(" "))
      a == b
    })
  }

  test("canonicalInspectorName is total (property)") {
    check(Prop.forAll(ruStrings) { s =>
      RuText.canonicalInspectorName(s) // must not throw
      true
    })
  }
}
