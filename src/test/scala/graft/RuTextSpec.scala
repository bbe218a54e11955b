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

  test("standardizeText is idempotent (property)") {
    check(Prop.forAll(ruStrings) { s =>
      val once = RuText.standardizeText(s)
      RuText.standardizeText(once) == once
    })
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
