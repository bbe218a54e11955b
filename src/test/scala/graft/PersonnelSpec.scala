package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{ParsedAssignment, Personnel}

/** P1-P13 parse fixtures from FIXTURES.md §2 (expected outputs verified
  * against the reference implementation), incl. quirks Q1/Q2/Q6, plus a
  * full replay of every personnel cell the reference parsed during its
  * corpus run (tools/golden/personnel_cases.jsonl — 3470 cases).
  */
class PersonnelSpec extends AnyFunSuite {

  test("simple record: prof + rank + name") {
    val r = Personnel.parse("Уч. Инж.-тех. Н. С. И. А. Федоровъ.")
    assert(r.size == 1)
    assert(r.head.name == "и. а. федоров")
    assert(r.head.profAbbr == "уч. инж.-тех")
    assert(r.head.rankAbbr == "н. с.")
    assert(r.head.eduAbbr == null)
  }

  test("three br-segments: dates, succession, vacancy") {
    val r = Personnel.parse(
      "до 10 іюня Инж.-Техн., К. Асс. Н. А. Шевалевъ.<br>" +
        "съ 10 іюня по 1 ноября Техн., Тит. С. Л. Л. Схоль-Энгбертсъ.<br>" +
        "съ 1 ноября вакансія.")
    assert(r.size == 3)
    assert(r(0).name == "н. а. шевалев" && r(0).endDateRaw == "до 10 июня")
    assert(r(1).name == "л. л. схоль-энгбертс" && r(1).startDateRaw == "с 10 июня" && r(1).endDateRaw == "по 1 ноября")
    assert(r(2).isVacancy && r(2).name == "вакансия" && r(2).startDateRaw == "с 1 ноября")
  }

  test("vacancy with date range") {
    val r = Personnel.parse("съ 1 янв. по 17 апр. вакансія.")
    assert(r.size == 1)
    assert(r.head.isVacancy && r.head.startDateRaw == "с 1 янв" && r.head.endDateRaw == "по 17 апр")
  }

  test("quirk Q1: month-less range captures 'по' as month") {
    val r = Personnel.parse("съ 1 по 16 мая вакансія.")
    assert(r.size == 1)
    assert(r.head.startDateRaw == "с 1 по")
    assert(r.head.endDateRaw == null)
    assert(r.head.notes != null && r.head.notes.contains("16 мая"))
  }

  test("senior marker: special role, no name") {
    val r = Personnel.parse("Старшій фабричный инспекторъ.")
    assert(r.size == 1)
    assert(r.head.specialRole == "старший инспектор" && r.head.name == null)
  }

  test("death sign + following vacancy") {
    val r = Personnel.parse("К. А. Г. В. Алексѣевъ (†).<br>съ 1 дек. вакансія.")
    assert(r.size == 2)
    assert(r(0).name == "г. в. алексеев" && r(0).rankAbbr == "к. а." && r(0).notes == "Умеръ (†)")
    assert(r(1).isVacancy && r(1).startDateRaw == "с 1 дек")
  }

  test("acting flag") {
    val r = Personnel.parse("и. д. Инж.-тех. К. Скр. П. П. Ивановъ.")
    assert(r.size == 1)
    assert(r.head.isActing && r.head.name == "п. п. иванов" && r.head.profAbbr == "инж.-тех")
  }

  test("quirk Q2: one record per segment; second name goes to notes") {
    val r = Personnel.parse(
      "съ 1 сент. оконч. СПБ. полит. инст., Колл. Секр. Н. Н. Деревенко и Инж.-тех., Колл. Сов. С. Н. Масловъ.")
    assert(r.size == 1)
    assert(r.head.name == "н. н. деревенко")
    assert(r.head.startDateRaw == "с 1 сент")
    assert(r.head.notes != null && r.head.notes.contains("маслов"))
  }

  test("empty / dash / no-data segments produce nothing") {
    assert(Personnel.parse("(Нет данных)").isEmpty)
    assert(Personnel.parse("—").isEmpty)
    assert(Personnel.parse("").isEmpty)
    assert(Personnel.parse(null).isEmpty)
  }

  test("emit invariant: every record has name, vacancy, or special role") {
    val inputs = Seq(
      "Уч. Инж.-тех. Н. С. И. А. Федоровъ.", "съ 1 янв. вакансія.",
      "Старшій инспекторъ.", "до 3 мая", "xyz 123")
    for (in <- inputs; r <- Personnel.parse(in))
      assert(r.name != null || r.isVacancy || r.specialRole != null)
  }

  test("full corpus replay: all 3470 reference cells match") {
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val mapper = new ObjectMapper()
    val path = sys.env.getOrElse("GRAFT_REPO", "/root/repo") + "/tools/golden/personnel_cases.jsonl"
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      var n = 0
      for (line <- src.getLines() if line.nonEmpty) {
        n += 1
        val node = mapper.readTree(line)
        val input = if (node.get("input").isNull) null else node.get("input").asText()
        val expected = node.get("output").elements().asScala
          .map(graft.parse.ParseCheck.toRecord).toVector
        val actual = Personnel.parse(input)
        assert(actual == expected, s"case $n input=$input")
      }
      assert(n == 3470)
    } finally src.close()
  }
}
