package graft.parse

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.io.Source
import scala.jdk.CollectionConverters._

/** Dev harness: replay tools/golden/personnel_cases.jsonl (every personnel
  * cell the reference parsed during its corpus run, with its outputs) through
  * graft.parse.Personnel and report mismatches. Exit 0 iff all match.
  */
object ParseCheck {

  private val mapper = new ObjectMapper()

  private def str(n: JsonNode, field: String): String = {
    val v = n.get(field)
    if (v == null || v.isNull) null else v.asText()
  }

  def toRecord(n: JsonNode): ParsedAssignment = ParsedAssignment(
    name = str(n, "name"),
    rankAbbr = str(n, "rank_abbr"),
    profAbbr = str(n, "prof_abbr"),
    eduAbbr = str(n, "edu_abbr"),
    startDateRaw = str(n, "start_date_raw"),
    endDateRaw = str(n, "end_date_raw"),
    isVacancy = n.get("is_vacancy").asBoolean(),
    isActing = n.get("is_acting").asBoolean(),
    notes = str(n, "notes"),
    specialRole = str(n, "special_role"))

  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "tools/golden/personnel_cases.jsonl"
    val src = Source.fromFile(path, "UTF-8")
    var total = 0
    var bad = 0
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        total += 1
        val node = mapper.readTree(line)
        val input = str(node, "input")
        val expected = node.get("output").elements().asScala.map(toRecord).toVector
        val actual = Personnel.parse(input)
        if (actual != expected) {
          bad += 1
          if (bad <= 10) {
            println(s"== MISMATCH case $total ==")
            println(s"input:    ${input.take(200)}")
            println(s"expected: $expected")
            println(s"actual:   $actual")
          }
        }
      }
    } finally src.close()
    println(s"personnel cases: $total, mismatches: $bad")
    if (bad > 0) sys.exit(1)
  }
}
