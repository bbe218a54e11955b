package graft.parse

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer
import graft.text.{Dictionaries => D, RuText}
import graft.text.RuText.{pyStrip, stripChars, replaceFirstLiteral}

/** One parsed personnel record (reference record shape,
  * populate_db_ru_v1.py:363-365). Nulls model Python None.
  */
final case class ParsedAssignment(
    name: String,
    rankAbbr: String,
    profAbbr: String,
    eduAbbr: String,
    startDateRaw: String,
    endDateRaw: String,
    isVacancy: Boolean,
    isActing: Boolean,
    notes: String,
    specialRole: String)

/** `parse_personnel_string_v4` (SURVEY.md P1-P13;
  * populate_db_ru_v1.py:304-501): one personnel cell's inner HTML →
  * 0..N assignment records. Pure function — no Spark deps — exercised
  * from the ETL via flatMap/explode (Q14) and unit-testable in isolation.
  *
  * Python-regex parity notes:
  *  - patterns compile with CASE_INSENSITIVE | UNICODE_CASE |
  *    UNICODE_CHARACTER_CLASS so `\b`/`\s`/`\d` and case-insensitive
  *    Cyrillic classes behave like Python `re` on str;
  *  - `pyReEscape` replicates Python ≥3.7 `re.escape` (escapes only
  *    regex-special chars, including space/# for VERBOSE mode);
  *  - Python named groups `(?P<x>...)` are rewritten to Java `(?<x>...)`
  *    (Java group names must be alphanumeric);
  *  - dictionary keys are tried longest-first with a STABLE sort, so
  *    equal-length keys keep insertion order (reference :419).
  */
object Personnel {

  private val FLAGS =
    Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS

  private val brPat = Pattern.compile("<br\\s*/?>", FLAGS)
  // :313 — named groups renamed for Java (prefix_date→prefix).
  private val datePat = Pattern.compile(
    D.datePatternSrc
      .replace("(?P<prefix_date>", "(?<prefix>")
      .replace("(?P<day>", "(?<day>")
      .replace("(?P<month>", "(?<month>"),
    FLAGS)
  // :314 — first alternative carries pre-reform і (\u0456).
  private val vacancyPat = Pattern.compile("\\bваканс\u0456я\\b|\\bвакансия\\b", FLAGS)
  private val actingPat = Pattern.compile("\\bи\\. ?д\\.", FLAGS)
  private val notePat = Pattern.compile("\\(([^)]+)\\)", FLAGS)
  private val neimChinaPat = Pattern.compile("\\bнеим\\.? чина\\b", FLAGS)
  private val namePat = Pattern.compile(D.namePatternSrc, FLAGS)
  // :450 — case-SENSITIVE lowercase class (no IGNORECASE in the reference).
  private val anyCyrLower = Pattern.compile("[а-яё]", Pattern.UNICODE_CHARACTER_CLASS)

  private val DeathSign = "†"

  /** Python ≥3.7 re.escape: backslash-escape exactly these characters. */
  private val pySpecial = "()[]{}?*+-|^$\\.&~# \t\n\u000b\f\r".toSet
  def pyReEscape(s: String): String =
    s.flatMap(c => if (pySpecial(c)) "\\" + c else c.toString)

  private def std(s: String): String = RuText.standardizeText(s)

  // Entity-extraction tables, precompiled once: per dictionary, keys
  // longest-first (stable), each with its 1-2 candidate patterns (:419-425).
  private def entityPatterns(dict: Vector[(String, String)]): Vector[(String, Vector[Pattern])] =
    dict.map(_._1).filter(k => k != null && k.nonEmpty).sortBy(-_.length).map { key =>
      var base = pyReEscape(key)
      if (key.contains('-')) base = base.replace("\\-", "[-\\s]?")
      val pats = Vector.newBuilder[String]
      pats += "(?<![а-яё0-9])\\b" + base + "\\b(?![а-яё0-9])"
      if (key.endsWith(".")) pats += "(?<![а-яё0-9])\\b" + base.dropRight(2) + "\\b(?![а-яё0-9])"
      else pats += "(?<![а-яё0-9])\\b" + base + "\\.(?![а-яё0-9])"
      key -> pats.result().map(p => Pattern.compile(p, FLAGS))
    }

  private lazy val profPatterns = entityPatterns(D.knownProfessions)
  private lazy val eduPatterns = entityPatterns(D.knownEducations)
  private lazy val rankPatterns = entityPatterns(D.knownRanks)

  private lazy val netDannykhStd = std(D.litNetDannykh)
  private lazy val netDannykhJerStd = std(D.litNetDannykhJer)

  /** Mutable working record mirroring the reference's assignment dict. */
  private final class Rec {
    var name: String = null
    var rankAbbr: String = null
    var profAbbr: String = null
    var eduAbbr: String = null
    var startDateRaw: String = null
    var endDateRaw: String = null
    var isVacancy = false
    var isActing = false
    var notes: String = null
    var specialRole: String = null
    def result: ParsedAssignment = ParsedAssignment(
      name, rankAbbr, profAbbr, eduAbbr, startDateRaw, endDateRaw,
      isVacancy, isActing, notes, specialRole)
    /** `((notes or "") + add).lstrip("; ")` — `add` carries its own "; ". */
    def appendNote(add: String): Unit =
      notes = RuText.lstripChars((if (notes == null) "" else notes) + add, "; ")
  }

  def parse(rawStringHtml: String): Vector[ParsedAssignment] = {
    val out = Vector.newBuilder[ParsedAssignment]
    if (rawStringHtml == null || rawStringHtml.isEmpty) return out.result()

    val unescaped = MiniDom.unescapeEntities(rawStringHtml)
    val parts = brPat.matcher(unescaped).replaceAll("||BR_DELIMITER||")
      .split(Pattern.quote("||BR_DELIMITER||"), -1)

    for (partRaw <- parts) {
      val segment = pyStrip(partRaw)
      val stdCheck = std(segment)
      val skip = segment.isEmpty || segment == "—" ||
        (stdCheck != null && (stdCheck == netDannykhStd || stdCheck == netDannykhJerStd))
      if (!skip) {
        val actual = stripChars(segment, " ,.")
        if (pyStrip(actual).nonEmpty && pyStrip(actual) != "—") {
          val processed = std(actual)
          if (processed != null) {
            if (processed == D.seniorInspMarkerStd || processed == D.seniorFabInspMarkerStd) {
              val r = new Rec
              r.specialRole = "старший инспектор"
              out += r.result
            } else {
              out ++= parseSegment(processed)
            }
          }
        }
      }
    }
    out.result()
  }

  /** One standardized sub-segment → 0..1 records (reference :361-500). */
  private def parseSegment(processedSegment: String): Option[ParsedAssignment] = {
    val a = new Rec
    var text = processedSegment

    // P5: parenthetical notes (:368-376).
    val noteBuf = ArrayBuffer[String]()
    locally {
      val m = notePat.matcher(text)
      val sb = new java.lang.StringBuilder
      var last = 0
      while (m.find()) {
        val content = pyStrip(m.group(1))
        if (content == DeathSign) a.appendNote("; Умеръ (†)")
        else if (content.contains("см. выше") || content.contains("см. ниже"))
          a.appendNote(s"; Ссылка: ($content)")
        else noteBuf += content
        sb.append(text, last, m.start()); last = m.end()
      }
      sb.append(text, last, text.length)
      text = stripChars(sb.toString, " ,.")
    }
    if (noteBuf.nonEmpty) a.appendNote(noteBuf.mkString("; "))

    // P6: acting flag (:378-379).
    val am = actingPat.matcher(text)
    if (am.find()) {
      a.isActing = true
      text = stripChars(replaceFirstLiteral(text, am.group(0), ""), " ,.")
    }

    // P7: service dates — first с/съ → start, first до/по → end (:381-393).
    val spans = ArrayBuffer[(Int, Int)]()
    locally {
      val dm = datePat.matcher(text)
      while (dm.find()) {
        val prefix = dm.group("prefix")
        val day = dm.group("day")
        val monthStd = std(stripChars(dm.group("month"), " .ьъ"))
        val dateStr = s"$prefix $day ${if (monthStd == null) "None" else monthStd}"
        if ((prefix == "съ" || prefix == "с") && a.startDateRaw == null) {
          a.startDateRaw = dateStr; spans += ((dm.start(), dm.end()))
        } else if ((prefix == "до" || prefix == "по") && a.endDateRaw == null) {
          a.endDateRaw = dateStr; spans += ((dm.start(), dm.end()))
        }
      }
    }
    if (spans.nonEmpty) {
      val chars = text.toCharArray.map(_.toString)
      for ((s, e) <- spans; i <- s until e) chars(i) = ""
      text = stripChars(chars.mkString, " ,.")
    }

    // P8: vacancy (:395-400).
    val vm = vacancyPat.matcher(text)
    if (vm.find()) {
      a.isVacancy = true
      a.name = "вакансия"
      val remaining = stripChars(replaceFirstLiteral(text, vm.group(0), ""), " ,.")
      if (remaining.nonEmpty) a.appendNote(s"; Доп. о вакансии: $remaining")
      text = ""
    }

    if (!a.isVacancy) {
      var work = text

      // P9: "неим. чина" note (:405-408).
      val nm = neimChinaPat.matcher(work)
      if (nm.find()) {
        a.appendNote("; Неим\u0463ющ\u0456й чина")
        work = stripChars(replaceFirstLiteral(work, nm.group(0), ""), " ,.")
      }

      // P10: dictionary entity extraction, prof → edu → rank (:410-437).
      for ((pats, setter, getter) <- Seq[(Vector[(String, Vector[Pattern])], String => Unit, () => String)](
          (profPatterns, (v: String) => a.profAbbr = v, () => a.profAbbr),
          (eduPatterns, (v: String) => a.eduAbbr = v, () => a.eduAbbr),
          (rankPatterns, (v: String) => a.rankAbbr = v, () => a.rankAbbr))) {
        if (getter() == null) {
          val keyIt = pats.iterator
          while (keyIt.hasNext && getter() == null) {
            val (key, candidates) = keyIt.next()
            val candIt = candidates.iterator
            var matched = false
            while (candIt.hasNext && !matched) {
              val m = candIt.next().matcher(work)
              if (m.find()) {
                matched = true
                setter(key)
                work = stripChars(work.substring(0, m.start()) + work.substring(m.end()), " ,.;")
              }
            }
          }
        }
      }

      // P11: person-name extraction + ≤4-word fallback (:440-457).
      val textForName = stripChars(work, " ,.;")
      if (textForName.nonEmpty) {
        val m = namePat.matcher(textForName)
        if (m.find()) {
          val candidate = (1 to m.groupCount()).iterator.map(m.group).find(_ != null).orNull
          if (candidate != null) {
            a.name = std(stripChars(candidate, " ,."))
            text = stripChars(replaceFirstLiteral(textForName, candidate, ""), " ,.;")
          } else text = textForName
        } else if (textForName.split("\\s+").count(_.nonEmpty) <= 4 && textForName.length > 1 &&
            anyCyrLower.matcher(textForName).find()) {
          a.name = std(textForName)
          text = ""
        } else {
          text = textForName
        }
      } else text = ""
    }

    // P12: vacancy inferred from dates (:460-462).
    if (a.name == null && !a.isVacancy && a.specialRole == null &&
        (a.startDateRaw != null || a.endDateRaw != null)) {
      a.isVacancy = true
      a.name = "вакансия (предп. по датам)"
    }

    // Lone death-sign residue (:464-466).
    if (pyStrip(text) == DeathSign) {
      a.appendNote("; Умеръ (†)")
      text = ""
    }

    // P13: residue → notes; emit test (:468-485).
    if (text.nonEmpty) {
      val prefix =
        if (a.name == null && !a.isVacancy && a.specialRole == null) "Неразобр. остаток"
        else "Доп. инфо"
      val part = s"$prefix: $text"
      if (pyStrip(part) != prefix + ":")
        a.appendNote("; " + part)
    }

    if (a.name != null || a.isVacancy || a.specialRole == "старший инспектор") {
      if (a.specialRole == "старший инспектор") {
        val n = std(a.name)
        if (n == D.seniorInspMarkerStd || n == D.seniorFabInspMarkerStd) a.name = null
      }
      Some(a.result)
    } else None
  }
}
