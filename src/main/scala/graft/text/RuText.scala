package graft.text

import java.util.Locale
import java.util.regex.Pattern

/** Pre-reform-Cyrillic text normalization — the reference's scalar function
  * surface (SURVEY.md F1/F2/E4; populate_db_ru_v1.py:38-89, :253-262,
  * :264-302), reimplemented as pure Scala. Behavioral notes:
  *
  *  - Python's `re` is Unicode-aware by default; Java needs
  *    UNICODE_CHARACTER_CLASS ("(?U)") for `\b`/`\s`/`\w` to see Cyrillic,
  *    and UNICODE_CASE ("(?u)") for case-insensitive Cyrillic classes.
  *  - Python's `str.strip()` strips U+00A0; Java's `trim()` does not —
  *    `pyStrip` replicates Python.
  *  - Replacement order (aliases → char map → terminal ъ/ь strip →
  *    abbreviation unification → punctuation collapse → guarded trailing
  *    dot removal) is semantic: several later rewrites only fire because
  *    earlier ones already ran. Do not reorder.
  */
object RuText {

  /** Python str.strip(): removes Unicode whitespace from both ends. */
  def pyStrip(s: String): String = {
    def isWs(c: Char) = Character.isWhitespace(c) || Character.isSpaceChar(c)
    var i = 0
    var j = s.length
    while (i < j && isWs(s.charAt(i))) i += 1
    while (j > i && isWs(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Python str.strip(chars). */
  def stripChars(s: String, chars: String): String = {
    var i = 0
    var j = s.length
    while (i < j && chars.indexOf(s.charAt(i)) >= 0) i += 1
    while (j > i && chars.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(i, j)
  }

  /** Python str.lstrip(chars). */
  def lstripChars(s: String, chars: String): String = {
    var i = 0
    while (i < s.length && chars.indexOf(s.charAt(i)) >= 0) i += 1
    s.substring(i)
  }

  /** Python str.replace(old, new, 1): first literal occurrence only. */
  def replaceFirstLiteral(s: String, target: String, repl: String): String = {
    val i = s.indexOf(target)
    if (i < 0) s else s.substring(0, i) + repl + s.substring(i + target.length)
  }

  // City-alias and abbreviation rewrites, in source order (reference :44-56, :68-73).
  private val cityAliases = Vector(
    "с.-петербургъ" -> "с.-петербург",
    "с.-петербургь" -> "с.-петербург",
    "с. петербургъ" -> "с.-петербург",
    "с. петербург" -> "с.-петербург",
    "спб." -> "с.-петербург",
    "нижній-новгородъ" -> "нижній-новгород",
    "нижній новгородъ" -> "нижній-новгород",
    "нахичевань н/д." -> "нахичевань-на-дону",
    "нахичевань н/д" -> "нахичевань-на-дону",
    "в.-волочокъ" -> "вышній-волочек",
    "вышн.-волочокъ" -> "вышній-волочек",
    "иваново-вознесенскь" -> "иваново-вознесенск",
    "инж.-гех" -> "инж.-тех")

  private val charMap = Map('ѣ' -> 'е', 'і' -> 'и', 'ѳ' -> 'ф', 'ї' -> 'и', 'ѵ' -> 'и')

  private val abbrevUnify = Vector(
    "инж. техн." -> "инж.-техн.",
    "инж. тех." -> "инж.-тех.",
    "инж. мех." -> "инж.-мех.",
    "д-ръ мед." -> "д-р мед",
    "д-ръ мед" -> "д-р мед",
    "уч. инж.-тех." -> "уч. инж.-тех.")

  private val hardSignEnd = Pattern.compile("(?U)ъ(?=\\s|$|[.,;:!?])")
  private val softSignEnd = Pattern.compile("(?U)ь(?=\\s|$|[.,;:!?])")
  private val doubleDot = Pattern.compile("(?U)\\s*\\.\\s*\\.(?!\\s*[а-яё])")
  private val dotBeforeWs = Pattern.compile("(?U)\\s*\\.(?=\\s|$)")
  private val commaSpace = Pattern.compile("(?U)\\s*,\\s*")
  private val wsCollapse = Pattern.compile("(?U)\\s+")
  private val endInitial1 = Pattern.compile("(?U)\\b[а-яё]\\.$")
  private val endInitial2 = Pattern.compile("(?U)\\b[а-яё]\\.\\s*[а-яё]\\.$")
  private val shortAbbrev = Pattern.compile("(?U)[а-яё]{1,3}\\.")
  private val keepDotted = Set("с.", "г.", "д.", "у.", "м.")

  /** Reference `standardize_text` (:38-89). Returns null for null/blank. */
  def standardizeText(text: String): String = {
    if (text == null) return null
    var t = pyStrip(text)
    if (t.isEmpty) return null
    t = t.toLowerCase(Locale.ROOT)
    cityAliases.foreach { case (a, b) => t = t.replace(a, b) }
    t = t.map(c => charMap.getOrElse(c, c))
    t = hardSignEnd.matcher(t).replaceAll("")
    t = softSignEnd.matcher(t).replaceAll("")
    abbrevUnify.foreach { case (a, b) => t = t.replace(a, b) }
    t = doubleDot.matcher(t).replaceAll(".")
    t = dotBeforeWs.matcher(t).replaceAll(".")
    t = commaSpace.matcher(t).replaceAll(", ")
    t = pyStrip(wsCollapse.matcher(t).replaceAll(" "))
    if (t.endsWith(".") || t.endsWith(",")) {
      val keep = endInitial1.matcher(t).find() ||
        endInitial2.matcher(t).find() ||
        shortAbbrev.matcher(t).matches() ||
        keepDotted.contains(t)
      if (!keep) t = pyStrip(t.dropRight(1))
    }
    if (t.isEmpty) null else t
  }

  private val thousandsSep = Pattern.compile("[.,](?=\\d{3})")
  private val nonDigit = Pattern.compile("(?U)\\D")

  /** Reference `clean_number` (:253-262): "5.896"→5896, "—"→null. */
  def cleanNumber(numStr: String): Integer = {
    if (numStr == null) return null
    val t = pyStrip(numStr)
    if (t == "—" || t == "-" || t.isEmpty) return null
    var c = thousandsSep.matcher(t.replace(" ", "")).replaceAll("")
    c = nonDigit.matcher(c).replaceAll("")
    if (c.isEmpty) null else
      try Integer.valueOf(c) catch { case _: NumberFormatException => null }
  }

  private val initialSingle = Pattern.compile("(?U)[а-яё]\\.")
  private val initialGlued = Pattern.compile("(?U)[а-яё]\\.[а-яё]\\.")

  /** Reference `get_or_create_inspector_id`'s canonicalization (:264-302):
    * "и. а. федоров" → "федоров а.и." (initials sorted — quirk Q4).
    * Returns null when nothing survives.
    */
  def canonicalInspectorName(fullNameRaw: String): String = {
    val std = standardizeText(fullNameRaw)
    if (std == null) return null
    val initials = Vector.newBuilder[String]
    val surnames = Vector.newBuilder[String]
    std.split("\\s+").filter(_.nonEmpty).foreach { part =>
      if (initialSingle.matcher(part).matches()) initials += part
      else if (initialGlued.matcher(part).matches()) {
        initials += part.substring(0, 2)
        initials += part.substring(2)
      } else if (part.endsWith(".")) {
        if (part.length == 2 && Character.isLetter(part.charAt(0))) initials += part
        else surnames += part
      } else surnames += part
    }
    val surname = surnames.result().mkString(" ")
    val initialsStr = initials.result().map(_.replace(".", "")).sorted.map(_ + ".").mkString
    if (surname.nonEmpty && initialsStr.nonEmpty) s"$surname $initialsStr"
    else if (surname.nonEmpty) surname
    else if (initialsStr.nonEmpty) initialsStr
    else null
  }

  // NOTE: HTML entity decoding lives in graft.parse.MiniDom.unescapeEntities
  // (Python html.unescape semantics); an earlier commons-text-based helper
  // was removed because unescapeHtml4 misses &apos;/HTML5 names.
}
