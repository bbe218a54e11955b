package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.text.RuText

/** Native Catalyst expressions (standardize_text / clean_number /
  * canonical_inspector_name): SQL-callable via GraftExtensions, agree
  * with the pure-Scala reference implementations on fixtures and random
  * strings, stay out of the ScalaUDF path, and survive codegen.
  */
class NativeFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("native-fns-spec")
  override def afterAll(): Unit = spark.stop()

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def sql1(fn: String, value: String): Any = {
    import spark.implicits._
    Seq(value).toDF("s").createOrReplaceTempView("t1")
    spark.sql(s"SELECT $fn(s) AS r FROM t1").collect().head.get(0)
  }

  test("native expressions agree with RuText on fixtures and nulls") {
    assert(sql1("standardize_text", "С.-Петербургъ.") == "с.-петербург")
    assert(sql1("clean_number", "5.896") == 5896)
    assert(sql1("canonical_inspector_name", "и. а. федоров") == "федоров а.и.")
    assert(sql1("standardize_text", "   ") == null) // non-null input, null result
    assert(sql1("clean_number", "—") == null)
  }

  test("plan has no ScalaUDF (whole-stage codegen preserved)") {
    import spark.implicits._
    Seq("Архангельскъ", "—", "5.896").toDF("s").createOrReplaceTempView("t2")
    val df = spark.sql("SELECT standardize_text(s), clean_number(s), canonical_inspector_name(s) FROM t2")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(df.collect().length == 3) // executes under codegen without error
  }

  test("native standardize_text ≡ RuText.standardizeText (property, via SQL)") {
    import spark.implicits._
    val ruChars = Gen.oneOf("абвъь ѣі.,-—()12XY†».".toSeq)
    val strs = Gen.listOfN(10, ruChars).map(_.mkString)
    // batch the comparison: one SQL round-trip over 100 generated strings
    val samples = Gen.listOfN(100, strs).sample.get
    samples.toDF("s").createOrReplaceTempView("t3")
    val rows = spark.sql("SELECT s, standardize_text(s) AS r FROM t3").collect()
    rows.foreach(r => assert(r.get(1) == RuText.standardizeText(r.getString(0)), s"input='${r.getString(0)}'"))
  }

  test("nfc_normalize composes combining sequences; NFC input passes through; null-safe") {
    import spark.implicits._
    val decomposed = "cafe\u0301" // e + U+0301 COMBINING ACUTE ACCENT
    val composed = "caf\u00e9"     // precomposed e-acute
    Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"), (4L, null))
      .toDF("id", "s").createOrReplaceTempView("tnfc")
    val got = spark.sql(
      "SELECT id, nfc_normalize(s) AS r, length(nfc_normalize(s)) AS n FROM tnfc")
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(got(1L) == ((composed, 4L)), "decomposed sequence must compose")
    assert(got(2L) == ((composed, 4L)), "NFC input must pass through unchanged")
    assert(got(3L) == (("plain ascii", 11L)))
    assert(got(4L) == ((null, null)), "null in, null out")
    // NFC (not NFKC): compatibility characters like the fi ligature
    // must survive — only canonical composition is applied
    val lig = spark.sql("SELECT nfc_normalize('ﬁsh')").head().getString(0)
    assert(lig == "ﬁsh")
  }
}
