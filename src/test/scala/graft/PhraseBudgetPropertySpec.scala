package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Curation, HashIndex}

/** Property checks for the round-13 selection/search family against
  * sequential brute forces on random corpora: d111 phrase counts, d105
  * greedy budget cuts, and d101 bloom == direct dedup under arbitrary
  * base/delta splits with planted duplicate text.
  */
class PhraseBudgetPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("phrase-budget-prop-spec")
  override def afterAll(): Unit = spark.stop()

  private def docsOf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private val word = Gen.oneOf("a", "b", "c", "ab")
  private val doc = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))

  test("phraseMatch equals a sliding-window brute force (property)") {
    val corpusGen = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, doc))
    val phraseGen = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(corpusGen, phraseGen) { (texts, terms) =>
      val got = Corpus.phraseMatch(docsOf(texts), terms.mkString(" "))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.trim.toLowerCase.split("\\s+").toSeq
        val n = toks.sliding(terms.length).count(_ == terms)
        if (n > 0) Some(i.toLong -> n.toLong) else None
      }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("budgetSelect equals the sequential greedy cut (property)") {
    val corpusGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, doc))
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(1L, 40L)) { (texts, budget) =>
      val got = Curation.budgetSelect(docsOf(texts), budget).collect()
        .map(r => (r.getLong(0), r.getLong(3))).toMap
      val scored = graft.ops.TextOps.qualityScore(docsOf(texts)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
        .sortBy { case (id, _, sc) => (-sc, id) }
      var acc = 0L
      val want = scored.iterator.map { case (id, nt, _) =>
        acc += nt; (id, acc)
      }.takeWhile(_._2 <= budget).toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("bloom-served dedup equals the direct probe (property, random splits)") {
    // small case count: each case persists an index; dup text planted by
    // the tiny vocabulary (identical short docs arise constantly)
    val corpusGen = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, doc))
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(1, 3)) { (texts, mod) =>
      val all = docsOf(texts)
      val base = all.where(col("doc_id") % (mod + 1) === 0)
      val delta = all.where(col("doc_id") % (mod + 1) =!= 0)
      if (base.isEmpty || delta.isEmpty) true
      else {
        val dir = java.nio.file.Files.createTempDirectory("graft-prop-bloom").toString
        try {
          HashIndex.save(base, dir)
          val viaBloom = HashIndex.dedupAgainstBloom(spark, delta, dir)
            .collect().map(r => (r.getLong(0), Option(r.get(2)), r.getBoolean(3))).toSet
          val direct = HashIndex.dedupAgainst(spark, delta, dir)
            .collect().map(r => (r.getLong(0), Option(r.get(2)), r.getBoolean(3))).toSet
          viaBloom == direct
        } finally Corpus.deleteRecursively(dir)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
