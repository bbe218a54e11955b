package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.Curation

/** d62 duplicate-span intervals + d63 scrub on planted passages: a
  * 7-token passage shared by two docs must merge its three overlapping
  * 5-gram hits into ONE interval per doc; within-doc-only repetition
  * must not flag (cross-doc convention, same as d25); the scrub must
  * cut exactly the covered tokens and keep one row per doc.
  */
class DupSpanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("dupspan-spec")
  override def afterAll(): Unit = spark.stop()

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f g x1 x2"),        // shared passage at tokens 0-6
      (2L, "y1 y2 a b c d e f g"),        // same passage at tokens 2-8
      (3L, "u v w p q r s t"),            // unique
      (4L, "m n o p q m n o p q")         // repeats WITHIN one doc only
    ).toDF("doc_id", "text")
  }

  test("d62: overlapping gram hits merge to one maximal interval per doc") {
    import spark.implicits._
    val out = Curation.dupSpanIntervals(corpus)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 6L, 3L), (2L, 2L, 8L, 3L)))
  }

  test("d62: hashGrams mode produces the identical interval set") {
    import spark.implicits._
    val plain = Curation.dupSpanIntervals(corpus)
      .as[(Long, Long, Long, Long)].collect().toSet
    val hashed = Curation.dupSpanIntervals(corpus, hashGrams = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(hashed == plain)
  }

  test("d63: scrub cuts exactly the covered tokens, one row per doc") {
    import spark.implicits._
    val out = Curation.dedupScrub(corpus)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("x1 x2", 2L)))
    assert(out(2L) == (("y1 y2", 2L)))
    assert(out(3L) == (("u v w p q r s t", 8L)))
    assert(out(4L) == (("m n o p q m n o p q", 10L)))
    assert(out.size == 4)
  }

  test("d63: a fully-duplicated doc survives as an empty row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p1 p2 p3 p4 p5"),
      (2L, "p1 p2 p3 p4 p5")).toDF("doc_id", "text")
    val out = Curation.dedupScrub(docs)
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "", 0L), (2L, "", 0L)))
  }

  test("d62: matches a sequential brute force on random corpora (property)") {
    import spark.implicits._
    val n = 3
    def brute(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] = {
      val pos = docs.map { case (id, t) =>
        val w = t.trim.toLowerCase.split("\\s+").toSeq
        id -> (if (w.length < n) Seq.empty[String]
               else w.sliding(n).map(_.mkString(" ")).toSeq)
      }
      val dupGrams = pos.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      pos.flatMap { case (id, gs) =>
        val hits = gs.zipWithIndex.collect { case (g, i) if dupGrams(g) => i }
        if (hits.isEmpty) Nil
        else {
          val islands = hits.tail.foldLeft(List(List(hits.head))) { (acc, p) =>
            if (p - acc.head.head <= n) (p :: acc.head) :: acc.tail
            else List(p) :: acc
          }.map(_.reverse).reverse
          islands.map(is =>
            (id, is.head.toLong, (is.last + n - 1).toLong, is.length.toLong))
        }
      }.toSet
    }
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    val corpusGen = Gen.choose(4, 8).flatMap(m => Gen.listOfN(m, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val prop = Prop.forAll(corpusGen) { corpus =>
      val got = Curation.dupSpanIntervals(corpus.toDF("doc_id", "text"), n)
        .as[(Long, Long, Long, Long)].collect().toSet
      got == brute(corpus)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- d121/d122: char granularity (Lee et al.'s published unit) ----

  /** Two docs share a 4-LONG-WORD passage (65+ chars); a third carries
    * the same passage with a fused missing space. Word-5-grams cannot
    * flag any of it (no 5 consecutive shared WORDS anywhere); 30-char
    * grams catch both the short-word-run copy and the
    * whitespace-variant copy. */
  private def charCorpus = {
    import spark.implicits._
    Seq(
      (1L, "aaa internationalization localization parallelization virtualization bbb"),
      (2L, "ccc internationalization localization parallelization virtualization ddd"),
      (3L, "eee internationalizationlocalization parallelization virtualization fff"),
      (4L, "unique prose with nothing repeated anywhere at all")
    ).toDF("doc_id", "text")
  }

  test("d121: char grams catch duplicates word-5-grams structurally miss") {
    import spark.implicits._
    // word mode: longest shared word run is 4 (docs 1-2) and 2 (doc 3)
    assert(Curation.dupSpanIntervals(charCorpus).count() == 0L)
    val out = Curation.dupSpanIntervalsChars(charCorpus)
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = out.groupBy(_._1)
    // all three passage carriers flagged, the unique doc not
    assert(byDoc.keySet == Set(1L, 2L, 3L))
    // docs 1/2: the shared region is " internationalization localization
    // parallelization virtualization " = char offsets 3..68 inclusive
    // (66 chars); the 37 30-grams fully inside it (starts 3..39) are
    // shared, merging to ONE maximal interval spanning the region
    assert(byDoc(1L).toSet == Set((1L, 3L, 68L, 37L)))
    assert(byDoc(2L).toSet == Set((2L, 3L, 68L, 37L)))
    // doc 3 matches docs 1/2 on its "localization parallelization
    // virtualization " region only (offsets 24..67 — grams crossing the
    // fused-token boundary match nothing): starts 24..38 = 15 grams
    assert(byDoc(3L).toSet == Set((3L, 24L, 67L, 15L)))
  }

  test("d121: hashGrams mode produces the identical interval set") {
    import spark.implicits._
    val plain = Curation.dupSpanIntervalsChars(charCorpus)
      .as[(Long, Long, Long, Long)].collect().toSet
    val hashed = Curation.dupSpanIntervalsChars(charCorpus, hashGrams = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(hashed == plain)
  }

  test("d122: char scrub cuts exactly the covered chars, one row per doc") {
    import spark.implicits._
    val out = Curation.dedupScrubChars(charCorpus)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 4)
    // docs 1/2: chars 3..69 cut from the 73-char normalized text —
    // "aaa" + the tail after the covered region
    assert(out(1L) == (("aaabbb", 6L)))
    assert(out(2L) == (("cccddd", 6L)))
    // doc 4 untouched (normalized == original: already single-spaced)
    assert(out(4L) == (("unique prose with nothing repeated anywhere at all", 50L)))
    // doc 3: kept = normalized length minus its covered-span width
    val spans3 = Curation.dupSpanIntervalsChars(charCorpus)
      .as[(Long, Long, Long, Long)].collect().filter(_._1 == 3L)
    val covered3 = spans3.map(s => s._3 - s._2 + 1).sum
    val norm3 = charCorpus.where($"doc_id" === 3L)
      .select(org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.trim($"text")), "\\s+", " "))
      .as[String].head()
    assert(out(3L)._2 == norm3.length - covered3)
  }

  test("d121/d122 agree on sf0.001: norm length minus kept equals coverage") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Curation.dupSpanIntervalsChars(docs)
      .orderBy($"doc_id", $"span_start")
      .as[(Long, Long, Long, Long)].collect()
    // maximality: intervals disjoint, non-adjacent per doc
    rows.groupBy(_._1).foreach { case (_, sp) =>
      sp.sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3 + 1, s"overlap/adjacency: $a $b")
        case _ =>
      }
    }
    val covered = rows.groupBy(_._1).view
      .mapValues(_.map(s => s._3 - s._2 + 1).sum).toMap
    val nChars = docs.select($"doc_id",
        length(regexp_replace(lower(trim($"text")), "\\s+", " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val kept = Curation.dedupScrubChars(docs)
      .select($"doc_id", $"n_kept_chars").as[(Long, Long)].collect().toMap
    nChars.foreach { case (id, n) =>
      assert(n - kept(id) == covered.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("d62/d63 agree: tokens minus kept equals interval coverage (sf0.001)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
    val spans = Curation.dupSpanIntervals(docs)
    // intervals are disjoint and ordered per doc (maximality)
    val rows = spans.orderBy($"doc_id", $"span_start")
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, sp) =>
      sp.sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3 + 1, s"overlap/adjacency: $a $b")
        case _ =>
      }
    }
    val covered = rows.groupBy(_._1).view
      .mapValues(_.map(s => s._3 - s._2 + 1).sum).toMap
    val nTok = docs.select($"doc_id",
        size(split(lower(trim($"text")), "\\s+")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val kept = Curation.dedupScrub(docs)
      .select($"doc_id", $"n_kept_tokens").as[(Long, Long)].collect().toMap
    nTok.foreach { case (id, n) =>
      assert(n - kept(id) == covered.getOrElse(id, 0L), s"doc $id")
    }
    assert(rows.nonEmpty, "corpus should contain at least one dup span")
  }
}
