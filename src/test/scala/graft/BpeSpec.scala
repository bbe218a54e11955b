package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Corpus

/** BPE merge learning (d51): the distributed trainer must reproduce a
  * sequential reference implementation of freq-weighted character-pair
  * BPE (left-to-right merge application, (cnt DESC, lhs, rhs)
  * tie-break) — first on a hand-checked fixture, then as a property
  * over random corpora.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("bpe-spec")
  override def afterAll(): Unit = spark.stop()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Sequential reference: word histogram -> merge loop over symbol
    * vectors. Returns (rank, lhs, rhs, cnt) rows. */
  private def refBpe(texts: Seq[String], merges: Int): Seq[(Long, String, String, Long)] = {
    val words = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    texts.foreach { t =>
      t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
        .foreach(w => words.update(w, words.getOrElse(w, 0L) + 1L))
    }
    // symbolization: one symbol per codepoint
    var syms: Map[String, Vector[String]] = words.keysIterator.map { w =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      w -> b.result()
    }.toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var k = 1
    var stop = false
    while (k <= merges && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((w, ss) <- syms; j <- 0 until ss.length - 1)
        counts.update((ss(j), ss(j + 1)),
          counts.getOrElse((ss(j), ss(j + 1)), 0L) + words(w))
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((k.toLong, l, r, c))
        syms = syms.map { case (w, ss) =>
          val b = Vector.newBuilder[String]
          var j = 0
          while (j < ss.length) {
            if (j < ss.length - 1 && ss(j) == l && ss(j + 1) == r) {
              b += (l + r); j += 2 // left-to-right non-overlapping
            } else { b += ss(j); j += 1 }
          }
          w -> b.result()
        }
        k += 1
      }
    }
    out.toSeq
  }

  private def run(texts: Seq[String], merges: Int) =
    Corpus.bpeTrain(
        docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*),
        merges)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)

  test("hand-checked fixture: merges, counts, and rank order") {
    // words: abab x3, aab x2 -> pair counts: (a,b) 2*3+1*2=8, (b,a) 3,
    // (a,a) 2 -> merge1 = (a,b). then 'abab'=[ab][ab], 'aab'=[a][ab]:
    // (ab,ab) 3, (a,ab) 2 -> merge2 = (ab,ab). then [abab], [a][ab]:
    // (a,ab) 2 -> merge3.
    val texts = Seq("abab abab aab", "abab aab")
    val got = run(texts, 3)
    assert(got == Seq((1L, "a", "b", 8L), (2L, "ab", "ab", 3L), (3L, "a", "ab", 2L)))
    assert(got == refBpe(texts, 3))
  }

  test("early stop: fully merged vocabulary yields fewer rows") {
    val got = run(Seq("aa aa", "bb"), 10)
    assert(got == refBpe(Seq("aa aa", "bb"), 10))
    assert(got.length < 10) // single-char tails exhaust well before 10
  }

  /** Reference segmentation: replay [[refBpe]]'s merge loop and return
    * the final subword histogram. */
  private def refSegment(texts: Seq[String], merges: Int): Map[String, Long] = {
    val words = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    texts.foreach { t =>
      t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
        .foreach(w => words.update(w, words.getOrElse(w, 0L) + 1L))
    }
    var syms: Map[String, Vector[String]] = words.keysIterator.map { w =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      w -> b.result()
    }.toMap
    refBpe(texts, merges).foreach { case (_, l, r, _) =>
      syms = syms.map { case (w, ss) =>
        val b = Vector.newBuilder[String]
        var j = 0
        while (j < ss.length) {
          if (j < ss.length - 1 && ss(j) == l && ss(j + 1) == r) {
            b += (l + r); j += 2
          } else { b += ss(j); j += 1 }
        }
        w -> b.result()
      }
    }
    val hist = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, ss) <- syms; sym <- ss)
      hist.update(sym, hist.getOrElse(sym, 0L) + words(w))
    hist.toMap
  }

  test("bpeSegment: subword histogram matches the reference replay") {
    val texts = Seq("abab abab aab", "abab aab ждж")
    val got = Corpus.bpeSegment(
        docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*),
        merges = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refSegment(texts, 3))
    // total subword mass == total character mass (merges conserve chars)
    val chars = texts.flatMap(_.split("\\s+")).map(_.length).sum
    assert(got.map { case (s, f) => s.length * f }.sum == chars)
  }

  test("bpeEncodeCounts: per-doc subword counts match the reference replay") {
    val texts = Seq("abab abab aab", "abab aab zz")
    val df = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    val got = Corpus.bpeEncodeCounts(df, merges = 3, headK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: replay merges, count subwords per doc token by token
    val refWordLen: Map[String, Long] = {
      val hist = refSegment(texts, 3) // proves syms conserve; recompute per word
      val words = texts.flatMap(_.split("\\s+")).distinct
      // reuse refBpe merges to segment each word
      var syms: Map[String, Vector[String]] = words.map { w =>
        w -> w.map(_.toString).toVector
      }.toMap
      refBpe(texts, 3).foreach { case (_, l, r, _) =>
        syms = syms.map { case (w, ss) =>
          val b = Vector.newBuilder[String]
          var j = 0
          while (j < ss.length) {
            if (j < ss.length - 1 && ss(j) == l && ss(j + 1) == r) {
              b += (l + r); j += 2
            } else { b += ss(j); j += 1 }
          }
          w -> b.result()
        }
      }
      assert(hist.nonEmpty) // refSegment exercised on the same corpus
      syms.view.mapValues(_.length.toLong).toMap
    }
    val expected = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split("\\s+").map(refWordLen).sum
    }.toMap
    assert(got == expected)
    // headK split is a plan detail
    val allHead = Corpus.bpeEncodeCounts(df, merges = 3, headK = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(allHead == expected)
  }

  test("distributed trainer == sequential reference (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small alphabet forces heavy pair collisions and ties, the spots
    // where tie-break or overlap-handling divergence would show; mixed
    // case and unicode cover the tokenize path
    val word = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "A", "ж", "☃")).map(_.mkString))
    val doc = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val corpusGen = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, doc))
    val prop = Prop.forAll(corpusGen) { texts =>
      run(texts, 5) == refBpe(texts, 5)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
