package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.{Lexical, MgAgg, MgSummary}

/** The lexical-statistics family (d76-d79): Misra-Gries heavy hitters
  * (exact mode == brute-force counts; production mode obeys the MG
  * bounds under ANY merge order), PMI bigrams, char entropy, and lexical
  * diversity against sequential brute forces. The DuckDB oracle gates
  * the registered bindings; this spec covers the knobs and corpora the
  * one registered binding cannot.
  */
class LexicalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("lexical-spec")
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def docsOf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def trueCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(t => t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  // ---- d76: Misra-Gries ------------------------------------------------

  test("exact mode (capacity >= distinct) equals brute-force counts, err 0") {
    val texts = Seq("a b b c c c", "c a  a", "d d b")
    val got = Lexical.heavyHitters(docsOf(texts), capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(_._3 == 0L))
    assert(got.map(t => t._1 -> t._2).toMap == trueCounts(texts))
  }

  test("production mode obeys the MG bounds (property, random corpora)") {
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val doc = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val corpusGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, doc))
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(2, 5)) { (texts, cap) =>
      val truth = trueCounts(texts)
      val n = truth.values.sum
      val rows = Lexical.heavyHitters(docsOf(texts), capacity = cap).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val dec = if (rows.isEmpty) 0L else rows.head._3
      // every stored counter undercounts by at most dec, never overcounts
      val bounds = rows.forall { case (t, c, _) =>
        c <= truth(t) && truth(t) - c <= dec
      }
      // dec never exceeds N/(cap+1); anything more frequent is present
      val have = rows.map(_._1).toSet
      val guaranteed = truth.forall { case (t, c) =>
        c * (cap + 1) <= n || have(t)
      }
      bounds && dec * (cap + 1) <= n && guaranteed && rows.length <= cap
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("MG merge keeps the bounds no matter how the stream is partitioned") {
    // sequential harness over the raw Aggregator: same stream, three
    // different partition shapes, one merged summary each — all must
    // satisfy the bounds (Spark's merge order is not ours to choose)
    val stream = ("a " * 30 + "b " * 20 + "c " * 5 + "d e f g h i j k").trim
      .split(" ").toSeq
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = new MgAgg(3)
    def summarize(parts: Seq[Seq[String]]): MgSummary = {
      val merged = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
        .reduceLeft(agg.merge)
      agg.finish(merged)
    }
    for (nParts <- Seq(1, 3, 7)) {
      val s = summarize(stream.grouped(math.max(1, stream.size / nParts)).toSeq)
      assert(s.toks.length <= 3)
      s.toks.zip(s.counts).foreach { case (t, c) =>
        assert(c <= truth(t) && truth(t) - c <= s.dec, s"$nParts parts: $t")
      }
      // a (the 30-of-66 majority token) must survive any partitioning
      assert(s.toks.contains("a"), s"$nParts parts lost the heavy hitter")
      assert(s.dec * 4 <= stream.size)
    }
  }

  // ---- d77: PMI bigrams ------------------------------------------------

  test("pmiBigrams equals a sequential brute force (values and row set)") {
    val texts = Seq("x y x y x y z", "x y q q q", "q q x y")
    val toks = texts.map(_.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq)
    val bigrams = toks.flatMap(ws => ws.zip(ws.tail))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bc = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nu = uni.values.sum.toDouble
    val nb = bc.values.sum.toDouble
    val expected = bc.filter(_._2 >= 2).map { case ((w1, w2), n) =>
      val raw = math.log((n.toDouble * nu * nu) / (nb * uni(w1) * uni(w2)))
      (w1, w2, n, BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    }.toSet
    val got = Lexical.pmiBigrams(docsOf(texts), minCount = 2, topK = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
  }

  test("topK truncation keeps the integer-deterministic prefix") {
    val texts = Seq("a b a b a b c d c d e f")
    val got = Lexical.pmiBigrams(docsOf(texts), minCount = 1, topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // counts: (a,b)=3, (b,a)=2, (c,d)=2, rest 1 -> top2 by (n DESC, w1, w2)
    assert(got == Set(("a", "b", 3L), ("b", "a", 2L)))
  }

  // ---- d78: char entropy -----------------------------------------------

  test("charEntropy matches a sequential brute force (property)") {
    val textGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ', 'ж', '1')).map(_.mkString))
    val prop = Prop.forAll(Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, textGen))) {
      texts =>
        val got = Lexical.charEntropy(docsOf(texts)).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
          .toMap
        texts.zipWithIndex.forall { case (t, i) =>
          val counts = t.groupBy(identity).view.mapValues(_.size).toMap
          val n = t.length.toDouble
          val h =
            if (t.isEmpty) 0.0
            else -counts.toSeq.sortBy(_._1).map { case (_, c) =>
              (c / n) * math.log(c / n)
            }.sum
          val hr = BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
          got(i.toLong) == ((t.length.toLong, counts.size.toLong, hr))
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("uniform text hits ln(k); single-char text hits exactly 0.0 (never -0.0)") {
    val rows = Lexical.charEntropy(docsOf(Seq("abcd", "aaaa", "")))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(0L) == BigDecimal(math.log(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rows(1L).compareTo(0.0) == 0 && 1.0 / rows(1L) > 0, "must be +0.0")
    assert(rows(2L).compareTo(0.0) == 0)
  }

  // ---- d79: lexical diversity ------------------------------------------

  test("lexicalDiversity matches a sequential brute force") {
    val texts = Seq("a a b c", "x", "  ", "a A a")
    val got = Lexical.lexicalDiversity(docsOf(texts)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // "a a b c": 4 tokens, 3 distinct, 2 hapax
    assert(got(0L) == ((4L, 3L, 2L, 3.0 / 4.0, 2.0 / 3.0)))
    // single token: everything 1, ratios 1.0
    assert(got(1L) == ((1L, 1L, 1L, 1.0, 1.0)))
    // whitespace-only: one empty token (the shared tokenize convention)
    assert(got(2L) == ((1L, 1L, 1L, 1.0, 1.0)))
    // case-folded: "a A a" -> 3x "a", 0 hapax
    assert(got(3L) == ((3L, 1L, 0L, 1.0 / 3.0, 0.0)))
  }

  // ---- d83: unk replacement --------------------------------------------

  test("unkReplace replaces exactly the below-share tokens, in place") {
    // 20 tokens total; share threshold 1/10 -> tokens with c*10 < 20
    // (i.e. count 1) are rare: exactly "y" and "z"
    val texts = Seq(
      "a a a a a b b b b y", // 10 tokens
      "a a a b b b c c c z") // 10 tokens (c has 3 >= 2)
    val got = Lexical.unkReplace(docsOf(texts), shareNum = 1, shareDen = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(0L) == ((10L, 1L, "a a a a a b b b b <unk>")))
    assert(got(1L) == ((10L, 1L, "a a a b b b c c c <unk>")))
  }

  test("unkReplace is the identity rebuild when nothing is rare") {
    val texts = Seq("X  y x", "y x y")
    val got = Lexical.unkReplace(docsOf(texts), shareNum = 1, shareDen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // canonical rebuild: lowercased, single-spaced, zero replacements
    assert(got(0L) == ((0L, "x y x")))
    assert(got(1L) == ((0L, "y x y")))
  }

  test("registered d83 binding actually replaces the rare tail on the test corpus") {
    val rows = SparkEntry.queries("d83_unk_replace")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getLong(2) > 0),
      "threshold is vacuous on the test corpus — no rare tokens replaced")
  }

  test("MG sketch is a streaming aggregate: heavy hitters over a stream in bounded memory") {
    // the mergeable summary is exactly what an unbounded stream needs —
    // complete-mode global aggregation whose state is <= capacity entries
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = in.toDS()
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("value"), " ")).as("token"))
      .as[String]
      .select(new MgAgg(8).toColumn)
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete).start()
    try {
      in.addData("a a a b", "a b c")
      q.processAllAvailable()
      in.addData("a d e f", "a a b b")
      q.processAllAvailable()
      val s = spark.table("mg_stream").as[MgSummary].collect().head
      val counts = s.toks.zip(s.counts).toMap
      // 15 tokens total, capacity 8 >= 6 distinct -> still exact
      assert(s.dec == 0L)
      assert(counts == Map("a" -> 7L, "b" -> 4L, "c" -> 1L, "d" -> 1L,
        "e" -> 1L, "f" -> 1L))
    } finally q.stop()
  }

  // ---- registered bindings ---------------------------------------------

  test("registered d76 binding runs in exact mode on the test corpus") {
    val rows = SparkEntry.queries("d76_heavy_hitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) == 0L), "registered binding must be exact")
  }
}
