package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.Retrieval

/** Sequential replays of the documented retrieval formulas (d136/d137):
  * BM25 (k1=1.2, b=0.75, RSJ +1 idf) and TF-IDF keyword extraction,
  * computed independently in plain Scala over a small corpus with the
  * same tokenization, rounding, and tie-break rules, then compared
  * exactly against the DataFrame plans — including query-term
  * selection, rank cutoffs, and deterministic ties.
  */
class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("retrieval-spec")
  override def afterAll(): Unit = spark.stop()

  /** Spark/DuckDB `round(x, 4)`: half away from zero. */
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log"),
    (3L, "cats and dogs and cats and ferrets"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "mat mat mat the mat"))

  private def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq

  private lazy val tf: Map[(Long, String), Long] =
    docs.flatMap { case (id, t) => toks(t).map(id -> _) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  private lazy val dl: Map[Long, Long] =
    tf.toSeq.groupBy(_._1._1).map { case (d, xs) => d -> xs.map(_._2).sum }
  private lazy val dfm: Map[String, Long] =
    tf.keys.toSeq.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }

  test("bm25TopK matches a sequential replay of the documented formula") {
    import spark.implicits._
    val n = docs.size
    val avgdl = dl.values.sum.toDouble / n
    // query terms: top-3 by (df desc, term asc)
    val qterms = dfm.toSeq.sortBy { case (t, d) => (-d, t) }.take(3)
    val expected = qterms.flatMap { case (term, df) =>
      val scored = docs.map(_._1).filter(d => tf.contains((d, term))).map { d =>
        val f = tf((d, term)).toDouble
        val idf = math.log(1.0 + ((n - df).toDouble + 0.5) / (df.toDouble + 0.5))
        val score = r4(idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(d).toDouble / avgdl)))
        (d, tf((d, term)), score)
      }.sortBy { case (d, _, s) => (-s, d) }.take(2)
      scored.zipWithIndex.map { case ((d, f, s), i) =>
        (term, d, f, s, (i + 1).toLong)
      }
    }.toSet
    val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), nQueryTerms = 3, k = 2)
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(got == expected)
  }

  test("bm25TopK: rank is dense per term, capped at k, scores non-increasing") {
    import spark.implicits._
    val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), nQueryTerms = 4, k = 3)
      .as[(String, Long, Long, Double, Long)].collect()
    val byTerm = got.groupBy(_._1)
    assert(byTerm.size == 4)
    byTerm.values.foreach { rows =>
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1L to sorted.size).toSeq)
      assert(sorted.size <= 3)
      // non-increasing scores in rank order; doc-id ascending within ties
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._2 < b._2))
        case _ =>
      }
    }
  }

  test("tfidfKeywords matches a sequential replay, ties to the smaller term") {
    import spark.implicits._
    val n = docs.size
    val expected = docs.map(_._1).flatMap { d =>
      val scored = toks(docs.find(_._1 == d).get._2).distinct.map { t =>
        val score = r4(tf((d, t)).toDouble * math.log(n.toDouble / dfm(t).toDouble))
        (t, tf((d, t)), score)
      }.sortBy { case (t, _, s) => (-s, t) }.take(3)
      scored.zipWithIndex.map { case ((t, f, s), i) => (d, t, f, s, (i + 1).toLong) }
    }.toSet
    val got = Retrieval.tfidfKeywords(docs.toDF("doc_id", "text"), k = 3)
      .as[(Long, String, Long, Double, Long)].collect().toSet
    assert(got == expected)
  }

  test("qlTopK matches a sequential replay of the Dirichlet formula") {
    import spark.implicits._
    val ctot = dl.values.sum.toDouble
    val cf: Map[String, Long] =
      tf.toSeq.groupBy(_._1._2).map { case (t, xs) => t -> xs.map(_._2).sum }
    val qterms = dfm.toSeq.sortBy { case (t, d) => (-d, t) }.take(3).map(_._1)
    val expected = qterms.flatMap { term =>
      val scored = docs.map(_._1).filter(d => tf.contains((d, term))).map { d =>
        val f = tf((d, term)).toDouble
        val score = r4(math.log(
          (f + 2000.0 * (cf(term).toDouble / ctot)) / (dl(d).toDouble + 2000.0)))
        (d, tf((d, term)), score)
      }.sortBy { case (d, _, s) => (-s, d) }.take(2)
      scored.zipWithIndex.map { case ((d, f, s), i) =>
        (term, d, f, s, (i + 1).toLong)
      }
    }.toSet
    val got = Retrieval.qlTopK(docs.toDF("doc_id", "text"), nQueryTerms = 3, k = 2)
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(got == expected)
  }

  test("qlTopK: higher tf wins at equal length; shorter doc wins at equal tf") {
    import spark.implicits._
    // doc 1 has the term twice in 4 tokens, doc 2 once in 4, doc 3 once in 8;
    // "a" is in all 3 docs and wins the df tie lexicographically
    val corpus = Seq(
      (1L, "a a x b"), (2L, "a c x b"), (3L, "a c x b e f g h"))
    val got = Retrieval.qlTopK(corpus.toDF("doc_id", "text"), nQueryTerms = 1, k = 3)
      .as[(String, Long, Long, Double, Long)].collect()
    assert(got.forall(_._1 == "a"))
    val byRank = got.sortBy(_._5).map(_._2).toSeq
    assert(byRank == Seq(1L, 2L, 3L))
  }

  test("tfidfKeywords: a term present in every document scores exactly zero") {
    import spark.implicits._
    // "the" appears in docs 1,2,4,5 but not 3 — plant a corpus where a
    // term IS universal and assert ln(N/df) = 0 exactly
    val uni = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha delta"))
    val got = Retrieval.tfidfKeywords(uni.toDF("doc_id", "text"), k = 2)
      .as[(Long, String, Long, Double, Long)].collect()
    val alphas = got.filter(_._2 == "alpha")
    assert(alphas.length == 3 && alphas.forall(_._4 == 0.0))
    // and the non-universal term outranks it in every doc
    assert(got.filter(_._5 == 1L).forall(_._2 != "alpha"))
  }

  test("rrfFuse: fixed-point contributions sum exactly; ties break to lower doc") {
    import spark.implicits._
    // 1e9 div 61 = 16393442, 1e9 div 62 = 16129032 (floor division)
    val a = Seq(("t", 1L, 1L), ("t", 3L, 2L)).toDF("term", "doc_id", "rank")
    val b = Seq(("t", 2L, 1L), ("t", 4L, 2L)).toDF("term", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._5)
    // docs 1 and 2 tie at rank-1 contribution -> doc 1 first; 3 and 4
    // tie at rank-2 contribution -> doc 3 third
    assert(got.toSeq == Seq(
      ("t", 1L, 16393442L, 1L, 1L), ("t", 2L, 16393442L, 1L, 2L),
      ("t", 3L, 16129032L, 1L, 3L), ("t", 4L, 16129032L, 1L, 4L)))
  }

  test("rrfFuse: consensus doc outranks either list's solo winner; k caps") {
    import spark.implicits._
    val a = Seq(("t", 1L, 1L), ("t", 9L, 2L)).toDF("term", "doc_id", "rank")
    val b = Seq(("t", 2L, 1L), ("t", 9L, 2L)).toDF("term", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 2)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._5)
    // doc 9 appears in BOTH lists at rank 2: 2×16129032 = 32258064 beats
    // any single rank-1 hit (16393442)
    assert(got.length == 2)
    assert(got(0) == (("t", 9L, 32258064L, 2L, 1L)))
    assert(got(1)._2 == 1L && got(1)._4 == 1L)
  }

  test("prfExpansion: feedback-set term totals, query term excluded, ties to smaller term") {
    import spark.implicits._
    // query term = the universal "q" (df 4, wins the df ranking); its
    // feedback set at kDocs=2 is the two best-scoring docs. "b" appears
    // in doc 1 twice and doc 2 once; "a" once in each; "z" only in the
    // excluded docs.
    val corpus = Seq(
      (1L, "q b b a"), (2L, "q b a"), (3L, "q z z z z z z z"), (4L, "q z z z z z z z z"))
    val df = corpus.toDF("doc_id", "text")
    val got = Retrieval.prfExpansion(df, nQueryTerms = 1, kDocs = 2, kTerms = 3)
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.forall(_._1 == "q"))
    assert(!got.exists(_._2 == "q")) // the query term never expands itself
    // BM25 prefers the short docs 1 and 2 for "q" (same tf, shorter dl)
    val byRank = got.sortBy(_._5).toSeq
    assert(byRank.map(r => (r._2, r._3, r._4)) ==
      Seq(("b", 3L, 2L), ("a", 2L, 2L), ("z", 0L, 0L)).filter(_._2 > 0))
  }

  test("prfExpansion: rank caps at kTerms and is dense per query term") {
    import spark.implicits._
    val got = Retrieval.prfExpansion(docs.toDF("doc_id", "text"),
        nQueryTerms = 3, kDocs = 3, kTerms = 2)
      .as[(String, String, Long, Long, Long)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rows) =>
      val ranks = rows.map(_._5).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq && ranks.length <= 2)
    }
    assert(got.forall(r => r._1 != r._2))
  }

  test("d143 shape: fusing bm25 and ql replays a sequential fusion of their outputs") {
    import spark.implicits._
    val corpus = docs.toDF("doc_id", "text")
    val bm = Retrieval.bm25TopK(corpus, nQueryTerms = 3, k = 4)
      .select("term", "doc_id", "rank").as[(String, Long, Long)].collect()
    val ql = Retrieval.qlTopK(corpus, nQueryTerms = 3, k = 4)
      .select("term", "doc_id", "rank").as[(String, Long, Long)].collect()
    val expected = (bm ++ ql).toSeq
      .groupBy(t => (t._1, t._2))
      .map { case ((term, doc), hits) =>
        (term, doc, hits.map(h => 1000000000L / (60L + h._3)).sum, hits.size.toLong) }
      .toSeq
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).zipWithIndex.collect {
          case ((term, doc, rrf, n), i) if i < 4 => (term, doc, rrf, n, i + 1L) }
      }.toSet
    val got = Retrieval.rrfFuse(
      Seq(Retrieval.bm25TopK(corpus, nQueryTerms = 3, k = 4),
        Retrieval.qlTopK(corpus, nQueryTerms = 3, k = 4)), k = 4)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("prfExpansion tokenizes ONCE: no Generate survives in the main plan") {
    import spark.implicits._
    // the postings frame feeds five plan branches; before the shared
    // materialization the executed plan carried SEVEN Generate nodes
    // (ReuseExchange did not dedupe the separately planned copies). The
    // one explode now runs in the localCheckpoint job; the main plan
    // must read the materialization — zero Generates.
    val df = Retrieval.prfExpansion(docs.toDF("doc_id", "text"),
      nQueryTerms = 2, kDocs = 2, kTerms = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val generates = plan.linesIterator.count(_.contains("Generate explode"))
    assert(generates == 0, s"expected 0 Generates (tokenize runs once at " +
      s"materialization), saw $generates:\n$plan")
  }

  test("indexed QL/PRF (d149/d150 path) equal the direct corpus paths") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lexq-spec").toString
    try {
      val corpus = docs.toDF("doc_id", "text")
      graft.ops.LexIndex.save(corpus, dir)
      val post = graft.ops.LexIndex.postings(spark, dir)
      val qlIdx = Retrieval.qlTopKFrom(post, nQueryTerms = 3, k = 2)
        .as[(String, Long, Long, Double, Long)].collect().toSet
      val qlDirect = Retrieval.qlTopK(corpus, nQueryTerms = 3, k = 2)
        .as[(String, Long, Long, Double, Long)].collect().toSet
      assert(qlIdx == qlDirect)
      val prfIdx = Retrieval.prfExpansionFrom(post, nQueryTerms = 2, kDocs = 2, kTerms = 3)
        .as[(String, String, Long, Long, Long)].collect().toSet
      val prfDirect = Retrieval.prfExpansion(corpus, nQueryTerms = 2, kDocs = 2, kTerms = 3)
        .as[(String, String, Long, Long, Long)].collect().toSet
      assert(prfIdx == prfDirect)
    } finally graft.ops.Corpus.deleteRecursively(dir)
  }

  test("searchQl: the bucket-pruned serve path equals the direct explicit-terms QL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lexq-serve").toString
    try {
      val corpus = docs.toDF("doc_id", "text")
      graft.ops.LexIndex.save(corpus, dir)
      val terms = Seq("the", "mat", "dog")
      val served = graft.ops.LexIndex.searchQl(spark, dir, terms, k = 3)
        .as[(String, Long, Long, Double, Long)].collect().toSet
      val direct = Retrieval.qlRank(corpus, terms, k = 3)
        .as[(String, Long, Long, Double, Long)].collect().toSet
      assert(served == direct && served.nonEmpty)
      // every query term that occurs in the corpus is served
      assert(served.map(_._1) == Set("the", "mat", "dog"))
    } finally graft.ops.Corpus.deleteRecursively(dir)
  }
}
