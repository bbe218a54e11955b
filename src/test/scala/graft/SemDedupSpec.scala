package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.{Corpus, Similarity}

/** Semantics of the round-9 curation quartet on planted geometry:
  * d57 SemDeDup keep-list, d58 semantic dup clusters, d59 hard-negative
  * mining, d60 asymmetric containment.
  */
class SemDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("semdedup-spec")
  override def afterAll(): Unit = spark.stop()

  // a-b-c chain: cos(a,b) and cos(b,c) above 0.9, cos(a,c) below; d is
  // far from everything
  private def chain = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9659f, 0.2588f)),  // 15 deg from a
      (3L, Array(0.8660f, 0.5f)),     // 30 deg from a, 15 from b
      (4L, Array(0.0f, 1.0f))         // 90 deg: no neighbor
    ).toDF("vec_id", "embedding")
  }

  test("d57: keep-list drops exactly the vectors with a smaller-id near neighbor") {
    import spark.implicits._
    // threshold 0.95: pairs are (1,2) and (2,3) only — cos 15 deg ~ 0.966,
    // cos 30 deg ~ 0.866
    val kept = Corpus.semDedupKeep(chain, threshold = 0.95)
      .as[(Long, Boolean)].collect().toMap
    assert(kept == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
    // the parallel rule is MORE aggressive than sequential greedy: c (id 3)
    // drops because of dropped b — documented in the scaladoc; and exactly
    // one row per input vector
    assert(kept.size == 4)
  }

  test("d57: composes over a caller-supplied pair stream") {
    import spark.implicits._
    val pairs = Seq((1L, 4L)).toDF("vec_a", "vec_b")
    val kept = Corpus.semDedupKeepFrom(chain, pairs)
      .as[(Long, Boolean)].collect().toMap
    assert(kept == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false))
  }

  test("d58: clusters are min-id labeled, chain-connected, singletons absent") {
    import spark.implicits._
    val out = Corpus.semanticDupClusters(spark, chain, threshold = 0.95)
      .as[(Long, Long, Long)].collect().toSet
    // a-b-c chain into one component labeled by min id 1; d absent
    assert(out == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)))
  }

  test("d59: hard negatives are different-label, ranked, unlabeled excluded") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), Some(0)),
      (2L, Array(0.9659f, 0.2588f), Some(0)),   // same label: never a negative
      (3L, Array(0.8660f, 0.5f), Some(1)),      // nearest different-label to 1
      (4L, Array(0.0f, 1.0f), Some(1)),
      (5L, Array(0.7071f, 0.7071f), None)       // unlabeled: excluded both ways
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegativeTopK(vecs, k = 2)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // anchor 1 (label 0): negatives ranked 3 (cos .866) then 4 (cos 0)
    assert(out(1L) == Seq(3L, 4L))
    // anchor 3 (label 1): negatives 2 (cos .966) then 1 (cos .866)
    assert(out(3L) == Seq(2L, 1L))
    // unlabeled vec 5 anchors nothing and serves nowhere
    assert(!out.contains(5L))
    assert(!out.values.exists(_.contains(5L)))
  }

  test("d60: containment is directed and exact at the integer boundary") {
    import spark.implicits._
    // b's text starts with a's 8 tokens (all 5 of a's 4-grams contained)
    // then diverges: C(a->b) = 5/5 = 1, C(b->a) = 5/17 < 4/5.
    val a = "w1 w2 w3 w4 w5 w6 w7 w8"
    val b = a + " x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"
    val docs = Seq((10L, a), (20L, b)).toDF("doc_id", "text")
    val out = Similarity.containmentPairs(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((10L, 20L, 5L, 5L)))

    // boundary: 4 of 5 grams shared is exactly 4/5 — kept (>=, integer
    // arithmetic, no float rounding); direction with 4/17 is dropped
    val c = "w1 w2 w3 w4 w5 w6 w7 z8"  // shares grams 1..4 of a, not the 5th
    val out2 = Similarity.containmentPairs(
        Seq((10L, a), (30L, c)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out2 == Set((10L, 30L, 4L, 5L), (30L, 10L, 4L, 5L)))
  }

  test("d61: ANN-pair keep-list at exact geometry equals the exact keep-list") {
    import spark.implicits._
    val vecs = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Corpus.semDedupKeep(vecs)
      .as[(Long, Boolean)].collect().toMap
    val ann = Corpus.semDedupKeepFrom(vecs,
        Similarity.cosineNearDupPairsAnn(vecs, threshold = 0.4,
          tables = 1, bitsPerTable = 1, probeFlips = 1))
      .as[(Long, Boolean)].collect().toMap
    assert(ann == exact)
    assert(exact.values.exists(!_), "corpus should contain at least one drop")
  }

  test("d60: agrees with brute-force containment on the sf0.001 corpus") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.ops.Tables.documents(spark, sf)
    val got = Similarity.containmentPairs(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute force over word-4-gram string sets
    def grams(t: String): Set[Seq[String]] = {
      val w = t.trim.toLowerCase.split("\\s+").toSeq
      if (w.length < 4) Set.empty else w.sliding(4).map(_.toSeq).toSet
    }
    val all = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> grams(t) }.filter(_._2.nonEmpty)
    val want = (for {
      (ia, ga) <- all; (ib, gb) <- all if ia != ib
      inter = (ga & gb).size
      if inter * 5 >= ga.size * 4
    } yield (ia, ib, inter.toLong, ga.size.toLong)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }
}
