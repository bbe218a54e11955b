package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Similarity

/** d103 MMR diversified top-3: the redundancy penalty must demote a
  * near-copy of the first pick in favor of a diverse candidate, λ=1
  * must collapse to plain cosine ranking, and the registered binding
  * must emit well-formed (pos 1..3, distinct neighbors) rows.
  */
class MmrSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("mmr-spec")
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def vecsOf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("the diversity penalty demotes a near-copy of the first pick") {
    // query 0 at e1; candidates: 1 and 2 nearly identical close to e1,
    // 3 clearly less similar to the query but nearly orthogonal to 1.
    // Plain top-3: 1, 2, 3. MMR at λ=0.5: 1 first, then 3 — candidate
    // 2's ~1.0 redundancy with 1 (score 0.5·0.990 − 0.5·1.0 ≈ −0.005)
    // loses to 3's diversity (0.5·0.6 − 0.5·0.594 ≈ +0.003).
    val vecs = vecsOf(Seq(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.99f, 0.14f, 0f),
      2L -> Seq(0.99f, 0.141f, 0f),
      3L -> Seq(0.6f, 0f, 0.8f)))
    val got = Similarity.mmrRerank(vecs).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got(1L) == 1L, s"pos1 must be the plain nearest: $got")
    assert(got(2L) == 3L, s"pos2 must be the diverse candidate: $got")
    assert(got(3L) == 2L, s"pos3 takes the demoted near-copy: $got")
  }

  test("λ=1 collapses to the plain cosine top-3 ranking") {
    val vecs = graft.ops.Tables.embeddings(spark, sf)
    val mmr = Similarity.mmrRerank(vecs, lambda = 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val plain = Similarity.cosineTopK(vecs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(mmr == plain)
  }

  test("registered d103 binding: 3 distinct picks per query from its pool") {
    val rows = SparkEntry.queries("d103_mmr_rerank")(spark, sf).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(Array(1L, 2L, 3L)),
        s"query $q positions")
      val picks = rs.map(_.getLong(2))
      assert(picks.distinct.length == 3, s"query $q repeated a pick")
      assert(!picks.contains(q), s"query $q picked itself")
    }
  }

  test("d123: ANN source in exact geometry equals the exact rerank") {
    val vecs = graft.ops.Tables.embeddings(spark, sf)
    val exact = Similarity.mmrRerank(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ann = Similarity.mmrRerankAnn(vecs,
        tables = 1, bitsPerTable = 1, probeFlips = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ann == exact)
  }

  test("production-knob ANN rerank: bounded pick agreement vs exact") {
    val vecs = graft.ops.Tables.embeddings(spark, sf)
    val exact = Similarity.mmrRerank(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ann = Similarity.mmrRerankAnn(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // same query universe (every nonzero vector reranks something)
    assert(ann.keySet.map(_._1) == exact.keySet.map(_._1))
    // pick agreement: the ANN pool's candidate recall bounds fidelity —
    // at d08's measured recall (1.0 at sf0.001/sf0.1 per bench quality)
    // the pools nearly coincide; require >= 90% positional agreement so
    // a future knob/codepath regression that guts the candidate stream
    // fails loudly without flaking on genuine boundary ties.
    val common = exact.keySet.intersect(ann.keySet)
    val agree = common.count(k => exact(k) == ann(k))
    assert(common.nonEmpty)
    assert(agree.toDouble / common.size >= 0.9,
      s"positional agreement ${agree.toDouble / common.size}")
  }
}
