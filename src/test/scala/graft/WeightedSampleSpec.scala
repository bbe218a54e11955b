package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.Curation

/** d125 weighted stratified sample: the md5 min-ticket race must agree
  * with a sequential brute-force replay exactly (same ticket strings,
  * same ordering), be weight-monotone in aggregate, and respect the
  * per-stratum k bound.
  */
class WeightedSampleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("weighted-sample-spec")
  override def afterAll(): Unit = spark.stop()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The engine's exact semantics, sequentially. */
  private def brute(docs: Seq[(Long, String, String)], k: Int,
      maxWeight: Int): Set[(Long, String, Long)] = {
    val keyed = docs.map { case (id, source, text) =>
      val w = math.min(math.max(
        text.trim.toLowerCase.split("\\s+").length, 1), maxWeight)
      val ticket = (1 to w).map(i => md5hex(s"$id:$i")).min
      (id, source, ticket)
    }
    keyed.groupBy(_._2).flatMap { case (src, ds) =>
      ds.sortBy(d => (d._3, d._1)).take(k).zipWithIndex
        .map { case (d, i) => (d._1, src, (i + 1).toLong) }
    }.toSet
  }

  test("matches the sequential brute force on the sf0.001 corpus") {
    import spark.implicits._
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
    val local = docs.select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq
    val got = Curation.weightedSample(docs)
      .as[(Long, String, Long)].collect().toSet
    assert(got == brute(local, 20, 64))
    assert(got.nonEmpty)
  }

  test("per-stratum bound and rank contiguity") {
    import spark.implicits._
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
    val bySrc = Curation.weightedSample(docs, k = 5)
      .as[(Long, String, Long)].collect().groupBy(_._2)
    bySrc.foreach { case (src, rows) =>
      val ranks = rows.map(_._3).sorted
      assert(ranks.length <= 5, src)
      assert(ranks.sameElements(1L to ranks.length), src)
    }
  }

  test("weight monotonicity in aggregate: heavy docs win more often") {
    import spark.implicits._
    // 400 strata, each with one 64-word doc and three 1-word docs; the
    // heavy doc holds 64 of 67 tickets, so it should take rank 1 in
    // ~64/67 of strata — require a clear majority (the exact fraction
    // is deterministic given the fixed ids, so this cannot flake)
    val docs = (0 until 400).flatMap { s =>
      val heavy = (s * 10L, s.toString, Seq.fill(64)("w").mkString(" "))
      val light = (1 to 3).map(j => (s * 10L + j, s.toString, "w"))
      heavy +: light
    }.toDF("doc_id", "source", "text")
    val rank1 = Curation.weightedSample(docs, k = 1)
      .as[(Long, String, Long)].collect()
    val heavyWins = rank1.count(_._1 % 10 == 0)
    assert(rank1.length == 400)
    assert(heavyWins >= 300, s"heavy docs won only $heavyWins/400")
  }
}
