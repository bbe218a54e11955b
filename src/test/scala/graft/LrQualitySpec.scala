package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.Curation

/** d64/d65 logistic-regression quality classifier: descent moves scores
  * toward the seed labels, the frozen-weights path reproduces the
  * train+score path exactly, and the whole descent is deterministic.
  */
class LrQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("lr-spec")
  private val sf = "/root/testdata/sf0.001"
  override def afterAll(): Unit = spark.stop()

  // separable corpus: 'en' docs are stopword-dense, others stopword-free
  private def planted = {
    import spark.implicits._
    val en = (0L until 20L).map(i =>
      (i, "the a of and to in the a of and to in", "en"))
    val xx = (20L until 40L).map(i =>
      (i, "qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss", "xx"))
    (en ++ xx).toDF("doc_id", "text", "lang")
  }

  test("d64: descent separates the seed classes by score") {
    import spark.implicits._
    val out = Curation.lrQualityScores(planted)
      .join(planted.select($"doc_id", $"lang"), Seq("doc_id"))
      .select($"lang", $"score").as[(String, Double)].collect()
    val enMean = out.filter(_._1 == "en").map(_._2).sum / 20
    val xxMean = out.filter(_._1 == "xx").map(_._2).sum / 20
    assert(enMean > xxMean + 0.05, s"en $enMean vs xx $xxMean")
    assert(out.forall(r => r._2 > 0.0 && r._2 < 1.0))
  }

  test("d64: weights are deterministic across runs and iterations add signal") {
    val w1 = Curation.lrQualityWeights(planted)
    val w2 = Curation.lrQualityWeights(planted)
    assert(w1 == w2)
    val w5 = Curation.lrQualityWeights(planted, iters = 5)
    assert(w5 != w1, "more iterations should move the weights")
  }

  test("d65: frozen-weights scoring equals the train+score path") {
    import spark.implicits._
    val docs = graft.ops.Tables.documents(spark, sf)
    val direct = Curation.lrQualityScores(docs).collect().map(_.toSeq).toSet
    val frozen = Curation.lrScoreAgainst(docs, Curation.lrWeightsFrame(docs))
      .collect().map(_.toSeq).toSet
    assert(direct == frozen)
    assert(direct.nonEmpty)
  }

  test("weights frame carries the four named features") {
    import spark.implicits._
    val wf = Curation.lrWeightsFrame(planted)
      .as[(String, Double)].collect().toMap
    assert(wf.keySet == Set("b", "s", "a", "t"))
  }
}
