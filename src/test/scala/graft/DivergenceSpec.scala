package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.TextOps

/** d104 source JS divergence: the two analytic anchors (identical
  * distributions → 0, disjoint vocabularies → ln 2) and the registered
  * binding's bounds/shape on the driver corpus.
  */
class DivergenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("divergence-spec")
  override def afterAll(): Unit = spark.stop()

  private def docsOf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("identical distributions diverge by 0; disjoint ones by ln 2") {
    val docs = docsOf(Seq(
      (1L, "a a b", "s1"), (2L, "a a b", "s2"),   // identical
      (3L, "x y z", "s3")))                        // disjoint from both
    val got = TextOps.sourceDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("s1", "s2")) == 0.0)
    val ln2r4 = BigDecimal(math.log(2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("s1", "s3")) == ln2r4)
    assert(got(("s2", "s3")) == ln2r4)
  }

  test("divergence is monotone in distribution shift") {
    // s2 shares s1's words at shifted frequencies; s3 shifts harder
    val docs = docsOf(Seq(
      (1L, "a a a a b", "s1"),
      (2L, "a a a b b", "s2"),
      (3L, "a b b b b", "s3")))
    val got = TextOps.sourceDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("s1", "s2")) > 0.0)
    assert(got(("s1", "s3")) > got(("s1", "s2")))
    assert(got(("s1", "s3")) < math.log(2))
  }

  test("registered d104 binding: one row per source pair, within [0, ln 2]") {
    val df = SparkEntry.queries("d104_source_divergence")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val n = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("source").distinct().count()
    assert(rows.length.toLong == n * (n - 1) / 2)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val js = r.getDouble(2)
      assert(js >= 0.0 && js <= 0.6932, s"${r.getString(0)}/${r.getString(1)}: $js")
    }
  }
}
