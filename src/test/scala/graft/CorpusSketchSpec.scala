package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** d13's HLL++ estimate must stay within the configured relative error
  * of the exact distinct count (sketches have no cross-engine oracle).
  */
class CorpusSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("sketch-spec")
  override def afterAll(): Unit = spark.stop()

  test("approx_count_distinct within 5% of exact per language") {
    val df = SparkEntry.queries("d13_distinct_sketch")(spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val approx = r.getAs[Long]("approx_distinct").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"lang=${r.get(0)} exact=$exact approx=$approx")
    }
  }

  test("d107 quantile sketch stays within its rank bound; exact p50 matches d18") {
    val rows = SparkEntry.queries("d107_quantile_sketch")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), s"lang=${r.get(0)} out of bound")
    }
    val d18 = SparkEntry.queries("d18_length_quantiles")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.get(0) -> r.getAs[Double]("p50")).toMap
    rows.foreach { r =>
      val want = BigDecimal(d18(r.get(0)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("p50") == want, s"lang=${r.get(0)}")
    }
  }

  test("d36 projects the sketch onto its hash-gateable contract (all within_bound)") {
    val df = SparkEntry.queries("d36_sketch_bound")(spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every row must carry within_bound = true (the oracle pins TRUE) and
    // the exact counts must agree with d13's exact side
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), s"lang=${r.get(0)} out of bound")
    }
    val d13 = SparkEntry.queries("d13_distinct_sketch")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.get(0) -> r.getAs[Long]("exact_distinct")).toMap
    rows.foreach { r =>
      assert(d13(r.get(0)) == r.getAs[Long]("exact_distinct"))
    }
  }
}
