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
}
