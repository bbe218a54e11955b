package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.Diagnostics

/** Hand-computed fixtures for the d131 key-skew report: the documented
  * "lower"-method integer percentiles over per-key counts, top-1/top-10
  * ppm mass shares with floor division, and degenerate (uniform,
  * single-key) shapes.
  */
class DiagnosticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("diagnostics-spec")
  override def afterAll(): Unit = spark.stop()

  /** One column `k`; key i repeated counts(i) times. */
  private def keyed(counts: Seq[(String, Int)]) = {
    import spark.implicits._
    counts.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
  }

  private def report(counts: Seq[(String, Int)]): Map[String, Long] = {
    val row = Diagnostics.keySkewReport(keyed(counts), "k").collect()(0)
    row.schema.fieldNames.map(f => f -> row.getLong(row.fieldIndex(f))).toMap
  }

  test("skewed fixture: hand-computed percentiles and mass shares") {
    // per-key counts ascending: [1,1,1,2,2,3,4,5,8,20,100]
    val counts = Seq("a" -> 100, "b" -> 20, "c" -> 8, "d" -> 5, "e" -> 4,
      "f" -> 3, "g" -> 2, "h" -> 2, "i" -> 1, "j" -> 1, "k" -> 1)
    val r = report(counts)
    assert(r("n_rows") == 147L && r("n_keys") == 11L)
    assert(r("min_cnt") == 1L && r("max_cnt") == 100L)
    // lower-method index (p*(n_keys-1)) div 100 into the ascending counts:
    // p50 -> idx 5 -> 3; p90 -> idx 9 -> 20; p99 -> idx 9 -> 20
    assert(r("p50_cnt") == 3L)
    assert(r("p90_cnt") == 20L)
    assert(r("p99_cnt") == 20L)
    // top1 = 100e6 div 147 ; top10 = (147-1)e6 div 147 — floor division
    assert(r("top1_share_ppm") == 680272L)
    assert(r("top10_share_ppm") == 993197L)
  }

  test("uniform keys: all percentiles equal the common count") {
    val r = report(Seq("a" -> 4, "b" -> 4, "c" -> 4, "d" -> 4, "e" -> 4))
    assert(r("n_rows") == 20L && r("n_keys") == 5L)
    assert(r("min_cnt") == 4L && r("max_cnt") == 4L)
    assert(r("p50_cnt") == 4L && r("p90_cnt") == 4L && r("p99_cnt") == 4L)
    assert(r("top1_share_ppm") == 200000L)   // 4e6 div 20
    assert(r("top10_share_ppm") == 1000000L) // fewer than 10 keys: all mass
  }

  test("single key: the whole corpus is one partition's worth of one key") {
    val r = report(Seq("only" -> 7))
    assert(r("n_rows") == 7L && r("n_keys") == 1L)
    assert(r("p50_cnt") == 7L && r("p99_cnt") == 7L)
    assert(r("top1_share_ppm") == 1000000L && r("top10_share_ppm") == 1000000L)
  }

  test("matches a brute-force replay on random key data") {
    val rnd = new scala.util.Random(131)
    // Zipf-ish: key i gets ~ 60/i rows
    val counts = (1 to 40).map(i => (s"key$i", math.max(60 / i, 1) + rnd.nextInt(3)))
    val shuffled = rnd.shuffle(counts)
    val r = report(shuffled)
    val asc = shuffled.map(_._2.toLong).sorted
    val n = asc.size
    def pctl(p: Int) = asc((p * (n - 1)) / 100)
    val nRows = asc.sum
    assert(r("n_rows") == nRows && r("n_keys") == n.toLong)
    assert(r("min_cnt") == asc.head && r("max_cnt") == asc.last)
    assert(r("p50_cnt") == pctl(50) && r("p90_cnt") == pctl(90) && r("p99_cnt") == pctl(99))
    assert(r("top1_share_ppm") == asc.last * 1000000L / nRows)
    assert(r("top10_share_ppm") == asc.takeRight(10).sum * 1000000L / nRows)
  }

  test("tableProfile: hand-computed per-column stats, numeric vs non-numeric min/max") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), Option(2.5), Option("x")),
      (Option(1L), Option.empty[Double], Option("y")),
      (Option(3L), Option(-1.0), Option.empty[String]),
      (Option.empty[Long], Option(2.5), Option("x"))).toDF("a", "b", "c")
    val got = Diagnostics.tableProfile(df, Seq("a", "b", "c"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == ("a", 4L, 1L, 2L, Some(1.0), Some(3.0)))
    assert(got("b") == ("b", 4L, 1L, 2L, Some(-1.0), Some(2.5)))
    // non-numeric: min/max deliberately null, null/distinct still exact
    assert(got("c") == ("c", 4L, 1L, 2L, None, None))
  }

  test("tableProfile: case-insensitive resolution, clear error on a typo, hostile names") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("MyCol", "other`weird'name")
    // default sessions are case-insensitive — 'mycol' resolves to MyCol,
    // and the output carries the SCHEMA's spelling
    val ci = Diagnostics.tableProfile(df, Seq("mycol"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])].collect()
    assert(ci.toSeq == Seq(("MyCol", 2L, 0L, 2L, Some(1.0), Some(2.0))))
    // a name containing a backtick and a quote profiles like any other
    // (no raw interpolation into SQL text anywhere)
    val hostile = Diagnostics.tableProfile(df, Seq("other`weird'name"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])].collect()
    assert(hostile.toSeq == Seq(("other`weird'name", 2L, 0L, 2L, None, None)))
    // a typo fails fast with the offending name and the schema in the message
    val err = intercept[IllegalArgumentException] {
      Diagnostics.tableProfile(df, Seq("nope"))
    }
    assert(err.getMessage.contains("'nope'") && err.getMessage.contains("MyCol"))
  }
}
