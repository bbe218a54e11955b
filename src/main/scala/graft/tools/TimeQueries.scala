package graft.tools

/** Dev harness: time individual registered queries against a data dir —
  * cold then warm `count()`, one line per query. For adjudicating bench
  * outliers without a full Bench run.
  *
  *   sbt "runMain graft.tools.TimeQueries /root/testdata/sf0.1 d128_pagerank ..."
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.Sessions.build("time-queries")
    val queries = graft.SparkEntry.queries
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = queries(n)(spark, dir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      queries(n)(spark, dir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"[time] $n%-32s cold $cold%7.2f s  warm $warm%7.2f s  ($rows rows)")
    }
    spark.stop()
  }
}
