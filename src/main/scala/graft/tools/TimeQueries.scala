package graft.tools

/** Dev harness: time individual registered queries against a data dir —
  * cold then warm, one line per query. For adjudicating bench outliers
  * without a full Bench run.
  *
  * Times a noop WRITE (the Bench discipline), not `count()`: count lets
  * Catalyst prune whole subtrees — e.g. a left join against an
  * aggregate unique on the join key is eliminated outright, so a
  * count()-timed d130 skips its Levenshtein comparator entirely and
  * reads 45× faster than the honest materialization.
  *
  *   sbt "runMain graft.tools.TimeQueries /root/testdata/sf0.1 d128_pagerank ..."
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.Sessions.build("time-queries")
    val queries = graft.SparkEntry.queries
    def timed(n: String): Double = {
      val t0 = System.nanoTime()
      queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val cold = timed(n)
      val warm = timed(n)
      println(f"[time] $n%-32s cold $cold%7.2f s  warm $warm%7.2f s")
    }
    spark.stop()
  }
}
