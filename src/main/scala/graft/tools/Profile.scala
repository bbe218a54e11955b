package graft.tools

import java.util.Locale

/** Dev utility: time individual registered queries against
  * SPARK_GRAFT_SF_DIR (default sf0.1), repeating each `-n` times.
  *
  *   sbt "runMain graft.tools.Profile d06_minhash_lsh d14_dedup_components"
  *
  * Unlike Bench (the driver contract, fixed query sets, one JSON line)
  * this is for interactive plan iteration only.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "1").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.build("graft-profile")
    val byName = graft.SparkEntry.registered.map(q => q.name -> q).toMap
    val names = if (args.nonEmpty) args.toSeq else byName.keys.toSeq.sorted
    // representative warmup: a real scan + agg (see Bench)
    byName.get("q01_pricing_summary")
      .foreach(q => q.fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").exists(_ == "1")
    for (name <- names; r <- 1 to reps) {
      val q = byName.getOrElse(name, sys.error(s"unknown query $name"))
      if (explain && r == 1) {
        println(s"==== $name ====")
        q.fn(spark, sfDir).explain("formatted")
      }
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-24s rep$r ${sec}%8.3f s".formatLocal(Locale.ROOT))
    }
    spark.stop()
  }
}
