package graft.etl

/** Dev harness: print formatted physical plans for the heavy / new
  * queries so shuffle counts, broadcast choices, pushdown, and
  * whole-stage-codegen spans can be audited (builder loop, not driver).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSet
      else Set("d06_minhash_lsh", "d07_cosine_topk", "d09_simhash", "d11_fingerprint")
    val spark = graft.Sessions.build("plan-audit")
    graft.SparkEntry.registered.filter(q => names(q.name)).foreach { q =>
      println(s"\n================ ${q.name} ================")
      q.fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
