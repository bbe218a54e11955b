package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Tables, TemporalEdgeIndex}

/** Dev instrument for the r18 optimization round: step-level timing of
  * the temporal edge index's cold build+serve path (the d182 binding's
  * shape) so the expensive step is identified before it is optimized —
  * guide §1 (measure first), at sub-query granularity the bench cannot
  * see.  SPARK_GRAFT_SF_DIR selects the corpus.
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.Sessions.build("build-profile")
    // per-job wall times, tagged by the step's job description
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = starts.remove(j.jobId)
        if (st != null)
          println(f"[job] ${j.jobId}%3d ${(System.nanoTime() - st._1) / 1e9}%7.3f s  ${st._2}")
      }
    })
    def t[A](tag: String)(body: => A): A = {
      s.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime(); val r = body
      println(f"[buildprofile] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm the session like the bench does
    graft.SparkEntry.queries("q01_pricing_summary")(s, d)
      .write.format("noop").mode("overwrite").save()
    val dir = java.nio.file.Files.createTempDirectory("buildprof").toString
    val baskets = t("baskets join+checkpoint") {
      Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("bday")), Seq("o_orderkey"))
        .select(col("o_orderkey").as("basket_id"),
          col("l_partkey").as("item_id"), col("bday"))
        .localCheckpoint()
    }
    t("save(even)") {
      TemporalEdgeIndex.save(baskets.where(col("basket_id") % 2 === 0), dir)
    }
    t("append(odd, checkDisjoint)") {
      TemporalEdgeIndex.append(baskets.where(col("basket_id") % 2 === 1), dir,
        checkDisjoint = true)
    }
    val anchor = Tables.orders(s, d)
      .agg(max(col("o_orderdate").cast("date")).as("mx"))
    t("serve decayedEdgesOf") {
      TemporalEdgeIndex.decayedEdgesOf(s, dir, anchor)
        .write.format("noop").mode("overwrite").save()
    }
    // late path: two appendLate batches split by item parity (d191)
    val lateDir = java.nio.file.Files.createTempDirectory("buildprof-late").toString
    t("appendLate(even items)") {
      TemporalEdgeIndex.appendLate(baskets.where(col("item_id") % 2 === 0), lateDir)
    }
    t("appendLate(odd items)") {
      TemporalEdgeIndex.appendLate(baskets.where(col("item_id") % 2 === 1), lateDir)
    }
    t("serve late decayedEdgesOf") {
      TemporalEdgeIndex.decayedEdgesOf(s, lateDir, anchor)
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
