package graft.tools

import java.nio.file.{Files, Paths}

import graft.Sessions

/** Dump `.explain("formatted")` for registered queries to files — the
  * plan-evidence artifact the optimization rounds commit under
  * `plans/<round>/<query>_<tag>.txt`.
  *
  *   sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <tag> q25_star_join d128_pagerank ..."
  *
  * Writes `<outDir>/<name>_<tag>.txt` per query. The plan is captured
  * BEFORE execution (AQE initial plan, `isFinalPlan=false`) — the same
  * artifact `.explain` prints interactively; signature-level AQE-final
  * pinning lives in HeadlinePlanSpec/ExtendedPlanSpec.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <tag> <queryName>...")
    val (dir, out, tag, names) = (args(0), args(1), args(2), args.drop(3).toSeq)
    Files.createDirectories(Paths.get(out))
    val spark = Sessions.build("plan-dump")
    val queries = graft.SparkEntry.queries
    names.foreach { n =>
      val df = queries(n)(spark, dir)
      // queryExecution.explainString is what explain("formatted") prints
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(out, s"${n}_$tag.txt"), txt)
      System.err.println(s"[plandump] wrote $out/${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
