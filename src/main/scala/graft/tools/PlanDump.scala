package graft.tools
import graft.Sessions
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("plan-dump")
    val df = graft.ops.Curation.dupSpanStats(
      graft.ops.Tables.documents(spark, "/root/testdata/sf0.001"))
    df.explain("formatted")
    spark.stop()
  }
}
