package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dump the formatted plans of the temporal late-data DELTA frame on a
  * straddle-heavy batch, BEFORE (the r17 three-fan-out formula,
  * replicated verbatim below) and AFTER (the live
  * [[graft.ops.TemporalEdgeIndex.lateDelta]]) — the r18 plan-evidence
  * artifact for the lateDelta rewrite (the registered d190/d191
  * queries' own plans show only the serve read; the delta is a
  * write-path frame).
  *
  *   sbt "runMain graft.tools.LateDeltaPlan <outBefore> <outAfter>"
  */
object LateDeltaPlan {

  /** The r17 pairFactsOf, replicated so the BEFORE plan is authentic. */
  private def pairFactsOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = docs.toDF("basket_id", "item_id", "bday")
    val days = b.groupBy(col("basket_id")).agg(max(col("bday")).as("bday"))
    val bi = b.select(col("basket_id"), col("item_id")).distinct()
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("basket_id"))))
      .where(col("__n") <= graft.ops.TemporalEdgeIndex.MaxBasketItems)
      .select(col("basket_id"), col("item_id"))
    val a = bi.toDF("basket_id", "src").join(days, Seq("basket_id"))
    val c = bi.toDF("basket_id", "dst")
    a.join(c, Seq("basket_id"))
      .where(col("src") < col("dst"))
      .groupBy(col("src"), col("dst"), col("bday"))
      .agg(count(lit(1)).as("n"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LateDeltaPlan <outBefore> <outAfter>")
    val s = graft.Sessions.build("late-delta-plan")
    import s.implicits._
    val dir = Files.createTempDirectory("latedelta-plan").toString
    // batch 0: even items of 3 baskets; batch 1 (the dumped delta):
    // odd items — every multi-parity basket straddles
    val rows = for (b <- 1L to 3L; i <- 1L to 6L)
      yield (b, i, java.sql.Date.valueOf("2024-06-01"))
    val all = rows.toDF("basket_id", "item_id", "bday")
    graft.ops.TemporalEdgeIndex.appendLate(
      all.where(col("item_id") % 2 === 0), dir)
    val b = all.where(col("item_id") % 2 === 1).localCheckpoint()

    // the r17 formula, verbatim (fresh + merged + negated prior)
    val priorIds = s.read.parquet(s"$dir/basketids")
      .where(col(graft.ops.IndexCommit.BatchCol) =!= 1L)
      .select(col("basket_id"))
    val straddleIds = b.select(col("basket_id")).distinct()
      .join(priorIds, Seq("basket_id"), "left_semi")
      .localCheckpoint()
    val prior = s.read.parquet(s"$dir/basketitems")
      .where(col(graft.ops.IndexCommit.BatchCol) =!= 1L)
      .select(col("basket_id"), col("item_id"), col("bday"))
      .join(straddleIds, Seq("basket_id"), "left_semi")
      .distinct()
      .localCheckpoint()
    val fresh = b.join(straddleIds, Seq("basket_id"), "left_anti")
    val merged = b.join(straddleIds, Seq("basket_id"), "left_semi")
      .select(col("basket_id"), col("item_id"), col("bday"))
      .union(prior).distinct()
    val before = pairFactsOf(s, fresh)
      .unionByName(pairFactsOf(s, merged))
      .unionByName(pairFactsOf(s, prior).withColumn("n", -col("n")))
      .groupBy(col("src"), col("dst"), col("bday"))
      .agg(sum(col("n")).as("n"))
      .where(col("n") =!= 0L)

    val after = graft.ops.TemporalEdgeIndex.lateDelta(b, dir, batchId = 1L)

    def dump(df: DataFrame, path: String): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(path), txt)
      System.err.println(s"[latedeltaplan] wrote $path (${txt.length} chars)")
    }
    dump(before, args(0))
    dump(after, args(1))
    s.stop()
  }
}
