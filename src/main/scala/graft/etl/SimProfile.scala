package graft.etl

import org.apache.spark.sql.functions._

/** Dev harness: stage-level timings for the similarity pipeline. */
object SimProfile {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.build("sim-profile")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.ops.Tables.documents(spark, sf)
    val sh = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, greatest(length(t) - 2, 0)), i -> substring(t, i, 3)))")).as("g"))
    t("shingles")(sh.count())
    val grams = sh.groupBy(col("doc_id")).agg(collect_set(col("g")).as("grams"))
    t("collect_set+minhash input")(grams.count())
    t("full d06")(graft.SparkEntry.queries("d06_minhash_lsh")(spark, sf).count())
    t("full d08")(graft.SparkEntry.queries("d08_ann_lsh")(spark, sf).count())
    spark.stop()
  }
}
