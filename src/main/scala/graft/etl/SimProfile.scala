package graft.etl

import org.apache.spark.sql.functions._

/** Dev harness: stage-level timings for the d06 similarity pipeline. */
object SimProfile {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.build("sim-profile")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm: real scan+agg (skippable — scale dirs carry only documents/
    // embeddings)
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, sf)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"[warmup skipped] ${e.getMessage.linesIterator.next()}") }
    graft.ops.Similarity.warm(spark)

    val sk = graft.ops.Similarity.docSketches(spark, sf)
    t("sketch table (UDF + cache)")(sk.count())
    t("full d06 (first run)")(
      graft.SparkEntry.queries("d06_minhash_lsh")(spark, sf)
        .write.format("noop").mode("overwrite").save())
    t("full d19 (first run)")(
      graft.SparkEntry.queries("d19_jaccard_prefix")(spark, sf)
        .write.format("noop").mode("overwrite").save())
    t("full d14 (reuses pairs)")(
      graft.SparkEntry.queries("d14_dedup_components")(spark, sf)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
