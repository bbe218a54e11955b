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

    // d19 stage breakdown (fresh session-free approximation: each stage
    // builds on the previous cached one)
    val docs = graft.ops.Tables.documents(spark, sf)
    val grams = docs.select(col("doc_id"),
      udf(graft.ops.Similarity.wordGramHashes _).apply(lower(trim(col("text")))).as("grams"))
      .cache()
    t("d19 word grams (UDF + cache)")(grams.count())
    val sh = grams.select(col("doc_id"), size(col("grams")).as("n"),
      explode(col("grams")).as("g")).cache()
    t("d19 explode cache")(sh.count())
    val dfreq = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    t("d19 dfreq")(println("  distinct grams = " + dfreq.count()))
    val ranked = sh.join(dfreq, "g").withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("g"))))
    val prefix = ranked.where(col("rn") <= col("n") - expr("(n * 4 + 4) div 5") + 1)
      .select(col("doc_id"), col("g")).cache()
    t("d19 window + prefix")(println("  prefix rows = " + prefix.count()))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    t("d19 candidates")(println("  candidates = " + cand.count()))
    t("d19 verify")(println("  verified = " +
      graft.ops.Similarity.verifyPairs(cand, grams).count()))
    spark.stop()
  }
}
