package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Tables}

/** Dev instrument for the r18 optimization round: stage-level timing of
  * the d54 trainingShards composition (each timed frame includes its
  * predecessors — differences approximate per-stage cost; guide §1).
  * SPARK_GRAFT_SF_DIR selects the corpus.
  */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.Sessions.build("pipeline-profile")
    def t[A](tag: String)(body: => A): A = {
      s.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime(); val r = body
      println(f"[pipeprofile] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    graft.SparkEntry.queries("q01_pricing_summary")(s, d)
      .write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(s, d)
    val base = docs.where(not(expr("doc_id % 97 = 0")))
    val ev = docs.where(expr("doc_id % 97 = 0"))
    t("1 dedupExact only")(noop(graft.api.Graft.dedupExact(base)))
    t("2 dedupedCorpus (ex+near)")(noop(graft.api.Graft.dedupedCorpus(base)))
    val deduped = graft.api.Graft.dedupedCorpus(base)
    t("3 + quality filter")(noop(deduped.join(
      Curation.repetitionSignals(deduped)
        .where(col("n_words") >= 5 &&
          col("dup_word_count").cast("double") / col("n_words") <= 0.9 &&
          when(col("n_bigrams") > 0,
            col("top_bigram_count").cast("double") / col("n_bigrams"))
            .otherwise(0.0) <= 0.5)
        .select(col("doc_id")), "doc_id")))
    t("4 full trainingShards")(noop(
      graft.api.Graft.trainingShards(base, ev, dropPplTail = true)))
    t("5 full again (memo-warm)")(noop(
      graft.api.Graft.trainingShards(base, ev, dropPplTail = true)))
    s.stop()
  }
}
