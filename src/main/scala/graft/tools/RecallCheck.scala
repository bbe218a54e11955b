package graft.tools

import org.apache.spark.sql.functions._

/** Recall assurance (dev tool): exact char-trigram J >= 0.8 pairs via
  * prefix filtering (exact recall by construction), diffed against the
  * LSH-generated d06 output — validates the banded-minhash recall
  * assumption on the biggest corpus we test on. The gram domain and the
  * verification math are REUSED from Similarity (docGrams/verifyPairs),
  * so this gate always checks the computation d06 actually ships; only
  * the candidate generation differs (exhaustive prefix filter here).
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.Sessions.build("recall-check")
    val grams = graft.ops.Similarity.docGrams(s, d)
    val sh = grams.select(col("doc_id"), explode(col("grams")).as("g"))
    val dfreq = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(dfreq, "g")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
    val prefix = ranked.where(col("rn") <= col("n") - ceil(col("n") * 0.8) + 1)
      .select(col("doc_id"), col("g"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val exact = graft.ops.Similarity.verifyPairs(cand, grams).cache()
    val lsh = graft.ops.Similarity.nearDupPairs(s, d).cache()
    val nExact = exact.count()
    val nLsh = lsh.count()
    val missed = exact.join(lsh, Seq("doc_a", "doc_b"), "left_anti").count()
    val spurious = lsh.join(exact, Seq("doc_a", "doc_b"), "left_anti").count()
    println(s"[assure] exact=$nExact lsh=$nLsh missed_by_lsh=$missed spurious_in_lsh=$spurious")
    s.stop()
    if (missed != 0 || spurious != 0) sys.exit(1)
  }
}
