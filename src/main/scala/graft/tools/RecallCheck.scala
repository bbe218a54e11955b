package graft.tools

import org.apache.spark.sql.functions._

/** Recall assurance (dev tool): exact char-trigram J >= 0.8 pairs at
  * sf0.1 via prefix filtering (exact recall), diffed against the
  * LSH-generated d06 output — validates the banded-minhash recall
  * assumption on the biggest corpus we test on.
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.Sessions.build("scratch")
    val docs = graft.ops.Tables.documents(s, d)
    val grams = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, greatest(length(t) - 2, 0)), i -> substring(t, i, 3)))").as("grams"))
      .cache()
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
    val exact = cand
      .join(grams.as("ga"), col("doc_a") === col("ga.doc_id"))
      .join(grams.as("gb"), col("doc_b") === col("gb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        size(col("ga.grams")).cast("long").as("n_a"),
        size(col("gb.grams")).cast("long").as("n_b"),
        size(array_intersect(col("ga.grams"), col("gb.grams"))).cast("long").as("inter_size"))
      .where(least(col("n_a"), col("n_b")) * 5 >= greatest(col("n_a"), col("n_b")) * 4)
      .select(col("doc_a"), col("doc_b"), col("inter_size"),
        (col("n_a") + col("n_b") - col("inter_size")).as("union_size"))
      .where(col("inter_size") * 5 >= col("union_size") * 4)
      .cache()
    val lsh = graft.ops.Similarity.nearDupPairs(s, d).cache()
    val nExact = exact.count()
    val nLsh = lsh.count()
    val missed = exact.join(lsh, Seq("doc_a", "doc_b"), "left_anti").count()
    val spurious = lsh.join(exact, Seq("doc_a", "doc_b"), "left_anti").count()
    println(s"[assure] exact=$nExact lsh=$nLsh missed_by_lsh=$missed spurious_in_lsh=$spurious")
    s.stop()
  }
}
