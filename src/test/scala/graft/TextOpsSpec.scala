package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.TextOps

/** TextOps corpus diagnostics beyond the oracle-gated d01–d05 surface:
  * pairwise source-vocabulary overlap (d68).
  */
class TextOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("textops-spec")
  override def afterAll(): Unit = spark.stop()

  private def docs(rows: (String, String)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((src, text), i) => (i.toLong, src, text) }
      .toDF("doc_id", "source", "text")
  }

  test("sourceOverlap: hand-computed Jaccard; pairs are ordered; disjoint pairs absent") {
    val out = TextOps.sourceOverlap(docs(
        "B" -> "b c d",          // declared out of order: output must sort
        "A" -> "a b c",
        "A" -> "a a b",          // duplicate words collapse into the vocab set
        "C" -> "zz"))            // shares nothing with A or B
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // A vocab {a,b,c}, B vocab {b,c,d}: common {b,c} -> jaccard 2/4
    assert(out == Map(("A", "B") -> ((3L, 3L, 2L, 0.5))))
  }

  test("sourceOverlap: identical sources have jaccard 1") {
    val out = TextOps.sourceOverlap(docs(
        "A" -> "x y z", "B" -> "z y x")).collect().head
    assert(out.getDouble(5) == 1.0)
  }

  test("snapshotDiff classifies added/removed/changed/same") {
    import spark.implicits._
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val neu = Seq((2L, "beta"), (3L, "gamma v2"), (4L, "delta")).toDF("doc_id", "text")
    val got = TextOps.snapshotDiff(old, neu)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
  }

  test("registered d85 binding yields all four statuses on the test corpus") {
    val counts = SparkEntry.queries("d85_snapshot_diff")(spark, "/root/testdata/sf0.001")
      .groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("added", "removed", "changed", "same").subsetOf(counts.keySet), counts.toString)
  }

  test("sourceReport: hand-computed per-source aggregates incl. dup and avg tokens") {
    import spark.implicits._
    val df = Seq(
      (1L, "A", "one two three", "en"),    // 3 tokens
      (2L, "A", "one two three", "en"),    // exact dup of 1
      (3L, "A", "four", "de"),             // 1 token, second lang
      (4L, "B", "x y", "en"))              // 2 tokens
      .toDF("doc_id", "source", "text", "lang")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
    val out = TextOps.sourceReport(df)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n_docs") == 3L)
    assert(a.getAs[Long]("n_unique_texts") == 2L)
    assert(a.getAs[Long]("n_langs") == 2L)
    assert(a.getAs[Long]("total_tokens") == 7L)
    assert(a.getAs[Long]("n_exact_dup_docs") == 1L)
    assert(a.getAs[Double]("avg_tokens") == 2.3333)
    // A n_chars: 13, 13, 4 -> p50 = 13
    assert(a.getAs[Double]("p50_chars") == 13.0)
    val b = out("B")
    assert(b.getAs[Long]("n_docs") == 1L && b.getAs[Double]("avg_tokens") == 2.0)
  }
}
