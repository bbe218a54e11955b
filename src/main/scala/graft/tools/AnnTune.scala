package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: recall@1-vs-cost sweep for the two ANN paths against the
  * exact d07 baseline — the measurements behind the default (tables,
  * bits, probeFlips) and (k, probes) choices in d08/d17.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.AnnTune"
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.Sessions.build("ann-tune")
    val vecs = graft.ops.Tables.embeddings(s, d)
    val exact = graft.ops.Similarity.cosineTopK(vecs).where(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id").as("exact_nn")).cache()
    val nq = exact.count().toDouble
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.select(col("vec_id"), col("neighbor_id")).join(exact, "vec_id")
        .where(col("neighbor_id") === col("exact_nn")).count() / nq

    for (tables <- Seq(8, 16); bits <- Seq(5, 6); flips <- Seq(3, 7, 11, 15)) {
      val t0 = System.nanoTime()
      val r = recallOf(graft.ops.Similarity.annBestNeighbor(vecs, tables, bits, flips))
      println(f"[tune] d08 tables=$tables%2d bits=$bits flips=$flips%2d recall=$r%.3f  ${(System.nanoTime() - t0) / 1e9}%5.1f s")
    }
    val e = vecs.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    for (k <- Seq(16, 40); probes <- Seq(6, 8, 10, 12)) {
      val model = graft.ops.IvfIndex.build(s, e, k = k, iters = 3)
      val t0 = System.nanoTime()
      val r = recallOf(graft.ops.IvfIndex.search(s, model, e, probes = probes))
      println(f"[tune] d17 k=$k%2d probes=$probes%2d recall=$r%.3f  ${(System.nanoTime() - t0) / 1e9}%5.1f s")
    }
    s.stop()
  }
}
