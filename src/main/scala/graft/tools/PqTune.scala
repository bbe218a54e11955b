package graft.tools

import org.apache.spark.sql.functions._

/** PQ operating-point probe (dev tool, the [[AnnTune]] convention):
  * measures lossy-PQ recall@3 against the exact cosine top-3 across a
  * small (m, k) knob grid on the bench embeddings, printing one line per
  * point with the storage compression that point buys
  * (dim·4 bytes float32 → m·ceil(log2 k)/8 bytes of codes). The r08
  * bench measured the then-default m=8/k=16 at recall@3 = 0.113 —
  * near-useless — so the published default ([[graft.ops.Pq.DefaultM]] /
  * [[graft.ops.Pq.DefaultK]]) is chosen from THIS grid's output
  * (≥ 0.8 recall@3 at the highest compression that clears it), and
  * `PqSpec`'s planted-cluster floor pins it from regressing. */
object PqTune {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.Sessions.build("pq-tune")
    val vecs = graft.ops.Tables.embeddings(s, d)
    val dim = vecs.select(size(col("embedding"))).take(1)(0).getInt(0)
    val ex3 = graft.ops.Similarity.cosineTopK(vecs, 3)
      .select(col("vec_id"), col("neighbor_id")).cache()
    val denom = ex3.count().toDouble
    val grid = Seq((8, 16), (4, 64), (8, 64), (16, 64), (4, 256), (8, 256), (16, 256))
    grid.foreach { case (m, k) =>
      val t0 = System.nanoTime()
      val cb = graft.ops.Pq.train(s, vecs, m = m, k = k, iters = 3)
      val hits = graft.ops.Pq.topKAdc(vecs, graft.ops.Pq.encode(s, vecs, cb), cb, 3)
        .select(col("vec_id"), col("neighbor_id"))
        .join(ex3, Seq("vec_id", "neighbor_id")).count()
      val rec = if (denom == 0) 0.0 else hits / denom
      val codeBytes = m * math.ceil(math.log(k) / math.log(2)) / 8.0
      val compression = dim * 4 / codeBytes
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[pqtune] m=$m%-3d k=$k%-4d recall_at3=$rec%.3f " +
        f"compression=${compression}%.1fx code_bytes=$codeBytes%.1f t=$secs%.1fs")
    }
    // the refine composition: ADC proposes `rerank` candidates, exact
    // re-rank on full vectors — recall@3 becomes candidate containment
    val refinedGrid = Seq((8, 256, 32), (16, 256, 16), (16, 256, 32), (16, 256, 64))
    refinedGrid.foreach { case (m, k, rr) =>
      val t0 = System.nanoTime()
      val cb = graft.ops.Pq.train(s, vecs, m = m, k = k, iters = 3)
      val hits = graft.ops.Pq.topKAdcRefined(
          vecs, graft.ops.Pq.encode(s, vecs, cb), vecs, cb, 3, rerank = rr)
        .select(col("vec_id"), col("neighbor_id"))
        .join(ex3, Seq("vec_id", "neighbor_id")).count()
      val rec = if (denom == 0) 0.0 else hits / denom
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[pqtune] m=$m%-3d k=$k%-4d rerank=$rr%-3d refined_recall_at3=$rec%.3f t=$secs%.1fs")
    }
    s.stop()
  }
}
