package graft.tools

/** [[HeadlinePlans]] for the EXTENDED surface's heaviest queries (r16
  * verdict ask #2): with the extended bench now running per-family
  * fresh JVMs, round-over-round timings are noisier by construction —
  * plan SHAPE is the primary regression signal for these queries, so
  * `ExtendedPlanSpec` pins each one's final-adaptive-plan
  * [[HeadlinePlans.PlanSig]] the way `HeadlinePlanSpec` pins the
  * frozen 30.
  *
  * The pin set is the verdict's top-10 most expensive extended
  * queries: the two exact-baseline scorers (d171/d189), the composed
  * curation pipeline (d54), the temporal index serve + warm-start
  * chain (d182/d186), the indexed BM25 (d153), the PageRank/HITS
  * fixed points (d128/d145), record linkage (d130), and the flat edge
  * index serve (d160).
  *
  * Regenerate after an intentional plan change:
  *   sbt "runMain graft.tools.ExtendedPlans [sfDir]"
  * (default sf0.001 — the spec's scale; AQE elects strategies from
  * runtime sizes, so generator and spec must agree on the directory).
  */
object ExtendedPlans {

  /** The pinned names, resolved through the full registered surface so
    * a rename fails the spec loudly. */
  val PinnedNames: Seq[String] = Seq(
    "d171_embedding_related",
    "d189_embedding_related_ann_exact",
    "d54_training_shards",
    "d186_decayed_pagerank_warm",
    "d182_decayed_indexed",
    "d153_bm25_topk_indexed",
    "d128_pagerank",
    "d145_hits",
    "d130_record_linkage",
    "d160_edge_index",
    // the production ANN serving path (the shape the 100 TB story
    // actually runs — IVF probe join + bounded TopKAgg); a cartesian
    // or lost-broadcast regression here re-quadratizes serving
    "d187_embedding_related_ann")

  def pinnedSet: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame)] =
    PinnedNames.map(n => n -> graft.SparkEntry.queries(n))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Sessions.build("extended-plans")
    pinnedSet.foreach { case (name, fn) =>
      val s = HeadlinePlans.signature(fn(spark, sfDir))
      println(s"""    "$name" -> PlanSig(${s.bhj}, ${s.smj}, ${s.shj}, ${s.bnlj}, ${s.cartesian}, ${s.exchanges}, ${s.uncodegened}),""")
    }
    spark.stop()
  }
}
