package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: executed-plan assertions for the operators whose scale
  * story depends on plan SHAPE rather than timings — run after touching
  * their implementations and compare against the recorded expectations.
  *
  * Recorded (sf0.01, 2026-08, round 7):
  *   - d26 mixWeights: 0 Window nodes (grand totals are agg + broadcast
  *     cross-join), 2 InMemoryTableScan (the 34-row cells cache serves
  *     both the weighted rows and the totals), corpus file mentions all
  *     inside the cached-plan description — ONE live corpus scan.
  *   - d30 knnClassifyAnn: 0 CartesianProduct / BroadcastNestedLoop
  *     (the LSH bucket join is a SortMergeJoin on (table, signature);
  *     vector re-attachments and the label join broadcast).
  *   - d31 materializeMix: 1 Generate (the explode), 0 shuffle exchanges
  *     on the docs path (the only exchanges belong to the cells
  *     aggregation feeding the broadcast).
  *
  *   sbt "runMain graft.tools.PlanAudit"
  */
object PlanAudit {

  /** Count plan-tree lines whose OPERATOR NAME starts with `node` — the
    * token must sit right after the tree-drawing prefix (`:  +- ` etc.)
    * and the optional codegen marker (`*(3) `), so a column alias or
    * file path that merely CONTAINS the token (e.g. a column named
    * `window_end`, a path `.../Window/`) can never inflate the count.
    * Multi-word nodes ("Exchange hashpartitioning(doc_id") match as
    * prefixes of the operator line.
    */
  def countNode(plan: String, node: String): Int = {
    val re = ("""^[\s:+\-|]*(?:\*\(\d+\)\s)?""" +
      java.util.regex.Pattern.quote(node)).r
    plan.split("\n").count(l => re.findPrefixOf(l).isDefined)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("plan-audit")
    val d = "/root/testdata/sf0.01"
    // raw substring on purpose: counts FILE MENTIONS anywhere in the plan
    // text (incl. inside cached-plan descriptions), not operator nodes
    def count(p: String, s: String) = p.split("\n").count(_.contains(s))

    val docs = graft.ops.Tables.documents(spark, d)
    val mw = graft.ops.Curation.mixWeights(docs)
    mw.count() // materialize the cells cache
    val p26 = mw.queryExecution.executedPlan.toString
    println("=== d26 corpus-file mentions (incl. cached-plan text): " +
      count(p26, "documents.parquet"))
    println("=== d26 InMemoryTableScan: " + countNode(p26, "InMemoryTableScan"))
    println("=== d26 Window nodes: " + countNode(p26, "Window"))

    val vecs = graft.ops.Tables.embeddings(spark, d)
    val p30 = graft.ops.Similarity.knnClassifyAnn(vecs)
      .queryExecution.executedPlan.toString
    println("=== d30 SortMergeJoin: " + countNode(p30, "SortMergeJoin"))
    println("=== d30 BroadcastHashJoin: " + countNode(p30, "BroadcastHashJoin"))
    println("=== d30 Exchange: " + countNode(p30, "Exchange"))
    println("=== d30 CartesianProduct/BNLJ: " +
      (countNode(p30, "CartesianProduct") + countNode(p30, "BroadcastNestedLoop")))

    val p31 = graft.ops.Curation
      .materializeMix(docs, graft.ops.Curation.mixWeights(docs))
      .queryExecution.executedPlan.toString
    println("=== d31 Generate (explode): " + countNode(p31, "Generate"))
    println("=== d31 doc_id shuffle exchanges: " +
      countNode(p31, "Exchange hashpartitioning(doc_id"))
    spark.stop()
  }
}
