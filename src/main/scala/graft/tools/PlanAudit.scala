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
  *   - d44 unigramPpl (sf0.01, round 8): BroadcastHashJoin >= 1 (the
  *     Zipf-head lookup), CartesianProduct 0; BroadcastNestedLoop all
  *     1-row-side (totals / unseen-mass constants). Initial-plan node
  *     counts are inflated by subtree duplication across the hit/miss
  *     union — at runtime AQE's stage cache collapses the duplicated
  *     tokenize/aggregate stages to 2 corpus scans (one per CCNet pass:
  *     vocab, scoring), measured via a stage-metrics listener.
  *   - d47 dsirWeights (sf0.01, round 8): BroadcastHashJoin 6 (two
  *     head lookups through the hit/miss union duplication),
  *     CartesianProduct 0, and ZERO (doc_id, token) exchanges — the
  *     in-row multiplicity UDF keeps the scoring-side tokenization
  *     narrow (CurationSpec asserts docTokens exchange-free).
  *   - d68 sourceOverlap (sf0.01, round 10): CartesianProduct/BNLJ 0;
  *     BroadcastHashJoin 3 (the two tiny size-frame joins, plus AQE
  *     electing broadcast for the word self-join at this vocab size —
  *     at corpus scale that one degrades gracefully to SMJ).
  *   - d71 projected top-k (sf0.01, round 10): CartesianProduct 0,
  *     BroadcastNestedLoop 1 — exactly d07's declared pair-source
  *     shape; the projection adds no exchange of its own.
  *   - d76 heavy hitters (sf0.01, round 11): 0 token-keyed exchanges
  *     (map-side MG summaries; the only exchanges are the loader's
  *     round-robin + the single-group final merge). d77 PMI: 0
  *     CartesianProduct, 2 BroadcastHashJoin (winner lookups), 0
  *     doc-keyed exchanges (in-row bigram multiplicities). d78/d79:
  *     0 hash exchanges — pure narrow projections.
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

    // d44: the Zipf-head lookup must be a BroadcastHashJoin; the only
    // nested-loop join is the 1-row totals cross join (mixWeights shape);
    // the tail lookup may be SMJ or shuffled-hash, never cartesian.
    val p44 = graft.ops.Curation.unigramPpl(docs)
      .queryExecution.executedPlan.toString
    println("=== d44 BroadcastHashJoin (head lookup): " +
      countNode(p44, "BroadcastHashJoin"))
    println("=== d44 BroadcastNestedLoop (1-row totals only): " +
      countNode(p44, "BroadcastNestedLoop"))
    println("=== d44 CartesianProduct: " + countNode(p44, "CartesianProduct"))
    println("=== d44 token shuffle exchanges: " +
      countNode(p44, "Exchange hashpartitioning(token"))

    // d47: two head lookups (raw + target models) — BroadcastHashJoin
    // count doubles d44's; the docTok side must reach them WITHOUT a
    // (doc_id, token) exchange (in-row multiplicity UDF — the narrow
    // docTokens shape, asserted exchange-free in CurationSpec).
    val p47 = graft.ops.Curation
      .dsirWeights(docs, docs.where(col("lang") === "en"))
      .queryExecution.executedPlan.toString
    println("=== d47 BroadcastHashJoin (two head lookups): " +
      countNode(p47, "BroadcastHashJoin"))
    println("=== d47 CartesianProduct: " + countNode(p47, "CartesianProduct"))
    println("=== d47 doc_id,token shuffle exchanges (want 0): " +
      countNode(p47, "Exchange hashpartitioning(doc_id, token"))

    // d59: same exact-NLJ shape as d07 — the pair source must be a
    // broadcast nested-loop (or the blocked fallback), never a
    // CartesianProduct, and the top-k aggregation shuffles k rows/query.
    val p59 = graft.ops.Similarity.hardNegativeTopK(vecs)
      .queryExecution.executedPlan.toString
    println("=== d59 BroadcastNestedLoop (pair source): " +
      countNode(p59, "BroadcastNestedLoop"))
    println("=== d59 CartesianProduct (want 0): " +
      countNode(p59, "CartesianProduct"))

    // d60: candidates from an equi-join on gram (prefix x postings) —
    // never a nested-loop; windows partitioned (gram / doc_id).
    val p60 = graft.ops.Similarity.containmentPairs(docs)
      .queryExecution.executedPlan.toString
    println("=== d60 CartesianProduct/BNLJ (want 0): " +
      (countNode(p60, "CartesianProduct") + countNode(p60, "BroadcastNestedLoop")))
    println("=== d60 Window nodes (df + prefix rank, partitioned): " +
      countNode(p60, "Window"))

    // d62/d63: the islands window is doc-partitioned; the dup-gram df
    // pass is one gram-keyed exchange over the DISTINCT (doc, gram) set;
    // no nested-loop anywhere.
    val p62 = graft.ops.Curation.dupSpanIntervals(docs)
      .queryExecution.executedPlan.toString
    println("=== d62 CartesianProduct/BNLJ (want 0): " +
      (countNode(p62, "CartesianProduct") + countNode(p62, "BroadcastNestedLoop")))
    println("=== d62 Window nodes: " + countNode(p62, "Window"))
    println("=== d62 gram shuffle exchanges: " +
      countNode(p62, "Exchange hashpartitioning(gram"))
    val p63 = graft.ops.Curation.dedupScrub(docs)
      .queryExecution.executedPlan.toString
    println("=== d63 CartesianProduct/BNLJ (want 0): " +
      (countNode(p63, "CartesianProduct") + countNode(p63, "BroadcastNestedLoop")))
    println("=== d63 doc_id shuffle exchanges: " +
      countNode(p63, "Exchange hashpartitioning(doc_id"))

    // d68: both joins on the tiny per-source size frame must broadcast;
    // the word-keyed self-join is an equi-join (SMJ/shuffled-hash),
    // never a nested loop.
    val p68 = graft.ops.TextOps.sourceOverlap(docs)
      .queryExecution.executedPlan.toString
    println("=== d68 BroadcastHashJoin (size frames): " +
      countNode(p68, "BroadcastHashJoin"))
    println("=== d68 CartesianProduct/BNLJ (want 0): " +
      (countNode(p68, "CartesianProduct") + countNode(p68, "BroadcastNestedLoop")))

    // d71: projection feeding the exact top-k — the projection itself
    // adds no exchange beyond d07's own shape (broadcast NLJ pair
    // source + bounded top-k agg).
    val p71 = graft.ops.Similarity
      .cosineTopK(graft.ops.Quantize.randomProject(vecs))
      .queryExecution.executedPlan.toString
    println("=== d71 CartesianProduct (want 0): " +
      countNode(p71, "CartesianProduct"))
    println("=== d71 BroadcastNestedLoop (pair source): " +
      countNode(p71, "BroadcastNestedLoop"))

    // d74: the IVFPQ composition — the probe->cell join must be an
    // equi-join on cell (SMJ/shuffled-hash/broadcast by size), never a
    // nested loop, and the only shuffles are the cell join + the
    // bounded top-k aggregation (no vector-wide exchange: the candidate
    // side carries m ints). The codebook must ride as a literal, not a
    // join.
    val cbA = graft.ops.Pq.trainExact(spark, vecs, m = 8)
    val dvA = vecs.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val modelA = graft.ops.IvfIndex.build(spark, dvA, k = 16, iters = 1)
    val p74 = graft.ops.Pq.ivfPqTopK(spark, modelA, cbA, vecs, k = 3, probes = 16)
      .queryExecution.executedPlan.toString
    println("=== d74 CartesianProduct/BNLJ (want 0): " +
      (countNode(p74, "CartesianProduct") + countNode(p74, "BroadcastNestedLoop")))
    println("=== d74 cell-join exchanges: " +
      countNode(p74, "Exchange hashpartitioning(cell"))
    println("=== d74 total Exchange nodes: " + countNode(p74, "Exchange"))

    // d77: bigram/unigram rollups are model-sized; the winner joins ride
    // broadcast; totals are 1-row nested-loop cross joins — never a
    // CartesianProduct, and no (doc_id, ...) exchange (in-row bigram
    // multiplicities, the d50 shape).
    val p77 = graft.ops.Lexical.pmiBigrams(docs)
      .queryExecution.executedPlan.toString
    println("=== d77 CartesianProduct (want 0): " +
      countNode(p77, "CartesianProduct"))
    println("=== d77 BroadcastHashJoin (winner lookups): " +
      countNode(p77, "BroadcastHashJoin"))
    println("=== d77 doc_id shuffle exchanges (want 0): " +
      countNode(p77, "Exchange hashpartitioning(doc_id"))

    // d78/d79: pure narrow projections — ZERO hash exchanges (the one
    // RoundRobin exchange in the plan is Tables.documents' test-scale
    // spread of the single parquet file, not the operator's).
    val p78 = graft.ops.Lexical.charEntropy(docs)
      .queryExecution.executedPlan.toString
    println("=== d78 hash exchanges (want 0): " +
      countNode(p78, "Exchange hashpartitioning"))
    val p79 = graft.ops.Lexical.lexicalDiversity(docs)
      .queryExecution.executedPlan.toString
    println("=== d79 hash exchanges (want 0): " +
      countNode(p79, "Exchange hashpartitioning"))

    // d83: no (doc, position) machinery anywhere — the rebuild is an
    // in-row transform; no window, no cartesian; the only exchanges are
    // the model-sized token rollup and the doc-keyed rare-list rollup.
    val p83 = graft.ops.Lexical.unkReplace(docs)
      .queryExecution.executedPlan.toString
    println("=== d83 CartesianProduct (want 0): " +
      countNode(p83, "CartesianProduct"))
    println("=== d83 Window nodes (want 0): " + countNode(p83, "Window"))

    // d76: the MG aggregation must be partial-then-final (map-side
    // summaries) — one single-group exchange, no token-keyed exchange.
    // (heavyHitters itself is eager — the returned frame is the bounded
    // local summary — so audit the aggregation it runs.)
    val p76 = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .as[String](org.apache.spark.sql.Encoders.STRING)
      .select(new graft.ops.MgAgg(4096).toColumn)
      .queryExecution.executedPlan.toString
    println("=== d76 token shuffle exchanges (want 0): " +
      countNode(p76, "Exchange hashpartitioning(token"))
    println("=== d76 total Exchange nodes: " + countNode(p76, "Exchange"))

    // d87/d88/d90: the ordering ops RETURN RDD-backed frames (sequenceBy's
    // zipWithIndex), whose executedPlan is an opaque RDD scan — the
    // auditable DataFrame stage is groupRank's output (checkpoint scan +
    // offsets aggregate + join): ZERO Window nodes despite row_number
    // semantics, and the offsets join rides broadcast. Varied group
    // column — a lit() constant would let Catalyst fold the join key.
    val keyed = docs
      .withColumn("source", concat(lit("s"), (col("doc_id") % 7).cast("string")))
      .select(col("doc_id"), col("source"),
        md5(concat_ws(":", lit("graft"), col("doc_id").cast("string"))).as("skey"))
    val p88 = graft.ops.Curation.groupRank(keyed, "source",
        Seq(col("skey"), col("doc_id")), "rank_in_group")
      .queryExecution.executedPlan.toString
    println("=== d88/d90 groupRank Window nodes (want 0): " + countNode(p88, "Window"))
    println("=== d88/d90 groupRank BroadcastHashJoin (offsets, want >=1): " +
      countNode(p88, "BroadcastHashJoin"))

    // d95/d98 (round 13): the boilerplate drop must ride a BROADCAST
    // anti-join on the line hash (boilerplate is few distinct strings by
    // nature — the equi-condition makes it a BroadcastHashJoin LeftAnti),
    // the ordered rebuild a doc_id-keyed aggregation: ZERO Window nodes
    // despite per-doc ordering semantics, zero nested loops. d98's
    // first-occurrence rule is a struct-min aggregation + equi-join —
    // same assertions despite the oracle's row_number formulation.
    // Measured (sf0.01, round 13): d95 BHJ 2 (the anti drop + AQE
    // electing broadcast for the doc-count left join at this scale) /
    // CP+BNLJ 0 / Window 0; d98 CP+BNLJ 0 / Window 0.
    val fixture = graft.ops.Curation.plantedBoilerplate(docs)
    val p95 = graft.ops.Curation.boilerplateScrub(fixture)
      .queryExecution.executedPlan.toString
    println("=== d95 BroadcastHashJoin (anti drop, want >=1): " +
      countNode(p95, "BroadcastHashJoin"))
    println("=== d95 CartesianProduct/BNLJ (want 0): " +
      (countNode(p95, "CartesianProduct") + countNode(p95, "BroadcastNestedLoop")))
    println("=== d95 Window nodes (want 0): " + countNode(p95, "Window"))
    val p98 = graft.ops.Curation.paragraphDedup(fixture, sep = "\n")
      .queryExecution.executedPlan.toString
    println("=== d98 CartesianProduct/BNLJ (want 0): " +
      (countNode(p98, "CartesianProduct") + countNode(p98, "BroadcastNestedLoop")))
    println("=== d98 Window nodes (want 0): " + countNode(p98, "Window"))
    spark.stop()
  }
}
