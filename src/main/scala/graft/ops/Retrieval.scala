package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Lexical retrieval over the document corpus — the inverted-index
  * scoring classics (BM25 ranked retrieval, TF-IDF keyword extraction)
  * as pure DataFrame plans. These are the batch analogs of a search
  * engine's scoring pass and the standard "salient terms per document"
  * feature used for corpus exploration and near-topic filtering in
  * training-data curation.
  *
  * Tokenization matches the d02/d03 convention exactly
  * (`split(lower(trim(text)), "\s+")` ↔ DuckDB
  * `regexp_split_to_array`), so every frame here is replayable by the
  * oracle. Scores are doubles; both engines evaluate the IDENTICAL
  * formula text (the numeric literals are shared string constants
  * interpolated into both the Spark `expr` and the oracle SQL) with
  * every operand explicitly cast to double, so the IEEE evaluation
  * order is the same on both sides; the result is rounded to 4 decimals
  * (the d76-family `round(ln(...), 4)` precedent) and ties in every
  * ranking break on the id/term, making top-k engine-independent.
  *
  * Scale: everything is postings-list shaped. The term-frequency frame
  * (doc, term, tf) is the only corpus-width explode; document length
  * and document frequency are partial-aggregated rollups of it. BM25
  * scoring touches only the postings of the query terms (a broadcast
  * semi-ish join — query sets are small by construction), and each
  * ranking window partitions by term (BM25) or document (TF-IDF), so
  * no sort is ever global. No driver-side vocabulary, no collect.
  */
object Retrieval {

  /** Okapi parameters as SHARED LITERAL STRINGS — interpolated into
    * both the Spark expression and the DuckDB oracle so the two
    * engines parse the very same numeric text (k1=1.2, b=0.75;
    * k1+1 = 2.2 and 1−b = 0.25 are pre-folded as text to keep the
    * runtime arithmetic identical on both sides). */
  private val K1 = "1.2"
  private val K1p1 = "2.2"
  private val B = "0.75"
  private val OneMinusB = "0.25"

  /** The shared score formula; `ndocs`/`df`/`tf`/`dl`/`avgdl` are
    * column names present on both sides. Robertson–Sparck Jones idf in
    * the +1 form (always positive), Okapi tf saturation with document
    * -length normalization. */
  private def bm25Formula: String =
    s"round(ln(1.0 + (cast(ndocs - df as double) + 0.5) / (cast(df as double) + 0.5))" +
      s" * (cast(tf as double) * $K1p1)" +
      s" / (cast(tf as double) + $K1 * ($OneMinusB + $B * cast(dl as double) / avgdl)), 4)"

  /** BM25 ranked retrieval (d136): for each of the `nQueryTerms` most
    * document-frequent terms (ties to the lexicographically smaller
    * term — a deterministic stand-in for a user query workload), the
    * top-`k` documents by BM25. Out: (term, doc_id, tf, score, rank).
    *
    * Scale: the postings frame is built once (explode + pair-keyed
    * count, the d03 shape); `dl`/`df`/corpus stats are partial
    * -aggregated rollups. The query-term frame is `nQueryTerms` rows —
    * broadcast — so scoring is one postings-side semi-join that prunes
    * the corpus to the query terms' postings lists before any scoring
    * arithmetic runs. The top-k window partitions BY TERM: its sort is
    * one postings list, never the corpus. */
  def bm25TopK(docs: DataFrame, nQueryTerms: Int = 20, k: Int = 10): DataFrame =
    bm25TopKFrom(postingsOf(docs), nQueryTerms, k)

  /** The (doc_id, term, tf) postings frame every operator here derives
    * from — ONE corpus-width explode + pair-keyed count, the d03 shape.
    * Everything downstream (dl, df, cf, corpus stats, scoring, PRF
    * rollups) is a rollup or prune of THIS frame, which is why each
    * operator has a `...From(tf)` twin: pass a frame read back from the
    * persisted [[LexIndex]] (whose postings table is built by the
    * identical tokenize + count) and the whole retrieval family serves
    * from the incremental index instead of re-tokenizing the corpus —
    * d149/d150 hash-gate that equivalence against the d141/d146
    * corpus-path oracles. */
  private[ops] def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** [[bm25TopK]] from a prebuilt postings frame. */
  def bm25TopKFrom(tf: DataFrame, nQueryTerms: Int = 20, k: Int = 10): DataFrame = {
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("ndocs"), sum(col("dl")).as("sum_dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = dfreq.orderBy(col("df").desc, col("term")).limit(nQueryTerms)
    tf.join(broadcast(qterms), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", expr("cast(sum_dl as double) / cast(ndocs as double)"))
      .withColumn("score", expr(bm25Formula))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("score").desc, col("doc_id"))).cast(LongType))
      .where(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("tf"), col("score"), col("rank"))
  }

  /** TF-IDF keyword extraction (d137): the `k` most salient terms per
    * document by tf·ln(N/df), ties to the lexicographically smaller
    * term. Out: (doc_id, term, tf, tfidf, rank) — the per-document
    * keyword profile used for corpus exploration, topic filters, and
    * cheap doc-level features.
    *
    * Scale: reuses the postings frame; the df attach is a term-keyed
    * shuffle join (vocabulary-sized — broadcastable for bounded
    * vocabularies, left to the planner/AQE here because a 100 TB
    * corpus's vocabulary need not be driver-small); the window
    * partitions BY DOCUMENT, so the sort is each document's own term
    * list. */
  def tfidfKeywords(docs: DataFrame, k: Int = 5): DataFrame =
    tfidfKeywordsFrom(postingsOf(docs), k)

  /** [[tfidfKeywords]] from a prebuilt postings frame. */
  def tfidfKeywordsFrom(tf: DataFrame, k: Int = 5): DataFrame = {
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = tf.agg(countDistinct(col("doc_id")).as("ndocs"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("tfidf", expr(
        "round(cast(tf as double) * ln(cast(ndocs as double) / cast(df as double)), 4) + 0.0"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))).cast(LongType))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"), col("rank"))
  }

  /** Dirichlet smoothing parameter as a shared literal (Zhai & Lafferty's
    * recommended μ≈2000). */
  private val MU = "2000.0"

  /** The shared query-likelihood score: ln p(t|d) under Dirichlet prior
    * smoothing — p(t|d) = (tf + μ·cf/C) / (dl + μ), where cf is the
    * term's collection frequency and C the total token count. Like
    * [[bm25Formula]], ONE literal string both engines parse, every
    * operand cast to double, rounded to 4 decimals. */
  private def qlFormula: String =
    s"round(ln((cast(tf as double) + $MU * (cast(cf as double) / cast(ctot as double)))" +
      s" / (cast(dl as double) + $MU)), 4)"

  /** Query-likelihood ranked retrieval (d141): the language-modeling
    * alternative to BM25 — documents ranked by ln p(term|doc) under
    * Dirichlet prior smoothing, for the same deterministic 20-term
    * query workload as d136, top-`k` per term (ties to the lower
    * doc_id). Out: (term, doc_id, tf, score, rank). BM25 and QL
    * disagree exactly where the models differ (QL's length prior is
    * smoothing-based, not saturation-based), which is why engines ship
    * both.
    *
    * Scale: identical shape to [[bm25TopK]] — the postings frame is
    * pruned to the query terms' postings lists by a 20-row broadcast
    * (which also carries each term's collection frequency, so the
    * vocabulary-sized cf rollup never shuffles against the corpus), and
    * the top-k window partitions BY TERM. */
  def qlTopK(docs: DataFrame, nQueryTerms: Int = 20, k: Int = 10): DataFrame =
    qlTopKFrom(postingsOf(docs), nQueryTerms, k)

  /** [[qlTopK]] from a prebuilt postings frame — the d149 indexed path
    * passes the [[LexIndex]] postings table here. */
  def qlTopKFrom(tf: DataFrame, nQueryTerms: Int = 20, k: Int = 10): DataFrame = {
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(sum(col("dl")).as("ctot"))
    val dfreq = tf.groupBy(col("term")).agg(
      count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val qterms = dfreq.orderBy(col("df").desc, col("term")).limit(nQueryTerms)
      .select(col("term"), col("cf"))
    tf.join(broadcast(qterms), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("score", expr(qlFormula))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("score").desc, col("doc_id"))).cast(LongType))
      .where(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("tf"), col("score"), col("rank"))
  }

  /** Dirichlet query-likelihood for an EXPLICIT term set — the serve
    * -path contract ([[LexIndex.searchQl]] is the indexed twin, equal by
    * construction: same [[qlRankFrames]] core, postings/doc-lengths read
    * from the persisted index instead of derived from the corpus). Out
    * the d141 shape: (term, doc_id, tf, score, rank ≤ k). */
  def qlRank(docs: DataFrame, terms: Seq[String], k: Int = 10): DataFrame = {
    require(terms.nonEmpty, "qlRank: empty query")
    val all = postingsOf(docs)
    val dl = all.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    qlRankFrames(all.filter(col("term").isin(terms: _*)), dl, k)
  }

  /** The QL scoring core over prebuilt frames: `tf` the QUERY TERMS'
    * postings (each term's postings complete — cf rolls up from them),
    * `dl` the FULL per-document length table. Shared by the direct
    * [[qlRank]] and the index-served [[LexIndex.searchQl]]. */
  private[ops] def qlRankFrames(tf: DataFrame, dl: DataFrame, k: Int): DataFrame = {
    val stats = dl.agg(sum(col("dl")).as("ctot"))
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    tf.join(broadcast(cf), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("score", expr(qlFormula))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("score").desc, col("doc_id"))).cast(LongType))
      .where(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("tf"), col("score"), col("rank"))
  }

  /** Fixed-point scale for RRF contributions: each list's contribution
    * for a rank-r hit is `RrfScale div (kRrf + r)` — a long, so the
    * fused score is pure integer arithmetic (the d128 convention) and
    * engine-independent. 1e9 keeps adjacent ranks distinguishable
    * (r=1 vs r=2 differ by ~2.6e5 at kRrf=60) with overflow headroom
    * for thousands of fused lists. */
  val RrfScale = 1000000000L

  /** Reciprocal-rank fusion (d143, Cormack/Clarke/Büttcher): combine
    * per-query rankings from several retrievers into one consensus
    * ranking — score(d) = Σ_lists 1/(kRrf + rank_list(d)), the standard
    * robust rank aggregation (no score calibration across retrievers
    * needed, only ranks). In: ranking frames each (term, doc_id, rank).
    * Out: (term, doc_id, rrf, n_lists, rank) — `rrf` the fixed-point
    * fused score, `n_lists` how many input lists ranked the doc, `rank`
    * the fused top-`k` position (ties to the lower doc_id).
    *
    * Scale: fusion touches ONLY the retrievers' top-k lists (#queries ×
    * k × #lists rows — trivially small at any corpus size); the heavy
    * lifting is the upstream retrievers themselves, and when those
    * share subplans (d136/d141 build the identical postings frame)
    * Spark's ReuseExchange dedupes the duplicated exchanges inside the
    * one fused job. The final window partitions by term over ≤ k·#lists
    * rows. */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = 60, k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kRrf >= 1, "need kRrf >= 1")
    val lists = rankings.map(_.select(col("term"), col("doc_id"), col("rank")))
    lists.reduce(_ unionAll _)
      .select(col("term"), col("doc_id"),
        expr(s"$RrfScale div ($kRrf + rank)").as("contrib"))
      .groupBy(col("term"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("rrf").desc, col("doc_id"))).cast(LongType))
      .where(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("rrf"), col("n_lists"), col("rank"))
  }

  /** Pseudo-relevance-feedback query expansion (d146, Rocchio/RM1
    * -lite): for each query term, take its BM25 top-`kDocs` documents
    * as the feedback set and rank the other terms occurring in it by
    * total term frequency — the classic automatic query-expansion step
    * (and, in a curation pipeline, "what co-occurs with this topic
    * term" corpus exploration). Out: (qterm, term, tf_sum, df_k, rank
    * 1..kTerms) — tf_sum = Σ tf over the feedback docs, df_k = how many
    * of them contain the term; exact longs, ties to the
    * lexicographically smaller term.
    *
    * Scale: the feedback set is nQueryTerms·kDocs rows — broadcast —
    * so the expansion is one doc_id-keyed prune of the postings frame
    * (the corpus never re-shuffles), a (qterm, term)-keyed rollup of
    * the pruned slice, and a per-qterm top-k window over the feedback
    * docs' own vocabulary. */
  def prfExpansion(docs: DataFrame, nQueryTerms: Int = 20, kDocs: Int = 10,
                   kTerms: Int = 5): DataFrame =
    prfExpansionFrom(postingsOf(docs), nQueryTerms, kDocs, kTerms)

  /** [[prfExpansion]] from a prebuilt postings frame. The postings feed
    * FIVE plan branches (document lengths, corpus stats, the df workload,
    * the BM25 scoring join, and the expansion rollup); relying on
    * ReuseExchange to dedupe five separately planned copies was
    * planner-dependent and measurably did NOT hold (the executed d146
    * plan carried seven Generate nodes — seven corpus tokenizations), so
    * the frame is materialized ONCE here and every branch reads the
    * materialization. RetrievalSpec pins the executed plan to a single
    * Generate. The d150 indexed path passes the [[LexIndex]] postings
    * table here — its "explode count" is zero either way (the postings
    * are pre-aggregated parquet), and the one materialization saves five
    * re-reads of the index. */
  def prfExpansionFrom(tf: DataFrame, nQueryTerms: Int = 20, kDocs: Int = 10,
                       kTerms: Int = 5): DataFrame = {
    val tfm = tf.localCheckpoint()
    val feedback = bm25TopKFrom(tfm, nQueryTerms, kDocs)
      .select(col("term").as("qterm"), col("doc_id"))
    tfm.join(broadcast(feedback), Seq("doc_id"))
      .where(col("term") =!= col("qterm"))
      .groupBy(col("qterm"), col("term"))
      .agg(sum(col("tf")).as("tf_sum"), count(lit(1)).as("df_k"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qterm"))
          .orderBy(col("tf_sum").desc, col("term"))).cast(LongType))
      .where(col("rank") <= kTerms)
      .select(col("qterm"), col("term"), col("tf_sum"), col("df_k"), col("rank"))
  }

  private val tfSql =
    """SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
      |  FROM documents)
      |GROUP BY 1, 2""".stripMargin

  /** d141's oracle — d149 (the LexIndex-served path) is gated by the
    * SAME SQL, asserting the index round-trip (postings write + read
    * -back) preserves the direct computation exactly, the d38/d39
    * convention. */
  private val qlOracle: String =
    s"""WITH tf AS MATERIALIZED ($tfSql),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |stats AS (SELECT CAST(sum(dl) AS BIGINT) AS ctot FROM dl),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
       |                 CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
       |qterms AS (SELECT term, cf FROM dfreq ORDER BY df DESC, term LIMIT 20),
       |scored AS (
       |  SELECT tf.term, tf.doc_id, tf.tf, $qlFormula AS score
       |  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT term, doc_id, tf, score, rank FROM ranked WHERE rank <= 10""".stripMargin

  /** d146's oracle — d150 (the LexIndex-served path) is gated by the
    * SAME SQL. */
  private val prfOracle: String =
    s"""WITH tf AS MATERIALIZED ($tfSql),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS ndocs,
       |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |qterms AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 20),
       |scored AS (
       |  SELECT tf.term, tf.doc_id,
       |         ${bm25Formula.replace("avgdl", "(cast(sum_dl as double) / cast(ndocs as double))")} AS score
       |  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
       |feedback AS (
       |  SELECT term AS qterm, doc_id FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY term ORDER BY score DESC, doc_id) AS rank
       |    FROM scored)
       |  WHERE rank <= 10),
       |exp AS (
       |  SELECT f.qterm, t.term,
       |         CAST(sum(t.tf) AS BIGINT) AS tf_sum,
       |         CAST(count(*) AS BIGINT) AS df_k
       |  FROM tf t JOIN feedback f USING (doc_id)
       |  WHERE t.term <> f.qterm
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY qterm ORDER BY tf_sum DESC, term) AS BIGINT) AS rank
       |  FROM exp)
       |SELECT qterm, term, tf_sum, df_k, rank FROM ranked WHERE rank <= 5""".stripMargin

  /** d136's oracle — d153 (the LexIndex-served path) is gated by the
    * SAME SQL. */
  private val bm25TopKOracle: String =
    s"""WITH tf AS MATERIALIZED ($tfSql),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS ndocs,
       |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |qterms AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 20),
       |scored AS (
       |  SELECT tf.term, tf.doc_id, tf.tf,
       |         ${bm25Formula.replace("avgdl", "(cast(sum_dl as double) / cast(ndocs as double))")} AS score
       |  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT term, doc_id, tf, score, rank FROM ranked WHERE rank <= 10""".stripMargin

  /** d137's oracle — d154 (the LexIndex-served path) is gated by the
    * SAME SQL. */
  private val tfidfOracle: String =
    s"""WITH tf AS MATERIALIZED ($tfSql),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS ndocs FROM tf),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf,
       |         round(cast(tf as double) * ln(cast(ndocs as double) / cast(df as double)), 4) + 0.0 AS tfidf
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= 5""".stripMargin

  /** Query names served from the per-(session, dir) memoized LexIndex
    * (Corpus.lexIndexDir, the d39 convention): run 1 pays the index
    * build + the serve, run 2 only the serve. */
  val MemoizedQueries: Set[String] = Set("d149_ql_indexed", "d150_prf_indexed",
    "d153_bm25_topk_indexed", "d154_tfidf_indexed")

  def queries: Seq[Q] = Seq(

    // d136: BM25 top-10 docs for each of the 20 most document-frequent
    // terms — the oracle replays the identical formula text.
    Q("d136_bm25_topk",
      (s, d) => bm25TopK(documents(s, d)),
      Some(bm25TopKOracle)),

    // d153: the SAME per-term BM25 retrieval served from the persisted
    // LexIndex postings, hash-gated by d136's oracle.
    Q("d153_bm25_topk_indexed",
      (s, d) => bm25TopKFrom(LexIndex.postings(s, Corpus.lexIndexDir(s, d))),
      Some(bm25TopKOracle)),

    // d137: top-5 TF-IDF keywords per document.
    Q("d137_tfidf_keywords",
      (s, d) => tfidfKeywords(documents(s, d)),
      Some(tfidfOracle)),

    // d154: the SAME keyword extraction served from the persisted
    // LexIndex postings, hash-gated by d137's oracle — with d149/d150/
    // d153 this completes the incremental persisted path across the
    // whole lexical family.
    Q("d154_tfidf_indexed",
      (s, d) => tfidfKeywordsFrom(LexIndex.postings(s, Corpus.lexIndexDir(s, d))),
      Some(tfidfOracle)),

    // d141: Dirichlet query-likelihood top-10 for the same 20-term
    // workload as d136 — the oracle replays the identical formula text.
    Q("d141_ql_topk",
      (s, d) => qlTopK(documents(s, d)),
      Some(qlOracle)),

    // d149: the SAME QL retrieval served from the persisted LexIndex
    // postings + docstats (no corpus re-tokenize), hash-gated by d141's
    // oracle — the d38/d39 discipline extended to the language-modeling
    // scorer: the incremental index path must preserve the direct
    // computation exactly.
    Q("d149_ql_indexed",
      (s, d) => qlTopKFrom(LexIndex.postings(s, Corpus.lexIndexDir(s, d))),
      Some(qlOracle)),

    // d143: reciprocal-rank fusion of the BM25 (d136) and QL (d141)
    // top-10 lists for the shared 20-term workload — fixed-point
    // integer contributions, so the fused scores are exact longs; the
    // oracle rebuilds both rankings and replays the identical
    // floor-div / sum / tie-break.
    Q("d143_rrf_fusion",
      (s, d) => {
        val docs = documents(s, d)
        rrfFuse(Seq(bm25TopK(docs), qlTopK(docs)))
      },
      Some(s"""WITH tf AS MATERIALIZED ($tfSql),
              |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
              |bstats AS (SELECT CAST(count(*) AS BIGINT) AS ndocs,
              |                  CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
              |qstats AS (SELECT CAST(sum(dl) AS BIGINT) AS ctot FROM dl),
              |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
              |                 CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
              |qterms AS (SELECT term, df, cf FROM dfreq ORDER BY df DESC, term LIMIT 20),
              |bscored AS (
              |  SELECT tf.term, tf.doc_id,
              |         ${bm25Formula.replace("avgdl", "(cast(sum_dl as double) / cast(ndocs as double))")} AS score
              |  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id) CROSS JOIN bstats),
              |branked AS (
              |  SELECT term, doc_id, CAST(row_number() OVER (
              |    PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT) AS rank
              |  FROM bscored),
              |qscored AS (
              |  SELECT tf.term, tf.doc_id, $qlFormula AS score
              |  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id) CROSS JOIN qstats),
              |qranked AS (
              |  SELECT term, doc_id, CAST(row_number() OVER (
              |    PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT) AS rank
              |  FROM qscored),
              |u AS (
              |  SELECT term, doc_id, rank FROM branked WHERE rank <= 10
              |  UNION ALL
              |  SELECT term, doc_id, rank FROM qranked WHERE rank <= 10),
              |fused AS (
              |  SELECT term, doc_id,
              |         CAST(sum(1000000000 // (60 + rank)) AS BIGINT) AS rrf,
              |         CAST(count(*) AS BIGINT) AS n_lists
              |  FROM u GROUP BY 1, 2),
              |franked AS (
              |  SELECT *, CAST(row_number() OVER (
              |    PARTITION BY term ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
              |  FROM fused)
              |SELECT term, doc_id, rrf, n_lists, rank
              |FROM franked WHERE rank <= 10""".stripMargin)),

    // d146: PRF query expansion over the BM25 feedback sets — exact
    // integer rollups; the oracle rebuilds the d136 ranking and
    // replays the identical prune / rollup / tie-break.
    Q("d146_prf_expansion",
      (s, d) => prfExpansion(documents(s, d)),
      Some(prfOracle)),

    // d150: the SAME PRF expansion served from the persisted LexIndex
    // postings — feedback ranking and expansion rollup both read the
    // pre-aggregated postings table; hash-gated by d146's oracle.
    Q("d150_prf_indexed",
      (s, d) => prfExpansionFrom(LexIndex.postings(s, Corpus.lexIndexDir(s, d))),
      Some(prfOracle))
  )
}
