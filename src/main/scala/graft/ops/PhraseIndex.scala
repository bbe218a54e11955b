package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables._

/** Persisted POSITIONAL postings index — the serving form of d111's
  * exact phrase search (the [[LexIndex]] of the position family):
  * tokenize the corpus once into per-(term, doc) sorted position lists,
  * persist them bucket-partitioned by term hash, then answer "which
  * docs contain this literal phrase, how many times" for any query
  * without re-scanning corpus text. d37/d38/[[LexIndex]] rank by
  * bag-of-words relevance; this is the precision end — dataset audits,
  * memorization probes, targeted decontamination.
  *
  * On-disk layout (parquet):
  *   <dir>/postings/ingest_batch=B/bucket=H/ (term STRING, doc_id BIGINT,
  *                                            positions ARRAY<INT>)
  *   <dir>/docids/ingest_batch=B/            (doc_id BIGINT)
  * one row per (term, document) with the term's 1-based occurrence
  * positions sorted — per-id keyed facts, ADDITIVE across
  * document-disjoint batches (`docids` enforces the disjointness via
  * [[IndexCommit.requireDisjoint]]; an overlapping batch would emit
  * duplicate candidate rows). Writes follow the [[IndexCommit]]
  * protocol (idempotent per-batch partitions, commit marker,
  * fail-closed reads).
  *
  * Scale notes:
  *  - `bucket = pmod(xxhash64(term), 64)` partitions postings so a
  *    k-term query reads at most k of 64 buckets — the [[LexIndex]]
  *    pruning model; the driver-side collect is the ≤ k bucket ids,
  *    bounded by the query, never the corpus;
  *  - phrase verification is pure set arithmetic on the position
  *    lists: starts = P₁ ∩ (P₂−1) ∩ … ∩ (P_k−(k−1)), evaluated as
  *    codegen'd array_intersect over the k-way doc_id equi-join — the
  *    join fans out only docs containing EVERY query term;
  *  - the index is never materialized driver-side.
  */
object PhraseIndex extends PersistedIndex {

  private val Buckets = 64

  private def postings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("p", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("p") + 1)).as("positions"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(Buckets)))

  /** Lifecycle is [[PersistedIndex]]'s: positional postings
    * (cluster-written so each task hits one bucket directory instead of
    * all 64) plus the docids disjointness table — per-(term, doc) facts
    * would duplicate on overlapping batches. Compacted postings stay
    * bucket-partitioned, so searches prune identically. */
  protected def batchTables: Seq[BatchTable] = Seq(
    BatchTable(IndexCommit.TableSpec("postings", Seq("bucket")),
      (docs, _, _) => postings(docs), clusterWrite = true),
    BatchTable(IndexCommit.TableSpec("docids"),
      (docs, _, _) => docs.select(col("doc_id")).distinct()))

  override protected def disjointTable: String = "docids"

  /** Documents containing the literal `phrase`, with occurrence counts
    * — [[Corpus.phraseMatch]]'s exact schema/answers served from the
    * index (the d112 gate). The driver-side collect is the ≤ k query
    * bucket ids; candidate docs are those containing EVERY term (the
    * k-way join), verified by position-set intersection. */
  def searchPhrase(spark: SparkSession, dir: String, phrase: String): DataFrame = {
    IndexCommit.requireCommitted(spark, dir, "searchPhrase")
    val terms = phrase.trim.toLowerCase.split("\\s+").toSeq
    require(terms.nonEmpty && terms.head.nonEmpty, "need a non-empty phrase")
    import spark.implicits._
    val buckets = terms.distinct.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(Buckets)).as("bucket"))
      .distinct().as[Long].collect()
    val posts = spark.read.parquet(s"$dir/postings")
      .where(col("bucket").isin(buckets.toIndexedSeq: _*))
    val frames = terms.zipWithIndex.map { case (t, j) =>
      posts.where(col("term") === t)
        .select(col("doc_id"),
          expr(s"transform(positions, x -> x - $j)").as(s"p$j"))
    }
    val joined = frames.reduce((a, b) => a.join(b, Seq("doc_id")))
    val starts = (1 until terms.length)
      .foldLeft(col("p0")) { (acc, j) => array_intersect(acc, col(s"p$j")) }
    joined
      .select(col("doc_id"), size(starts).cast(LongType).as("n_matches"))
      .where(col("n_matches") > 0)
  }

  // ---- driver binding --------------------------------------------------

  /** Per-(session, sfDir) saved index over the full driver corpus —
    * d112 serves the same fixture phrase d111 scans for, and must
    * reproduce it exactly (the d97/d106 persisted-index gate pattern;
    * directories die with the session). */
  private val dirMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def savedDir(s: SparkSession, d: String): String = {
    val k = (s, d)
    val hit = dirMemo.get(k)
    if (hit != null) hit
    else {
      val dir = java.nio.file.Files.createTempDirectory("graft-phrase-q").toString
      save(documents(s, d), dir)
      val prev = dirMemo.putIfAbsent(k, dir)
      if (prev != null) { Corpus.deleteRecursively(dir); prev }
      else {
        graft.Sessions.onStopOnce(s, "phraseindex-dirs") { () =>
          val it = dirMemo.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getKey._1 eq s) { Corpus.deleteRecursively(e.getValue); it.remove() }
          }
        }
        dir
      }
    }
  }

  val MemoizedQueries: Set[String] = Set("d112_phrase_indexed")

  def queries: Seq[Q] = Seq(
    // d112: d111 served from the persisted positional index — save
    // (run 1) then search the same fixture phrase; hash-gated by
    // d111's oracle verbatim, proving the index round trip (positions
    // collect, bucket pruning, k-way join + intersection) preserves
    // the direct scan exactly.
    Q("d112_phrase_indexed",
      (s, d) => searchPhrase(s, savedDir(s, d), "table scan"),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, w,
             |         unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
             |  FROM t)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
             |FROM pos
             |WHERE w[i] = 'table' AND w[i + 1] = 'scan'
             |GROUP BY 1""".stripMargin)))
}
