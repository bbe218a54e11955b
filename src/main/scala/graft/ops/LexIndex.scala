package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index for BM25 lexical retrieval — the lexical
  * analog of [[IvfIndex]] (vectors) and SketchIndex (MinHash): tokenize
  * and aggregate the corpus ONCE, then serve arbitrary bag-of-words
  * queries without re-reading the documents.
  *
  * Layout under `dir`:
  *   - `postings/bucket=N/` — (term, doc_id, tf), partitioned by
  *     `bucket = pmod(xxhash64(term), NumBuckets)`. A search computes its
  *     terms' buckets and reads ONLY those directories (partition
  *     pruning), so query cost scales with the posting lists touched, not
  *     the corpus. Fixed bucket count instead of `partitionBy(term)`
  *     because a corpus-scale vocabulary would mean millions of
  *     directories — the bucket layer keeps the file count bounded while
  *     preserving pruning.
  *   - `docstats/` — (doc_id, dl): per-document token counts, the
  *     length-normalization side. Read in full at search time (one narrow
  *     scan + two scalar aggregates for n_docs/avgdl); a deployment
  *     serving many queries would cache it.
  *
  * [[append]] ingests additional documents incrementally (parquet append
  * on both tables). Precondition: appended doc_ids are disjoint from
  * what's already indexed — postings/docstats are keyed facts per doc, so
  * re-adding a doc would double-count it (same contract as
  * `IvfIndex.appendSaved`).
  *
  * The two tables are two separate parquet commits, so a crash between
  * them would leave postings and docstats describing DIFFERENT corpora —
  * new docs present in tf/df but absent from n_docs/avgdl, silently
  * skewing every other document's BM25 score. Writes therefore follow a
  * marker protocol: drop `_graft_commit`, write both tables, recreate it.
  * [[searchBm25]] refuses (fails closed) when the marker is missing —
  * an interrupted write must be redone (rebuild via [[save]], or re-run
  * the same [[append]] after deleting the partially-appended doc_ids'
  * rows is NOT supported; rebuild).
  *
  * Search reuses [[Corpus.bm25ScoreFrom]], the exact scoring core of the
  * direct-path d38 query, so indexed results equal the direct computation
  * by construction (LexIndexSpec asserts it; d39 hash-gates it against
  * d38's DuckDB oracle).
  */
object LexIndex {

  /** Directory fan-out of the postings table. 64 keeps listing cheap at
    * test scale; at corpus scale raise it so each bucket's posting files
    * stay within a few HDFS blocks. */
  val NumBuckets = 64

  private def bucketCol = pmod(xxhash64(col("term")), lit(NumBuckets.toLong))

  private def postings(docs: DataFrame): DataFrame =
    Corpus.termStream(docs)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  private def docstats(docs: DataFrame): DataFrame =
    Corpus.termStream(docs)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))

  /** Hadoop-FS path of the index-consistency marker (works on any
    * Spark-reachable filesystem, not just local disk). */
  private def marker(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_commit")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def write(docs: DataFrame, dir: String, mode: String): Unit = {
    val (fs, m) = marker(docs.sparkSession, dir)
    fs.delete(m, false) // invalidate while the two commits are in flight
    postings(docs)
      .withColumn("bucket", bucketCol)
      .repartition(col("bucket"))
      .write.mode(mode).partitionBy("bucket").parquet(s"$dir/postings")
    // dl is the per-doc token total = sum(tf) by definition, so a full
    // build derives it from the postings it JUST wrote — one tokenize +
    // explode pass over the corpus instead of two (the explode dominates
    // build cost; the read-back aggregates the far smaller postings
    // table). Append batches keep the direct computation: their read-back
    // would include the pre-existing docs' postings.
    val dl =
      if (mode == "overwrite")
        docs.sparkSession.read.parquet(s"$dir/postings")
          .groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      else docstats(docs)
    dl.write.mode(mode).parquet(s"$dir/docstats")
    fs.create(m, true).close()
  }

  /** Build the index from scratch. In: (doc_id, text). */
  def save(docs: DataFrame, dir: String): Unit = write(docs, dir, "overwrite")

  /** Incrementally index additional documents (doc_ids must be new). */
  def append(docs: DataFrame, dir: String): Unit = write(docs, dir, "append")

  /** Top-`k` documents for `terms` under Okapi BM25, served from the
    * saved index. The driver-side collect is the ≤ |terms| bucket ids —
    * bounded by the query, never by the corpus. */
  def searchBm25(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "searchBm25: empty query")
    val (fs, m) = marker(spark, dir)
    require(fs.exists(m),
      s"searchBm25: $dir has no _graft_commit marker — the index was never " +
      "fully written or a save/append was interrupted between its postings " +
      "and docstats commits; scoring it would silently skew BM25. Rebuild " +
      "with LexIndex.save.")
    import spark.implicits._
    val buckets = terms.toDF("term")
      .select(bucketCol.as("bucket")).distinct().as[Long].collect()
    val tf = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets.toIndexedSeq: _*) && col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("tf"))
    val dl = spark.read.parquet(s"$dir/docstats")
    Corpus.bm25ScoreFrom(tf, dl, k, k1, b)
  }
}
