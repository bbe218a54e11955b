package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted MinHash sketch index — the incremental-dedup counterpart of
  * the one-shot [[Similarity.nearDupPairs]] batch operator and the
  * [[graft.streaming.NearDupStream]] continuous detector: sketch the
  * corpus ONCE, persist, then dedupe each arriving batch against the
  * index without ever re-reading corpus text.
  *
  * On-disk layout (parquet):
  *   <dir>/sketches/ingest_batch=B/  (doc_id, grams ARRAY<BIGINT>, n INT,
  *                                    mh ARRAY<BIGINT>)
  *   <dir>/buckets/ingest_batch=B/band=N/  (bucket BIGINT, doc_id BIGINT,
  *                                          n INT)
  * Writes follow the [[IndexCommit]] protocol: each batch lands
  * idempotently under its own `ingest_batch` partitions (replaying a
  * failed [[append]]/[[ingest]] batch replaces its partial output), the
  * two tables are bracketed by a commit marker, and [[nearDupAgainst]]
  * fails closed on an interrupted write (sketches without their buckets
  * would silently MISS duplicates).
  *
  * Scale notes:
  *  - the bucket table is the probe side's join target and carries 24
  *    bytes/row x 16 bands — a probe batch never touches the ~1 KB/doc
  *    sketch rows except for the candidates that survive the bucket join
  *    and size-ratio prune (id-keyed attach; AQE broadcasts only a
  *    measured-small side);
  *  - at warehouse scale the bucket table should additionally be stored
  *    BUCKETed BY `bucket` (df.write.bucketBy — needs a persistent
  *    catalog, absent in this sandbox) so repeated probe batches shuffle
  *    alone while the index stays in place;
  *  - candidates, agreement pruning, and exact verification reuse the
  *    same code path as d06, so emitted pairs carry the same exact
  *    (inter_size, union_size) contract at Jaccard >= 0.8.
  */
object SketchIndex extends PersistedIndex {

  /** Lifecycle is [[PersistedIndex]]'s. The bucket table is derived
    * from the just-written sketches parquet, not from the in-memory
    * lineage — the gram+minhash UDF pass over the corpus runs exactly
    * once (re-running it for buckets would double the dominant cost of
    * index construction). */
  protected def batchTables: Seq[BatchTable] = Seq(
    BatchTable(IndexCommit.TableSpec("sketches"),
      (docs, _, _) => Similarity.sketchTable(docs)),
    BatchTable(IndexCommit.TableSpec("buckets", Seq("band")),
      (docs, dir, batchId) => Similarity.bandBuckets(
        docs.sparkSession.read.parquet(s"$dir/sketches")
          .where(col(IndexCommit.BatchCol) === batchId))))

  /** Near-duplicate pairs (exact Jaccard >= 0.8 over char-3-gram sets)
    * between `newDocs` (doc_id, text) and the indexed corpus. Emitted as
    * (doc_a = indexed id, doc_b = new id, inter_size, union_size) —
    * only CROSS pairs; dedup among the new batch itself is
    * [[Similarity.nearDupPairs]] on `newDocs`. New ids may collide with
    * indexed ids (re-crawls): identity pairs are excluded by id. */
  def nearDupAgainst(spark: SparkSession, newDocs: DataFrame, dir: String): DataFrame = {
    IndexCommit.requireCommitted(spark, dir, "nearDupAgainst")
    val oldSk = spark.read.parquet(s"$dir/sketches")
      .select(col("doc_id"), col("grams"), col("n"), col("mh"))
    val oldBuckets = spark.read.parquet(s"$dir/buckets")
      .select(col("doc_id"), col("n"), col("band"), col("bucket"))
    val newSk = Similarity.sketchTable(newDocs).cache()
    val newBuckets = Similarity.bandBuckets(newSk)
    val cand = oldBuckets.as("x").join(newBuckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") =!= col("y.doc_id") &&
          least(col("x.n"), col("y.n")) * 5 >= greatest(col("x.n"), col("y.n")) * 4)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val agreed = cand
      .join(oldSk.as("ma"), col("doc_a") === col("ma.doc_id"))
      .join(newSk.as("mb"), col("doc_b") === col("mb.doc_id"))
      .where(call_function("array_agree", col("ma.mh"), col("mb.mh")) >=
        (Similarity.NumHashes * 6) / 10)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    agreed
      .join(oldSk.as("ga"), col("doc_a") === col("ga.doc_id"))
      .join(newSk.as("gb"), col("doc_b") === col("gb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        col("ga.grams").as("gsa"), col("gb.grams").as("gsb"),
        col("ga.n").cast(LongType).as("n_a"), col("gb.n").cast(LongType).as("n_b"))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        call_function("sorted_inter_count", col("gsa"), col("gsb"))
          .cast(LongType).as("inter_size"))
      .select(col("doc_a"), col("doc_b"), col("inter_size"),
        (col("n_a") + col("n_b") - col("inter_size")).as("union_size"))
      .where(col("inter_size") * 5 >= col("union_size") * 4)
  }
}
