package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Persisted SimHash signature index — the incremental serving form of
  * d09's hamming near-dup detection (the [[SketchIndex]] of the simhash
  * family): sketch the corpus once into 60-bit signatures, persist them
  * (16 bytes/doc — the cheapest of the index families), then answer
  * "which indexed docs sit within hamming ≤ 3 of this arriving batch"
  * without re-reading corpus text. MinHash ([[SketchIndex]]) serves the
  * Jaccard-threshold question; this serves the bit-flip/near-template
  * question the simhash sketch is built for.
  *
  * On-disk layout (parquet):
  *   <dir>/signatures/ingest_batch=B/  (doc_id BIGINT, simhash BIGINT)
  * one row per indexed document — per-id keyed facts, additive across
  * DOCUMENT-disjoint batches ([[IndexCommit.requireDisjoint]] on the
  * signatures table itself; a re-indexed doc would emit duplicate
  * pairs). Writes follow the [[IndexCommit]] protocol.
  *
  * Scale notes:
  *  - the probe derives both sides' 15-bit pigeonhole chunks (4
  *    rows/doc) and equi-joins on (chunk, value) — exact recall at
  *    hamming ≤ 3 by pigeonhole, never all-pairs; the hamming test
  *    runs map-side so the dedupe shuffle carries only true pairs;
  *  - signature recompute from the stored 16-byte rows is a narrow
  *    projection — no corpus text is ever stored or shuffled;
  *  - the index is never materialized driver-side. */
object SimHashIndex extends PersistedIndex {

  /** Lifecycle is [[PersistedIndex]]'s: one 16-byte row per doc (the
    * 64-bit signature) — batches must be doc-disjoint (a re-sketched
    * doc would pair with itself at hamming 0). */
  protected def batchTables: Seq[BatchTable] = Seq(
    BatchTable(IndexCommit.TableSpec("signatures"),
      (docs, _, _) => Corpus.simhashSignatures(docs)))

  /** CROSS near-dup pairs between the indexed corpus and an arriving
    * batch at hamming ≤ `maxHamming`: (doc_a indexed, doc_b new,
    * hamming). Exact recall by the same chunk pigeonhole as the
    * one-shot d09 — the gate restricts both to a split corpus and they
    * must agree. */
  def nearDupAgainst(spark: SparkSession, newDocs: DataFrame, dir: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "chunk-equality candidates are exact only for hamming <= 3")
    IndexCommit.requireCommitted(spark, dir, "nearDupAgainst")
    val idx = spark.read.parquet(s"$dir/signatures")
      .select(col("doc_id"), col("simhash"))
    val probe = Corpus.simhashSignatures(newDocs)
    Corpus.simhashChunks(idx).as("x")
      .join(Corpus.simhashChunks(probe).as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("CAST(bit_count(x.simhash ^ y.simhash) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---- driver binding --------------------------------------------------

  /** Per-(session, sfDir) saved index over the mod-3-zero base split —
    * d113 probes the rest against it (the d97/d106/d112 persisted-index
    * gate pattern; directories die with the session). */
  private val dirMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def savedDir(s: SparkSession, d: String): String = {
    val k = (s, d)
    val hit = dirMemo.get(k)
    if (hit != null) hit
    else {
      val dir = java.nio.file.Files.createTempDirectory("graft-simhash-q").toString
      save(documents(s, d).where(col("doc_id") % 3 === 0), dir)
      val prev = dirMemo.putIfAbsent(k, dir)
      if (prev != null) { Corpus.deleteRecursively(dir); prev }
      else {
        graft.Sessions.onStopOnce(s, "simhashindex-dirs") { () =>
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

  val MemoizedQueries: Set[String] = Set("d113_simhash_indexed")

  def queries: Seq[Q] = Seq(
    // d113: d09 served cross-split from the persisted signatures —
    // save (run 1) then probe the delta; the oracle recomputes both
    // sides' signatures from text and takes the base × delta pairs.
    Q("d113_simhash_indexed",
      (s, d) => nearDupAgainst(s,
        documents(s, d).where(col("doc_id") % 3 =!= 0), savedDir(s, d)),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents
             |), th AS (
             |  SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks
             |), bits AS (
             |  SELECT doc_id, k,
             |         CASE WHEN sum(CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END) >= 0 THEN 1 ELSE 0 END AS bit
             |  FROM th, LATERAL (SELECT unnest(range(0, 60)) AS k) u
             |  GROUP BY doc_id, k
             |), sh AS (
             |  SELECT doc_id, CAST(sum(bit * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS simhash
             |  FROM bits GROUP BY doc_id
             |)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
             |FROM sh a JOIN sh b ON a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
             |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin)))
}
