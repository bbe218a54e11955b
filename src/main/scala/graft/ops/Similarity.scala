package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Fuzzy-dedup / similarity-search operators over `documents` and
  * `embeddings` — the sketch half of the training-data-pipeline surface
  * (the exact/statistical half lives in TextOps).
  *
  * Scale design notes (100 TB):
  *  - d06 never does an all-pairs comparison: candidates come from banded
  *    MinHash-LSH (one shuffle on band buckets), and only candidate pairs
  *    are exact-verified with a shingle join. The emitted *result* is
  *    exact (integer intersection/union sizes at threshold ≥ 0.8), so the
  *    DuckDB oracle — which at test scale CAN afford the all-pairs
  *    computation — must agree bit-for-bit: any pair at J ≥ 0.8 escapes
  *    the 16-band × 8-row sketch only with probability (1-J⁸)¹⁶ (≈1e-5 at J=0.92; the corpus near-dups all sit above 0.92 and the estimate pre-filter keeps a wide margin).
  *  - d07 is the brute-force cosine baseline (broadcast self-join — the
  *    right plan when one side fits in memory; the LSH-bucketed scale path
  *    is d08). No floats in the output: ranks + ids only, ordered by a
  *    total order (sim desc, neighbor asc) with both engines computing
  *    the identical double expression.
  *  - d08 is the approximate scale path: random-hyperplane signatures,
  *    candidates within a bucket only — sub-quadratic; rows-only check
  *    (the signature hash is engine-specific by design).
  */
object Similarity {

  // ---- MinHash machinery (d06/d08) -----------------------------------------

  /** 3-char shingles of lower(text), distinct per doc — pure Catalyst
    * (sequence + substring), no UDF, codegen'd. */
  private def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(expr("sequence(1, greatest(length(lower(text)) - 2, 0))")).as("i"),
        lower(col("text")).as("t"))
      .select(col("doc_id"), expr("substring(t, i, 3)").as("g"))
      .distinct()

  private val NumHashes = 128
  private val Bands = 16
  private val RowsPerBand = 8 // NumHashes / Bands

  /** Sequential (index-order) double dot product — the same arithmetic
    * DuckDB's list_dot_product performs, compiled to a tight loop. */
  private val dotUdf = udf((a: Seq[Double], b: Seq[Double]) => {
    var i = 0
    var acc = 0.0
    val n = a.length
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  })

  /** Fraction of agreeing minhash components — an unbiased Jaccard
    * estimate used to prune candidates before exact verification. */
  private val mhAgreeUdf = udf((a: Seq[Long], b: Seq[Long]) => {
    var i = 0
    var eq = 0
    while (i < NumHashes) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq
  })

  /** 128 min-hashes per doc in one pass over its shingle set (UDF — the
    * per-gram hash fan-out would be a 128× row blow-up as pure SQL). */
  private val minhashUdf = udf((grams: Seq[String]) => {
    val out = new Array[Long](NumHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    grams.foreach { g =>
      val base = scala.util.hashing.MurmurHash3.stringHash(g, 0x9747b28c).toLong & 0xffffffffL
      var i = 0
      while (i < NumHashes) {
        // Carter-Wegman style: h_i(x) = (a_i * x + b_i) mod p, p = 2^61-1
        val p = (1L << 61) - 1
        val a = 0x5DEECE66DL * (i * 2 + 1)
        val b = 0xB504F32DL * (i + 7)
        val v = (a * base + b) % p
        if (v < out(i)) out(i) = v
        i += 1
      }
    }
    out.toSeq
  })

  /** doc_id → (minhash array, band buckets). */
  private def bandBuckets(docs: DataFrame): DataFrame = {
    val mh = shingles(docs)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("g")).as("grams"))
      .select(col("doc_id"), minhashUdf(col("grams")).as("mh"))
    mh.select(col("doc_id"), col("mh"), explode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> struct(b AS band, hash(slice(mh, b * $RowsPerBand + 1, $RowsPerBand)) AS bucket))"))
        .as("bb"))
      .select(col("doc_id"), col("mh"), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs: docs sharing any band bucket (never all-pairs),
    * pre-pruned by the minhash Jaccard estimate at 0.6 — far enough below
    * the 0.8 emission threshold that a true >= 0.8 pair failing it would
    * need a 5+ sigma minhash fluctuation (Binomial(128, 0.8) < 77). */
  def lshCandidates(docs: DataFrame): DataFrame = {
    val b = bandBuckets(docs)
    b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.mh").as("mha"), col("y.mh").as("mhb"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(col("mha")).as("mha"), first(col("mhb")).as("mhb"))
      .where(mhAgreeUdf(col("mha"), col("mhb")) >= (NumHashes * 6) / 10)
      .select(col("doc_a"), col("doc_b"))
  }

  def queries: Seq[Q] = Seq(

    // d06: MinHash-LSH near-duplicate detection, exact-verified at J >= 0.8.
    // Output is pure integers (shingle intersection / union sizes) and the
    // threshold test is integer arithmetic (5*inter >= 4*union) — no float
    // parity risk. The DuckDB oracle computes the same result by exhaustive
    // all-pairs (affordable at test scale; the Spark side stays LSH-pruned).
    Q("d06_minhash_lsh",
      (s, d) => {
        val docs = documents(s, d)
        val sh = shingles(docs).cache()
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val cand = lshCandidates(docs)
        val inter = cand
          .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
          .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.g") === col("sb.g"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("inter_size"))
        inter
          .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
          .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
          .select(col("doc_a"), col("doc_b"), col("inter_size"),
            (col("za.n") + col("zb.n") - col("inter_size")).as("union_size"))
          .where(col("inter_size") * 5 >= col("union_size") * 4)
      },
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, substring(t, i, 3) AS g
             |  FROM (SELECT doc_id, lower(text) AS t FROM documents) dd,
             |       LATERAL (SELECT unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i) u
             |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |inter AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_size
             |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, inter_size,
             |       za.n + zb.n - inter_size AS union_size
             |FROM inter
             |JOIN sizes za ON za.doc_id = doc_a
             |JOIN sizes zb ON zb.doc_id = doc_b
             |WHERE inter_size * 5 >= (za.n + zb.n - inter_size) * 4""".stripMargin)),

    // d07: brute-force cosine top-3 per vector (the exact ANN baseline).
    // Both engines compute the identical double expression
    // dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))) over double-cast vectors and
    // rank by (sim DESC, neighbor ASC); only ids and ranks are emitted.
    Q("d07_cosine_topk",
      (s, d) => {
        // Broadcast-kNN: the candidate set (id, vector, norm) ships to every
        // executor ONCE; each partition scans its queries against the
        // broadcast array with a bounded top-k insert — no 4M-row pair
        // materialization, no shuffle, output is k rows per query. The dot
        // product is a sequential double loop, bit-identical to DuckDB's
        // list_dot_product, and the (sim DESC, neighbor ASC) tiebreak
        // reproduces the oracle's row_number ordering exactly.
        import s.implicits._
        val e = embeddings(s, d)
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
          .as[(Long, Array[Double])]
        def dot(a: Array[Double], b: Array[Double]): Double = {
          var i = 0; var acc = 0.0
          while (i < a.length) { acc += a(i) * b(i); i += 1 }
          acc
        }
        val cands = e.collect().map { case (id, v) => (id, v, math.sqrt(dot(v, v))) }
        val bc = s.sparkContext.broadcast(cands)
        val k = 3
        e.mapPartitions { it =>
          val cs = bc.value
          it.flatMap { case (qid, qv) =>
            val qn = math.sqrt(dot(qv, qv))
            // bounded insertion sort under (sim DESC, id ASC)
            val topSim = new Array[Double](k)
            val topId = new Array[Long](k)
            var filled = 0
            cs.foreach { case (cid, cv, cn) =>
              if (cid != qid) {
                val sim = dot(qv, cv) / (qn * cn)
                var pos = filled
                while (pos > 0 && (sim > topSim(pos - 1) ||
                    (sim == topSim(pos - 1) && cid < topId(pos - 1)))) pos -= 1
                if (pos < k) {
                  val upto = math.min(filled, k - 1)
                  var j = upto
                  while (j > pos) { topSim(j) = topSim(j - 1); topId(j) = topId(j - 1); j -= 1 }
                  topSim(pos) = sim; topId(pos) = cid
                  if (filled < k) filled += 1
                }
              }
            }
            (0 until filled).iterator.map(r => (qid, (r + 1).toLong, topId(r)))
          }
        }.toDF("vec_id", "rank", "neighbor_id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sim AS (
             |  SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
             |         list_dot_product(q.v, c.v)
             |           / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
             |  FROM e q JOIN e c ON q.vec_id <> c.vec_id)
             |SELECT vec_id, rank, neighbor_id FROM (
             |  SELECT vec_id, neighbor_id,
             |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank
             |  FROM sim)
             |WHERE rank <= 3""".stripMargin)),

    // d08: LSH-bucketed approximate nearest neighbor — the sub-quadratic
    // scale path. 64 seeded random-hyperplane bits split into 8 tables of
    // 8-bit signatures; candidates are bucket-mates only, each query
    // reports its best candidate (sim DESC, id ASC). Deterministic given
    // the seeded hyperplanes but engine-specific → rows-only check; the
    // quality bound vs the exact d07 baseline is asserted in
    // SimilaritySpec.
    Q("d08_ann_lsh",
      (s, d) => {
        val e = embeddings(s, d)
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
        // bit b of the signature = sign of dot(v, r_b); r_b components are
        // +-1 from a seeded hash of (b, dim) — no broadcast needed.
        val sig = e.select(col("vec_id"), col("v"), expr(
          """transform(sequence(0, 7), t -> aggregate(sequence(0, 7), 0L, (acc, j) ->
            |  acc * 2 + if(aggregate(sequence(0, size(v) - 1), cast(0 AS double),
            |    (s2, i) -> s2 + element_at(v, i + 1) * if(pmod(hash((t * 8 + j) * 131 + i), 2) = 0, 1.0D, -1.0D)) >= 0D, 1L, 0L)))"""
            .stripMargin.replaceAll("\n", " ")).as("sigs"))
        val buckets = sig.select(col("vec_id"), col("v"),
            posexplode(col("sigs")).as(Seq("t", "sig")))
        val cand = buckets.as("x").join(buckets.as("y"),
            col("x.t") === col("y.t") && col("x.sig") === col("y.sig") &&
              col("x.vec_id") =!= col("y.vec_id"))
          .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("neighbor_id"),
            (dotUdf(col("x.v"), col("y.v")) /
              (sqrt(dotUdf(col("x.v"), col("x.v"))) * sqrt(dotUdf(col("y.v"), col("y.v"))))).as("sim"))
          .groupBy(col("vec_id"), col("neighbor_id"))
          .agg(first(col("sim")).as("sim"))
        cand.withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
            .orderBy(col("sim").desc, col("neighbor_id"))))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
      },
      None)
  )
}
