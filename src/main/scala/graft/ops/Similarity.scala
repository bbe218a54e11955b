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

  /** 3-char shingles of lower(text), distinct per doc — pure Catalyst,
    * no UDF. The shingle array is built and deduped per document BEFORE
    * the explode, so the full text never rides an exploded row and no
    * shuffle is needed for dedup (the key is (doc, gram); per-doc
    * uniqueness IS global uniqueness). */
  private def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lower(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, greatest(length(t) - 2, 0)), i -> substring(t, i, 3)))")).as("g"))

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

  /** 8 tables × 8-bit random-hyperplane signatures; hyperplane components
    * are ±1 from a fixed-seed hash of (bit, dim) — deterministic across
    * runs and executors, no broadcast needed. */
  private val annSigUdf = udf((v: Seq[Double]) => {
    val dim = v.length
    val sigs = new Array[Long](8)
    var t = 0
    while (t < 8) {
      var sig = 0L
      var j = 0
      while (j < 8) {
        val bit = t * 8 + j
        var acc = 0.0
        var i = 0
        while (i < dim) {
          // xorshift-mixed (bit, dim) → ±1, fixed seed
          var h = (bit * 131 + i) * -0x61c88647
          h ^= h >>> 16
          acc += v(i) * (if ((h & 1) == 0) 1.0 else -1.0)
          i += 1
        }
        sig = sig * 2 + (if (acc >= 0.0) 1L else 0L)
        j += 1
      }
      sigs(t) = sig
      t += 1
    }
    sigs.toSeq
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
  // (bandBuckets keeps mh alongside the buckets; lshCandidates projects it
  // away before the bucket self-join so the wide column stays out of the
  // shuffle.)

  /** Candidate pairs: docs sharing any band bucket (never all-pairs),
    * pre-pruned by the minhash Jaccard estimate at 0.6 — far enough below
    * the 0.8 emission threshold that a true >= 0.8 pair failing it would
    * need a 5+ sigma minhash fluctuation (Binomial(128, 0.8) < 77). */
  def lshCandidates(docs: DataFrame): DataFrame = {
    val b = bandBuckets(docs).cache()
    // join bucket collisions on ids ONLY (the 128-long minhash array never
    // rides the wide shuffle), then fetch the two arrays per distinct pair
    // from the small per-doc sketch table via broadcast.
    val mh = b.select(col("doc_id"), col("mh")).distinct()
    val pairs = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(broadcast(mh.as("ma")), col("doc_a") === col("ma.doc_id"))
      .join(broadcast(mh.as("mb")), col("doc_b") === col("mb.doc_id"))
      .where(mhAgreeUdf(col("ma.mh"), col("mb.mh")) >= (NumHashes * 6) / 10)
      .select(col("doc_a"), col("doc_b"))
  }

  /** LSH-candidate pairs exact-verified at Jaccard >= 0.8 — shared by
    * d06 (which emits them) and d14 (which clusters them). Memoized per
    * (session, dir) and cached so the second consumer reuses the
    * materialized pair set instead of re-paying the sketch pipeline. */
  private val pairCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def nearDupPairs(s: SparkSession, d: String): DataFrame =
    pairCache.computeIfAbsent((s, d), _ => computeNearDupPairs(s, d).cache())

  private def computeNearDupPairs(s: SparkSession, d: String): DataFrame = {
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
  }

  def queries: Seq[Q] = Seq(

    // d06: MinHash-LSH near-duplicate detection, exact-verified at J >= 0.8.
    // Output is pure integers (shingle intersection / union sizes) and the
    // threshold test is integer arithmetic (5*inter >= 4*union) — no float
    // parity risk. The DuckDB oracle computes the same result by exhaustive
    // all-pairs (affordable at test scale; the Spark side stays LSH-pruned).
    Q("d06_minhash_lsh",
      (s, d) => nearDupPairs(s, d),
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
    // scale path. 64 seeded random-hyperplane bits (compiled UDF) split
    // into 8 tables of 8-bit signatures; the bucket self-join carries ids
    // only, vectors are re-attached per candidate pair from the small
    // broadcast table, and each query reports its best candidate
    // (sim DESC, id ASC). Deterministic (fixed seed) but engine-specific
    // → rows-only check; quality vs the exact d07 baseline is asserted in
    // SimilaritySpec.
    Q("d08_ann_lsh",
      (s, d) => {
        val e = embeddings(s, d)
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
        val sig = e.select(col("vec_id"), annSigUdf(col("v")).as("sigs"))
        val buckets = sig.select(col("vec_id"), posexplode(col("sigs")).as(Seq("t", "sig")))
        val pairs = buckets.as("x").join(buckets.as("y"),
            col("x.t") === col("y.t") && col("x.sig") === col("y.sig") &&
              col("x.vec_id") =!= col("y.vec_id"))
          .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("neighbor_id"))
          .distinct()
        val sim = pairs.as("p")
          .join(broadcast(e.as("q")), col("p.vec_id") === col("q.vec_id"))
          .join(broadcast(e.as("c")), col("p.neighbor_id") === col("c.vec_id"))
          .select(col("p.vec_id").as("vec_id"), col("p.neighbor_id").as("neighbor_id"),
            (dotUdf(col("q.v"), col("c.v")) /
              (sqrt(dotUdf(col("q.v"), col("q.v"))) * sqrt(dotUdf(col("c.v"), col("c.v"))))).as("sim"))
        sim.withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
            .orderBy(col("sim").desc, col("neighbor_id"))))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
      },
      None),

    // d14: near-duplicate CLUSTERING — connected components over the d06
    // pair graph via iterative min-label propagation (the driver loop runs
    // O(component-diameter) rounds, each one shuffle of edges ⋈ labels —
    // the standard Spark CC shape; large-star/small-star would cut rounds
    // for giant components). Output: every clustered doc with its
    // component id (= min doc_id in the component) and component size.
    // DuckDB oracle computes the same closure with a recursive CTE.
    Q("d14_dedup_components",
      (s, d) => {
        val pairs = nearDupPairs(s, d).select(col("doc_a"), col("doc_b")).cache()
        val edges = pairs
          .unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
          .cache()
        var labels = edges.select(col("doc_a").as("v")).distinct()
          .withColumn("lbl", col("v")).cache()
        var converged = false
        var iter = 0
        while (!converged && iter < 50) {
          val prop = edges.as("e").join(labels.as("l"), col("e.doc_a") === col("l.v"))
            .select(col("e.doc_b").as("v"), col("l.lbl"))
            .unionAll(labels)
            .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))
            .cache()
          val changed = prop.as("n").join(labels.as("o"), col("n.v") === col("o.v"))
            .where(col("n.lbl") =!= col("o.lbl")).count()
          labels.unpersist()
          labels = prop
          converged = changed == 0L
          iter += 1
        }
        val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
        labels.join(broadcast(sizes), "lbl")
          .select(col("v").as("doc_id"), col("lbl").as("cluster_id"), col("cluster_size"))
      },
      // The heavy pair computation is hoisted into MATERIALIZED CTEs so
      // DuckDB evaluates it once instead of per recursion step.
      Some("""WITH RECURSIVE np AS MATERIALIZED (
             |  WITH sh AS (
             |    SELECT DISTINCT doc_id, substring(t, i, 3) AS g
             |    FROM (SELECT doc_id, lower(text) AS t FROM documents) dd,
             |         LATERAL (SELECT unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i) u
             |  ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |  inter AS (
             |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_size
             |    FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
             |    GROUP BY 1, 2)
             |  SELECT doc_a, doc_b FROM inter
             |  JOIN sizes za ON za.doc_id = doc_a
             |  JOIN sizes zb ON zb.doc_id = doc_b
             |  WHERE inter_size * 5 >= (za.n + zb.n - inter_size) * 4
             |),
             |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM np UNION ALL SELECT doc_b, doc_a FROM np),
             |nodes AS (SELECT DISTINCT a AS v FROM edges),
             |reach AS (
             |  SELECT v, v AS l FROM nodes
             |  UNION
             |  SELECT r.v, e.b AS l FROM reach r JOIN edges e ON e.a = r.l
             |),
             |lab AS (SELECT v, min(l) AS cluster_id FROM reach GROUP BY v),
             |csz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
             |SELECT v AS doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size
             |FROM lab JOIN csz USING (cluster_id)""".stripMargin)),

    // d17: IVF approximate neighbor search — the second ANN index family
    // (k-means coarse quantizer). Centroids: deterministic init (16 lowest
    // vec_ids) + 3 Lloyd iterations, each one assign-shuffle + tiny
    // centroid aggregation; search probes the query's 2 nearest cells
    // only (sub-quadratic: candidates ~ 2/16 of the corpus per query).
    // Rows-only check (float summation order makes borderline cell
    // assignments engine-specific); quality vs the exact d07 baseline is
    // asserted in SimilaritySpec.
    Q("d17_ivf_ann",
      (s, d) => {
        import s.implicits._
        val K = 16
        val e = embeddings(s, d)
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
          .as[(Long, Array[Double])]
          .cache()
        def dist2(a: Array[Double], b: Array[Double]): Double = {
          var i = 0; var acc = 0.0
          while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
          acc
        }
        def nearest(cents: Array[Array[Double]], v: Array[Double], skip: Int = -1): Int = {
          var best = -1; var bestD = Double.MaxValue; var c = 0
          while (c < cents.length) {
            if (c != skip) { val dd = dist2(cents(c), v); if (dd < bestD) { bestD = dd; best = c } }
            c += 1
          }
          best
        }
        // deterministic init + Lloyd refinement
        var centroids = e.orderBy(col("vec_id")).limit(K).collect().map(_._2)
        for (_ <- 1 to 3) {
          val bc = s.sparkContext.broadcast(centroids)
          val sums = e.map { case (_, v) => (nearest(bc.value, v), (v, 1L)) }
            .groupByKey(_._1)
            .mapValues(_._2)
            .reduceGroups((a, b) => (a._1.zip(b._1).map(t => t._1 + t._2), a._2 + b._2))
            .collect()
          val next = centroids.clone()
          sums.foreach { case (c, (sum, n)) => next(c) = sum.map(_ / n) }
          centroids = next
        }
        val bc = s.sparkContext.broadcast(centroids)
        val cells = e.map { case (id, v) => (id, nearest(bc.value, v)) }
          .toDF("vec_id", "cell")
        // probe the 2 nearest cells per query
        val probes = e.map { case (id, v) =>
          val c1 = nearest(bc.value, v)
          (id, Seq(c1, nearest(bc.value, v, skip = c1)))
        }.toDF("q_id", "probe_cells")
          .select(col("q_id"), explode(col("probe_cells")).as("cell"))
        val eDf = e.toDF("vec_id", "v")
        val cand = probes.join(cells.as("m"), "cell")
          .where(col("q_id") =!= col("m.vec_id"))
          .select(col("q_id"), col("m.vec_id").as("neighbor_id"))
          .distinct()
        val sim = cand
          .join(broadcast(eDf.as("qv")), col("q_id") === col("qv.vec_id"))
          .join(broadcast(eDf.as("cv")), col("neighbor_id") === col("cv.vec_id"))
          .select(col("q_id").as("vec_id"), col("neighbor_id"),
            (dotUdf(col("qv.v"), col("cv.v")) /
              (sqrt(dotUdf(col("qv.v"), col("qv.v"))) * sqrt(dotUdf(col("cv.v"), col("cv.v"))))).as("sim"))
        sim.withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
            .orderBy(col("sim").desc, col("neighbor_id"))))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
      },
      None)
  )
}
