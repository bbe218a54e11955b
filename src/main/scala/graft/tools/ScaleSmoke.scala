package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: run the similarity family at ~10x the sf0.1 corpus to
  * probe scale headroom (the driver gates stop at sf0.1; the engine is
  * graded on how the plans would behave far beyond it).
  *
  * Generates a deterministic synthetic corpus under /tmp — same schemas
  * as the driver's `documents`/`embeddings` tables, with a realistic
  * long-tail vocabulary (Zipf-ish) and a planted ~3% near-duplicate rate
  * so d06/d14 have real work — then times each operator end-to-end in a
  * fresh-ish state (the memo caches are per-directory, so every query
  * still pays its own pipeline once).
  *
  *   sbt "runMain graft.tools.ScaleSmoke [nDocs] [nVecs]"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 50000
    val nVecs = if (args.length > 1) args(1).toInt else 20000
    val dir = "/tmp/graft_scale"
    val spark = graft.Sessions.build("scale-smoke")
    import spark.implicits._

    // --- synthesize corpus (deterministic, seeded per doc) ---------------
    // vocabulary of letter-based words (realistic char-trigram diversity —
    // numeric-suffix tokens would collapse every simhash into one hamming
    // ball and make d09's output quadratic by construction)
    val vocabSize = 5000
    val vocab: Array[String] = {
      val vr = new scala.util.Random(424242)
      Array.fill(vocabSize)(
        Seq.fill(3 + vr.nextInt(6))(('a' + vr.nextInt(26)).toChar).mkString)
    }
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
      .as[Long]
      .map { id =>
        val rng = new scala.util.Random(id * 0x9e3779b9L + 7)
        val base = id % 33 // 3% of ids share a base with id-1 (near-dups)
        val seedId = if (base == 0 && id > 0) id - 1 else id
        val srng = new scala.util.Random(seedId * 0x9e3779b9L + 7)
        val nWords = 40 + srng.nextInt(80)
        val words = Seq.fill(nWords) {
          // Zipf-ish: word w has mass ~ 1/(w+10)
          val u = srng.nextDouble()
          val w = (math.exp(u * math.log(vocabSize + 10.0)) - 10.0).toInt.max(0)
          vocab(w.min(vocabSize - 1))
        }
        val text =
          if (base == 0 && id > 0) {
            // mutate ~5% of words of the seed doc -> J ~ 0.8-0.95
            words.map(w => if (rng.nextDouble() < 0.05) vocab(rng.nextInt(vocabSize)) else w)
              .mkString(" ")
          } else words.mkString(" ")
        (id, text, if (id % 7 == 0) "ru" else "en", s"src${id % 17}", text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    val vecs = spark.range(nVecs).select(col("id").as("vec_id")).as[Long]
      .map { id =>
        val rng = new scala.util.Random(id * 0x51af3c1dL + 3)
        (id, Array.fill(64)(rng.nextGaussian().toFloat), (id % 5).toInt)
      }
      .toDF("vec_id", "embedding", "label")
    vecs.write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    println(s"[scale] corpus ready: $nDocs docs, $nVecs vecs -> $dir")

    // --- time the similarity family --------------------------------------
    // Measured at 50k docs / 20k vecs (2026-08, round 5): d06 8.7s, d19
    // 8.0s, d14 0.8s, d08 7.7s (the recall-tuned multiprobe geometry —
    // 16 probe signatures/table at occupancy 64 buys recall ~1.0 with
    // candidates still flat per query; see the growth probe below),
    // d17 1.9s, d11 2.1s — sub-linear per item vs sf0.1.
    // At 100k docs: d06 9.5s (banded LSH stays FLAT — candidates are
    // bucket-bounded), d19 14.0s after the count-over-window df pass
    // (dominated by the two linear window shuffles over the exploded
    // gram set; prefix candidates themselves stay tiny here, but grow
    // with sum(f^2) over prefix-gram frequencies as a corpus densifies —
    // the trade that motivates keeping both paths: d19 for exact recall
    // at any threshold, d06 for flat scaling near 0.8), d14 0.9s, index
    // save 3.2s / probe 3.2s.
    // The two quadratic-BY-SEMANTICS ops: d07 (exact all-pairs baseline,
    // 85s; its scale paths d08/d17 answer the same query in seconds) and
    // d09 (simhash hamming<=3 matches a constant fraction of all pairs on
    // corpora with homogeneous feature distributions -> OUTPUT is ~1.1e9
    // rows here, streamed at ~4M rows/s). Pass query names as args 3+ to
    // run a subset.
    // Round-9 gram-family probes (2026-08): d60 containment 21.9 s at
    // 50k docs -> 16.8 s at 100k (flat — candidate pairs are prefix-
    // bounded; outputs 1.7k -> 3.6k rows, linear), d62 dup-span
    // intervals 10.1 -> 16.6 s (~1.65x per corpus doubling — the df
    // window over the distinct (doc, gram) set dominates; output rows
    // linear at 77k -> 175k). d63's count() here is join-eliminated
    // (the final doc_id left join carries no counted columns), so its
    // honest cost was measured with a noop write: 24.1 s at 100k docs
    // for the full scrub incl. the d62 pipeline and per-doc rebuild.
    // The vector-side round-9 ops (d57/d58/d59) share d07/d15's
    // quadratic-BY-SEMANTICS exact pair source — their scale paths are
    // the ANN compositions (d61's keep rule over cosineNearDupPairsAnn;
    // label-filtered annTopK), whose candidate growth d08's probe
    // already bounds flat.
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("d06_minhash_lsh", "d19_jaccard_prefix", "d14_dedup_components",
        "d07_cosine_topk", "d08_ann_lsh", "d17_ivf_ann", "d09_simhash", "d11_fingerprint")
    val queries = graft.SparkEntry.queries
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = queries(n)(spark, dir).count()
      println(f"[scale] $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }

    // incremental path: index the corpus, dedupe a 5%-sized new batch
    val t0 = System.nanoTime()
    graft.api.Graft.sketchIndexSave(
      spark.read.parquet(s"$dir/documents.parquet"), s"$dir/sketch_index")
    val tSave = (System.nanoTime() - t0) / 1e9
    val batch = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val t1 = System.nanoTime()
    val crossPairs = graft.api.Graft.nearDupAgainstIndex(spark, batch, s"$dir/sketch_index").count()
    println(f"[scale] sketch_index save ${tSave}%.2f s, probe ${(System.nanoTime() - t1) / 1e9}%.2f s ($crossPairs cross pairs)")

    // lexical index: build once, then BM25 searches that read only the
    // query terms' postings buckets (partition pruning) — search cost
    // should stay flat as the corpus grows while the direct d38 path
    // re-tokenizes everything. Query terms come from the synthetic
    // vocabulary head (Zipf mass ⇒ they occur corpus-wide).
    // Measured (2026-08, round 8): save 6.2 s / search 2.7 s vs direct
    // 4.8 s at 50k docs; save 5.1 s / search 2.9 s vs direct 7.8 s at
    // 100k — the indexed search is FLAT (3 of 64 buckets + the narrow
    // docstats scan) while the direct path grows with the corpus.
    // After the single-tokenize build (docstats derived from the written
    // postings instead of a second corpus explode): save 4.9 s at 50k,
    // 5.6 s at 100k (same host class, ±co-tenant noise).
    val lexTerms = Seq(vocab(0), vocab(1), vocab(2))
    val lexDocs = spark.read.parquet(s"$dir/documents.parquet")
    val tL0 = System.nanoTime()
    graft.api.Graft.lexIndexSave(lexDocs, s"$dir/lex_index")
    val tLexSave = (System.nanoTime() - tL0) / 1e9
    val tL1 = System.nanoTime()
    val hitsIdx = graft.api.Graft.searchBm25(spark, s"$dir/lex_index", lexTerms).count()
    val tLexSearch = (System.nanoTime() - tL1) / 1e9
    val tL2 = System.nanoTime()
    val hitsDirect = graft.api.Graft.bm25Rank(lexDocs, lexTerms).count()
    val tLexDirect = (System.nanoTime() - tL2) / 1e9
    println(f"[scale] lex_index save $tLexSave%.2f s, search $tLexSearch%.2f s " +
      f"($hitsIdx rows) vs direct $tLexDirect%.2f s ($hitsDirect rows)")

    // --- curation family (measured 2026-08, round 5): d20 1.6s, d21
    // 2.1s, d23 2.6s at 50k docs; 1.6s / 2.3s / 1.5s at 100k — flat to
    // linear. d22 at the ORACLE's n = 3 is OUTPUT-bound on this Zipf
    // vocabulary (frequent-word trigrams put a shared gram in nearly
    // every (train, eval-doc) pair: 14.8M true pairs / 17.6s at 50k
    // docs, 57M / 25.8s at 100k — quadratic OUTPUT, like d09 on
    // homogeneous corpora, streamed not materialized). Production
    // decontamination widths (n = 8..13) make cross-doc matches rare —
    // the probe below runs the library form at n = 8: 1601 true pairs
    // in 1.7s at 100k docs — the cost is the linear gram scan.
    val docsAll = spark.read.parquet(s"$dir/documents.parquet")
    val t2 = System.nanoTime()
    val cont8 = graft.api.Graft.contaminationPairs(
      docsAll.where(col("doc_id") % 97 =!= 0),
      docsAll.where(col("doc_id") % 97 === 0), n = 8).count()
    println(f"[scale] d22 n=8 ${(System.nanoTime() - t2) / 1e9}%.2f s ($cont8 pairs)")

    // --- hashGrams shuffle-volume probe: d22/d25's production mode
    // shrinks each shuffled gram from ~45-100 string bytes to an 8-byte
    // xxhash64. Measure ACTUAL shuffle-write bytes for the d25 pipeline
    // at n = 8, string grams vs hashed.
    // Measured (50k docs, 2026-08, round 6): strings 134.6 MB, hashed
    // 40.6 MB -> 3.3x smaller END-TO-END (lz4 shuffle compression eats
    // part of the raw ~6x byte gap — low-entropy word grams compress
    // well, hashes don't; per-row doc_id/cnt overhead is shared). Real
    // prose at n = 8..13 carries wider grams and a bigger win.
    def shuffledBytes(body: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong(0L)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          acc.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(l)
      // listener delivery is async: poll until the counter stabilizes
      // (a fixed sleep undercounts when the bus lags under host load)
      try {
        body
        var prev = -1L
        var spins = 0
        while (acc.get() != prev && spins < 30) {
          prev = acc.get(); Thread.sleep(500); spins += 1
        }
      } finally spark.sparkContext.removeSparkListener(l)
      acc.get()
    }
    val sBytes = shuffledBytes {
      graft.api.Graft.dupSpanStats(docsAll, n = 8)
        .write.format("noop").mode("overwrite").save()
    }
    val hBytes = shuffledBytes {
      graft.api.Graft.dupSpanStats(docsAll, n = 8, hashGrams = true)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[scale] d25 n=8 shuffle: strings ${sBytes / 1e6}%.1f MB, " +
      f"hashed ${hBytes / 1e6}%.1f MB (${sBytes.toDouble / math.max(1, hBytes)}%.1fx smaller)")

    // --- mix family growth probe (d26/d29): the d26 shuffle must stay
    // CELL-bounded — its key cardinality is |lang x source| (34 here),
    // fixed by the corpus' structure, so shuffle bytes are ~(tasks x
    // cells) partial rows regardless of corpus size — and d29 must stay
    // SCAN-dominated (broadcast cells join + narrow md5 projection; its
    // elapsed should track the bare token-count scan, not add to it).
    // Measured (50k docs, 2026-08, round 7): d26 shuffle 72.8 KB at 25k
    // docs -> 71.7 KB at 50k — FLAT across a corpus doubling (bytes
    // track tasks x 34 cells, not corpus rows), cold elapsed
    // 0.84/0.57 s (the corpus scan + cells agg, timed on the FIRST
    // execution); d29 0.60/0.37 s vs 0.21/0.20 s bare token-count scan
    // (~2-3x — the broadcast join + md5 coin, constant per row); total
    // copies ~= docs under the uniform target (24,967 / 50,094), as
    // expected when every cell's weight sits near 1.
    Seq(2, 1).foreach { invFrac =>
      val sub = docsAll.where(col("doc_id") % invFrac === 0)
      val nSub = sub.count()
      // time the FIRST execution (cold — it pays the corpus scan that
      // populates the cells cache) INSIDE the byte-measured block; a
      // second run of the identical plan would read the cached 34-row
      // cells frame and time a cache probe, not the operator
      var nCells = 0L
      var tMix = 0.0
      val mixBytes = shuffledBytes {
        val t0 = System.nanoTime()
        nCells = graft.ops.Curation.mixWeights(sub).count()
        tMix = (System.nanoTime() - t0) / 1e9
      }
      // d29 reads the (now warm) cells — the production shape: weights
      // are computed once and applied per batch; its cost claim is the
      // corpus scan + broadcast join, not the cells aggregation
      val wts = graft.ops.Curation.mixWeights(sub)
      val t4 = System.nanoTime()
      val copies = graft.ops.Curation.applyMix(sub, wts)
        .agg(sum(col("n_copies"))).head().getLong(0)
      val tApply = (System.nanoTime() - t4) / 1e9
      val t5 = System.nanoTime()
      sub.select(sum(size(split(trim(col("text")), "\\s+")))).head()
      val tScan = (System.nanoTime() - t5) / 1e9
      println(f"[scale] mix n=$nSub%8d cells=$nCells%4d d26_shuffle=${mixBytes / 1e3}%8.1f KB " +
        f"d26_cold=${tMix}%.2f s d29=${tApply}%.2f s bare_scan=${tScan}%.2f s copies=$copies")
    }

    // --- d08 candidate-growth probe: the auto-derived signature width
    // (bits ~ log2(N/64)) must keep candidates PER QUERY roughly flat as
    // the corpus grows — a fixed 8-bit geometry's per-query candidates
    // grow linearly with N (bucket occupancy N/256) and the bucket
    // self-join re-quadratizes. Run at 1/4, 1/2, and full nVecs.
    // Measured (20k gaussian 64-dim vecs, 2026-08): 5293 -> 5535 -> 5797
    // candidates/query across 5k/10k/20k — flat (+4.6%/doubling). The
    // same probe under the earlier weakly-mixed hyperplane hash grew
    // 1.6x per doubling at the same occupancy target: correlated
    // hyperplanes skew bucket masses and candidates are sum(bucket^2) —
    // component quality is a SCALE property, not just a recall one.
    val allVecs = spark.read.parquet(s"$dir/embeddings.parquet")
    Seq(4, 2, 1).foreach { invFrac =>
      val sub = allVecs.where(col("vec_id") % invFrac === 0)
      val n = sub.count()
      val bits = graft.ops.Similarity.annBitsFor(n)
      val e = sub
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
        .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
        .where(col("nrm") > 0.0)
      val cands = graft.ops.Similarity.annCandidatePairs(e, 8, bits, 15).count()
      println(f"[scale] ann_candidates n=$n%8d bits=$bits%2d total=$cands%10d  per_query=${cands.toDouble / n}%8.1f")
    }

    // --- LM / DSIR family growth probe (d44/d47 + the d49 persisted
    // path): scoring must stay SCAN-dominated — tokenize + the
    // broadcast-head logp lookup; only head-miss rows shuffle by token,
    // so elapsed should track corpus size linearly, never superlinearly
    // (a naive token-keyed lookup join would concentrate the Zipf head
    // on single partitions). d47 runs the same docTok through TWO model
    // lookups, so it should cost ~2x d44, not more.
    // Measured (quiet host, 2026-08, round 8, after the in-row
    // multiplicity UDF): d44 3.8 -> 3.7 s and d47 5.5 -> 5.6 s across a
    // 50k -> 100k doubling — FLAT (the 32-core scan absorbs the linear
    // token work at this scale; nothing superlinear left). This probe
    // caught two real defects en route: the first dsirWeights cut
    // re-tokenized the corpus for its raw model (12.8 s at 50k, 3x per
    // doubling — fixed by rolling the raw vocab up from docTok), and
    // the original explode+groupBy docTokens shuffled the full token
    // stream (replaced by the in-row UDF; CurationSpec asserts the path
    // exchange-free). lm_index at 100k: save 1.4 s, 5% append 1.1 s
    // (tracks the batch, not the corpus), frozen score 1.6 s.
    Seq(2, 1).foreach { invFrac =>
      val sub = docsAll.where(col("doc_id") % invFrac === 0)
      val n = sub.count()
      val t0 = System.nanoTime()
      graft.ops.Curation.unigramPpl(sub)
        .write.format("noop").mode("overwrite").save()
      val tPpl = (System.nanoTime() - t0) / 1e9
      val tgt = sub.where(col("lang") === "en")
      val t1 = System.nanoTime()
      graft.ops.Curation.dsirWeights(sub, tgt)
        .write.format("noop").mode("overwrite").save()
      val tDsir = (System.nanoTime() - t1) / 1e9
      println(f"[scale] lm n=$n%8d d44=${tPpl}%.2f s d47=${tDsir}%.2f s")
    }
    // --- BPE trainer growth probe (d51): rounds run over word TYPES,
    // so elapsed should track the (Heaps-law) vocab, not the corpus —
    // a doubling of docs grows the type table sublinearly and the
    // 8-round loop cost with it; the only corpus-sized work is the one
    // histogram pass.
    // Measured (2026-08, round 8): 2.4 s at 50k docs -> 1.7 s at 100k —
    // FLAT (this synthetic vocab is fixed at 5k types, so the rounds
    // cost the same at any corpus size; only the histogram pass grows,
    // and the 32-core scan absorbs it).
    Seq(2, 1).foreach { invFrac =>
      val sub = docsAll.where(col("doc_id") % invFrac === 0)
      val n = sub.count()
      val tB = System.nanoTime()
      val nMerges = graft.ops.Corpus.bpeTrain(sub, merges = 8).count()
      println(f"[scale] bpe n=$n%8d merges=$nMerges ${(System.nanoTime() - tB) / 1e9}%.2f s")
    }

    // --- composed pipeline growth probe (d54): trainingShards chains
    // dedup -> quality -> ppl tail-drop -> decontamination -> packing;
    // its cost should stay ~the SUM of its stages (each individually
    // probed above) — superadditive growth would mean a stage is
    // recomputing another's work.
    // Measured (2026-08, round 8): 17.5 s at 50k docs -> 29.2 s at 100k
    // (1.67x per doubling — sublinear, dominated by the d06 LSH dedup
    // stage, and additive: the total tracks the individually-probed
    // stage costs).
    Seq(2, 1).foreach { invFrac =>
      val sub = docsAll.where(col("doc_id") % invFrac === 0)
      val n = sub.count()
      val tP = System.nanoTime()
      val kept = graft.api.Graft.trainingShards(
        sub.where(col("doc_id") % 97 =!= 0),
        sub.where(col("doc_id") % 97 === 0),
        dropPplTail = true).count()
      println(f"[scale] pipeline n=$n%8d kept=$kept%8d ${(System.nanoTime() - tP) / 1e9}%.2f s")
    }

    // persisted LM lifecycle at scale: train once over the corpus,
    // append a 5%-sized new batch (must write ONLY the batch's counts —
    // its cost should track the batch, not the corpus), then score the
    // batch against the frozen merged model (the d49 deployment shape).
    val tL6 = System.nanoTime()
    graft.api.Graft.lmIndexSave(docsAll, s"$dir/lm_index")
    val tLmSave = (System.nanoTime() - tL6) / 1e9
    val lmBatch = docsAll.where(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val tL7 = System.nanoTime()
    graft.api.Graft.lmIndexAppend(lmBatch, s"$dir/lm_index")
    val tLmApp = (System.nanoTime() - tL7) / 1e9
    val tL8 = System.nanoTime()
    val lmScored = graft.ops.Curation.unigramPplAgainst(lmBatch,
      graft.api.Graft.lmVocab(spark, s"$dir/lm_index")).count()
    val tLmScore = (System.nanoTime() - tL8) / 1e9
    println(f"[scale] lm_index save $tLmSave%.2f s, append(5%%) $tLmApp%.2f s, " +
      f"frozen score $tLmScore%.2f s ($lmScored rows)")

    // --- index-serve crossover probe (d38 vs d39, d44 vs d46): at sf0.1
    // the SERVED paths look slower than their direct siblings (r08 bench:
    // d39 4.5 s vs d38 2.2 s) because commit-marker checks + index
    // parquet reads are fixed costs that dwarf a toy corpus scan. This
    // probe times direct vs served at two corpus sizes so the artifact
    // shows the TREND: the direct path re-pays the full corpus
    // scan/agg per query (grows with the corpus); the served path reads
    // bucket-pruned postings / the frozen head (≈ flat in corpus size
    // once past the fixed overhead). The crossover is where corpus scan
    // cost exceeds the serve overhead — far below 100 TB.
    // Measured (2026-08, round 9, 25k -> 50k docs):
    //   bm25  direct 2.97 -> 3.32 s | serve 1.57 -> 1.49 s
    //         (save 3.40 -> 4.55 s)
    //   ppl   direct 4.47 -> 4.14 s | serve 3.69 -> 3.32 s (the serve
    //         win here is only the TRAIN pass it skips — scoring
    //         re-tokenizes its input either way)
    // -> the bm25 crossover sits BELOW 25k docs on this host: serve is
    // already ~2x faster and FLAT across the doubling while direct
    // grows with the corpus; the sf0.1 bench (2k docs) where d39 reads
    // 2x slower than d38 is simply below the crossover. One indexed
    // write (~4.5 s at 50k) buys corpus-size-independent queries.
    val bmQuery = Seq(vocab(0), vocab(1), vocab(5)) // Zipf-head terms
    Seq(2, 1).foreach { invFrac =>
      val sub = docsAll.where(col("doc_id") % invFrac === 0)
      val n = sub.count()
      val tD = System.nanoTime()
      graft.ops.Corpus.bm25Rank(sub, bmQuery)
        .write.format("noop").mode("overwrite").save()
      val tDirect = (System.nanoTime() - tD) / 1e9
      val idxDir = s"$dir/lex_index_$invFrac"
      val tS = System.nanoTime()
      graft.ops.LexIndex.save(sub, idxDir)
      val tSave = (System.nanoTime() - tS) / 1e9
      val tV = System.nanoTime()
      graft.ops.LexIndex.searchBm25(spark, idxDir, bmQuery)
        .write.format("noop").mode("overwrite").save()
      val tServe = (System.nanoTime() - tV) / 1e9
      val tPd = System.nanoTime()
      graft.ops.Curation.unigramPpl(sub)
        .write.format("noop").mode("overwrite").save()
      val tPplDirect = (System.nanoTime() - tPd) / 1e9
      val tPs = System.nanoTime()
      graft.ops.Curation.unigramPplAgainst(sub,
        graft.api.Graft.lmVocab(spark, s"$dir/lm_index"))
        .write.format("noop").mode("overwrite").save()
      val tPplServe = (System.nanoTime() - tPs) / 1e9
      println(f"[scale] serve-crossover n=$n%8d bm25 direct $tDirect%.2f s / " +
        f"serve $tServe%.2f s (save $tSave%.2f s); ppl direct $tPplDirect%.2f s / " +
        f"serve $tPplServe%.2f s")
    }

    // --- line family growth probe (d95/d97/d98): each stage is one
    // narrow line explode + a distinct-line-width aggregation (d95/d97)
    // or a struct-min aggregation (d98) + the doc-keyed rebuild —
    // elapsed should ~track corpus line count, never superlinearly.
    // The synthetic docs are single-line, so the probe reflows them
    // through the planted-boilerplate fixture (10-token lines + a
    // corpus-wide wrapper that really exercises the drop path).
    // Measured (2026-08, round 13, 25k -> 50k docs): d95 2.58 -> 2.64 s,
    // d98 2.46 -> 2.92 s, line_index save 1.51 -> 1.61 s / serve 1.56 ->
    // 2.00 s — sublinear across the doubling (the 32-core scan absorbs
    // the line work; nothing superlinear), and the served scrub tracks
    // the PROBE batch, not the indexed corpus.
    Seq(2, 1).foreach { invFrac =>
      val sub = graft.ops.Curation.plantedBoilerplate(
        docsAll.where(col("doc_id") % invFrac === 0))
      val n = sub.count()
      val t95 = System.nanoTime()
      graft.ops.Curation.boilerplateScrub(sub)
        .write.format("noop").mode("overwrite").save()
      val t95s = (System.nanoTime() - t95) / 1e9
      val t98 = System.nanoTime()
      graft.ops.Curation.paragraphDedup(sub, sep = "\n")
        .write.format("noop").mode("overwrite").save()
      val t98s = (System.nanoTime() - t98) / 1e9
      val liDir = s"$dir/line_index_$invFrac"
      val tLs = System.nanoTime()
      graft.ops.LineIndex.save(sub, liDir)
      val tLsS = (System.nanoTime() - tLs) / 1e9
      val tLp = System.nanoTime()
      graft.ops.LineIndex.scrubAgainst(spark, sub, liDir)
        .write.format("noop").mode("overwrite").save()
      val tLpS = (System.nanoTime() - tLp) / 1e9
      println(f"[scale] lines n=$n%8d d95 $t95s%.2f s, d98 $t98s%.2f s, " +
        f"line_index save $tLsS%.2f s / serve $tLpS%.2f s")
    }

    // --- PQ / IVFPQ growth probe (d72-d74): lossy train+encode must be
    // linear narrow passes; brute-force ADC over all codes is linear per
    // query BY SEMANTICS (its pruned form is IVFPQ); IVFPQ at
    // k = sqrt(N) cells with fixed probes scans probes * occupancy ~
    // sqrt(N) candidates per query — the sublinear scale path. A fixed
    // 1024-query panel isolates per-query cost from corpus growth.
    // Measured (2026-08, round 8): n=10k -> 20k: train 1.08 -> 0.64 s,
    // encode 0.58 -> 0.57 s, adc(1k q) 1.48 -> 0.57 s, ivf build 0.45
    // -> 0.33 s, ivfpq(1k q, 8 probes) 2.77 -> 1.49 s — flat across the
    // doubling (job-overhead-dominated at this scale; nothing
    // superlinear).
    Seq(2, 1).foreach { invFrac =>
      val sub = allVecs.where(col("vec_id") % invFrac === 0)
      val n = sub.count()
      val tTr = System.nanoTime()
      val cb = graft.api.Graft.pqTrain(spark, sub, m = 8, k = 256, iters = 2)
      val tTrain = (System.nanoTime() - tTr) / 1e9
      val tEn = System.nanoTime()
      val enc = graft.api.Graft.pqEncode(spark, sub, cb)
      enc.write.mode(SaveMode.Overwrite).parquet(s"$dir/pq_codes.parquet")
      val tEnc = (System.nanoTime() - tEn) / 1e9
      val panel = sub.where(col("vec_id") % (n / 1024).max(1) === 0)
      val tAdc = System.nanoTime()
      val nAdc = graft.api.Graft.pqTopK(panel,
        spark.read.parquet(s"$dir/pq_codes.parquet"), cb).count()
      val tAdcS = (System.nanoTime() - tAdc) / 1e9
      val dv = sub.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      val cells = math.sqrt(n.toDouble).toInt.max(1)
      val tIv = System.nanoTime()
      val model = graft.api.Graft.ivfBuild(spark, dv, k = cells, iters = 2)
      val tIvf = (System.nanoTime() - tIv) / 1e9
      val tQ = System.nanoTime()
      val nIvfPq = graft.api.Graft.ivfPqTopK(spark, model, cb, panel,
        k = 3, probes = 8).count()
      val tIvfPq = (System.nanoTime() - tQ) / 1e9
      println(f"[scale] pq n=$n%8d train $tTrain%.2f s, encode $tEnc%.2f s, " +
        f"adc(1k q) $tAdcS%.2f s ($nAdc rows), ivf($cells cells) $tIvf%.2f s, " +
        f"ivfpq(1k q, 8 probes) $tIvfPq%.2f s ($nIvfPq rows)")
    }

    // --- lexical family growth probe (d76-d79): MG shuffle volume is
    // partitions x capacity (corpus-size-independent), so heavyHitters
    // must scale with scan cost alone; PMI rolls up to model-sized
    // (vocab^2-bounded bigram) counts; entropy/diversity are narrow.
    // Doubling the corpus must ~double wall time at most (scan-bound),
    // and the MG summary row count must stay <= capacity exactly.
    for (frac <- Seq(0.5, 1.0)) {
      val slice = spark.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % lit((1 / frac).toInt) === 0)
      val t0 = System.nanoTime()
      val hh = graft.api.Graft.heavyHitters(slice, capacity = 1 << 10)
      val nHh = hh.count()
      val tHh = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nPmi = graft.api.Graft.pmiBigrams(slice, minCount = 5, topK = 200).count()
      val tPmi = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val nEnt = graft.api.Graft.charEntropy(slice).count() +
        graft.api.Graft.lexicalDiversity(slice).count()
      val tNar = (System.nanoTime() - t2) / 1e9
      require(nHh <= (1 << 10), s"MG summary exceeded capacity: $nHh")
      println(f"[scale] lexical frac=$frac%.1f hh $tHh%.2f s ($nHh tokens), " +
        f"pmi $tPmi%.2f s ($nPmi rows), entropy+diversity $tNar%.2f s ($nEnt rows)")
    }

    // d87/d88/d90 ordering family: range-sort-based numbering must scale
    // like the sort (n log n per row ~ flat per-item at these sizes);
    // the group-offsets side is #groups rows regardless of corpus size.
    for (frac <- Seq(0.5, 1.0)) {
      val slice = spark.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % lit((1 / frac).toInt) === 0)
      val t0 = System.nanoTime()
      val nSh = graft.api.Graft.shuffleOrder(slice).count()
      val tSh = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nIl = graft.api.Graft.interleaveOrder(slice).count()
      val tIl = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val nLb = graft.api.Graft.lengthBatches(slice).count()
      val tLb = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val nEp = graft.api.Graft.epochPlan(slice).count()
      val tEp = (System.nanoTime() - t3) / 1e9
      val t4 = System.nanoTime()
      val nCu = graft.api.Graft.curriculumOrder(
        graft.api.Graft.qualityScore(slice)
          .select(col("doc_id"), col("stopword_ratio").as("score"))).count()
      val tCu = (System.nanoTime() - t4) / 1e9
      println(f"[scale] order frac=$frac%.1f d87 $tSh%.2f s ($nSh rows), " +
        f"d88 $tIl%.2f s ($nIl rows), d90 $tLb%.2f s ($nLb rows), " +
        f"d91 $tEp%.2f s ($nEp rows), d92 $tCu%.2f s ($nCu rows)")
    }
    // --- phrase serve crossover (d111 vs d112): the direct scan
    // re-tokenizes the corpus per query (one regex pass per row); the
    // positional index reads <= k of 64 postings buckets and verifies
    // by position intersection — corpus-size-independent past the
    // fixed serve overhead, the same trade as the bm25 probe above.
    // Measured (2026-08, round 13, 25k -> 50k docs): direct 0.31 ->
    // 0.71 s (tracks the corpus) vs serve 0.72 -> 0.52 s (flat; save
    // 2.5 -> 2.2 s) — the crossover sits at ~50k docs on this host,
    // and the direct/serve gap widens with every further doubling.
    Seq(2, 1).foreach { invFrac =>
      val sub = docsAll.where(col("doc_id") % invFrac === 0)
        .select(col("doc_id"), col("text"))
      val n = sub.count()
      val ph = s"${vocab(0)} ${vocab(1)}"
      val tD = System.nanoTime()
      graft.ops.Corpus.phraseMatch(sub, ph)
        .write.format("noop").mode("overwrite").save()
      val tDirect = (System.nanoTime() - tD) / 1e9
      val pDir = s"$dir/phrase_index_$invFrac"
      val tS = System.nanoTime()
      graft.ops.PhraseIndex.save(sub, pDir)
      val tSave = (System.nanoTime() - tS) / 1e9
      val tV = System.nanoTime()
      graft.ops.PhraseIndex.searchPhrase(spark, pDir, ph)
        .write.format("noop").mode("overwrite").save()
      val tServe = (System.nanoTime() - tV) / 1e9
      println(f"[scale] phrase-crossover n=$n%8d direct $tDirect%.2f s / " +
        f"serve $tServe%.2f s (save $tSave%.2f s)")
    }

    // --- bloom-gated incremental dedup probe (d82 vs d101): the direct
    // probe equi-joins EVERY delta row against the index; the bloom path
    // joins only sketch-positives (true dups + the fpp sliver), so its
    // exact-join input is delta-dup-sized regardless of how the BASE
    // grows — the quantity that matters at 100 TB, where the delta is
    // tiny and the base is not. Answers are identical by construction
    // (spec- and oracle-gated); the probe reports the join-input
    // reduction and the timings across a base doubling.
    // Measured (2026-08, round 13, 25k -> 50k base docs): save 1.18 ->
    // 0.68 s; direct 0.55 -> 0.37 s vs bloom 0.61 -> 0.37 s (equal —
    // job-overhead-dominated at toy scale); exact-join input 64 of
    // 1088 delta rows BOTH times — exactly the planted re-crawls, zero
    // false positives (the 1 MiB filter is underfilled at these bases,
    // so its realized fpp beats the configured 3%). The 17x join-input
    // reduction is the quantity that carries to 100 TB, where the
    // index side of the pruned join is the expensive half.
    Seq(2, 1).foreach { invFrac =>
      val base = docsAll.where(col("doc_id") % invFrac === 0)
        .select(col("doc_id"), col("text"))
      val nBase = base.count()
      val hDir = s"$dir/hash_index_$invFrac"
      val tS = System.nanoTime()
      graft.ops.HashIndex.save(base, hDir)
      val tSave = (System.nanoTime() - tS) / 1e9
      // delta: 1024 novel docs + 64 re-crawls (indexed text, new ids)
      val novel = spark.range(1024).select(
        (col("id") + 10000000L).as("doc_id"),
        concat(lit("novel delta doc "), col("id")).as("text"))
      val recrawl = base.orderBy(col("doc_id")).limit(64)
        .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
      val delta = novel.unionByName(recrawl).localCheckpoint()
      val tD = System.nanoTime()
      graft.ops.HashIndex.dedupAgainst(spark, delta, hDir)
        .write.format("noop").mode("overwrite").save()
      val tDirect = (System.nanoTime() - tD) / 1e9
      val tB = System.nanoTime()
      graft.ops.HashIndex.dedupAgainstBloom(spark, delta, hDir)
        .write.format("noop").mode("overwrite").save()
      val tBloom = (System.nanoTime() - tB) / 1e9
      val bloom = graft.ops.HashIndex.mergedBloom(spark, hDir)
      val positives = delta.select(xxhash64(md5(col("text"))).as("h"))
        .collect().count(r => bloom.mightContainLong(r.getLong(0)))
      println(f"[scale] bloom-dedup base=$nBase%8d save $tSave%.2f s; " +
        f"delta=1088 direct $tDirect%.2f s / bloom $tBloom%.2f s; " +
        f"exact-join input $positives of 1088 delta rows pass the sketch")
    }

    // --- char-granularity exact-substring dedup (d121/d122): the char
    // position stream is ~chars-per-word x the word stream's rows, so
    // the probe tracks (a) that the df pass stays the dominant, still
    // sublinear cost in PRODUCTION mode (hashGrams — 8-byte keys
    // through every shuffle, never 30-char strings), and (b) that the
    // scrub's interval-fold rebuild adds only id-keyed join time over
    // the interval derivation, never a per-char explode.
    // Measured (2026-08, round 10): intervals 6.90 s at 25k docs ->
    // 8.03 s at 50k (1.16x per doubling — sublinear); scrub 5.27 ->
    // 8.38 s while found spans grew 2.56x (34.1k -> 87.4k), i.e. the
    // rebuild tracks the duplicate mass it removes, not the corpus.
    Seq(2, 1).foreach { invFrac =>
      val sub = docsAll.where(col("doc_id") % invFrac === 0)
      val n = sub.count()
      val tI = System.nanoTime()
      val spans = graft.ops.Curation
        .dupSpanIntervalsChars(sub, hashGrams = true).count()
      val tIntervals = (System.nanoTime() - tI) / 1e9
      val tScrub = System.nanoTime()
      graft.ops.Curation.dedupScrubChars(sub, hashGrams = true)
        .write.format("noop").mode("overwrite").save()
      println(f"[scale] char-dedup n=$n%8d spans=$spans%6d " +
        f"intervals $tIntervals%.2f s / scrub ${(System.nanoTime() - tScrub) / 1e9}%.2f s")
    }

    // --- d130 linkage candidate growth: TPC-H part names end in one of
    // ~92 color words, so RAW blocks grow linearly with the corpus and
    // pair volume quadratically. The banded + capped discipline bounds
    // candidates per record at 3·blockCap, so the candidate frame must
    // grow LINEARLY on a 10× corpus with the same 92 skewed blocks —
    // this probe counts it directly (candidateFrame is the frame the
    // Levenshtein comparator prices; its row count IS the operator's
    // scale story). An uncapped within-band count is printed alongside
    // to show what the cap is protecting against.
    // Measured (2026-08, round 15, 20k -> 200k names, 92 blocks,
    // cap 1024): capped candidates 2.23M -> 26.9M (1.21x per-name
    // growth on a 10x corpus — linear, the band split keeps cells under
    // the cap until ~2k names/block; uncapped 2.23M -> 38.9M and
    // diverging quadratically as cells overflow: at 100x the uncapped
    // frame is ~100x per name while capped stays flat at 3·blockCap).
    Seq(20000, 200000).foreach { n =>
      val colors = (0 until 92).map(i => s"color$i")
      val names = spark.range(n).select(col("id").as("rec_id")).as[Long]
        .map { id =>
          val rng = new scala.util.Random(id * 0x2545f491L + 11)
          val words = Seq.fill(3 + rng.nextInt(3))(
            vocab(rng.nextInt(vocabSize))) :+ colors(rng.nextInt(colors.length))
          (id, words.mkString(" "))
        }.toDF("rec_id", "name").localCheckpoint()
      val t0 = System.nanoTime()
      val capped = graft.ops.Linkage.candidateFrame(names).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      val uncapped = graft.ops.Linkage.candidateFrame(names, blockCap = Int.MaxValue).count()
      println(f"[scale] linkage n=$n%8d capped=$capped%12d ($tCand%.2f s) " +
        f"uncapped=$uncapped%12d  per-name=${capped.toDouble / n}%.1f")
    }

    // --- d127 basket-cap growth probe: candidate pair volume is
    // Σ_baskets C(n_items, 2), so ONE runaway basket (a bot account, a
    // crawler session) dominates the whole corpus quadratically. Plant a
    // heavy basket at 1k then 10k items (100× its pair count) on a fixed
    // 100k-row honest corpus and count copurchaseCandidates directly
    // (the d130 candidateFrame discipline — the pre-aggregation frame's
    // row count IS the operator's scale story): the capped frame must
    // stay FLAT across the heavy-basket growth while the uncapped one
    // explodes with C(heavy, 2).
    // Measured (2026-08, round 12): capped 200,000 pairs at BOTH heavy
    // sizes, 1.4/1.9 s (flat — the bot basket is gone before the
    // self-join, the honest corpus alone fans out) vs uncapped 2,199,000
    // at heavy=2k -> 200,190,000 at heavy=20k, 2.2 -> 9.1 s (C(heavy,2):
    // a 91× pair blow-up from ONE basket even at toy scale, quadratic
    // from here — and all of it lands on a single basket key).
    Seq(2000, 20000).foreach { heavy =>
      val honest = spark.range(100000).select(
        (col("id") / 5).cast("long").as("basket_id"),
        pmod(col("id") * 2654435761L, lit(4096L)).as("item_id"))
      val bot = spark.range(heavy).select(
        lit(99999999L).as("basket_id"), col("id").as("item_id"))
      val baskets = honest.unionByName(bot).localCheckpoint()
      val t0 = System.nanoTime()
      val capped = graft.ops.Graphs.copurchaseCandidates(baskets).count()
      val tCap = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val uncapped = graft.ops.Graphs
        .copurchaseCandidates(baskets, Int.MaxValue).count()
      val tUn = (System.nanoTime() - t1) / 1e9
      println(f"[scale] basket-cap heavy=$heavy%6d capped=$capped%12d " +
        f"($tCap%.2f s) uncapped=$uncapped%12d ($tUn%.2f s)")
    }

    // --- d157 walk probe: per-step work must track #walks, not Σ deg —
    // the next-hop adjacency join is on (node, idx) EQUALITY, so a
    // 50k-spoke celebrity node matches one row per visiting walk, same
    // as a leaf; only the one-time indexed-adjacency build touches
    // Σ deg. A hash-bucketed selection that instead joined every
    // neighbor and filtered would blow up exactly here.
    // Measured (2026-08, round 12): uniform 200k edges / ~40k nodes,
    // 2 walks × 4 steps = 397k rows in 5.4 s; +50k-spoke hub: 500k
    // rows in 6.0 s — +11% time for +25% Σdeg landing on ONE node
    // (and the extra rows are the hub component's own walks, not
    // hub fan-out). hyperBall r=2 over the same ~40k nodes: 2.8 s at
    // 100k edges -> 2.7 s at 200k — constant per-node sketch state;
    // the edge doubling is absorbed by the 32-core join at this
    // scale, with nothing superlinear anywhere.
    {
      val base = spark.range(200000).select(
        pmod(xxhash64(col("id")), lit(40000L)).as("src"),
        pmod(xxhash64(col("id") + 7), lit(40000L)).as("dst"))
        .where(col("src") =!= col("dst"))
      val hub = spark.range(50000).select(
        lit(9999999L).as("src"), col("id").as("dst"))
      Seq(("uniform", base), ("with-hub", base.unionByName(hub))).foreach {
        case (tag, g) =>
          val e = g.localCheckpoint()
          val nE = e.count()
          val t0 = System.nanoTime()
          val rows = graft.ops.Graphs.randomWalks(e, walksPerNode = 2, steps = 4).count()
          println(f"[scale] walks $tag%-9s edges=$nE%8d rows=$rows%9d " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      Seq(2, 1).foreach { invFrac =>
        val e = spark.range(200000).where(col("id") % invFrac === 0).select(
          pmod(xxhash64(col("id")), lit(40000L)).as("src"),
          pmod(xxhash64(col("id") + 7), lit(40000L)).as("dst"))
          .where(col("src") =!= col("dst")).localCheckpoint()
        val nE = e.count()
        val t0 = System.nanoTime()
        val rows = graft.ops.Graphs.hyperBall(e, radius = 2).count()
        println(f"[scale] hyperball edges=$nE%8d rows=$rows%9d " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // --- d162 node2vec wedge-volume probe: second-order walks carry
    // (prev, cur)-conditional transition state whose row count is the
    // WEDGE volume Σ deg² — the published alias-table bound the
    // biasedWalks scaladoc declares as the scale limit. The probe
    // measures it directly: a planted 2k-spoke hub on a uniform graph
    // adds ~deg_hub² ≈ 4M wedges, dominating the uniform corpus's own
    // volume — the number that says "cap or k-core hub graphs FIRST",
    // exactly as the doc instructs. The walk step itself stays
    // frontier-proportional (equi-join on (prev, cur) + range filter).
    // Measured (2026-08, driver round 13): uniform 100k edges = 2.40M
    // wedges, 3-step walks in 5.5 s; +2k-spoke hub = 6.44M wedges
    // (the hub alone ≈ deg² = 4M), 8.8 s — time tracks wedge volume
    // ~linearly, confirming the transition-table build (not the walk
    // steps) is the scale term, and that it is LINEAR in wedges, not
    // worse. Same walk-row count both ways (#walks-proportional).
    {
      val base = spark.range(100000).select(
        pmod(xxhash64(col("id")), lit(20000L)).as("src"),
        pmod(xxhash64(col("id") + 7), lit(20000L)).as("dst"))
        .where(col("src") =!= col("dst"))
      val hub = spark.range(2000).select(
        lit(9999999L).as("src"), col("id").as("dst"))
      Seq(("uniform", base), ("with-hub", base.unionByName(hub))).foreach {
        case (tag, g) =>
          val e = g.localCheckpoint()
          val sym = e.select(col("src").as("u"), col("dst").as("v"))
            .union(e.select(col("dst").as("u"), col("src").as("v")))
            .distinct().localCheckpoint()
          val wedges = sym.toDF("p", "c")
            .join(sym.toDF("c", "n"), Seq("c")).count()
          val t0 = System.nanoTime()
          val rows = graft.ops.Graphs.biasedWalks(e, walksPerNode = 1,
            steps = 3, wReturn = 1, wIn = 2, wOut = 2).count()
          println(f"[scale] node2vec $tag%-9s wedges=$wedges%10d rows=$rows%9d " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // --- EdgeIndex incremental-append probe: an append must cost the
    // ARRIVING batch (its own capped self-join + pair count), not the
    // indexed corpus — the claim that makes the index worth existing
    // at 100 TB. The probe saves a large basket corpus, then appends a
    // 5% batch and compares times; serve-time edgesOf aggregates index
    // rows only. Measured (2026-08, driver round 13): save 3.0 s
    // (100k baskets), append of a 5% batch 1.4 s (the gap to 5%-of-
    // save is fixed job overhead at toy scale — the append never
    // touches the indexed partitions, its cost is the batch's own
    // two-table write), serve 0.76 s over 21k summed edges.
    {
      val big = spark.range(500000).select(
        (col("id") / 5).cast("long").as("basket_id"),
        pmod(xxhash64(col("id")), lit(30000L)).as("item_id"))
      val small = spark.range(25000).select(
        (lit(200000L) + col("id") / 5).cast("long").as("basket_id"),
        pmod(xxhash64(col("id") + 13), lit(30000L)).as("item_id"))
      val dir = java.nio.file.Files.createTempDirectory("scale-edgeidx").toString
      try {
        val t0 = System.nanoTime()
        graft.ops.EdgeIndex.save(big, dir)
        val tSave = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.ops.EdgeIndex.append(small, dir)
        val tApp = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val edges = graft.ops.EdgeIndex.edgesOf(spark, dir).count()
        println(f"[scale] edge_index save $tSave%.2f s, append(5%%) $tApp%.2f s, " +
          f"serve ${(System.nanoTime() - t2) / 1e9}%.2f s ($edges edges)")
      } finally graft.ops.Corpus.deleteRecursively(dir)
    }

    // --- d176/d178 sampled-centrality probe: the published trade is
    // state (and time) at most LINEAR in the source sample — (source,
    // node) BFS keys bound the state at nSources·|V|, so doubling the
    // sample must at worst double the cost, never square it (a
    // shared-frontier bug would show superlinear growth here).
    // Measured (2026-08, driver round 14) on a uniform 200k-edge /
    // ~40k-node graph: sources 4/8/16 → betweenness 3.1/2.2/2.1 s,
    // harmonic 1.6/1.5/1.5 s — FLAT at this scale (fixed per-hop join
    // overhead dominates; the source multiplicity rides inside the
    // same joins), comfortably inside the linear envelope.
    {
      val e = spark.range(200000).select(
        pmod(xxhash64(col("id")), lit(40000L)).as("src"),
        pmod(xxhash64(col("id") + 7), lit(40000L)).as("dst"))
        .where(col("src") =!= col("dst")).localCheckpoint()
      Seq(4, 8, 16).foreach { s =>
        val t0 = System.nanoTime()
        val rows = graft.ops.Graphs
          .betweennessCentrality(e, nSources = s, maxHops = 3).count()
        val t1 = System.nanoTime()
        val hrows = graft.ops.Graphs
          .harmonicCentrality(e, nSources = s, maxHops = 3).count()
        println(f"[scale] centrality sources=$s%3d betweenness " +
          f"${(t1 - t0) / 1e9}%.2f s ($rows rows), harmonic " +
          f"${(System.nanoTime() - t1) / 1e9}%.2f s ($hrows rows)")
      }
    }

    // --- d173 k-truss hub-safety probe: per-round support uses the
    // degree-oriented once-per-triangle enumeration. The planted
    // 50k-spoke hub is adjacent to EVERY base node, so it closes a
    // triangle over every base edge (~200k triangles through one
    // vertex) — the worst case for a naive common-neighbor self-join,
    // which would fan deg² = 2.5e9 wedge rows at the hub. Orientation
    // sends every hub edge INTO the hub (max degree), so the hub
    // generates no wedges; its triangles are enumerated from their
    // low-degree corners (the d129 argument, load-bearing inside an
    // iterated prune). Measured (2026-08, driver round 14): uniform
    // 1.9 s (666 survivors), with-hub 2.9 s (239,642 survivors — the
    // hub legitimately trussifies nearly every edge) — +25% edges and
    // +200k triangles for +50% time, nothing quadratic.
    {
      val base = spark.range(200000).select(
        pmod(xxhash64(col("id")), lit(40000L)).as("src"),
        pmod(xxhash64(col("id") + 7), lit(40000L)).as("dst"))
        .where(col("src") =!= col("dst"))
      val hub = spark.range(50000).select(
        lit(9999999L).as("src"), col("id").as("dst"))
      Seq(("uniform", base), ("with-hub", base.unionByName(hub))).foreach {
        case (tag, g) =>
          val e = g.localCheckpoint()
          val nE = e.count()
          val t0 = System.nanoTime()
          val rows = graft.ops.Graphs.kTruss(e, k = 3, rounds = 2).count()
          println(f"[scale] ktruss $tag%-9s edges=$nE%8d survivors=$rows%8d " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // --- d185 link-prediction center-cap probe: candidate enumeration
    // is Σ deg² at the wedge center BY THE PROBLEM'S NATURE (a hub
    // really witnesses deg² pairs), so the maxCenterDegree gate before
    // the fan-out is the whole scale story — the same planted 50k-spoke
    // hub must cost ~nothing under the default cap (the hub center is
    // dropped; its 2.5e9 candidate pairs never materialize) and the
    // capped answer on the uniform part must be unchanged. Measured
    // (2026-08, driver round 14): uniform 3.6 s, with-hub 2.8 s —
    // IDENTICAL 198,453 candidate rows both ways (the hub contributes
    // zero candidates and its spokes only new anti-join probes).
    {
      val base = spark.range(200000).select(
        pmod(xxhash64(col("id")), lit(40000L)).as("src"),
        pmod(xxhash64(col("id") + 7), lit(40000L)).as("dst"))
        .where(col("src") =!= col("dst"))
      val hub = spark.range(50000).select(
        lit(9999999L).as("src"), col("id").as("dst"))
      Seq(("uniform", base), ("with-hub", base.unionByName(hub))).foreach {
        case (tag, g) =>
          val e = g.localCheckpoint()
          val t0 = System.nanoTime()
          val rows = graft.ops.Graphs.linkPrediction(e, k = 5).count()
          println(f"[scale] linkpred $tag%-9s rows=$rows%8d " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
