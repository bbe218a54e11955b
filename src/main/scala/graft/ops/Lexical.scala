package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Mutable Misra-Gries buffer: token -> counter map plus the total
  * decrement depth `dec` applied so far (the undercount bound). Kryo-
  * encoded — it only ever crosses the wire as a per-partition partial
  * summary of at most `capacity` entries. */
final class MgMap extends Serializable {
  val m = new java.util.HashMap[String, Long]()
  var dec: Long = 0L
}

/** Finished Misra-Gries summary (parallel arrays sorted by token). */
case class MgSummary(toks: Array[String], counts: Array[Long], dec: Long)

/** Misra-Gries heavy-hitter sketch as a typed Aggregator — the mergeable
  * frequent-items summary of Misra & Gries 1982 in the mergeable-
  * summaries formulation of Agarwal et al. 2013 (merge = counter-wise
  * sum, then subtract the (capacity+1)-th largest counter and drop the
  * non-positive). Guarantees, with N = stream length and k = capacity:
  * every stored counter c satisfies true - dec <= c <= true, dec <= N/(k+1),
  * and every token with true frequency > N/(k+1) is present. When k is at
  * least the number of DISTINCT tokens no decrement ever fires anywhere
  * (dec = 0) and the summary is the exact frequency table — the
  * exact-mode gate d76 runs under.
  *
  * Update is O(1) amortized (each full-map decrement pays for `capacity`
  * preceding inserts); merge is O(capacity log capacity). */
class MgAgg(capacity: Int) extends Aggregator[String, MgMap, MgSummary] {
  require(capacity > 0, "need capacity > 0")

  override def zero: MgMap = new MgMap

  override def reduce(b: MgMap, t: String): MgMap = {
    if (t == null) return b
    val cur = b.m.get(t)
    if (cur != 0L || b.m.containsKey(t)) b.m.put(t, cur + 1L)
    else if (b.m.size < capacity) b.m.put(t, 1L)
    else {
      // decrement-all: the arriving token and one unit of every tracked
      // token cancel — the classic MG step
      val it = b.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
      b.dec += 1L
    }
    b
  }

  override def merge(a: MgMap, c: MgMap): MgMap = {
    val it = c.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.m.merge(e.getKey, e.getValue, (x, y) => x + y)
    }
    a.dec += c.dec
    if (a.m.size > capacity) {
      // subtract the (capacity+1)-th largest counter value from all
      val vals = new Array[Long](a.m.size)
      var i = 0
      val vit = a.m.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - capacity - 1)
      val eit = a.m.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= d) eit.remove() else e.setValue(e.getValue - d)
      }
      a.dec += d
    }
    a
  }

  override def finish(b: MgMap): MgSummary = {
    val toks = new Array[String](b.m.size)
    b.m.keySet().toArray(toks)
    java.util.Arrays.sort(toks, java.util.Comparator.naturalOrder[String]())
    MgSummary(toks, toks.map(b.m.get(_)), b.dec)
  }

  override def bufferEncoder: Encoder[MgMap] = Encoders.kryo[MgMap]
  override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}

/** Corpus-level lexical statistics a training-data pipeline reads before
  * deciding what to keep: heavy-hitter token frequencies (a mergeable
  * sketch, exact-mode gateable), PMI bigram phrase mining, per-document
  * character entropy, and per-document lexical diversity. All tokenizing
  * paths share the Catalyst-parity semantics of [[Curation]] (space-only
  * trim, Locale.ROOT lower, \s+ split) so every DuckDB oracle
  * hash-matches.
  */
object Lexical {

  private def wordsCol: Column = split(lower(trim(col("text"))), "\\s+")

  // ---- d76: Misra-Gries heavy hitters ---------------------------------

  /** Heavy-hitter tokens via a distributed [[MgAgg]] sketch. Out:
    * (token, est_count, err_bound) — est_count undercounts the true
    * frequency by at most err_bound (the summary's global decrement
    * depth; 0 in exact mode), and every token with true frequency >
    * N/(capacity+1) is guaranteed present.
    *
    * Scale: the map side runs one MG summary per partition (bounded at
    * `capacity` entries each — memory is capacity x token width, never
    * corpus-sized), so the shuffle carries `partitions x capacity`
    * entries no matter how many tokens the corpus holds; the single
    * reduce group merges those summaries associatively. The finished
    * summary (<= capacity entries) is materialized driver-side to build
    * the result frame — an explicitly bounded collect, the [[IvfIndex]]
    * centroid convention, NOT a table collect. With the default
    * capacity the summary is ~KBs; callers picking a large capacity pay
    * capacity x width driver bytes and should size accordingly. */
  def heavyHitters(docs: DataFrame, capacity: Int = 1 << 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(wordsCol).as("token")).as[String]
    val s = toks.select(new MgAgg(capacity).toColumn).head()
    val rows = s.toks.indices.map(i => (s.toks(i), s.counts(i), s.dec))
    spark.createDataset(rows).toDF("token", "est_count", "err_bound")
  }

  // ---- d77: PMI bigram phrase mining ----------------------------------

  /** Top-k adjacent-bigram collocations by corpus frequency, scored with
    * pointwise mutual information: pmi = ln((B/NB) / ((U1/NU)(U2/NU)))
    * for bigram count B, unigram counts U1/U2, and corpus totals NB/NU.
    * Selection is by the exact integer ordering (n DESC, w1, w2) — never
    * by the float score, so the emitted row set is engine-independent;
    * pmi rides along at the 4-decimal convention (+0.0 normalizes a
    * rounded -0.0, which repr-based comparison would distinguish). Out:
    * (w1, w2, n, pmi).
    *
    * Scale: bigram multiplicities are computed IN-ROW (the d50
    * convention — no corpus-width bigram-stream shuffle); the only wide
    * exchanges roll up to model-sized (distinct-bigram / distinct-token)
    * frames; top-k is a TakeOrdered, the <= k winners broadcast into the
    * unigram lookups, and the two 1-row totals broadcast-cross-join. */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5, topK: Int = 100): DataFrame = {
    require(topK > 0, "need topK > 0")
    val bc = docs
      .select(explode(Curation.bigramCountsUdf(col("text"))).as("b"))
      .select(col("b._1").as("w1"), col("b._2").as("w2"), col("b._3").as("m"))
      .groupBy(col("w1"), col("w2")).agg(sum(col("m")).as("n"))
    val uc = Curation.docTokens(docs)
      .groupBy(col("token")).agg(sum(col("m")).as("u"))
    val nu = uc.agg(sum(col("u")).cast(DoubleType).as("nu"))
    val nb = bc.agg(sum(col("n")).cast(DoubleType).as("nb"))
    val top = bc.where(col("n") >= minCount)
      .orderBy(col("n").desc, col("w1"), col("w2")).limit(topK)
    val u1 = uc.select(col("token").as("w1"), col("u").as("u1"))
    val u2 = uc.select(col("token").as("w2"), col("u").as("u2"))
    u2.join(broadcast(u1.join(broadcast(top), Seq("w1"))), Seq("w2"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("n"),
        (round(log((col("n").cast(DoubleType) * col("nu") * col("nu")) /
          (col("nb") * col("u1") * col("u2"))), 4) + lit(0.0)).as("pmi"))
  }

  // ---- d78: character entropy -----------------------------------------

  /** Per-document code-point multiplicities and raw Shannon entropy
    * H = -sum p ln p (p = count/total), computed in one pass over the
    * string. The sum runs in sorted-character order so the float result
    * is deterministic for a given document. */
  private[graft] val charEntropyUdf = udf { (text: String) =>
    val m = new java.util.TreeMap[String, Long]()
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      m.merge(new String(Character.toChars(cp)), 1L, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    val n = text.codePointCount(0, text.length).toDouble
    var h = 0.0
    val it = m.values().iterator()
    while (it.hasNext) {
      val p = it.next() / n
      h -= p * math.log(p)
    }
    (n.toLong, m.size.toLong, h)
  }

  /** Per-document character-level entropy — the gibberish/binary
    * detector real curation pipelines run alongside [[Curation.gopherRules]]
    * (natural text sits in a band; base64 blobs and key-mash spam sit
    * far above, single-character runs at 0). Out: (doc_id, n_cp,
    * n_unique_chars, entropy) with entropy at the 4-decimal convention
    * (+0.0 so a -0.0 from rounding a one-character document can never
    * diverge from the oracle's 0.0).
    *
    * Scale: one narrow codegen'd projection around an O(len) UDF — no
    * shuffle, streaming-safe; the scan cost is the whole cost. */
  def charEntropy(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), charEntropyUdf(col("text")).as("e"))
      .select(col("doc_id"), col("e._1").as("n_cp"),
        col("e._2").as("n_unique_chars"),
        (round(col("e._3"), 4) + lit(0.0)).as("entropy"))

  // ---- d79: lexical diversity -----------------------------------------

  private[graft] val lexDiversityUdf = udf { (text: String) =>
    val ws = Curation.tokenize(text)
    val m = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < ws.length) { m.merge(ws(i), 1L, (a, b) => a + b); i += 1 }
    var hapax = 0L
    val it = m.values().iterator()
    while (it.hasNext) if (it.next() == 1L) hapax += 1L
    (ws.length.toLong, m.size.toLong, hapax)
  }

  /** Per-document lexical diversity: type-token ratio and hapax-legomenon
    * ratio — low TTR flags template/spam repetition that [[Curation.gopherRules]]'
    * length bounds cannot see; a high hapax share flags OCR noise and
    * gibberish vocabularies. Out: (doc_id, n_tokens, n_distinct, n_hapax,
    * ttr, hapax_ratio); the ratios are single IEEE divisions of exact
    * integer counts (d04's convention), so the oracle hash-matches
    * without rounding. Tokenization yields at least one token (the empty
    * string for an empty text — the shared convention), so neither
    * divisor is ever 0.
    *
    * Scale: one narrow codegen'd projection around an O(len) UDF — no
    * shuffle, streaming-safe. */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lexDiversityUdf(col("text")).as("l"))
      .select(col("doc_id"), col("l._1").as("n_tokens"),
        col("l._2").as("n_distinct"), col("l._3").as("n_hapax"),
        (col("l._2").cast(DoubleType) / col("l._1")).as("ttr"),
        (col("l._3").cast(DoubleType) / col("l._2")).as("hapax_ratio"))

  // ---- d83: vocabulary truncation --------------------------------------

  /** Vocabulary truncation — the LM-prep step that replaces tokens whose
    * corpus share falls below shareNum/shareDen with an `<unk>` marker
    * (rare-tail tokens blow up embedding tables and are mostly typos /
    * OCR noise; every classic n-gram / word-level LM pipeline runs
    * this). Rarity is an exact integer predicate (c * shareDen <
    * total * shareNum — no float threshold), so the replaced set is
    * engine-independent. Out: (doc_id, n_tokens, n_replaced, text_unk)
    * where text_unk is the canonical token stream (lowercased,
    * single-space — the d63 rebuild convention) with rare tokens
    * replaced.
    *
    * Scale: token counts roll up from per-doc-distinct rows (the
    * [[Curation.docTokens]] shape — narrow in-row multiplicities, the
    * only wide exchange is model-sized); the rare set attaches back by
    * a token-keyed semi join whose fan-out is the rare tokens' own
    * occurrence count (below-share by definition); per-doc rare lists
    * ride a doc-keyed rollup of the DISTINCT (doc, token) frame; the
    * rebuild is one narrow in-row transform — no (doc, position)
    * shuffle anywhere. */
  def unkReplace(docs: DataFrame, shareNum: Long = 1, shareDen: Long = 500,
      unk: String = "<unk>"): DataFrame = {
    require(shareNum > 0 && shareDen > 0, "need positive share fraction")
    val tc = Curation.docTokens(docs)
      .groupBy(col("token")).agg(sum(col("m")).as("c"))
    val tot = tc.agg(sum(col("c")).as("total"))
    val rare = tc.crossJoin(broadcast(tot))
      .where(col("c") * shareDen < col("total") * shareNum)
      .select(col("token"))
    val bad = Curation.docTokens(docs).select(col("doc_id"), col("token"))
      .join(rare, Seq("token"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_list(col("token")).as("bads"))
    val words = wordsCol
    docs.join(bad, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("bads"), array()).as("badsC"),
        words.as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast(LongType).as("n_tokens"),
        size(filter(col("ws"), w => array_contains(col("badsC"), w)))
          .cast(LongType).as("n_replaced"),
        array_join(transform(col("ws"),
          w => when(array_contains(col("badsC"), w), unk).otherwise(w)), " ")
          .as("text_unk"))
  }

  // ---- driver bindings -------------------------------------------------

  /** d76 runs the sketch in EXACT MODE: capacity 2^17 exceeds any
    * distinct-token count the test corpus can produce, so dec = 0 and
    * the summary equals the full frequency table — which is what lets a
    * frequency-table oracle hash-gate a sketch algorithm (the d33/d35/d73
    * exact-mode-gate pattern). Production callers size capacity to the
    * memory they will give the sketch, not to the vocabulary. */
  def queries: Seq[Q] = Seq(

    Q("d76_heavy_hitters",
      (s, d) => heavyHitters(documents(s, d), capacity = 1 << 17),
      Some("""WITH w AS (
             |  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS ws
             |  FROM documents),
             |t AS (SELECT unnest(ws) AS token FROM w)
             |SELECT token, CAST(count(*) AS BIGINT) AS est_count,
             |       CAST(0 AS BIGINT) AS err_bound
             |FROM t GROUP BY 1""".stripMargin)),

    Q("d77_pmi_bigrams",
      (s, d) => pmiBigrams(documents(s, d)),
      Some("""WITH w AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
             |  FROM documents),
             |bi AS (
             |  SELECT ws[i] AS w1, ws[i+1] AS w2
             |  FROM w, UNNEST(range(1, len(ws))) AS t(i)),
             |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
             |       FROM bi GROUP BY 1, 2),
             |uc AS (SELECT token, CAST(count(*) AS BIGINT) AS u
             |       FROM (SELECT unnest(ws) AS token FROM w) GROUP BY 1),
             |nu AS (SELECT CAST(sum(u) AS DOUBLE) AS nu FROM uc),
             |nb AS (SELECT CAST(sum(n) AS DOUBLE) AS nb FROM bc),
             |top AS (SELECT w1, w2, n FROM bc WHERE n >= 5
             |        ORDER BY n DESC, w1, w2 LIMIT 100)
             |SELECT w1, w2, n,
             |       round(ln((CAST(n AS DOUBLE) * nu * nu) /
             |                (nb * u1.u * u2.u)), 4) + 0.0 AS pmi
             |FROM top JOIN uc u1 ON top.w1 = u1.token
             |         JOIN uc u2 ON top.w2 = u2.token, nu, nb""".stripMargin)),

    Q("d78_char_entropy",
      (s, d) => charEntropy(documents(s, d)),
      Some("""WITH ch AS (
             |  SELECT doc_id, unnest(string_split(text, '')) AS c
             |  FROM documents WHERE len(text) > 0),
             |cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
             |tt AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_cp,
             |              CAST(count(*) AS BIGINT) AS n_unique_chars
             |       FROM cc GROUP BY 1),
             |e AS (SELECT cc.doc_id,
             |             round(-sum((CAST(n AS DOUBLE) / n_cp) *
             |                        ln(CAST(n AS DOUBLE) / n_cp)), 4) + 0.0 AS entropy
             |      FROM cc JOIN tt USING (doc_id) GROUP BY 1)
             |SELECT d.doc_id, coalesce(n_cp, 0) AS n_cp,
             |       coalesce(n_unique_chars, 0) AS n_unique_chars,
             |       coalesce(entropy, 0.0) AS entropy
             |FROM documents d LEFT JOIN tt USING (doc_id) LEFT JOIN e USING (doc_id)""".stripMargin)),

    Q("d83_unk_replace",
      (s, d) => unkReplace(documents(s, d)),
      Some("""WITH w AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
             |  FROM documents),
             |t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
             |tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM tc),
             |r AS (SELECT tok FROM tc, tot WHERE c * 500 < total * 1),
             |p AS (SELECT doc_id, ws[i] AS tok, i
             |      FROM w, UNNEST(range(1, len(ws) + 1)) AS u(i)),
             |q AS (SELECT doc_id, i,
             |             CASE WHEN tok IN (SELECT tok FROM r)
             |                  THEN '<unk>' ELSE tok END AS tok2,
             |             CASE WHEN tok IN (SELECT tok FROM r)
             |                  THEN 1 ELSE 0 END AS rep
             |      FROM p)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |       CAST(sum(rep) AS BIGINT) AS n_replaced,
             |       string_agg(tok2, ' ' ORDER BY i) AS text_unk
             |FROM q GROUP BY 1""".stripMargin)),

    Q("d79_lexical_diversity",
      (s, d) => lexicalDiversity(documents(s, d)),
      Some("""WITH w AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
             |  FROM documents),
             |t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
             |c AS (SELECT doc_id, tok, count(*) AS n FROM t GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
             |       CAST(count(*) AS BIGINT) AS n_distinct,
             |       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             |       CAST(count(*) AS DOUBLE) / sum(n) AS ttr,
             |       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
             |         AS hapax_ratio
             |FROM c GROUP BY 1""".stripMargin)))
}
