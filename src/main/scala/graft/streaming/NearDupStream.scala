package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Similarity

/** A document arriving on the ingestion stream. */
final case class StreamDoc(docId: Long, text: String)

/** A near-duplicate candidate surfaced by the streaming detector:
  * `estAgree` of 128 minhash components agree (estimate of J*128). */
final case class NearDupCand(docA: Long, docB: Long, estAgree: Int)

/** Per-bucket state: the last `maxPerBucket` sketches seen in this LSH
  * bucket, ids parallel to 128-long signature blocks (flattened — nested
  * primitive arrays don't have a product encoder). */
private final case class BucketState(ids: Array[Long], sigs: Array[Long])

/** Streaming MinHash-LSH near-duplicate detection — the continuous-
  * ingestion counterpart of batch d06: each arriving document is sketched
  * once (the same 128-component minhash family as the batch operator),
  * fanned out to its 16 band buckets, and compared ONLY against the
  * sketches previously seen in those buckets (typed per-bucket state) —
  * never against the corpus.
  *
  * Scale properties:
  *  - one shuffle per micro-batch, keyed by (band, bucket) — the same key
  *    the batch bucket self-join uses, so hot buckets spread exactly as
  *    far as they do in batch;
  *  - state is bounded per bucket: at most `maxPerBucket` sketches (ring
  *    eviction, oldest first) — the documented trade: a true duplicate of
  *    a document evicted from all 16 of its buckets is missed, which at
  *    the default 64/bucket x 16 bands needs 1024 later same-bucket
  *    arrivals before the first repeat. TOTAL state grows with the number
  *    of distinct buckets touched (O(min(corpus, 16 x 2^64)) keys, ~1 KB
  *    each at the cap) — the inherent cost of remembering the stream; a
  *    deployment that only needs recent-window dedup should add a state
  *    TTL (GroupStateTimeout) to forget idle buckets;
  *  - candidates are emitted at-least-once (a pair colliding in several
  *    bands is emitted per band); consumers dedupe downstream, exactly
  *    like the batch pipeline's `distinct()`.
  *
  * Emitted pairs carry the agreement estimate (>= 77 of 128 ~ J >= 0.6,
  * the same prefilter the batch operator applies before exact
  * verification); exact verification of candidates happens downstream in
  * batch, where the gram arrays live.
  */
object NearDupStream {

  private val N = Similarity.NumHashes

  def candidates(spark: SparkSession, docs: Dataset[StreamDoc],
      maxPerBucket: Int = 64,
      minAgree: Int = (Similarity.NumHashes * 6) / 10): Dataset[NearDupCand] = {
    import spark.implicits._

    val fanout: Dataset[(Long, Long, Long, Array[Long])] = docs.flatMap { doc =>
      // Locale.ROOT, not the JVM default: under e.g. a Turkish default
      // locale "I".toLowerCase is "ı", diverging from Catalyst lower()
      // (locale-insensitive) — the batch index this stream must agree with
      val grams = Similarity.charGramHashes(
        if (doc.text == null) null
        else doc.text.toLowerCase(java.util.Locale.ROOT))
      // no grams -> no sketch: an empty gram set's minhash is the
      // all-MaxValue vector, which would make every pair of degenerate
      // (null / < 3 chars) documents collide in all 16 bands with a
      // perfect agreement estimate — matching batch, such docs simply
      // never enter the index.
      if (grams.isEmpty) Iterator.empty
      else {
      val mh = Similarity.minhashFromHashes(grams)
      (0 until Similarity.Bands).iterator.map { b =>
        var h = 0x9747b28cL ^ b
        var i = b * Similarity.RowsPerBand
        val end = i + Similarity.RowsPerBand
        while (i < end) { // splitmix-fold the band's components into a bucket id
          h ^= mh(i)
          h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
          h ^= h >>> 27
          i += 1
        }
        (b.toLong, h, doc.docId, mh)
      }
      }
    }

    fanout
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Long, Long), it: Iterator[(Long, Long, Long, Array[Long])],
         state: GroupState[BucketState]) => {
          var ids = state.getOption.map(_.ids).getOrElse(Array.empty[Long])
          var sigs = state.getOption.map(_.sigs).getOrElse(Array.empty[Long])
          val out = Vector.newBuilder[NearDupCand]
          it.foreach { case (_, _, docId, mh) =>
            var j = 0
            while (j < ids.length) {
              if (ids(j) != docId) {
                var eq = 0
                var i = 0
                while (i < N) { if (sigs(j * N + i) == mh(i)) eq += 1; i += 1 }
                if (eq >= minAgree) {
                  out += NearDupCand(math.min(ids(j), docId), math.max(ids(j), docId), eq)
                }
              }
              j += 1
            }
            // append, evicting oldest beyond the bucket cap
            if (ids.length >= maxPerBucket) {
              ids = ids.drop(1); sigs = sigs.drop(N)
            }
            ids = ids :+ docId
            sigs = sigs ++ mh
          }
          state.update(BucketState(ids, sigs))
          out.result().iterator
        })
  }
}
