package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Fuzzy record linkage — the blocked pairwise-matching operator behind
  * entity resolution, catalog reconciliation, and dirty-dimension
  * cleanup. The reference resolves dimensions by EXACT canonical keys
  * (SURVEY.md §2A E1–E4, `populate_db_ru_v1.py` get-or-create); this is
  * the approximate sibling a 100 TB warehouse needs when keys are typed
  * by humans.
  *
  * The scale discipline is the same as the dedup family's: NEVER score
  * all pairs. Candidates only materialize inside a block (cheap
  * deterministic key both records share), are pruned by the length band
  * the edit-distance bound implies (|len(a) − len(b)| > maxDist can
  * never match — the PPJoin-style filter, applied before the expensive
  * comparator), and only then pay the O(len²) Levenshtein. The best
  * match per record is an integer-encoded argmin, so the result is
  * deterministic and oracle-replayable.
  */
object Linkage {

  /** Encoding base for the (dist, id) argmin: dist·1e12 + id is a single
    * long, exact while ids stay below 1e12 and dist below ~9e6. */
  private val IdBase = 1000000000000L

  /** Best fuzzy match per record (d130). In: (rec_id, name). Out: one
    * row per input record — (rec_id, name, match_id, match_dist), with
    * NULLs where no other record matches within maxDist edits.
    *
    * Match = the candidate with minimal (edit distance, rec_id); ties
    * break on the lower id, so the output is a pure function of the
    * input set. Blocking key: the last whitespace token, lower-cased —
    * swap in a phonetic or q-gram blocker for other domains; the shape
    * (equi-join on the block key) is what matters at scale.
    *
    * Scale: one equi-join keyed on the block (pairs exist only within a
    * block — block sizes are the quadratic term, so a production caller
    * salts or caps runaway blocks the same way the LSH family caps
    * buckets), the length-band prune before Levenshtein, then one
    * rec-keyed min and a broadcast-friendly join back to the records
    * frame. No sort, no window, no driver state. */
  def bestMatches(records: DataFrame, maxDist: Int = 3): DataFrame = {
    val r = records.toDF("rec_id", "name")
      .withColumn("blk", lower(regexp_extract(col("name"), "([^ ]+)$", 1)))
    val a = r.select(col("rec_id"), col("name"), col("blk"))
    val b = r.select(col("rec_id").as("b_id"), col("name").as("b_name"), col("blk"))
    val best = a.join(b, Seq("blk"))
      .where(col("rec_id") =!= col("b_id") &&
        abs(length(col("name")) - length(col("b_name"))) <= maxDist &&
        levenshtein(col("name"), col("b_name")) <= maxDist)
      .groupBy(col("rec_id"))
      .agg(min(levenshtein(col("name"), col("b_name")).cast(LongType) * IdBase
        + col("b_id")).as("enc"))
    r.select(col("rec_id"), col("name"))
      .join(best, Seq("rec_id"), "left")
      .select(col("rec_id"), col("name"),
        (col("enc") % IdBase).as("match_id"),
        expr(s"enc div ${IdBase}L").as("match_dist"))
  }

  def queries: Seq[Q] = Seq(

    // d130: blocked fuzzy linkage over part names — exact integer
    // distances; the oracle replays block, band, Levenshtein, and the
    // encoded argmin identically (both engines use unit-cost edits).
    Q("d130_record_linkage",
      (s, d) => bestMatches(part(s, d).select(col("p_partkey"), col("p_name"))),
      Some("""WITH r AS (
             |  SELECT p_partkey AS rec_id, p_name AS name,
             |         lower(regexp_extract(p_name, '([^ ]+)$', 1)) AS blk
             |  FROM part),
             |best AS (
             |  SELECT a.rec_id,
             |         CAST(min(levenshtein(a.name, b.name) * 1000000000000 + b.rec_id) AS BIGINT) AS enc
             |  FROM r a JOIN r b ON a.blk = b.blk AND a.rec_id <> b.rec_id
             |  WHERE abs(length(a.name) - length(b.name)) <= 3
             |    AND levenshtein(a.name, b.name) <= 3
             |  GROUP BY 1)
             |SELECT r.rec_id, r.name,
             |       best.enc % 1000000000000 AS match_id,
             |       best.enc // 1000000000000 AS match_dist
             |FROM r LEFT JOIN best USING (rec_id)""".stripMargin)))
}
