package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Operational diagnostics over keyed data — the "will this shuffle
  * fall over" pre-flight a 100 TB job runs BEFORE keying a join or
  * aggregation on a column. The engine's own skew mitigations (salting
  * in q30, AQE skew splitting) need this report to decide when to
  * engage.
  */
object Diagnostics {

  /** Key-skew report (d131): one exact-integer summary row describing
    * the per-key row-count distribution of `keyCol` — row/key totals,
    * min/max, exact p50/p90/p99 of the per-key counts, and the mass
    * share (parts-per-million, integer) of the heaviest key and the
    * heaviest ten. A top1_share near 1e6/partitions says "this key
    * alone fills a partition: salt it".
    *
    * Percentile semantics: the per-key counts sorted ascending, value
    * at 0-based index (p·(n_keys−1)) div 100 — the "lower" method, pure
    * integer selection, identical in any engine.
    *
    * Scale: the per-key count is the only corpus-width shuffle
    * (map-side partial-aggregated). Percentiles come from the
    * count-of-counts frame — #rows = #distinct count VALUES, which
    * collapses the key dimension (a billion keys with Zipfian counts
    * yield only O(thousands) distinct counts, and can't exceed
    * O(√(2·n_rows)) distinct values summing to n_rows) — so the one
    * window in the plan orders that bounded frame, never the keys.
    * Top-10 is a TakeOrdered (per-partition heap, never a global
    * sort). */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      min(col("cnt")).as("min_cnt"),
      max(col("cnt")).as("max_cnt"))
    // count-of-counts: how many keys share each count value, cumulated
    // in ascending count order (the frame is distinct-count-value sized)
    val cc = counts.groupBy(col("cnt")).agg(count(lit(1)).as("k"))
      .withColumn("cum", sum(col("k")).over(
        Window.orderBy(col("cnt")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def pctl(p: Int): Column =
      min(when(col("cum") >= expr(s"$p * (n_keys - 1) div 100") + 1, col("cnt")))
        .as(s"p${p}_cnt")
    val pcts = cc.crossJoin(broadcast(totals.select(col("n_keys"))))
      .agg(pctl(50), pctl(90), pctl(99))
    val top10 = counts.orderBy(col("cnt").desc, col("key")).limit(10)
      .agg(sum(col("cnt")).as("top10_rows"))
    broadcast(totals).crossJoin(broadcast(pcts)).crossJoin(broadcast(top10))
      .select(col("n_rows"), col("n_keys"), col("min_cnt"), col("max_cnt"),
        col("p50_cnt"), col("p90_cnt"), col("p99_cnt"),
        expr("max_cnt * 1000000 div n_rows").as("top1_share_ppm"),
        expr("top10_rows * 1000000 div n_rows").as("top10_share_ppm"))
  }

  def queries: Seq[Q] = Seq(

    // d131: skew report on lineitem's supplier key — all exact longs;
    // the oracle replays the same index-selection percentiles naively
    // (row_number over keys — fine for an oracle, not for the engine).
    Q("d131_skew_report",
      (s, d) => keySkewReport(lineitem(s, d), "l_suppkey"),
      Some("""WITH c AS (
             |  SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS cnt
             |  FROM lineitem GROUP BY 1),
             |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             |             CAST(count(*) AS BIGINT) AS n_keys,
             |             min(cnt) AS min_cnt, max(cnt) AS max_cnt FROM c),
             |o AS (SELECT cnt, row_number() OVER (ORDER BY cnt) - 1 AS i FROM c),
             |p AS (SELECT min(CASE WHEN i >= (50 * (n.n_keys - 1)) // 100 THEN cnt END) AS p50_cnt,
             |             min(CASE WHEN i >= (90 * (n.n_keys - 1)) // 100 THEN cnt END) AS p90_cnt,
             |             min(CASE WHEN i >= (99 * (n.n_keys - 1)) // 100 THEN cnt END) AS p99_cnt
             |      FROM o CROSS JOIN n),
             |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS top10_rows
             |      FROM (SELECT cnt FROM c ORDER BY cnt DESC, key LIMIT 10))
             |SELECT n.n_rows, n.n_keys, n.min_cnt, n.max_cnt,
             |       p.p50_cnt, p.p90_cnt, p.p99_cnt,
             |       n.max_cnt * 1000000 // n.n_rows AS top1_share_ppm,
             |       t.top10_rows * 1000000 // n.n_rows AS top10_share_ppm
             |FROM n CROSS JOIN p CROSS JOIN t""".stripMargin)))
}
