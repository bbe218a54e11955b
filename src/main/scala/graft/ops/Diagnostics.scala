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

  /** Generic table profile (d138): one row per requested column —
    * row count, null count, exact distinct count, and (for numeric
    * columns) min/max as doubles — the first thing a pipeline author
    * asks of an unfamiliar 100 TB table, and the input to partition
    * -count / broadcast-threshold / skew decisions (d131's sibling:
    * d131 profiles one KEY in depth, this profiles every COLUMN in
    * breadth).
    *
    * Scale: one aggregation pass. Multiple exact distinct counts in a
    * single agg plan through Spark's Expand — each input row is
    * replicated once per distinct-aggregate (here |cols|), which is the
    * documented price of EXACT profiling; a 100 TB caller trades
    * exactness for one pass by swapping `countDistinct` for
    * `approx_count_distinct` (HLL, one replica) — the oracle contract
    * is why the registered query keeps the exact form. Min/max/null
    * counts partial-aggregate map-side; the stack() unpivot runs on the
    * single 1-row result. */
  def tableProfile(df: DataFrame, colNames: Seq[String]): DataFrame = {
    require(colNames.nonEmpty, "profile at least one column")
    // Resolve requested names against the actual schema up front —
    // case-insensitively unless spark.sql.caseSensitive is on, matching
    // what column resolution in a query would do — so a typo fails with
    // a clear message instead of a bare NoSuchElementException. The
    // resolved StructField's own spelling is used from here on, and no
    // user-supplied name is ever interpolated into SQL text (aliases are
    // positional, the unpivot is explode-of-structs), so names holding
    // backticks, quotes, or dots profile like any other.
    val caseSensitive = df.sparkSession.sessionState.conf.caseSensitiveAnalysis
    val fields = colNames.map { c =>
      val hits = df.schema.fields.filter(f =>
        if (caseSensitive) f.name == c else f.name.equalsIgnoreCase(c))
      require(hits.length == 1,
        s"tableProfile: column '$c' ${if (hits.isEmpty) "not found" else "is ambiguous"}" +
          s" in schema ${df.schema.fieldNames.mkString("[", ", ", "]")}")
      hits.head
    }
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      // backtick-quote the resolved name (inner backticks doubled) so the
      // attribute reference is exact — df(name) would re-PARSE the name
      // and choke on a stray backtick or treat a dot as nesting
      val c = df.col("`" + f.name.replace("`", "``") + "`")
      Seq(sum(when(c.isNull, 1L).otherwise(0L)).as(s"c${i}__nulls"),
        countDistinct(c).as(s"c${i}__nd")) ++
        (if (f.dataType.isInstanceOf[NumericType])
          Seq(min(c).cast(DoubleType).as(s"c${i}__mn"),
            max(c).cast(DoubleType).as(s"c${i}__mx"))
        else
          Seq(lit(null).cast(DoubleType).as(s"c${i}__mn"),
            lit(null).cast(DoubleType).as(s"c${i}__mx")))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = fields.zipWithIndex.map { case (f, i) =>
      struct(lit(f.name).as("col_name"), col(s"c${i}__nulls").as("n_nulls"),
        col(s"c${i}__nd").as("n_distinct"), col(s"c${i}__mn").as("min_num"),
        col(s"c${i}__mx").as("max_num"))
    }
    row.select(col("n_rows"), explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("n_rows"),
        col("e.n_nulls").as("n_nulls"), col("e.n_distinct").as("n_distinct"),
        col("e.min_num").as("min_num"), col("e.max_num").as("max_num"))
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
             |FROM n CROSS JOIN p CROSS JOIN t""".stripMargin)),

    // d138: breadth-first profile of six lineitem columns (two keys, a
    // measure, two low-cardinality flags, a timestamp) — the oracle is
    // the same four aggregates spelled per column.
    Q("d138_table_profile",
      (s, d) => tableProfile(lineitem(s, d),
        Seq("l_orderkey", "l_suppkey", "l_quantity",
          "l_returnflag", "l_linestatus", "l_shipdate")),
      Some(Seq(("l_orderkey", true), ("l_suppkey", true), ("l_quantity", true),
          ("l_returnflag", false), ("l_linestatus", false), ("l_shipdate", false))
        .map { case (c, num) =>
          val mn = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          val mx = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  $mn AS min_num, $mx AS max_num
             |FROM lineitem""".stripMargin
        }.mkString("\nUNION ALL\n")))
  )
}
