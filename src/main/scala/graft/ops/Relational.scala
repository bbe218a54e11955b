package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** One registered query: Spark implementation + (optionally) the ANSI SQL
  * the DuckDB oracle runs over the same parquet tables. Column names and
  * value representations are kept bit-identical between the two sides
  * (see Tables.decSum for the numeric strategy).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The relational operator surface of SURVEY.md §2B (Q1–Q20), one
  * oracle-tested query per operator family, expressed Spark-first:
  * declarative DataFrame plans, broadcast hints where the dimension side
  * is small, decimal-exact aggregation for oracle parity.
  */
object Relational {

  private def rev(li: DataFrame): Column =
    dec2(li("l_extendedprice")) * (lit(BigDecimal(1)).cast(DecimalType(18, 2)) - dec2(li("l_discount")))

  def queries: Seq[Q] = Seq(

    Q("q01_pricing_summary",
      (s, d) => {
        // Exact decimal semantics on the long fast path: the money/measure
        // columns carry <= 2 decimal digits (Tables.dec2's contract), so
        // x*100 is an exact integer ("cents") and every sum is exact long
        // arithmetic inside whole-stage codegen — no BigDecimal per row.
        // The final /100.0 (and /10000.0 for the cents*cents product) is a
        // single correctly-rounded double division of an exact integer,
        // which is bit-identical to DuckDB's CAST(DECIMAL-sum AS DOUBLE):
        // both produce the nearest double to the same exact rational.
        def cents(c: Column): Column = round(c * 100).cast(LongType)
        val li = lineitem(s, d)
        // COUNT(DISTINCT) is split out of the main aggregate: mixed
        // distinct aggregation plans an Expand (2x the input rows through
        // every buffer); a separate distinct->count joined back on the 25
        // tiny groups is one narrow pre-aggregated shuffle instead.
        val dist = li.select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"))
          .distinct()
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_orders"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n_rows"),
            (sum(cents(col("l_quantity"))).cast(DoubleType) / 100.0).as("sum_qty"),
            (sum(cents(col("l_extendedprice"))).cast(DoubleType) / 100.0).as("sum_price"),
            // the per-row product fits a long (~1e9) but its SUM does not
            // at full scale (~1.5e11 rows/group x 1e9 >> 2^63): widen the
            // accumulator to decimal(38,0) — one decimal add per row, the
            // per-row arithmetic stays long
            (sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
                .cast(DecimalType(38, 0)))
              .cast(DoubleType) / 10000.0).as("sum_disc_price"),
            ((sum(cents(col("l_extendedprice"))).cast(DoubleType) / 100.0) / count(lit(1)))
              .as("avg_price"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"))
          .join(dist, Seq("l_returnflag", "l_linestatus"))
          .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
            col("sum_qty"), col("sum_price"), col("sum_disc_price"), col("avg_price"),
            col("n_orders"), col("min_qty"), col("max_qty"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |count(*) AS n_rows,
             |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
             |count(DISTINCT l_orderkey) AS n_orders,
             |min(l_quantity) AS min_qty,
             |max(l_quantity) AS max_qty
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // Q1/Q2: projection + predicate pushdown to parquet; per-row double
    // arithmetic (IEEE-deterministic, no aggregation).
    Q("q02_filter_projection",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_discount"),
            (col("l_extendedprice") * col("l_discount")).as("disc_revenue")),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
             |l_extendedprice * l_discount AS disc_revenue
             |FROM lineitem
             |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // Q3: broadcast hash join over the dim chain supplier→nation→region.
    Q("q03_broadcast_join_agg",
      (s, d) => {
        val sup = supplier(s, d)
        val n = nation(s, d)
        val r = region(s, d)
        sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_suppliers"),
            decSum(col("s_acctbal")).as("total_bal"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_suppliers,
             |CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name""".stripMargin)),

    // Q4: shuffle (sort-merge / AQE-selected) equi-join fact↔dim.
    Q("q04_shuffle_join_agg",
      (s, d) => {
        val o = orders(s, d)
        val c = customer(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_orders"),
            decSum(col("o_totalprice")).as("total_price"),
            countDistinct(col("c_custkey")).as("n_customers"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
             |count(DISTINCT c_custkey) AS n_customers
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // Q5: left-semi join (EXISTS).
    Q("q05_semi_join",
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin)),

    // Q5: left-anti join (NOT EXISTS) — customers with no pending order.
    Q("q06_anti_join",
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin)),

    // Q16: when/otherwise, coalesce, nullif.
    Q("q07_conditional_null",
      (s, d) =>
        customer(s, d).select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high").as("bal_tier"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_or_other")),
      Some("""SELECT c_custkey,
             |CASE WHEN c_acctbal < 0 THEN 'negative'
             |     WHEN c_acctbal < 5000 THEN 'low'
             |     ELSE 'high' END AS bal_tier,
             |coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other
             |FROM customer""".stripMargin)),

    // Q7: dedup / DISTINCT.
    Q("q08_distinct_pairs",
      (s, d) => customer(s, d).select(col("c_nationkey"), col("c_mktsegment")).distinct(),
      Some("SELECT DISTINCT c_nationkey, c_mktsegment FROM customer")),

    // Q8: deterministic surrogate keys over a total order. A bare
    // Window.orderBy row_number funnels the whole table through one task;
    // Ids.sequenceBy is the scale-safe two-phase equivalent (range
    // partition → local rank → broadcast offsets).
    Q("q09_surrogate_rank",
      (s, d) =>
        Ids.sequenceBy(
            customer(s, d).select(col("c_custkey"), col("c_acctbal")),
            Seq(col("c_acctbal").desc, col("c_custkey")), "rk")
          .withColumn("rk", col("rk").cast(IntegerType)),
      Some("""SELECT c_custkey, c_acctbal,
             |CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rk
             |FROM customer""".stripMargin)),

    // Q10: rollup over the region→nation hierarchy.
    Q("q10_rollup_region",
      (s, d) => {
        val sup = supplier(s, d)
        val n = nation(s, d)
        val r = region(s, d)
        sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_suppliers"), decSum(col("s_acctbal")).as("total_bal"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_suppliers,
             |CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP(r_name, n_name)""".stripMargin)),

    // Q10: cube.
    Q("q11_cube_segments",
      (s, d) =>
        customer(s, d)
          .cube(col("c_mktsegment"), col("c_nationkey"))
          .agg(count(lit(1)).as("n_customers"), decSum(col("c_acctbal")).as("total_bal")),
      Some("""SELECT c_mktsegment, c_nationkey, count(*) AS n_customers,
             |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)""".stripMargin)),

    // Q11: window analytics — row_number, lag, running sum over frames.
    Q("q12_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        orders(s, d).select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          sum(dec2(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType).as("running_spend"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |CAST(row_number() OVER w AS INT) AS rn,
             |lag(o_totalprice, 1) OVER w AS prev_price,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // Q12: top-k with deterministic tie-break.
    Q("q13_topk_parts",
      (s, d) => {
        val li = lineitem(s, d)
        li.groupBy(col("l_partkey"))
          .agg(sum(rev(li)).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("l_partkey"))
          .limit(10)
      },
      Some("""SELECT l_partkey,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM lineitem GROUP BY l_partkey
             |ORDER BY revenue DESC, l_partkey LIMIT 10""".stripMargin)),

    // Q13: set operations — symmetric difference with provenance tag.
    Q("q14_set_ops",
      (s, d) => {
        val c = customer(s, d)
        val a = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        val b = c.filter(col("c_acctbal") > 9000).select(col("c_custkey"))
        a.except(b).withColumn("op", lit("only_auto"))
          .union(b.except(a).withColumn("op", lit("only_rich")))
          .union(a.intersect(b).withColumn("op", lit("both")))
      },
      Some("""SELECT c_custkey, 'only_auto' AS op FROM
             |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
             |   EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
             |UNION ALL
             |SELECT c_custkey, 'only_rich' AS op FROM
             |  (SELECT c_custkey FROM customer WHERE c_acctbal > 9000
             |   EXCEPT SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
             |UNION ALL
             |SELECT c_custkey, 'both' AS op FROM
             |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
             |   INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 9000)""".stripMargin)),

    // Q14: explode / lateral with position.
    Q("q15_explode_words",
      (s, d) =>
        part(s, d)
          .select(col("p_partkey"), posexplode(split(col("p_type"), " ")).as(Seq("pos", "word"))),
      Some("""SELECT p_partkey,
             |CAST(unnest(range(len(string_split(p_type, ' ')))) AS INT) AS pos,
             |unnest(string_split(p_type, ' ')) AS word
             |FROM part""".stripMargin)),

    // Q15: string function battery.
    Q("q16_string_funcs",
      (s, d) =>
        part(s, d).select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lc"),
          substring(col("p_type"), 1, 5).as("type5"),
          length(col("p_name")).cast(LongType).as("name_len"),
          regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          trim(upper(col("p_brand"))).as("brand_uc")),
      Some("""SELECT p_partkey, lower(p_name) AS name_lc,
             |substring(p_type, 1, 5) AS type5,
             |length(p_name) AS name_len,
             |regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
             |p_brand || ':' || p_type AS brand_type,
             |trim(upper(p_brand)) AS brand_uc
             |FROM part""".stripMargin)),

    // Q17: date part extraction + aggregation.
    Q("q17_date_parts",
      (s, d) =>
        orders(s, d)
          .groupBy(
            year(col("o_orderdate")).cast(LongType).as("o_year"),
            month(col("o_orderdate")).cast(LongType).as("o_month"))
          .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total_price")),
      Some("""SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             |EXTRACT(month FROM o_orderdate) AS o_month,
             |count(*) AS n_orders,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
             |FROM orders GROUP BY 1, 2""".stripMargin)),

    // Q19: pivot.
    Q("q18_pivot_status",
      (s, d) => {
        val o = orders(s, d)
        val c = customer(s, d)
        val n = nation(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .pivot("o_orderstatus", Seq("O", "F", "P"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("O", "F", "P"))
      },
      Some("""SELECT n_name,
             |count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
             |count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
             |count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)),

    // Q2/Q3: null-safe (<=>) join.
    Q("q19_nullsafe_join",
      (s, d) => {
        val c = customer(s, d)
        val a = c.groupBy(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
          .agg(count(lit(1)).as("n_all"))
        val b = c.filter(col("c_acctbal") > 0)
          .groupBy(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
          .agg(count(lit(1)).as("n_pos"))
        a.join(b, a("seg") <=> b("seg"), "left")
          .select(a("seg"), col("n_all"), col("n_pos"))
      },
      Some("""WITH a AS (SELECT nullif(c_mktsegment,'BUILDING') AS seg, count(*) AS n_all
             |            FROM customer GROUP BY 1),
             |     b AS (SELECT nullif(c_mktsegment,'BUILDING') AS seg, count(*) AS n_pos
             |            FROM customer WHERE c_acctbal > 0 GROUP BY 1)
             |SELECT a.seg, n_all, n_pos FROM a
             |LEFT JOIN b ON a.seg IS NOT DISTINCT FROM b.seg""".stripMargin)),

    // Q6: range (theta) join against a tiny broadcast bucket table.
    Q("q20_range_join",
      (s, d) => {
        val buckets = s.createDataFrame(Seq(
          (0.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 1e9, "high")))
          .toDF("lo", "hi", "bucket")
        val li = lineitem(s, d)
        li.join(broadcast(buckets), li("l_quantity") >= col("lo") && li("l_quantity") < col("hi"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"), decSum(col("l_extendedprice")).as("total_price"))
      },
      Some("""SELECT bucket, count(*) AS n_rows,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
             |FROM lineitem JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'), (25.0, 1e9, 'high'))
             |  AS buckets(lo, hi, bucket)
             |ON l_quantity >= lo AND l_quantity < hi
             |GROUP BY bucket""".stripMargin)),

    // Q6/Q11: as-of join — for each purchase, the latest click at-or-before
    // it by the same user. Implemented scalably as union + segmented window
    // fill (single shuffle, no row-at-a-time correlated lookup).
    Q("q21_asof_join",
      (s, d) => {
        val ev = events(s, d)
        // dedupe clicks to one per (user, µs) so the as-of pick is total-ordered
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max(col("event_id")).as("click_id"), max_by(col("value"), col("event_id")).as("click_value"))
          .select(col("user_id"), col("ts_us"), lit(0).as("tag"),
            struct(col("click_id"), col("click_value")).as("click"),
            lit(null).cast(LongType).as("purchase_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"), lit(1).as("tag"),
            lit(null).cast("struct<click_id:bigint,click_value:double>").as("click"),
            col("event_id").as("purchase_id"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("tag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.union(purchases)
          .withColumn("last_click", last(col("click"), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(
            col("purchase_id"), col("user_id"),
            col("last_click.click_id").as("click_id"),
            col("last_click.click_value").as("click_value"))
      },
      Some("""WITH clicks AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_id,
             |         max_by(value, event_id) AS click_value
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
             |purchases AS (
             |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ts_us
             |  FROM events WHERE event_type = 'purchase')
             |SELECT purchase_id, p.user_id, c.click_id, c.click_value
             |FROM purchases p ASOF LEFT JOIN clicks c
             |ON p.user_id = c.user_id AND c.ts_us <= p.ts_us""".stripMargin)),

    // Q9/Q15: event-time tumbling window (batch form), hour buckets in µs.
    // ts_us - pmod(ts_us, N) == floor-division bucketing, matching DuckDB's
    // `//` even for pre-1970 (negative) timestamps (`div` truncates to 0).
    Q("q22_event_hourly",
      (s, d) =>
        events(s, d)
          .groupBy(
            (col("ts_us") - pmod(col("ts_us"), lit(3600000000L))).as("hour_us"),
            col("event_type"))
          .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("total_value")),
      Some("""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us, event_type,
             |count(*) AS n_events,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Q11: sessionization — 30-minute inactivity gap, lag + indicator sum.
    Q("q23_sessionize",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        events(s, d)
          .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
          .groupBy(col("user_id"))
          .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some("""WITH g AS (
             |  SELECT user_id,
             |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events)
             |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
             |FROM g GROUP BY user_id""".stripMargin)),

    // Q15/semi-structured: JSON extraction from the events props column.
    Q("q24_json_extract",
      (s, d) =>
        events(s, d)
          .groupBy(get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .agg(count(lit(1)).as("n"), decSum(col("value")).as("total_value")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |count(*) AS n,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1""".stripMargin)),

    // Q3+Q9: multi-way star join (fact + 4 dims), the classic reporting shape.
    Q("q25_star_join",
      (s, d) => {
        // Revenue partial-aggregates per order BEFORE the fact join (4x
        // fewer join rows, and the decimal-exact arithmetic runs as long
        // "cents" with a decimal(38,0) accumulator — see q01); the
        // distinct customer count is split out of the main aggregate to
        // avoid the mixed-distinct Expand, then joined back on the 35
        // result groups.
        def cents(c: Column): Column = round(c * 100).cast(LongType)
        val li = lineitem(s, d)
        val o = orders(s, d)
        val c = customer(s, d)
        val n = nation(s, d)
        val r = region(s, d)
        val liAgg = li.groupBy(col("l_orderkey"))
          .agg(sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .cast(DecimalType(38, 0))).as("rev_c"))
        val joined = liAgg.join(o, col("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("r_name"), year(col("o_orderdate")).cast(LongType).as("o_year"),
            col("rev_c"), col("c_custkey"))
        val base = joined.groupBy(col("r_name"), col("o_year"))
          .agg((sum(col("rev_c")).cast(DoubleType) / 10000.0).as("revenue"))
        val dist = joined.select(col("r_name"), col("o_year"), col("c_custkey"))
          .distinct()
          .groupBy(col("r_name"), col("o_year"))
          .agg(count(lit(1)).as("n_customers"))
        base.join(dist, Seq("r_name", "o_year"))
          .select(col("r_name"), col("o_year"), col("revenue"), col("n_customers"))
      },
      Some("""SELECT r_name, EXTRACT(year FROM o_orderdate) AS o_year,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |count(DISTINCT c_custkey) AS n_customers
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, EXTRACT(year FROM o_orderdate)""".stripMargin))
  )
}
