package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.text.RuText

/** Typed UDAF (SURVEY.md Q18): value of the first row under a total order
  * — the set-oriented form of the reference's "first raw spelling by
  * document order" semantics (get-or-create keeps the first-seen value,
  * populate_db_ru_v1.py:240-245). Merge-safe partial aggregation: each
  * buffer carries (minKey, value-at-minKey), so map-side combine works.
  */
class FirstByOrder extends Aggregator[(String, Long), (Long, String), String] {
  override def zero: (Long, String) = (Long.MaxValue, null)
  override def reduce(b: (Long, String), a: (String, Long)): (Long, String) =
    if (a._2 < b._1) (a._2, a._1) else b
  override def merge(x: (Long, String), y: (Long, String)): (Long, String) =
    if (x._1 <= y._1) x else y
  override def finish(r: (Long, String)): String = r._2
  override def bufferEncoder: Encoder[(Long, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** The engine's SQL-visible scalar function surface (SURVEY.md Q18/F1–F4):
  * the reference's text functions (populate_db_ru_v1.py:38-89 standardize,
  * :253-262 clean_number, :264-302 inspector canonicalization) registered
  * as Spark SQL UDFs, plus the oracle-tested queries that exercise them.
  */
object Functions {

  /** Idempotent; call once per session (Sessions.build does).
    *
    * standardize_text / clean_number / canonical_inspector_name are
    * injected as native codegen'd expressions by graft.plans
    * .GraftExtensions; registering same-named UDFs here would shadow
    * them, so only the remaining scalar (unescape_html) is a UDF. It
    * decodes via MiniDom.unescapeEntities (Python html.unescape
    * semantics incl. numeric refs — commons-text unescapeHtml4 misses
    * &apos;/HTML5 names).
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("unescape_html", (s: String) => graft.parse.MiniDom.unescapeEntities(s))
    spark.udf.register("first_by_order", udaf(new FirstByOrder))
  }

  def queries: Seq[Q] = Seq(

    // Q18: a registered scalar UDF used from SQL. clean_number has no
    // thousands separators to strip in this column, so the DuckDB oracle's
    // plain digit-extraction is semantically identical on this data.
    Q("q26_udf_clean_number",
      (s, d) => {
        register(s)
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderkey, clean_number(o_orderpriority) AS prio_num
                 FROM orders_v""")
      },
      Some("""SELECT o_orderkey,
             |CAST(nullif(regexp_replace(o_orderpriority, '[^0-9]', '', 'g'), '') AS INT) AS prio_num
             |FROM orders""".stripMargin)),

    // Q18 UDAF surface: the typed Aggregator from SQL, checked against
    // DuckDB's built-in min_by (identical first-under-total-order
    // semantics).
    Q("q28_typed_udaf",
      (s, d) => {
        register(s)
        Tables.customer(s, d).createOrReplaceTempView("customer_v")
        s.sql("""SELECT c_nationkey, first_by_order(c_name, c_custkey) AS first_name,
                 count(*) AS n_customers
                 FROM customer_v GROUP BY c_nationkey""")
      },
      Some("""SELECT c_nationkey, min_by(c_name, c_custkey) AS first_name,
             |count(*) AS n_customers
             |FROM customer GROUP BY c_nationkey""".stripMargin)),

    // Skew-safe distinct aggregation: COUNT(DISTINCT key) over a
    // low-cardinality group column would funnel each group through one
    // task if done naively; the two-phase form (distinct on the full
    // composite key — shuffle spread over BOTH columns — then a tiny
    // count per group) has no skewed shuffle. Same result, same oracle.
    Q("q29_skew_safe_distinct",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.select(col("l_returnflag"), col("l_partkey"))
          .distinct() // phase 1: shuffle keyed by (flag, partkey) — no hot key
          .groupBy(col("l_returnflag")) // phase 2: tiny per-group counts
          .agg(count(lit(1)).as("n_parts"))
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Salted join for hot-key skew: the small side is replicated across 8
    // salt values, the large side picks a DETERMINISTIC salt from another
    // column, and the join key becomes (key, salt) — a single hot product
    // key now spreads over 8 reducers instead of one. Result identical to
    // the plain join, which is exactly what the oracle runs.
    Q("q30_salted_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("salt", pmod(col("l_orderkey"), lit(8)).cast("int"))
        val salts = Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"),
            explode(sequence(lit(0), lit(7))).as("salt"))
        li.join(salts,
            li("l_partkey") === salts("p_partkey") && li("salt") === salts("salt"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_items"), Tables.decSum(col("l_quantity")).as("total_qty"))
      },
      Some("""SELECT p_brand, count(*) AS n_items,
             |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand""".stripMargin)),

    // Q20: sampling for inspection. Bernoulli sampling is engine-specific
    // (Spark's XORShiftRandom stream), so there is no cross-engine oracle —
    // the driver records the weaker rows-only check, which is the point of
    // the operator (cheap approximate inspection, not exact results).
    Q("q27_sample",
      (s, d) =>
        Tables.part(s, d)
          .sample(withReplacement = false, fraction = 0.1, seed = 42)
          .select(col("p_partkey"), col("p_name"), col("p_type")),
      None)
  )
}
