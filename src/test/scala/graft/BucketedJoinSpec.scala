package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins: pre-bucketing both sides on the join key
  * lets the sort-merge join run with NO exchange — the shuffle is paid
  * once at write time, which is the 100 TB pattern for repeatedly-joined
  * fact tables (SURVEY §2 "Partitioning & shuffle").
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("bucketed-join-spec")
  override def afterAll(): Unit = spark.stop()

  test("join of two bucketed tables has no Exchange in the plan") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    val sf = "/root/testdata/sf0.001"
    graft.ops.Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    graft.ops.Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucket-pruned SMJ: the only exchange allowed is for the final tiny
    // aggregation, never on the join keys
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    val expected = graft.ops.Tables.lineitem(spark, sf)
      .join(graft.ops.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val actual = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(actual.keySet == expected.keySet)
    actual.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-6) }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
