package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe deterministic sequence numbering.
  *
  * `row_number().over(Window.orderBy(...))` with no partitioning is correct
  * but funnels the entire input through a single task — dead at 100 TB.
  * `sequenceBy` produces the identical numbering in two phases:
  *
  *   1. range-partition by the order key (total order across partitions,
  *      equal keys co-located), rank locally per partition;
  *   2. compute per-partition row counts (numParts rows — tiny), prefix-sum
  *      them on the driver-sized side, broadcast back as offsets.
  *
  * The only global structure is the numParts-row offset table. Used for
  * surrogate-key assignment (SURVEY.md Q8/E1–E4): the reference's SERIAL
  * PKs (populate_db_ru_v1.py:162-167) become first-seen row numbers.
  */
object Ids {

  /** Append `idCol` = 1-based rank of each row under the total order
    * `order` (which must be a total order — include a unique tiebreaker).
    */
  def sequenceBy(df: DataFrame, order: Seq[Column], idCol: String, numParts: Int = 32): DataFrame = {
    val parted = df.repartitionByRange(numParts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__local",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*)))
    // numParts rows: the exclusive prefix sum of partition sizes.
    val offsets = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(idCol, col("__off") + col("__local"))
      .drop("__pid", "__local", "__off")
  }
}
