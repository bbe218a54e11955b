package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scale-safe deterministic sequence numbering.
  *
  * `row_number().over(Window.orderBy(...))` with no partitioning is correct
  * but funnels the entire input through a single task — dead at 100 TB.
  * `sequenceBy` produces the identical numbering without a single-task
  * stage: range-partition by the order key (total order across partitions,
  * 1 shuffle), sort within partitions, then `RDD.zipWithIndex`, whose
  * per-partition count job and data job run over the SAME shuffle stage —
  * the map output is materialized once and reused, so the numbering is
  * consistent and deterministic.
  *
  * (A previous version computed per-partition offsets from a second
  * aggregation branch over `spark_partition_id()`; the two physical
  * branches each re-executed the range exchange, whose sampled bounds can
  * differ between executions — producing duplicate ids. `zipWithIndex`
  * shares one exchange by construction.)
  *
  * Used for surrogate-key assignment (SURVEY.md Q8/E1–E4): the reference's
  * SERIAL PKs (populate_db_ru_v1.py:162-167) become first-seen row numbers.
  */
object Ids {

  /** Append `idCol` = 1-based rank of each row under the total order
    * `order` (which must be a total order — include a unique tiebreaker).
    */
  def sequenceBy(df: DataFrame, order: Seq[Column], idCol: String, numParts: Int = 32): DataFrame = {
    val sorted = df.repartitionByRange(numParts, order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rowRdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rowRdd, schema)
  }
}
