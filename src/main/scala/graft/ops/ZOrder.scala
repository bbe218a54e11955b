package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) clustering for write layout — the
  * multi-dimensional counterpart of sorting before write. A linear sort
  * gives perfect data-skipping on ONE column and none on the others;
  * interleaving the bits of several columns' normalized ranks gives every
  * participating column file-level min/max ranges ~globalRange /
  * files^(1/d), so predicates on ANY of them prune files (the layout
  * behind Delta/Iceberg OPTIMIZE ZORDER — at 100 TB, pruning is the
  * difference between scanning a partition and scanning a corpus).
  *
  * The z-value here is a pure Column expression tree (shifts/ands/ors —
  * whole-stage-codegen'd, no UDF): each column is min/max-normalized to a
  * `bitsPerCol`-bit rank in one bounded aggregation pass (2 scalars per
  * column collected, never data), and ranks are bit-interleaved
  * round-robin, highest bits first.
  */
object ZOrder {

  /** Bit-interleave of pre-quantized non-negative ranks (round-robin,
    * MSB first): rank i's bit (bits-1-j) lands at z-bit
    * (bits-1-j)*n + (n-1-i). Constant-size expression tree of
    * bits*n shift/or terms — fine for the <= 63 bits a LongType holds. */
  private[graft] def interleave(ranks: Seq[Column], bitsPerCol: Int): Column = {
    val n = ranks.size
    ranks.zipWithIndex.flatMap { case (r, i) =>
      (0 until bitsPerCol).map { j =>
        // source bit j of rank i -> target bit j*n + (n-1-i)
        shiftleft(shiftright(r, j).bitwiseAND(lit(1L)), j * n + (n - 1 - i))
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Z-value column over `cols` given their (min, max) stats. Each column
    * is scaled to [0, 2^bitsPerCol) — constant columns (min == max) rank
    * 0; a null cell ranks top (both engines' `least` skips nulls), so
    * null-heavy rows cluster together at the curve's end. */
  private[graft] def zValue(cols: Seq[Column], mins: Seq[Double],
      maxs: Seq[Double], bitsPerCol: Int): Column = {
    val top = (1L << bitsPerCol) - 1
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val span = maxs(i) - mins(i)
      if (span <= 0) lit(0L)
      else least(lit(top),
        ((c.cast(DoubleType) - mins(i)) / span * top).cast(LongType))
    }
    interleave(ranks, bitsPerCol)
  }

  /** `df` plus a `__z` column holding the z-value of `cols`. One extra
    * aggregation job computes the per-column min/max (2 scalars per
    * column — bounded, never data). */
  private[graft] def withZ(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 8, "need 1..8 z-order columns")
    val bitsPerCol = math.min(16, 63 / cols.size)
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast(DoubleType)).as(s"mn_$c"),
      max(col(c).cast(DoubleType)).as(s"mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = cols.indices.map(i => rowDouble(stats, 2 * i))
    val maxs = cols.indices.map(i => rowDouble(stats, 2 * i + 1))
    df.withColumn("__z", zValue(cols.map(col), mins, maxs, bitsPerCol))
  }

  /** Cluster `df` by the z-order of `cols` (numeric or castable to
    * numeric) into ~`files` output slices: range-shuffle on the z-value,
    * sort within slices, return the clustered frame ready to write. */
  def cluster(df: DataFrame, cols: Seq[String], files: Int): DataFrame = {
    require(files > 0, "need files > 0")
    withZ(df, cols)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  private def rowDouble(r: org.apache.spark.sql.Row, i: Int): Double =
    if (r.isNullAt(i)) 0.0 else r.getDouble(i)

  /** [[cluster]] + parquet write. */
  def writeZOrdered(df: DataFrame, dir: String, cols: Seq[String],
      files: Int = 64): Unit =
    cluster(df, cols, files).write.mode("overwrite").parquet(dir)

  /** Driver-gated form: the per-row z-value over (n_chars, doc_id) of
    * `documents`, hash-compared against a DuckDB reimplementation of the
    * same normalize-and-interleave arithmetic. The rank math is exact
    * cross-engine: ranks are floor((c-min)/span*top) of integer-valued
    * doubles (both engines compute the identical IEEE double, and Spark's
    * double→long cast truncates like floor for the non-negative operand),
    * and the interleave is disjoint-bit shifts, so + == | term-by-term. */
  def queries: Seq[Q] = Seq(
    Q("d24_zorder",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
        .transform(withZ(_, Seq("n_chars", "doc_id")))
        .select(col("doc_id"), col("__z").as("z")),
      Some {
        val bits = 16
        val top = (1L << bits) - 1
        // rank i's bit j lands at z-bit j*2 + (1-i): ra (n_chars) high, rb low
        val terms = (0 until bits).flatMap(j => Seq(
          s"(((ra >> $j) & 1) << ${2 * j + 1})",
          s"(((rb >> $j) & 1) << ${2 * j})"))
        s"""WITH st AS (
           |  SELECT min(CAST(n_chars AS DOUBLE)) AS mn_a, max(CAST(n_chars AS DOUBLE)) AS mx_a,
           |         min(CAST(doc_id  AS DOUBLE)) AS mn_b, max(CAST(doc_id  AS DOUBLE)) AS mx_b
           |  FROM documents),
           |rk AS (
           |  SELECT doc_id,
           |    CASE WHEN mx_a > mn_a THEN least($top, CAST(floor(((CAST(n_chars AS DOUBLE) - mn_a) / (mx_a - mn_a)) * $top) AS BIGINT)) ELSE 0 END AS ra,
           |    CASE WHEN mx_b > mn_b THEN least($top, CAST(floor(((CAST(doc_id  AS DOUBLE) - mn_b) / (mx_b - mn_b)) * $top) AS BIGINT)) ELSE 0 END AS rb
           |  FROM documents, st)
           |SELECT doc_id, ${terms.mkString(" + ")} AS z FROM rk""".stripMargin
      })
  )
}
