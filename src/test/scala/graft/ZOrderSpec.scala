package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._

import graft.ops.ZOrder

/** Z-order clustered layout: interleaved-bit correctness and the property
  * that makes it worth shipping — per-FILE min/max ranges stay narrow on
  * EVERY participating column, where a linear sort leaves all but the
  * first column at full range (no skipping possible).
  */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("zorder-spec")
  override def afterAll(): Unit = spark.stop()

  test("interleave: known bit patterns") {
    import spark.implicits._
    // x = 0b11, y = 0b01, 2 bits: z bits (MSB first) x1 y1 x0 y0 = 1 1 0 1... wait
    // layout: source bit j of rank i -> target j*n + (n-1-i); n=2
    // x(i=0): bit0 -> 1, bit1 -> 3;  y(i=1): bit0 -> 0, bit1 -> 2
    // x=0b11, y=0b01 -> z = (1<<1)|(1<<3) | (1<<0) = 0b1011 = 11
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 2).as("z"))
      .head().getLong(0)
    assert(z == 11L)
  }

  test("cluster: rows preserved exactly, deterministic") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, (i * 37 % 1000).toLong)).toDF("x", "y")
    val out = ZOrder.cluster(df, Seq("x", "y"), files = 8)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    assert(out.columns.toSeq == Seq("x", "y")) // helper column dropped
  }

  test("z-ordered files bound per-file span on BOTH columns; linear sort cannot") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = Seq.fill(20000)((rng.nextInt(1024).toLong, rng.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-spec").toString
    ZOrder.writeZOrdered(df, s"$dir/z", Seq("x", "y"), files = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    def spans(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))

    val zSpans = spans(s"$dir/z")
    val linSpans = spans(s"$dir/linear")
    assert(zSpans.length >= 8) // actually produced multiple files
    // z-order: files are narrow on BOTH dims — ideal 16-file tiling of a
    // 2-D grid is quarter-range tiles. Files straddling a z-quadrant
    // transition get a full-range bounding box on one dim (the z-curve
    // has one main-diagonal jump per recursion level), so the honest
    // claim is: the mean span is tile-sized and at most 2 of 16 files
    // are wide — vs EVERY file wide for the linear layout.
    def avg(xs: Array[Long]) = xs.sum.toDouble / xs.length
    assert(avg(zSpans.map(_._1)) <= 500 && avg(zSpans.map(_._2)) <= 500,
      zSpans.mkString(","))
    assert(zSpans.count { case (sx, sy) => sx >= 900 || sy >= 900 } <= 2,
      zSpans.mkString(","))
    // linear sort: x is narrow but y spans ~the full range in every file
    assert(linSpans.forall { case (sx, _) => sx <= 200 })
    assert(linSpans.forall { case (_, sy) => sy >= 900 })
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("end-to-end: a selective predicate on the NON-sort column prunes z-ordered row groups") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val rng = new scala.util.Random(13)
    val df = Seq.fill(20000)((rng.nextInt(1024).toLong, rng.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-prune").toString
    ZOrder.writeZOrdered(df, s"$dir/z", Seq("x", "y"), files = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    // the user-visible effect: read each layout's parquet FOOTERS (the
    // row-group min/max stats a scan consults) and count the row groups a
    // reader skips for `y BETWEEN lo AND hi` — exactly the stats-based
    // pruning parquet readers and table formats perform
    val conf = spark.sessionState.newHadoopConf()
    def rowGroups(path: String, column: String): Seq[(Long, Long)] = {
      new java.io.File(path).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet"))
        .flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            reader.getFooter.getBlocks.asScala.toSeq.map { block =>
              val st = block.getColumns.asScala
                .find(_.getPath.toDotString == column).get.getStatistics
              (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
            }
          } finally reader.close()
        }
    }
    val (lo, hi) = (100L, 163L) // ~6% of the y domain
    def prunedFraction(path: String): Double = {
      val rgs = rowGroups(path, "y")
      assert(rgs.nonEmpty)
      rgs.count { case (mn, mx) => mx < lo || mn > hi }.toDouble / rgs.size
    }
    val zPruned = prunedFraction(s"$dir/z")
    val linPruned = prunedFraction(s"$dir/linear")
    info(f"row groups skipped for y in [$lo,$hi]: z-order $zPruned%.2f, linear $linPruned%.2f")
    // linear layout: every file spans ~all of y -> nothing prunes;
    // z-order: y-bands narrow per tile -> most row groups skip
    assert(linPruned == 0.0, s"linear layout unexpectedly pruned $linPruned")
    assert(zPruned >= 0.4, s"z-order pruned only $zPruned")
    assert(zPruned > linPruned)
    // both layouts return identical rows for the predicate (pruning is
    // metadata-only, never a correctness trade)
    val zRows = spark.read.parquet(s"$dir/z").where(col("y").between(lo, hi)).count()
    val linRows = spark.read.parquet(s"$dir/linear").where(col("y").between(lo, hi)).count()
    assert(zRows == linRows)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
