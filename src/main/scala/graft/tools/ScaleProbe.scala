package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-rung-up scale probe (r13 verdict ask #6): run the round's five
  * heaviest registered queries at sf≈1 — ten key-shifted copies of the
  * driver's sf0.1 tables — and commit the wall times, so the 2× bench
  * gate's ~12× headroom at sf0.1 is shown to be STRUCTURAL (plans whose
  * cost moves ~linearly with the data) rather than a coincidence of the
  * gated scale. Correctness is NOT probed here (the sf0.01 oracle gate
  * owns that); this is purely a does-the-plan-survive-10× measurement.
  *
  * The synthetic sf1: each copy k shifts every join key by k·OFFSET
  * (orderkeys, part/supp/cust keys, doc ids) so the relational joins
  * and graphs scale to 10× the keys/edges/nodes instead of multiplying
  * weights onto the same keys (which would probe skew, not volume).
  * Offsets are EVEN so the EdgeIndex driver binding's even/odd basket
  * split stays balanced. Document TEXT is per-copy `translate`d over
  * ten common letters (rotation k) — length, whitespace and token
  * counts are preserved, but shingles/tokens differ across copies, so
  * the dedup stages keep their within-copy near-dup structure instead
  * of degenerating into uniform 10-clique duplicate groups (which
  * would probe a pathological-input shape, not scale — bucket fan-out
  * there is quadratic BY THE DATA'S construction).
  *
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.ScaleProbe"
  *
  * Emits one JSON line (and bench_sf1_probe.json) with per-query cold
  * seconds plus the generation cost and loadavg bracketing.
  */
object ScaleProbe {

  private val ProbeQueries = Seq(
    "d54_training_shards",
    "d139_personalized_pagerank",
    "d160_edge_index",
    "d145_hits",
    "d128_pagerank",
    // the temporal family rung (r14 verdict forward item #4): d182
    // pays the in-run index build (split save+append over the probe's
    // 10× basket frame) plus the decayed serve; d186 then reuses the
    // memoized index dir, so its number isolates the warm-start
    // two-phase PageRank over the served edges.
    "d182_decayed_indexed",
    "d186_decayed_pagerank_warm",
    // the ANN-served related-items path (d171's production sibling):
    // the exact baseline is N² BY SEMANTICS (≈100× pairs at 10× nodes
    // — deliberately NOT probed); this rung shows the served path the
    // 100 TB story actually runs stays near-linear (trainer chain +
    // IVF probed-cell candidates, probes·√N per query).
    "d187_embedding_related_ann")

  private val Letters = "etaoinshrd" // 10 common letters; rotation k per copy

  private def loadavg(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  private def generate(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    val ORD = 10000000L
    val KEY = 1000000L
    val DOC = 10000000L
    def shifted(df: DataFrame, k: Int, shifts: (String, Long)*): DataFrame =
      shifts.foldLeft(df) { case (d, (c, off)) =>
        d.withColumn(c, col(c) + lit(k * off)) }
    def union(frames: Seq[DataFrame]): DataFrame = frames.reduce(_ union _)

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    union((0 until copies).map(k => shifted(li, k,
        "l_orderkey" -> ORD, "l_partkey" -> KEY, "l_suppkey" -> KEY)))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")

    val ord = spark.read.parquet(s"$src/orders.parquet")
    union((0 until copies).map(k => shifted(ord, k,
        "o_orderkey" -> ORD, "o_custkey" -> KEY)))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    union((0 until copies).map { k =>
      val rot = Letters.drop(k % Letters.length) + Letters.take(k % Letters.length)
      shifted(docs, k, "doc_id" -> DOC)
        .withColumn("text", translate(col("text"), Letters, rot))
    }).write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/_generated_$copies"), "ok\n")
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.Sessions.build("graft-scale-probe")
    val loadPre = loadavg()

    val t0 = System.nanoTime()
    val marker = java.nio.file.Paths.get(s"$out/_generated_$copies")
    if (!java.nio.file.Files.exists(marker)) generate(spark, src, out, copies)
    val genSec = (System.nanoTime() - t0) / 1e9

    val qmap = graft.SparkEntry.queries
    def f(d: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val timed = ProbeQueries.map { n =>
      val t = System.nanoTime()
      val sec =
        try {
          qmap(n)(spark, out).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[probe] $n FAILED: ${e.getMessage}")
            -1.0
        }
      System.err.println(f"[probe] $n ${sec}%.1f s")
      n -> sec
    }
    val json =
      s"""{"metric":"sf1_probe","copies":$copies,"src":"$src","gen_sec":${f(genSec)},""" +
        s""""queries":{${timed.map { case (k, v) => s""""$k":${f(v)}""" }.mkString(",")}},""" +
        s""""loadavg_pre":${f(loadPre)},"loadavg_post":${f(loadavg())}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_sf1_probe.json"), json + "\n")
    System.out.println(json)
    spark.stop()
  }
}
