package graft

import java.nio.file.{Files, Paths}
import java.util.Locale

/** Benchmark main. Runs every registered query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line on stdout (driver contract) plus the same JSON to
  * bench.json (belt-and-braces: the stdout line can get interleaved with
  * sbt log noise — BENCH_r01 recorded "parsed": null for that reason).
  *
  * Each query is executed with a noop-format write so the full plan runs
  * (a bare .count() lets Catalyst prune computed projections and
  * under-measures select-heavy queries). Failures are NOT swallowed into
  * fast timings: a failed query records -1 and is listed in "errors".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench")

    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.registered.map { q =>
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
          errors += q.name
      }
      val sec = (System.nanoTime() - t0) / 1e9
      q.name -> (if (errors.lastOption.contains(q.name)) -1.0 else sec)
    }

    def f(d: Double): String = "%.3f".formatLocal(Locale.ROOT, d)
    val qs = results.map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
    val errs = errors.map(e => s""""$e"""").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench.json"), json + "\n")
    // single atomic stdout write so log interleaving can't split the line
    System.out.println(json)
    System.out.flush()
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
