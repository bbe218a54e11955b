package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.Linkage

/** Planted-fixture coverage for d130 blocked fuzzy linkage: match and
  * tie-break semantics, the lossless length-band join (pairs crossing a
  * band boundary are still found, each seen once), the deterministic
  * occupancy cap's exact-below/graceful-above behavior, and
  * single-evaluation of the Levenshtein comparator in the plan.
  */
class LinkageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("linkage-spec")
  override def afterAll(): Unit = spark.stop()

  private def recs(rs: (Long, String)*) = {
    import spark.implicits._
    rs.toDF("rec_id", "name")
  }

  private def run(df: org.apache.spark.sql.DataFrame, maxDist: Int = 3,
      blockCap: Int = 1024): Map[Long, (Option[Long], Option[Long])] = {
    import spark.implicits._
    Linkage.bestMatches(df, maxDist, blockCap)
      .as[(Long, String, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
  }

  test("planted typos: within-maxDist pairs match, far names and lonely blocks don't") {
    val got = run(recs(
      1L -> "fuzzy green apple",
      2L -> "fuzzi green apple",       // dist 1 from #1
      3L -> "totally different apple", // same block, > 3 edits from both
      4L -> "lonely pear"))            // no block mate
    assert(got(1L) == (Some(2L), Some(1L)))
    assert(got(2L) == (Some(1L), Some(1L)))
    assert(got(3L) == (None, None))
    assert(got(4L) == (None, None))
  }

  test("tie-break: equal distances resolve to the lowest candidate id") {
    val got = run(recs(10L -> "aa corn", 11L -> "ab corn", 12L -> "ac corn"))
    assert(got(10L) == (Some(11L), Some(1L))) // 11 and 12 both dist 1 -> lower id
    assert(got(11L) == (Some(10L), Some(1L)))
    assert(got(12L) == (Some(10L), Some(1L)))
  }

  test("band join is lossless across a band boundary and duplicates no pair") {
    // lengths 7 and 8 straddle the div-4 band edge (band 1 vs band 2)
    val got = run(recs(1L -> "aa corn", 2L -> "aaa corn"))
    assert(got(1L) == (Some(2L), Some(1L)))
    assert(got(2L) == (Some(1L), Some(1L)))
    // dist encodes a MIN over candidates; a duplicated pair could not
    // change it, so duplication is checked structurally instead: the
    // candidate frame holds each (probe, candidate) pair exactly once
    import org.apache.spark.sql.functions._
    val r = recs(1L -> "aa corn", 2L -> "aaa corn", 3L -> "ab corn")
    val cand = {
      val w = 4
      val base = r
        .withColumn("blk", lower(regexp_extract(col("name"), "([^ ]+)$", 1)))
        .withColumn("band", expr(s"length(name) div $w"))
      val b = base.select(col("rec_id").as("b_id"), col("blk"), col("band"))
      base.select(col("rec_id"), col("blk"),
          explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"))
        .join(b, Seq("blk", "band"))
        .where(col("rec_id") =!= col("b_id"))
    }
    val pairs = cand.groupBy(col("rec_id"), col("b_id")).count()
      .where(col("count") > 1).count()
    assert(pairs == 0L, "a (probe, candidate) pair materialized in more than one band")
  }

  test("occupancy cap: exact below the cap, graceful degradation above it") {
    val cell = recs(20L -> "pa dog", 21L -> "pb dog", 22L -> "pc dog")
    // cap not binding -> exact: everyone matches the lowest-id dist-1 peer
    val exact = run(cell)
    assert(exact(20L) == (Some(21L), Some(1L)))
    assert(exact(21L) == (Some(20L), Some(1L)))
    assert(exact(22L) == (Some(20L), Some(1L)))
    // cap 1: only id 20 survives as a candidate; 21/22 still probe and
    // find it, 20 itself has no remaining candidate
    val capped = run(cell, blockCap = 1)
    assert(capped(20L) == (None, None))
    assert(capped(21L) == (Some(20L), Some(1L)))
    assert(capped(22L) == (Some(20L), Some(1L)))
  }

  test("distances beyond maxDist never match, and maxDist is honored per call") {
    val pair = recs(1L -> "abcde corn", 2L -> "vwxyz corn") // dist 5
    assert(run(pair)(1L) == (None, None))
    assert(run(pair, maxDist = 5)(1L) == (Some(2L), Some(5L)))
  }

  test("the optimized plan evaluates levenshtein exactly once") {
    val plan = Linkage.bestMatches(recs(1L -> "aa corn", 2L -> "ab corn"))
      .queryExecution.optimizedPlan.toString
    val n = "levenshtein".r.findAllIn(plan).size
    assert(n == 1, s"expected a single levenshtein evaluation, found $n:\n$plan")
  }
}
