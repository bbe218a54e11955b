package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._
import graft.ops.IndexCommit

/** Unit coverage for the atomic serving-snapshot protocol
  * ([[IndexCommit.publishSnapshot]] / [[IndexCommit.currentSnapshotDir]]
  * — r15 advice: the streaming trending consumer previously refreshed
  * its serving table with a plain overwrite, deleting the directory
  * under concurrent readers). The streaming consumers' end-to-end use
  * is gated in TemporalEdgeIndexSpec; this spec pins the protocol
  * itself: fail-closed before the first publish, pointer swap on each
  * publish, the previous generation retained exactly one publish for
  * in-flight readers, older generations GC'd, and a crashed publish
  * (generation written, pointer not swapped) leaving the old complete
  * generation serving until a later publish GCs the orphan. */
class SnapshotPublishSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("snapshot-publish-spec")
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("snappub").toString + "/snap"

  private def df(v: Long) = {
    import spark.implicits._
    Seq((1L, v)).toDF("k", "v")
  }

  private def served(root: String): Long = {
    import spark.implicits._
    spark.read.parquet(IndexCommit.currentSnapshotDir(spark, root))
      .select(col("v")).as[Long].collect().head
  }

  private def gens(root: String): Seq[String] =
    new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName).toSeq.sorted

  test("fails closed before the first publish") {
    val root = tmp()
    val err = intercept[IllegalArgumentException] {
      IndexCommit.currentSnapshotDir(spark, root)
    }
    assert(err.getMessage.contains("no _graft_current"))
  }

  test("publish swaps the pointer; the previous generation survives one publish; older GC'd") {
    val root = tmp()
    IndexCommit.publishSnapshot(df(1L), root, batchId = 0L)
    assert(served(root) == 1L)
    assert(gens(root).size == 1)
    val g1 = gens(root)
    IndexCommit.publishSnapshot(df(2L), root, batchId = 1L)
    assert(served(root) == 2L)
    // generation 0 retained for in-flight readers of the old pointer
    assert(gens(root).size == 2 && gens(root).intersect(g1) == g1)
    IndexCommit.publishSnapshot(df(3L), root, batchId = 2L)
    assert(served(root) == 3L)
    // generation 0 is now two publishes old — GC'd; 1 and 2 remain
    assert(gens(root).size == 2 && gens(root).intersect(g1).isEmpty)
  }

  test("a crashed publish (generation written, pointer not swapped) leaves the old snapshot serving; a later publish GCs the orphan") {
    val root = tmp()
    IndexCommit.publishSnapshot(df(1L), root, batchId = 0L)
    // simulate the crash window: a fresh generation lands on disk but
    // the pointer swap never happened
    val orphan = s"$root/gen-99-0"
    df(99L).write.parquet(orphan)
    assert(served(root) == 1L) // readers still see the complete old one
    // the replayed batch publishes a NEW generation (new nonce — never
    // rewriting a dir a reader might hold) and GCs the orphan
    IndexCommit.publishSnapshot(df(2L), root, batchId = 99L)
    assert(served(root) == 2L)
    assert(!new java.io.File(orphan).exists())
  }

  test("republishing the same batch id is safe: a new nonce directory, never an in-place rewrite") {
    val root = tmp()
    IndexCommit.publishSnapshot(df(1L), root, batchId = 5L)
    val g1 = IndexCommit.currentSnapshotName(spark, root).get
    IndexCommit.publishSnapshot(df(1L), root, batchId = 5L)
    val g2 = IndexCommit.currentSnapshotName(spark, root).get
    assert(g1 != g2, "a replayed publish must land in a fresh generation dir")
    assert(served(root) == 1L)
  }

  test("publishing to a non-atomic-rename store is refused before any write") {
    // r16 verdict ask #5: the pointer swap is atomic on HDFS/POSIX
    // rename but NOT on object stores (copy+delete) — a racing reader
    // there could observe a missing/partial pointer. The refusal names
    // the opt-in conf and fires before any filesystem access (no s3a
    // connector is present here, so reaching the FS would throw a
    // different, unnamed error).
    val e = intercept[IllegalArgumentException] {
      IndexCommit.publishSnapshot(df(1L), "s3a://bucket/serving", 0L)
    }
    assert(e.getMessage.contains("not atomic") &&
      e.getMessage.contains("allowNonAtomicRename"))
  }

  test("retainMillis keeps generations younger than the floor past the one-publish grace") {
    // r16 advice: with fast micro-batches and a slow downstream scan,
    // two publishes can complete inside one read — the age floor keeps
    // every generation younger than retainMillis so such a reader
    // never loses files mid-scan.
    val root = tmp()
    IndexCommit.publishSnapshot(df(1L), root, 0L, retainMillis = 3600000L)
    IndexCommit.publishSnapshot(df(2L), root, 1L, retainMillis = 3600000L)
    IndexCommit.publishSnapshot(df(3L), root, 2L, retainMillis = 3600000L)
    IndexCommit.publishSnapshot(df(4L), root, 3L, retainMillis = 3600000L)
    assert(served(root) == 4L)
    assert(gens(root).size == 4, s"all young generations retained: ${gens(root)}")
    // with the floor off, the next publish GCs everything but itself
    // and its immediate predecessor
    IndexCommit.publishSnapshot(df(5L), root, 4L)
    assert(served(root) == 5L)
    assert(gens(root).size == 2, s"floor off => one-publish grace: ${gens(root)}")
  }

  test("retainMillis measures from SUPERSESSION, not directory creation (r17 advice)") {
    // The slow-reader/fast-micro-batch race: a generation that served
    // as the live pointer for LONGER than retainMillis and is then
    // superseded by two quick publishes. Age-from-creation (the r17
    // implementation) deleted it at the second publish — a reader that
    // resolved the pointer just before the first publish lost its
    // files mid-scan, inside the documented retainMillis window. The
    // clock must start when the pointer swaps OFF the generation.
    val root = tmp()
    val retain = 3600000L // 1 h — "old by creation" is simulated below
    IndexCommit.publishSnapshot(df(1L), root, 0L, retainMillis = retain)
    val g1 = s"$root/${IndexCommit.currentSnapshotName(spark, root).get}"
    // simulate a long serving life: backdate the generation directory
    // (and its files) well past retainMillis
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = java.lang.System.currentTimeMillis() - 2 * retain
    fs.setTimes(new org.apache.hadoop.fs.Path(g1), old, old)
    // two quick publishes: g1 becomes prev, then neither current nor prev
    IndexCommit.publishSnapshot(df(2L), root, 1L, retainMillis = retain)
    IndexCommit.publishSnapshot(df(3L), root, 2L, retainMillis = retain)
    assert(new java.io.File(g1).exists(),
      "a generation superseded moments ago must survive retainMillis " +
        "regardless of how long it previously served")
    // and the clock does expire: backdate the supersession stamp itself,
    // then the next publish GCs g1
    val stamp = new org.apache.hadoop.fs.Path(g1, IndexCommit.SupersededAtMarker)
    assert(fs.exists(stamp), "the pointer swap must stamp the superseded generation")
    fs.setTimes(stamp, old, old)
    IndexCommit.publishSnapshot(df(4L), root, 3L, retainMillis = retain)
    assert(!new java.io.File(g1).exists(),
      "a generation whose supersession stamp aged past retainMillis is GC'd")
  }
}
