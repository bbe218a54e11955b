package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._

import graft.ops.IvfIndex

/** IvfIndex persistence contract: a saved+loaded index answers queries
  * identically to the in-memory model, and the inverted file lands
  * cell-partitioned so probes prune to their partitions.
  */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("ivf-index-spec")
  private val sf = "/root/testdata/sf0.001"
  override def afterAll(): Unit = spark.stop()

  test("save/load round-trip answers identically; cells are partitioned by cell") {
    import spark.implicits._
    val e = graft.ops.Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val model = IvfIndex.build(spark, e, k = 8, iters = 2)
    val direct = IvfIndex.search(spark, model, e, probes = 2)
      .as[(Long, Long, Double)].collect().toSet

    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.save(model, dir)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.centroids.length == 8)
    assert(loaded.centroids.zip(model.centroids).forall { case (a, b) => a.sameElements(b) })
    val viaDisk = IvfIndex.search(spark, loaded, e, probes = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaDisk == direct)

    // partition layout: ingest_batch=B/cell=N directories (partition
    // pruning on probes; batch level for idempotent incremental writes)
    val batchDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("ingest_batch="))
    assert(batchDirs.nonEmpty, "inverted file is not batch-partitioned")
    val cellDirs = batchDirs.head.listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "inverted file is not cell-partitioned")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("build is bit-deterministic under any partitioning and row order") {
    // the determinism contract build()'s scaladoc declares: seeds are
    // id-ordered, Lloyd accumulates fixed-point LONGS (integer addition
    // is order-independent where double addition is not), means divide
    // exact operands, ties break by lowest cell — so the trained
    // quantizer must be BIT-identical across partition counts, split
    // plans, and row orders. This is what lets the same corpus train
    // the same index on 10 executors or 1000, and what makes d17
    // golden-gateable.
    import spark.implicits._
    val e = graft.ops.Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
    def cents(df: org.apache.spark.sql.DataFrame): Seq[Seq[Double]] =
      IvfIndex.build(spark, df, k = 8, iters = 3).centroids.toSeq.map(_.toSeq)
    val base = cents(e)
    assert(cents(e.repartition(3)) == base, "3-partition build differs")
    assert(cents(e.repartition(17)) == base, "17-partition build differs")
    assert(cents(e.orderBy(col("vec_id").desc)) == base,
      "reversed row order differs")
  }

  test("searchTopK at probes = K equals the exact cosine top-k") {
    import spark.implicits._
    // with every cell probed the candidate set is the whole corpus, so
    // the IVF ranking must reproduce the exact baseline row-for-row —
    // schema-compatible by design (vec_id, rank, neighbor_id). Scope:
    // this corpus has no zero-norm vectors; on one that does, the ANN
    // family excludes them (design) while the exact baseline ranks
    // their NaN cosine greatest — see the searchTopK scaladoc
    val vecs = graft.ops.Tables.embeddings(spark, sf)
    val e = vecs.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val model = IvfIndex.build(spark, e, k = 8, iters = 2)
    val ivf = IvfIndex.searchTopK(spark, model, e, k = 3, probes = 8)
      .as[(Long, Long, Long)].collect().toSet
    val exact = graft.ops.Similarity.cosineTopK(vecs, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(ivf == exact)
    // restricted probes: rank-1 agrees with search()'s best neighbor
    val top1 = IvfIndex.searchTopK(spark, model, e, k = 3, probes = 2)
      .where(col("rank") === 1)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    val best = IvfIndex.search(spark, model, e, probes = 2)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._2).toMap
    assert(top1 == best)
  }

  test("k = 0 derives ~sqrt(N) cells; explicit k is honored") {
    import graft.ops.IvfIndex.autoK
    assert(autoK(0L, 8) == 1)
    assert(autoK(100L, 8) == 10)
    assert(autoK(1000000L, 8) == 1000)
    assert(autoK(1L << 40, 8) == 65536) // row cap at small dims
    val e = graft.ops.Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val n = e.count()
    val dim = 8
    val auto = IvfIndex.build(spark, e, iters = 1)
    assert(auto.centroids.length == autoK(n, dim), s"n=$n -> ${auto.centroids.length}")
    val explicit = IvfIndex.build(spark, e, k = 5, iters = 1)
    assert(explicit.centroids.length == 5)
  }

  test("incremental add: fixed quantizer, in-memory and on-disk appends answer identically") {
    import spark.implicits._
    val e = graft.ops.Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val half = e.where(col("vec_id") % 2 === 0)
    val rest = e.where(col("vec_id") % 2 === 1)
    val base = IvfIndex.build(spark, half, k = 8, iters = 2)

    // in-memory union path
    val grown = IvfIndex.add(spark, base, rest)
    assert(grown.centroids.zip(base.centroids).forall { case (a, b) => a.sameElements(b) })
    assert(grown.cells.count() == e.count())
    val inMem = IvfIndex.search(spark, grown, e, probes = 3)
      .as[(Long, Long, Double)].collect().toSet
    // added vectors are both queryable and findable as neighbors
    assert(inMem.exists(_._2 % 2 == 1))
    assert(inMem.map(_._1).size == inMem.size)

    // on-disk append path: only new rows land, existing partitions stay
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-add").toString
    IvfIndex.save(base, dir)
    IvfIndex.appendSaved(spark, dir, rest)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.cells.count() == e.count())
    val viaDisk = IvfIndex.search(spark, loaded, e, probes = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaDisk == inMem)

    // re-running the append's batch id (crash replay) must replace its
    // partitions, not double them; disjointness guard refuses a re-add
    IvfIndex.appendSaved(spark, dir, rest) // batch id 1 — a second append
    val twice = IvfIndex.load(spark, dir)
    assert(twice.cells.count() == e.count() + rest.count()) // contract: caller's burden
    val refused = intercept[IllegalArgumentException] {
      IvfIndex.appendSaved(spark, dir, rest, checkDisjoint = true)
    }
    assert(refused.getMessage.contains("double-count"))

    // interrupted write -> load fails closed
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_graft_commit"))
    val e2 = intercept[IllegalArgumentException] { IvfIndex.load(spark, dir) }
    assert(e2.getMessage.contains("_graft_commit"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("streaming ingest assigns micro-batches to the saved quantizer (exactly-once)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = graft.ops.Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val half = e.where(col("vec_id") % 2 === 0)
    val rest = e.where(col("vec_id") % 2 === 1)
      .as[(Long, Array[Double])].collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-ckpt").toString
    IvfIndex.save(IvfIndex.build(spark, half, k = 8, iters = 2), dir)

    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Double])]
    val q = graft.api.Graft.ivfIngest(spark, in.toDF().toDF("vec_id", "v"), dir, ckpt)
    try {
      val (b1, b2) = rest.partition(_._1 % 4 == 1)
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.cells.count() == e.count())
    // streamed rows were assigned with the same fixed quantizer -> search
    // equals the batch-appended index's answers
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ivf-batch").toString
    IvfIndex.save(IvfIndex.build(spark, half, k = 8, iters = 2), dir2)
    IvfIndex.appendSaved(spark, dir2,
      e.where(col("vec_id") % 2 === 1))
    val viaStream = IvfIndex.search(spark, loaded, e, probes = 3)
      .as[(Long, Long, Double)].collect().toSet
    val viaBatch = IvfIndex.search(spark, IvfIndex.load(spark, dir2), e, probes = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaStream == viaBatch)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir2))
  }

  test("centroid cap is byte-budgeted by dimensionality, not a flat row count") {
    import graft.ops.IvfIndex.{autoK, CentroidBudgetBytes}
    val huge = 1L << 40
    // at dim 8192, 65536 centroids would be 4 GB of driver heap; the
    // derived cap keeps the collect at <= 256 MB = 4096 cells
    assert(autoK(huge, 8192) == (CentroidBudgetBytes / (8192L * 8)).toInt)
    assert(autoK(huge, 8192) == 4096)
    // monotone: wider vectors, fewer cells; never below 1
    assert(autoK(huge, 1 << 26) == 1)
    // an explicit k over the budget fails fast instead of OOMing mid-Lloyd
    import spark.implicits._
    val wide = Seq((1L, Array.fill(8192)(0.5)), (2L, Array.fill(8192)(0.7)))
      .toDF("vec_id", "v")
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.build(spark, wide, k = 65536, iters = 1)
    }
    assert(ex.getMessage.contains("centroid budget"))
  }
}
