package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._
import graft.api.Graft
import graft.ops.Tables

/** The quantizer's contract is arithmetic, so the spec checks the math:
  * codes live in 0..255, the round trip reconstructs within half a
  * quantization step per element, constant vectors survive the hi = lo
  * edge, and quantized exact retrieval stays near the float result
  * (top-1 agreement) — the end-to-end claim d41 hash-gates.
  */
class QuantizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("quantize-spec")
  private val sf = "/root/testdata/sf0.001"
  override def afterAll(): Unit = spark.stop()

  private def vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))

  test("codes are bounded 0..255 and every vector round-trips within half a step") {
    val q = Graft.quantizeInt8(vecs).cache()
    val codeBounds = q.select(
      min(array_min(col("codes"))).as("lo"), max(array_max(col("codes"))).as("hi"))
      .head()
    assert(codeBounds.getInt(0) >= 0 && codeBounds.getInt(1) <= 255)

    // worst per-element |x - recon| over the corpus, relative to each
    // vector's step size (hi - lo)/255: must be <= 1/2 everywhere
    val recon = Graft.dequantize(q).withColumnRenamed("embedding", "r")
    val worst = vecs
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .join(recon, "vec_id")
      .join(q.select(col("vec_id"), ((col("hi") - col("lo")) / 255.0).as("step")), "vec_id")
      .select(expr("aggregate(zip_with(v, r, (a, b) -> abs(a - b)), 0D, (m, e) -> greatest(m, e))")
        .divide(col("step")).as("rel"))
      .agg(max(col("rel"))).head().getDouble(0)
    assert(worst <= 0.5 + 1e-9, s"worst relative reconstruction error $worst > 0.5 steps")
  }

  test("constant vectors (hi = lo) quantize to zero codes and reconstruct exactly") {
    import spark.implicits._
    val const = Seq((1L, Array(0.25f, 0.25f, 0.25f)), (2L, Array(-3f, -3f, -3f)))
      .toDF("vec_id", "embedding")
    val q = Graft.quantizeInt8(const)
    assert(q.select(array_max(col("codes"))).collect().forall(_.getInt(0) == 0))
    val recon = Graft.dequantize(q).as[(Long, Array[Double])].collect().toMap
    assert(recon(1L).toSeq == Seq(0.25, 0.25, 0.25) && recon(2L).toSeq == Seq(-3.0, -3.0, -3.0))
  }

  test("quantized exact retrieval agrees with float retrieval on top-1") {
    val exact = Graft.cosineTopK(vecs).where(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id").as("e"))
    val quantized = Graft.cosineTopK(Graft.dequantize(Graft.quantizeInt8(vecs)))
      .where(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id").as("q"))
    val joined = exact.join(quantized, "vec_id").cache()
    val n = joined.count()
    val agree = joined.where(col("e") === col("q")).count()
    assert(n > 0)
    val rate = agree.toDouble / n
    assert(rate >= 0.95, s"quantized top-1 agreement $rate < 0.95 over $n queries")
  }
}
