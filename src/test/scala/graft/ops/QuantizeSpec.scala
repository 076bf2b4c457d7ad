package graft.ops

import graft.SparkSpec
import graft.sources.Tables

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: known values, clamp, and zero-vector exclusion") {
    val vecs = Seq(
      (1L, Seq(1.0, -0.5, 0.25, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val out = Quantize.int8(vecs, "vec_id", "embedding")
      .as[(Long, Int, Int, Double)].collect()
    assert(!out.exists(_._1 == 2L), "zero vectors have no scale")
    val d = out.filter(_._1 == 1L).map(r => r._2 -> (r._3, r._4)).toMap
    // scale = 127: q = 127, round(-63.5) = -64 (half away from zero),
    // round(31.75) = 32, 0
    assert(d(0)._1 == 127 && d(0)._2 == 0.0, "max element is exact")
    assert(d(1)._1 == -64)
    assert(d(2)._1 == 32)
    assert(math.abs(d(2)._2 - 0.001969) < 1e-6)
    assert(d(3)._1 == 0 && d(3)._2 == 0.0)
  }

  test("int8 quantization bounds hold over the real embeddings") {
    val e = Tables(spark, sf, "embeddings")
    val out = Quantize.int8(e, "vec_id", "embedding")
      .as[(Long, Int, Int, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._3 >= -127 && r._3 <= 127), "q out of range")
    // per-element reconstruction error is at most half a quantization
    // step: 0.5/scale = maxabs/254, and maxabs <= array max |x| <= ...
    // bound it per vector via the observed max |q/scale - x|
    val maxAbs = e.select($"vec_id",
      org.apache.spark.sql.functions.array_max(
        org.apache.spark.sql.functions.transform(
          $"embedding".cast("array<double>"),
          x => org.apache.spark.sql.functions.abs(x))).as("m"))
      .as[(Long, Double)].collect().toMap
    out.foreach { r =>
      val step = maxAbs(r._1) / 127.0
      assert(r._4 <= step / 2 + 1e-6,
        s"vec ${r._1} dim ${r._2}: err ${r._4} > half step ${step / 2}")
    }
  }
}
