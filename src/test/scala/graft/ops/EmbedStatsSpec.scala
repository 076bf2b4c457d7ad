package graft.ops

import graft.SparkSpec

class EmbedStatsSpec extends SparkSpec {
  import spark.implicits._

  test("label separation matches hand-computed moments") {
    // 2-dim toy: label 0 at (0,0)/(2,0) -> mu=(1,0), msr=(1+1)/2=1
    //           label 1 at (4,4)/(4,6) -> mu=(4,5), msr=(1+1)/2=1
    // corpus mu=(2.5, 2.5); gaps: |(1,0)-(2.5,2.5)|²=8.5, |(4,5)-..|²=8.5
    val df = Seq(
      (0, Seq(0f, 0f)), (0, Seq(2f, 0f)),
      (1, Seq(4f, 4f)), (1, Seq(4f, 6f))).toDF("label", "embedding")
    val out = EmbedStats.labelSeparation(df, "label", "embedding")
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(0) == ((2L, 1.0, 8.5)))
    assert(out(1) == ((2L, 1.0, 8.5)))
  }

  test("a tight far-away label shows small radius, large gap") {
    val near = (1 to 20).map(i => (0, Seq((i % 5).toFloat, 0f)))
    val far = (1 to 5).map(_ => (1, Seq(100f, 100f)))
    val out = EmbedStats.labelSeparation(
      (near ++ far).toDF("label", "embedding"), "label", "embedding")
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1)._2 == 0.0, "identical vectors have zero radius")
    assert(out(1)._3 > out(0)._3, "far label's centroid gap dominates")
    assert(out(0)._2 > 0.0)
  }

  test("deterministic across repartitionings") {
    val df = graft.sources.Tables(spark, sf, "embeddings")
    val a = EmbedStats.labelSeparation(df, "label", "embedding")
      .as[(Int, Long, Double, Double)].collect().toSet
    val b = EmbedStats.labelSeparation(df.repartition(13), "label", "embedding")
      .as[(Int, Long, Double, Double)].collect().toSet
    assert(a == b)
  }

  test("gramCov matches hand-computed moments on a 2-dim toy") {
    // vectors (1,2), (3,4): E[x0x0]=(1+9)/2=5, E[x0x1]=(2+12)/2=7,
    // E[x1x1]=(4+16)/2=10; means (2,3);
    // cov00=5-4=1, cov01=7-6=1, cov11=10-9=1
    val df = Seq(Tuple1(Seq(1f, 2f)), Tuple1(Seq(3f, 4f))).toDF("embedding")
    val out = EmbedStats.gramCov(df, "embedding")
      .as[(Int, Int, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out.keySet == Set((0, 0), (0, 1), (1, 1)), "upper triangle only")
    assert(out((0, 0)) == ((2L, 5.0, 1.0)))
    assert(out((0, 1)) == ((2L, 7.0, 1.0)))
    assert(out((1, 1)) == ((2L, 10.0, 1.0)))
  }

  test("standardize: hand-computed z-scores; constant component yields NULL") {
    // dims: (1,3) -> mu=2, sigma=1 -> z = -1, +1; (2,4) -> same shape;
    // third component constant -> zero variance -> NULL, never +-Inf
    val df = Seq((1L, Seq(1f, 2f, 7f)), (2L, Seq(3f, 4f, 7f)))
      .toDF("vec_id", "embedding")
    val out = EmbedStats.standardize(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out((1L, 0)) == Some(-1.0) && out((2L, 0)) == Some(1.0))
    assert(out((1L, 1)) == Some(-1.0) && out((2L, 1)) == Some(1.0))
    assert(out((1L, 2)).isEmpty && out((2L, 2)).isEmpty,
      "zero-variance component must be NULL")
  }

  test("gramCov is deterministic across repartitionings (decimal grid)") {
    val df = graft.sources.Tables(spark, sf, "embeddings")
    val a = EmbedStats.gramCov(df, "embedding")
      .as[(Int, Int, Long, Double, Double)].collect().toSet
    val b = EmbedStats.gramCov(df.repartition(13), "embedding")
      .as[(Int, Int, Long, Double, Double)].collect().toSet
    assert(a == b && a.size == 64 * 65 / 2)
  }
}
