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
}
