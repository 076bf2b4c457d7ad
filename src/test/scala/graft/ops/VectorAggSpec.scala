package graft.ops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("typed VectorMean Aggregator matches the relational centroid query") {
    val e = Tables(spark, sf, "embeddings")
    val typed = e.select($"label", $"embedding").as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(VectorAgg.vectorMean(64).toColumn)
      .collect().toMap

    val relational = e
      .select($"label", posexplode($"embedding").as(Seq("dim", "x")))
      .groupBy($"label", $"dim")
      .agg((sum($"x".cast("double")) / count(lit(1))).as("c"))
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1)
      .map { case (l, rows) => l -> rows.sortBy(_._2).map(_._3) }

    relational.foreach { case (label, expected) =>
      val got = typed(label)
      expected.zip(got).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $label")
      }
    }
  }

  test("empty group yields the zero vector") {
    val out = Seq.empty[(Int, Array[Float])].toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(VectorAgg.vectorMean(4).toColumn).collect()
    assert(out.isEmpty)
  }
}
