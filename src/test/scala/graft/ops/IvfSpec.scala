package graft.ops

import graft.SparkSpec
import graft.sources.Tables

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF index partitions the corpus and search beats its cost model") {
    val e = Tables(spark, sf, "embeddings")
    val index = Ivf.build(e, "vec_id", "embedding", k = 8)
    assert(index.centroids.length == 8)
    assert(index.assigned.count() == e.count())
    val clusters = index.assigned.select("cluster").distinct().count()
    assert(clusters > 1, "KMeans must produce multiple non-empty cells")
  }

  test("IVF top-k recall vs brute force with generous nprobe") {
    val e = Tables(spark, sf, "embeddings")
    val query = e.filter($"vec_id" === 0L)
    val k = 20
    val exact = Similarity.bruteForceTopK(e, query, "vec_id", "embedding", k)
      .select("vec_id").as[Long].collect().toSet
    val index = Ivf.build(e, "vec_id", "embedding", k = 8)
    val approx = Ivf.topK(index, query, "vec_id", "embedding", k, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / k
    assert(approx.contains(0L), "query must find itself")
    assert(recall >= 0.4, s"recall $recall too low for nprobe=half the cells")
  }
}
