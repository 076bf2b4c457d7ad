package graft.ops

import graft.SparkSpec
import graft.sources.Tables

/** Partition-order independence of the decimal-grid operators: every
  * score that sums floating-point-derived terms must give identical
  * bytes under any repartitioning — the property the DuckDB oracles
  * rely on, checked here directly against adversarial partitionings
  * (1 partition vs 17 skewed ones reverses most sum orders).
  */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents")

  private def stable[T](f: org.apache.spark.sql.DataFrame => Seq[T]): Unit = {
    val one = f(docs.repartition(1))
    val many = f(docs.repartition(17, $"lang"))
    assert(one == many, "result drifted under repartitioning")
    Staged.releaseAll()
  }

  test("DSIR weights are partition-order-independent") {
    stable(d => Dsir.importanceWeights(
      d.filter($"doc_id" % 5 =!= 0), d.filter($"doc_id" % 5 === 0),
      "doc_id", "text", buckets = 128)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq)
  }

  test("bigram LM scores are partition-order-independent") {
    stable(d => LangModel.bigramLogProb(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq)
  }

  test("TF-IDF cosine pairs are partition-order-independent") {
    stable(d => TfIdf.cosinePairs(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq)
  }

  test("zipf fit is partition-order-independent") {
    stable(d => TextAnalysis.zipfFit(d, "text")
      .as[(Long, Double, Double, Double)].collect().toSeq)
  }

  test("PMI pairs are partition-order-independent") {
    stable(d => Cooccur.pmiTopPairs(d, "doc_id", "text")
      .as[(String, String, Long, Double)].collect().toSeq)
  }

  test("curriculum interleave is partition-order-independent") {
    stable(d => Curriculum.interleave(d, "doc_id", "source",
      Map("src1" -> 3))
      .as[(Long, String, Long)].collect().sortBy(_._3).toSeq)
  }

  test("containment pairs are partition-order-independent") {
    stable(d => Dedup.ngramContainmentBlocked(d, "doc_id", "text", "lang",
      n = 3, threshold = 0.6)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq)
  }

  test("vocab coverage is partition-order-independent (tie-broken cut)") {
    stable(d => TextAnalysis.vocabCoverage(d, "doc_id", "text", vocabSize = 20)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq)
  }

  test("novelty scores are partition-order-independent") {
    stable(d => TextAnalysis.ngramNovelty(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq)
  }
}
