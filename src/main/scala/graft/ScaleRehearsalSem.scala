package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Ivf, SemanticDedup, Staged}
import graft.sources.Tables

/** Scale rehearsal for SemDeDup-style semantic dedup (VERDICT r5 item
  * 2): replicate the sf0.1 embeddings K× (same structure-preserving
  * sign-flip replication as [[ScaleRehearsalAnn]] — within-replica
  * cosines are exact, so true pairs grow K×, while cross-replica
  * similarity decorrelates) and measure the x31 pipeline end-to-end
  * with the corpus-sized k policy: KMeans build at k = kForCells(N),
  * hot-cell governance, within-cell pairs, connected components.
  *
  * What the curve must show: with k ∝ N (constant expected cell
  * population), the within-cell pair step's work grows LINEARLY in the
  * corpus — against the fixed-k form, whose pair count grows
  * quadratically. Both are measured side by side.
  *
  * Usage: runMain graft.ScaleRehearsalSem [multipliers...] (default 1 2 5 10 20)
  */
object ScaleRehearsalSem {

  def main(args: Array[String]): Unit = {
    val multipliers = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 5, 10, 20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val dim = base.select(size(col("embedding"))).head().getInt(0)

    multipliers.foreach { m =>
      // sfDir-fingerprinted, shared with ScaleRehearsalAnn (see there)
      val path = s"/tmp/graft-scale-vecs-${graft.queries.OracleDump.sfTag(sfDir)}-${m}x"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        ScaleRehearsalAnn.scaledVecs(base, m, dim)
          .repartition(32).write.mode("overwrite").parquet(path)
      }
      val vecs = spark.read.parquet(path)
      val n = vecs.count()

      def run(k: Int): (Double, Long, Long) = {
        val idx = Ivf.build(vecs, "vec_id", "embedding", k = k)
        idx.assigned.persist()
        idx.assigned.count() // materialize: time the dedup, not the fit
        val t0 = System.nanoTime()
        val kept = SemanticDedup.keptCells(idx.assigned)
        val drops = SemanticDedup.dropListFromKept(
          kept, "vec_id", "embedding", threshold = 0.3).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // pair volume the blocking admits: Σ c·(c−1)/2 over kept cells
        val pairBudget = kept.groupBy(col("cluster"))
          .agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) DIV 2"))).head().getLong(0)
        idx.assigned.unpersist()
        Staged.releaseAll()
        (sec, drops, pairBudget)
      }

      // rehearsal-scaled policy: same kForCells function, targetCell
      // shrunk so k ∝ N is exercised across the 1-20× range (with the
      // production 4096 target, every rehearsal size clamps to kMin and
      // the policy-vs-fixed contrast would be invisible)
      val kPolicy = Ivf.kForCells(n, targetCell = 512, kMin = 4)
      val (tPolicy, dropsPolicy, pairsPolicy) = run(kPolicy)
      val (tFixed, dropsFixed, pairsFixed) = run(16)
      println(s"""{"mult":$m,"vecs":$n,"k_policy":$kPolicy,""" +
        s""""policy_sec":$tPolicy,"policy_drops":$dropsPolicy,"policy_pairs":$pairsPolicy,""" +
        s""""fixed16_sec":$tFixed,"fixed16_drops":$dropsFixed,"fixed16_pairs":$pairsFixed}""")
    }
    spark.stop()
  }
}
