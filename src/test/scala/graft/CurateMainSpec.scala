package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** End-to-end verification of the flagship curation job: per-stage
  * survivor counts AND an order-independent content hash of the curated
  * output are pinned as goldens, so a regression in any composed
  * operator (scrub, quality, decontam, dedup, clustering, resample,
  * packing) fails here instead of shipping silently. Every stage is
  * individually oracle-verified in the registry; this spec verifies the
  * COMPOSITION.
  */
class CurateMainSpec extends SparkSpec {

  /** Partitioning/order-independent digest: exact decimal sum of
    * per-row xxhash64 over all output columns.
    */
  private def contentHash(path: String): String =
    spark.read.parquet(path)
      .agg(sum(xxhash64(col("doc_id"), col("lang"), col("source"),
        col("text"), col("quality")).cast(DecimalType(38, 0))))
      .head().getDecimal(0).toString

  // NB on the goldens: the synthetic documents tables contain no
  // PII-shaped text and no sub-0.5-quality docs (verified directly
  // against the parquet with DuckDB regexes), so pii_flagged=0 and
  // quality=input are CORRECT here, not missed detections — the
  // detection behaviors themselves are fixture-tested in
  // ScrubSpec/TextAnalysisSpec; this spec pins the composition.
  test("curation pipeline is pinned end-to-end at sf0.001") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate-spec").toString
    val s = CurateMain.run(spark, "/root/testdata/sf0.001", out)
    assert(s == CurateMain.CurateSummary(
      input = 500, piiFlagged = 0, quality = 500, decontaminated = 492,
      exact = 492, nearDedup = 471, mixed = 340, packs = 10,
      out = s"$out/curated"), s"stage counts drifted: $s")
    assert(contentHash(s.out) == "1989880728505580823",
      s"curated content drifted: ${contentHash(s.out)}")
  }

  test("curation pipeline is pinned end-to-end at sf0.01") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate-spec").toString
    val s = CurateMain.run(spark, "/root/testdata/sf0.01", out)
    assert(s == CurateMain.CurateSummary(
      input = 500, piiFlagged = 0, quality = 500, decontaminated = 495,
      exact = 495, nearDedup = 471, mixed = 313, packs = 10,
      out = s"$out/curated"), s"stage counts drifted: $s")
    assert(contentHash(s.out) == "-86292477455433414616",
      s"curated content drifted: ${contentHash(s.out)}")
  }
}
