package graft.ops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents").select($"doc_id")

  test("assignment is content-stable: partitioning cannot move a doc") {
    val a = Sharding.assign(docs, "doc_id", nShards = 8)
      .as[(Long, Long, Int)].collect().toSet
    val b = Sharding.assign(docs.repartition(13), "doc_id", nShards = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b, "shard layout must be a pure function of the corpus")
  }

  test("shards are balanced and positions are dense in-shard id order") {
    val rows = Sharding.assign(docs, "doc_id", nShards = 8)
      .as[(Long, Long, Int)].collect()
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    // md5 uniformity: no shard more than 2x the smallest (500 docs / 8
    // shards ~ 62 each; fluctuation ~ sqrt, far under 2x)
    val sizes = byShard.values.map(_.length)
    assert(sizes.max <= 2 * sizes.min, s"imbalanced: $byShard")
    byShard.values.foreach { s =>
      val inIdOrder = s.sortBy(_._1).map(_._3).toSeq
      assert(inIdOrder == (1 to s.length), "pos must be dense id order")
    }
  }

  test("writeShards round-trips with deterministic membership and order") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Sharding.writeShards(docs, "doc_id", nShards = 4, out)
    val back = spark.read.parquet(out)
    // partition dirs exist per shard and agree with assign()
    val expected = Sharding.assign(docs, "doc_id", nShards = 4)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toSet
    val got = back.select($"doc_id", $"shard".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
    // re-run writes the identical layout (overwrite mode, same bytes)
    Sharding.writeShards(docs.repartition(7), "doc_id", nShards = 4, out)
    val again = spark.read.parquet(out).select($"doc_id", $"shard".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(again == expected)
  }

  test("writeShards puts exactly one task behind every shard") {
    // the probe mapping is an exact exchange: no sampler to merge
    // adjacent shards onto one task (straggler) or strand empty tasks —
    // so every shard dir holds exactly ONE data file
    val out = java.nio.file.Files.createTempDirectory("graft-shards-exact").toString
    Sharding.writeShards(docs, "doc_id", nShards = 8, out)
    (0 until 8).foreach { s =>
      val dir = new java.io.File(s"$out/shard=$s")
      assert(dir.isDirectory, s"missing shard dir $s")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"shard $s must be written by exactly one task, got ${files.length} files")
    }
  }

  test("partition probes land each shard on its own partition") {
    // pin the contract the probe search relies on: pmod(murmur3(probe,
    // seed 42), n) — Spark's HashPartitioning layout for a long column
    for (n <- Seq(1, 3, 8, 32)) {
      val probes = Sharding.partitionProbes(n)
      assert(probes.length == n)
      probes.zipWithIndex.foreach { case (v, s) =>
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 42)
        assert(((h % n) + n) % n == s, s"probe $v must land partition $s of $n")
      }
    }
  }
}
