package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables(spark, sf, "documents")

  test("hash sampling is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(docs, "doc_id", 0.2)
      .select($"doc_id").as[Long].collect().sorted
    val b = Sampling.hashSample(docs.repartition(13), "doc_id", 0.2)
      .select($"doc_id").as[Long].collect().sorted
    assert(a.nonEmpty && a.sameElements(b),
      "the sample must not depend on physical layout")
  }

  test("hash sampling is consistent: smaller rates nest inside larger") {
    val small = Sampling.hashSample(docs, "doc_id", 0.05)
      .select($"doc_id").as[Long].collect().toSet
    val large = Sampling.hashSample(docs, "doc_id", 0.2)
      .select($"doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large), "5% sample must be a subset of 20%")
    val n = docs.count().toDouble
    assert(math.abs(large.size / n - 0.2) < 0.08, s"got ${large.size / n}")
  }

  test("exactSample: exact n, layout-independent, sizes nest as prefixes") {
    val a = Sampling.exactSample(docs, "doc_id", 40)
      .select($"doc_id").as[Long].collect()
    val b = Sampling.exactSample(docs.repartition(13), "doc_id", 40)
      .select($"doc_id").as[Long].collect()
    assert(a.length == 40, s"exactly n rows, got ${a.length}")
    assert(a.sameElements(b), "the sample must not depend on physical layout")
    val small = Sampling.exactSample(docs, "doc_id", 15)
      .select($"doc_id").as[Long].collect()
    assert(small.sameElements(a.take(15)),
      "the 15-row sample must be a strict prefix of the 40-row sample")
    // n larger than the corpus: the whole corpus, no error
    val all = Sampling.exactSample(docs, "doc_id", 1000000)
      .select($"doc_id").as[Long].collect()
    assert(all.length == docs.count(), "oversize n returns everything")
  }

  test("stratified rates apply per stratum; absent strata drop") {
    val sampled = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.1))
    val byLang = sampled.groupBy($"lang").count().as[(String, Long)]
      .collect().toMap
    assert(byLang.keySet == Set("en", "de"), s"got ${byLang.keySet}")
    val totals = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en").toDouble / totals("en") - 0.5) < 0.15)
    assert(byLang("de").toDouble / totals("de") < 0.3)
  }

  test("mixRates hits the largest corpus achieving the target mix") {
    val totals = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    // 1:1 en:fr — fr is the scarce stratum, so fr keeps everything and
    // en downsamples to fr's count
    val rates = Sampling.mixRates(docs, "lang", Map("en" -> 1.0, "fr" -> 1.0))
    assert(rates.keySet == Set("en", "fr"))
    assert(rates("fr") == 1.0, "scarce stratum must not be downsampled")
    assert(math.abs(rates("en") * totals("en") - totals("fr")) < 1e-6,
      "en rate must target exactly fr's count")
    assert(rates.values.forall(r => r > 0 && r <= 1.0))
    // resample end-to-end: achieved counts near the 1:1 target
    val got = Sampling.resampleToMix(docs, "doc_id", "lang",
      Map("en" -> 1.0, "fr" -> 1.0))
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(got.keySet == Set("en", "fr"))
    val expected = totals("fr").toDouble
    assert(math.abs(got("en") - expected) < 4 * math.sqrt(expected),
      s"en kept ${got("en")}, want ~$expected")
    assert(got("fr") == totals("fr"))
  }

  test("mixRates clamps the argmin stratum's rate against FP round-up") {
    // ws*(n/ws)/n rounds to 1.0000000000000002 for ws=0.3, n=7 — the
    // scarce stratum's rate must clamp to 1.0, not crash hashGate
    val df = ((1 to 7).map(i => (i.toLong, "a")) ++
      (8 to 24).map(i => (i.toLong, "b"))).toDF("doc_id", "lang")
    val rates = Sampling.mixRates(df, "lang", Map("a" -> 0.3, "b" -> 0.7))
    assert(rates.values.forall(_ <= 1.0), s"rates must clamp: $rates")
    assert(rates("a") == 1.0)
    Sampling.resampleToMix(df, "doc_id", "lang",
      Map("a" -> 0.3, "b" -> 0.7)).count() // must not throw
  }

  test("mixRates rejects weights on absent strata") {
    val ex = intercept[IllegalArgumentException] {
      Sampling.mixRates(docs, "lang", Map("en" -> 1.0, "klingon" -> 1.0))
    }
    assert(ex.getMessage.contains("klingon"))
  }

  test("temperatureRates: smallest source keeps all; realized mix is n^alpha") {
    val d = (1L to 900L).map(i =>
      (i, if (i <= 800) "web" else if (i <= 880) "books" else "code"))
      .toDF("doc_id", "source")
    val rates = Sampling.temperatureRates(d, "source", 0.5)
    // weights 28.28/8.94/4.47; argmin n/w = the smallest source (code)
    assert(rates("code") == 1.0, s"smallest source must keep all: $rates")
    // closed form: rate_s = sqrt(n_s)*sqrt(n_min)/n_s = sqrt(n_min/n_s)
    assert(math.abs(rates("web") - math.sqrt(20.0 / 800)) < 1e-12)
    assert(math.abs(rates("books") - math.sqrt(20.0 / 80)) < 1e-12)
    // expected kept counts realize the n^0.5 mix: n_s*rate = sqrt(n_s*n_min)
    // web→126.5, books→40, code→20 — flattened from 800/80/20
    assert(rates.values.forall(r => r > 0 && r <= 1.0))
  }

  test("temperatureRates: alpha=1 is the identity mix (every rate 1)") {
    val d = (1L to 100L).map(i => (i, if (i <= 70) "a" else "b"))
      .toDF("doc_id", "source")
    val rates = Sampling.temperatureRates(d, "source", 1.0)
    assert(rates.values.forall(_ == 1.0), s"alpha=1 must keep everything: $rates")
  }

  test("temperatureRates: null strata are excluded, not counted into the argmin") {
    // a tiny null stratum would otherwise become the argmin of n/w and
    // deflate every real stratum's keep rate — while its own rows are
    // silently dropped by the sampling gate anyway
    val clean = (1L to 900L).map(i =>
      (i, if (i <= 800) "web" else if (i <= 880) "books" else "code"))
      .toDF("doc_id", "source")
    val dirty = clean.unionByName(
      Seq((901L, null.asInstanceOf[String]), (902L, null.asInstanceOf[String]))
        .toDF("doc_id", "source"))
    val rates = Sampling.temperatureRates(dirty, "source", 0.5)
    assert(!rates.keySet.contains(null),
      s"null must not be a stratum: ${rates.keySet}")
    assert(rates == Sampling.temperatureRates(clean, "source", 0.5),
      "null rows must not move any real stratum's rate")
  }

  test("weightedTemperatureRates: token totals set the mix, doc counts are irrelevant") {
    // "web": 8 docs x 100 tokens = 800; "code": 80 docs x 1 token = 80.
    // Doc-count temperature would call web SMALL (8 docs) and keep all
    // of it; token-weighted flattening sees 800 vs 80 and flattens WEB.
    val d = ((1L to 8L).map(i => (i, "web", 100L)) ++
      (101L to 180L).map(i => (i, "code", 1L)))
      .toDF("doc_id", "source", "n_tok")
    val rates = Sampling.weightedTemperatureRates(d, "source", "n_tok", 0.5)
    assert(rates("code") == 1.0, s"smallest TOKEN mass keeps all: $rates")
    // closed form over totals: rate = sqrt(T_min / T_s) = sqrt(80/800)
    assert(math.abs(rates("web") - math.sqrt(80.0 / 800)) < 1e-12, s"$rates")
    // the doc-count recipe disagrees on which side flattens
    val docRates = Sampling.temperatureRates(d, "source", 0.5)
    assert(docRates("web") == 1.0 && docRates("code") < 1.0,
      s"fixture must separate the two recipes: $docRates")
    // zero-weight strata drop from the rate table (cannot be flattened)
    val z = d.unionByName(Seq((500L, "empty", 0L)).toDF("doc_id", "source", "n_tok"))
    val rz = Sampling.weightedTemperatureRates(z, "source", "n_tok", 0.5)
    assert(!rz.contains("empty") && rz == rates,
      s"zero-token stratum must drop without moving real rates: $rz")
    intercept[IllegalArgumentException] {
      Sampling.weightedTemperatureRates(d, "source", "n_tok", 0.0)
    }
  }

  test("weightedTemperatureSample is deterministic and partitioning-independent") {
    val d = (1L to 400L).map(i =>
      (i, if (i <= 300) "a" else "b", (i % 7) + 1L))
      .toDF("doc_id", "source", "n_tok")
    val a = Sampling.weightedTemperatureSample(d, "doc_id", "source", "n_tok", 0.5)
      .select($"doc_id").as[Long].collect().sorted
    val b = Sampling.weightedTemperatureSample(d.repartition(13),
      "doc_id", "source", "n_tok", 0.5)
      .select($"doc_id").as[Long].collect().sorted
    assert(a.nonEmpty && a.sameElements(b),
      "the weighted temperature sample must not depend on physical layout")
  }

  test("temperatureSample is deterministic and partitioning-independent") {
    val a = Sampling.temperatureSample(docs, "doc_id", "source", 0.5)
      .select($"doc_id").as[Long].collect().sorted
    val b = Sampling.temperatureSample(docs.repartition(13), "doc_id", "source", 0.5)
      .select($"doc_id").as[Long].collect().sorted
    assert(a.nonEmpty && a.sameElements(b),
      "the temperature sample must not depend on physical layout")
  }

  test("cellQuotaSample: exact per-cell quota, no empty cell, rates nest") {
    // cells of very different sizes: 0→60, 1→10, 2→1
    val d = (1L to 71L).map(i =>
      (i, if (i <= 60) 0 else if (i <= 70) 1 else 2)).toDF("doc_id", "cell")
    val kept = Sampling.cellQuotaSample(d, "doc_id", "cell", 0.25)
    val byCell = kept.groupBy($"cell").count().as[(Int, Long)].collect().toMap
    assert(byCell == Map(0 -> 15L, 1 -> 3L, 2 -> 1L),
      s"quota must be ceil(rate*n) exactly: $byCell")
    // a flat 25% hash gate would likely kill the singleton cell; the
    // quota keeps it by construction (ceil never rounds to zero)
    val small = kept.select($"doc_id").as[Long].collect().toSet
    val large = Sampling.cellQuotaSample(d, "doc_id", "cell", 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large),
      "rank order is rate-independent, so exports must nest")
    // determinism under repartitioning
    val again = Sampling.cellQuotaSample(d.repartition(7), "doc_id", "cell", 0.25)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == small, "the export must not depend on physical layout")
  }

  test("leakageSafeSplit keeps every near-dup family on one side") {
    // planted family: 10, 11, 12 are jaccard-identical near-dups; 20,
    // 21 are unrelated singletons. The family must share ONE split —
    // and it must be the split of its representative's gate, so the
    // whole assignment stays a pure function of content.
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val planted = Seq(
      (10L, s"$boiler variant one"), (11L, s"$boiler variant two"),
      (12L, s"$boiler variant three"),
      (20L, "the quick brown fox jumps over the lazy dog today"),
      (21L, "completely different content about spark shuffles and joins")
    ).toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplit(planted, "doc_id", "text",
      threshold = 0.5, testRate = 0.5)
      .as[(Long, Long, String)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.length == 5)
    val family = Seq(10L, 11L, 12L).map(byId)
    assert(family.map(_._2).toSet == Set(10L), "family rep must be min id")
    assert(family.map(_._3).toSet.size == 1, "family must not straddle the split")
    assert(byId(20L)._2 == 20L && byId(21L)._2 == 21L, "singletons rep themselves")
    // partitioning invariance (the property plain df.sample lacks)
    val again = Sampling.leakageSafeSplit(planted.repartition(7), "doc_id",
      "text", threshold = 0.5, testRate = 0.5)
      .as[(Long, Long, String)].collect().toSet
    assert(again == out.toSet)
  }
}
