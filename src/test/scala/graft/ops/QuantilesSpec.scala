package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{col, expr}

/** The scale-safe two-pass exact quantile must (a) equal the
  * percentile_cont definition computed naively on sorted data, and
  * (b) never plan an ObjectHashAggregate (the buffer-the-group shape
  * it exists to replace).
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: percentile_cont(p) = linear interpolation at rank
    * (n-1)*p over the sorted values. Same formula as the operator, but
    * computed on a plain sorted Scala array.
    */
  private def ref(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted
    val rp = (s.size - 1).toDouble * p
    val lo = s(rp.toInt)
    val hi = s(math.ceil(rp).toInt)
    lo + (rp - math.floor(rp)) * (hi - lo)
  }

  test("grouped quantiles match the sorted-array definition (ties, even/odd n)") {
    val rnd = new scala.util.Random(42)
    // ties on a cent grid, uneven group sizes (including n=1 and n=2)
    val rows = Seq.tabulate(501) { i =>
      val g = if (i == 0) "solo" else if (i <= 2) "pair" else s"g${i % 3}"
      (g, math.floor(rnd.nextDouble() * 10000) / 100.0)
    }
    val df = rows.toDF("k", "v")
    val got = Quantiles.exact(df, Seq("k"), "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2))
    byKey.foreach { case (k, vs) =>
      val (p25, p50, p90, n) = got(k)
      assert(n === vs.size)
      assert(p25 === ref(vs, 0.25), s"p25 of $k")
      assert(p50 === ref(vs, 0.5), s"p50 of $k")
      assert(p90 === ref(vs, 0.9), s"p90 of $k")
    }
  }

  test("global quantiles (no keys) match, and nulls are ignored") {
    val vs = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val df = (vs.map(Option(_)) ++ Seq(None, None)).toDF("v")
    val r = Quantiles.exact(df, Nil, "v", Seq("med" -> 0.5, "p95" -> 0.95)).head()
    assert(r.getDouble(0) === ref(vs, 0.5))
    assert(r.getDouble(1) === ref(vs, 0.95))
    assert(r.getLong(2) === 5L)
  }

  test("empty-input contract: all-null input is null/empty, q44 fails loudly") {
    val allNull = Seq[(String, Option[Double])](("a", None), ("b", None)).toDF("k", "v")
    // grouped: no group exists → empty frame
    assert(Quantiles.exact(allNull, Seq("k"), "v", Seq("p50" -> 0.5)).count() === 0L)
    // global: one aggregate row with NULL quantile and NULL n
    val g = Quantiles.exact(allNull, Nil, "v", Seq("p50" -> 0.5)).head()
    assert(g.isNullAt(0) && g.isNullAt(1))
    // the q44 call site turns that null row into a contract error
    // (previously a bare NullPointerException from getDouble)
    val dir = java.nio.file.Files.createTempDirectory("graft-q44-empty").toString
    Seq.empty[(String, Option[Double])].toDF("l_returnflag", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val ex = intercept[IllegalArgumentException] {
      graft.SparkEntry.queries("q44_winsorized_mean")(spark, dir)
    }
    assert(ex.getMessage.contains("no non-null"))
  }

  test("differential: agrees with Spark's percentile to 1 ulp on random doubles") {
    // percentile_cont semantics match the built-in exactly; the only
    // permitted divergence is the final interpolation's association
    // order, worth at most one ulp (the oracle replays OUR formula, so
    // cross-engine hashing is still bit-exact — this test pins the
    // SEMANTICS against an independent implementation)
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(2000)(i => (s"g${i % 7}", rnd.nextDouble() * 1e6 - 5e5))
    val df = rows.toDF("k", "v")
    val fr = Seq("p05" -> 0.05, "p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    val mine = Quantiles.exact(df, Seq("k"), "v", fr)
      .select(col("k") +: fr.map(f => col(f._1)): _*)
      .collect().map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    val builtin = df.groupBy(col("k"))
      .agg(expr("percentile(v, array(0.05D, 0.25D, 0.5D, 0.9D))").as("ps"))
      .select(col("k") +: (0 to 3).map(i => col("ps")(i)): _*)
      .collect().map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    mine.foreach { case (k, ms) =>
      ms.zip(builtin(k)).foreach { case (a, b) =>
        assert(a == b || math.abs(a - b) <= math.ulp(b),
          s"$k: $a vs builtin $b differ by more than 1 ulp")
      }
    }
  }

  test("banded ≡ unbanded on random doubles, any bandWidth (incl. 1 band and ~1/band)") {
    val rnd = new scala.util.Random(11)
    // off-grid doubles with ties (25% dup rate), uneven groups, n=1 group
    val vals = Array.fill(800)(rnd.nextDouble() * 2e4 - 1e4)
    val rows = Seq.tabulate(1000) { i =>
      val g = if (i == 0) "solo" else s"g${i % 3}"
      (g, vals(rnd.nextInt(if (i % 4 == 0) 200 else 800)))
    }
    val df = rows.toDF("k", "v")
    val fr = Seq("p05" -> 0.05, "p50" -> 0.5, "p95" -> 0.95)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        ((1 to 3).map(r.getDouble), r.getLong(4))).toMap
    val want = canon(Quantiles.exact(df, Seq("k"), "v", fr))
    // one band swallowing everything, a medium grid, and ~unit bands
    for (w <- Seq(1e6, 500.0, 3.7)) {
      val got = canon(Quantiles.exactBanded(df, Seq("k"), "v", fr, bandWidth = w))
      assert(got == want, s"bandWidth=$w diverged from the unbanded result")
    }
    // global form too (the case exactBanded exists for)
    val gw = Quantiles.exact(df, Nil, "v", fr).head()
    val gg = Quantiles.exactBanded(df, Nil, "v", fr, bandWidth = 250.0).head()
    assert((0 to 2).forall(i => gw.getDouble(i) == gg.getDouble(i)) &&
      gw.getLong(3) == gg.getLong(3))
  }

  test("banded matches unbanded when NaN values are present (NaN sorts last)") {
    // floor(NaN/w) casts to 0L — without the explicit top-band pin,
    // NaN rows would land FIRST in the banded rank scan while exact's
    // value ordering puts NaN last, silently skewing every quantile
    val vs = Seq(1.0, 11.0, 21.0, Double.NaN, 5.0, Double.NaN)
    val df = vs.toDF("v")
    val fr = Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95)
    val a = Quantiles.exact(df, Nil, "v", fr).head()
    val b = Quantiles.exactBanded(df, Nil, "v", fr, bandWidth = 10.0).head()
    (0 to 2).foreach { i =>
      assert(java.lang.Double.compare(a.getDouble(i), b.getDouble(i)) == 0,
        s"col $i: ${a.getDouble(i)} vs ${b.getDouble(i)}")
    }
    assert(a.getLong(3) == b.getLong(3))
  }

  test("banded: ranks exactly on a band boundary interpolate across bands") {
    // 4 values, p~0.5 targets ranks 1 and 2; with bandWidth=10 the pair
    // (9.0, 11.0) straddles bands 0 and 1 — both bands must be refined
    val df = Seq(1.0, 9.0, 11.0, 19.0).toDF("v")
    val r = Quantiles.exactBanded(df, Nil, "v",
      Seq("p50" -> 0.5, "p33" -> (1.0 / 3)), bandWidth = 10.0).head()
    assert(r.getDouble(0) === 10.0, "p50 = (9+11)/2 across the band split")
    assert(r.getDouble(1) === 9.0, "rank 1 exactly (d=0) inside band 0")
    assert(r.getLong(2) === 4L)
  }

  test("banded: the group-wide ordered window sees O(#bands) rows, not O(distinct)") {
    import org.apache.spark.sql.functions.{countDistinct, floor => ffloor}
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(20000)(rnd.nextDouble() * 1e6).toDF("v")
    val w = 1e4
    val Array(nDistinct, nBands) = df
      .agg(countDistinct(col("v")), countDistinct(ffloor(col("v") / w)))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    // the rank scan's single partition shrinks from ~20k rows to ≤ ~101
    assert(nBands <= 110, s"band grid must bound the rank scan, got $nBands")
    assert(nDistinct > 100 * nBands,
      s"off-grid input must be ~all-distinct ($nDistinct vs $nBands bands)")
    // and the result over that shape is still exact
    val got = Quantiles.exactBanded(df, Nil, "v", Seq("p99" -> 0.99), w).head()
    val want = Quantiles.exact(df, Nil, "v", Seq("p99" -> 0.99)).head()
    assert(got.getDouble(0) == want.getDouble(0) && got.getLong(1) == want.getLong(1))
  }

  test("property: banded ≡ unbanded bit-for-bit over generated datasets") {
    // generated trials mix raw doubles, integer ties, EXACT band
    // boundaries, negatives, near-zeros, NaN and ±Inf, across band
    // widths from 0.1 to 1e8 — compared on raw IEEE bits (NaN-safe)
    val seeded = new scala.util.Random(2024)
    val fr = Seq("p01" -> 0.01, "p50" -> 0.5, "p99" -> 0.99)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        (((1 to 3).map(i => java.lang.Double.doubleToLongBits(r.getDouble(i)))),
          r.getLong(4))).toMap
    (1 to 8).foreach { trial =>
      val nGroups = 1 + seeded.nextInt(4)
      val nRows = 1 + seeded.nextInt(400)
      val bandWidth = Seq(0.1, 3.7, 64.0, 1e4, 1e8)(seeded.nextInt(5))
      def value(): Double = seeded.nextInt(7) match {
        case 0 => seeded.nextDouble() * 2e4 - 1e4
        case 1 => seeded.nextInt(100).toDouble
        case 2 => (seeded.nextInt(200) - 100) * bandWidth
        case 3 => -seeded.nextDouble() * 1e6
        case 4 => Double.NaN
        case 5 => seeded.nextDouble() * 1e-6
        case 6 => if (seeded.nextBoolean()) Double.PositiveInfinity
                  else Double.NegativeInfinity
      }
      val df = Seq.fill(nRows)((s"g${seeded.nextInt(nGroups)}", value()))
        .toDF("k", "v")
      val a = canon(Quantiles.exact(df, Seq("k"), "v", fr))
      val b = canon(Quantiles.exactBanded(df, Seq("k"), "v", fr, bandWidth))
      assert(a == b,
        s"trial $trial (bandWidth=$bandWidth, rows=$nRows) diverged")
      graft.ops.Staged.release()
    }
  }

  test("quantile plans stay bounded: no ObjectHashAggregate, histogram is partial+final") {
    val li = spark.read.parquet(s"$sf/orders.parquet")
    val p = Quantiles.exact(li, Seq("o_orderstatus"), "o_totalprice",
        Seq("p50" -> 0.5)).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("ObjectHashAggregate"),
      s"two-pass quantile must never buffer a group:\n$p")
    // the histogram pass keeps map-side partial aggregation
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }
}
