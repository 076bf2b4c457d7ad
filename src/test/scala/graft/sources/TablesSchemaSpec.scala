package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Fixture-schema canary (round-9 postmortem, VERDICT item 4).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * drifted a column's parquet type once (events.ts: nanos-as-long →
  * µs TIMESTAMP_NTZ), which broke three queries and six tests with
  * confusing analysis errors. This spec pins the POST-`Tables.apply`
  * schema of every fixture table — names, order, and Spark types — so the
  * next drift fails exactly one labeled test that names the column.
  *
  * `events.ts` is the deliberate exception: whatever the on-disk layout,
  * the loader must canonicalize it to `TimestampType` (see
  * `Tables.canonicalTs`), because downstream queries call `unix_micros`
  * and friends that reject TIMESTAMP_NTZ.
  */
class TablesSchemaSpec extends SparkSpec {

  private def fields(name: String): Seq[(String, DataType)] =
    Tables(spark, sf, name).schema.fields.toSeq.map(f => f.name -> f.dataType)

  private val L = LongType; private val I = IntegerType
  private val S = StringType; private val D = DoubleType
  private val TS = TimestampType; private val NTZ = TimestampNTZType

  test("canary: events loads with ts canonicalized to TimestampType") {
    assert(fields("events") == Seq(
      "event_id" -> L, "ts" -> TS, "user_id" -> L,
      "event_type" -> S, "value" -> D, "props" -> S))
  }

  test("canary: lineitem schema") {
    assert(fields("lineitem") == Seq(
      "l_orderkey" -> L, "l_partkey" -> L, "l_suppkey" -> L,
      "l_linenumber" -> I, "l_quantity" -> D, "l_extendedprice" -> D,
      "l_discount" -> D, "l_tax" -> D, "l_returnflag" -> S,
      "l_linestatus" -> S, "l_shipdate" -> NTZ))
  }

  test("canary: orders schema") {
    assert(fields("orders") == Seq(
      "o_orderkey" -> L, "o_custkey" -> L, "o_orderstatus" -> S,
      "o_totalprice" -> D, "o_orderdate" -> NTZ, "o_orderpriority" -> S))
  }

  test("canary: customer/supplier/part/nation/region schemas") {
    assert(fields("customer") == Seq(
      "c_custkey" -> L, "c_name" -> S, "c_nationkey" -> I,
      "c_acctbal" -> D, "c_mktsegment" -> S))
    assert(fields("supplier") == Seq(
      "s_suppkey" -> L, "s_name" -> S, "s_nationkey" -> I, "s_acctbal" -> D))
    assert(fields("part") == Seq(
      "p_partkey" -> L, "p_name" -> S, "p_brand" -> S, "p_type" -> S,
      "p_size" -> I, "p_retailprice" -> D))
    assert(fields("nation") == Seq(
      "n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I))
    assert(fields("region") == Seq("r_regionkey" -> I, "r_name" -> S))
  }

  test("canary: documents and embeddings schemas") {
    assert(fields("documents") == Seq(
      "doc_id" -> L, "text" -> S, "lang" -> S, "source" -> S, "n_chars" -> L))
    assert(fields("embeddings") == Seq(
      "vec_id" -> L, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> I))
  }

  test("canary: canonicalTs handles both historical ts layouts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // nanos-as-long layout (pre-round-9 fixtures)
    val asLong = Seq((1L, 1704103260123456789L)).toDF("event_id", "ts")
    val fromLong = Tables.canonicalTs(asLong)
    assert(fromLong.schema("ts").dataType == TS)
    assert(fromLong.select(unix_micros($"ts")).head().getLong(0) == 1704103260123456L)
    // µs TIMESTAMP_NTZ layout (current fixtures); UTC session ⇒ cast is
    // value-preserving
    val asNtz = asLong.select($"event_id",
      timestamp_micros($"ts" / 1000 cast LongType).cast(NTZ).as("ts"))
    val fromNtz = Tables.canonicalTs(asNtz)
    assert(fromNtz.schema("ts").dataType == TS)
    assert(fromNtz.select(unix_micros($"ts")).head().getLong(0) == 1704103260123456L)
  }
}
