package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

class SanitizeSpec extends SparkSpec {

  /** scalacheck-driven exhaustive-ish sampling without the scalatestplus
    * bridge (not on the offline classpath).
    */
  private def forAllStrings(f: String => Unit): Unit = {
    val gen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf('$', '.', 'a', 'b', '_')).map(_.mkString))
    val seeded = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seeded.nextLong()))
        .foreach(f)
    }
  }

  test("sanitizeName rewrites BSON-illegal names") {
    assert(Sanitize.sanitizeName("user.name") == "user_name")
    assert(Sanitize.sanitizeName("$meta") == "_meta")
    assert(Sanitize.sanitizeName("$a.b.c") == "_a_b_c")
    assert(Sanitize.sanitizeName("clean") == "clean")
    assert(Sanitize.sanitizeName("") == "_")
  }

  test("sanitizeName is idempotent (property)") {
    forAllStrings { s =>
      val once = Sanitize.sanitizeName(s)
      assert(Sanitize.sanitizeName(once) == once)
    }
  }

  test("sanitized names are always BSON-legal (property)") {
    forAllStrings { s =>
      val out = Sanitize.sanitizeName(s)
      assert(!out.contains(".") && !out.startsWith("$") && out.nonEmpty)
    }
  }

  test("recursive schema sanitation: structs, arrays, maps") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v")
      .select($"id",
        struct($"v".as("a.b"), struct($"v".as("$inner")).as("$nest")).as("top.level"),
        array(struct($"v".as("elem.key"))).as("arr"),
        map(lit("k.1"), $"v", lit("$k2"), $"v").as("m"))
    val out = Sanitize(df)
    val schema = out.schema
    assert(schema.fieldNames.toSeq == Seq("id", "top_level", "arr", "m"))
    val top = schema("top_level").dataType.asInstanceOf[StructType]
    assert(top.fieldNames.toSeq == Seq("a_b", "_nest"))
    assert(top("_nest").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("_inner"))
    val arrEl = schema("arr").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(arrEl.fieldNames.toSeq == Seq("elem_key"))
    // dynamic map keys are sanitized at runtime
    val keys = out.select(explode(map_keys($"m"))).as[String].collect().sorted
    assert(keys.toSeq == Seq("_k2", "k_1"))
    // values survive the rewrite
    assert(out.select($"top_level.a_b").as[String].head() == "x")
  }

  test("sanitizeSchema matches the runtime rewrite") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v")
      .select($"id", struct($"v".as("a.b")).as("$s"))
    assert(Sanitize(df).schema == Sanitize.sanitizeSchema(df.schema))
  }
}
