package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.{Sanitize, Transforms}
import graft.sources.Tables

/** The reference's ETL surface as verifiable queries (SURVEY §2.1
  * T1–T6 / V1). `events.props` stands in for a raw API payload column.
  *
  * The full pipeline (with the nondeterministic `ingested_at` stamp) is
  * exercised by `SparkEntry.entry` and the ScalaTest suite; the queries
  * here keep only deterministic columns so the DuckDB oracle can
  * hash-compare them.
  */
object EtlQueries {

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** The flagship pipeline: parse → flatten → sanitize → validate →
    * stamp. Used by SparkEntry.entry.
    */
  def pipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stages = Transforms.pipeline(
      Transforms.parseJson("props", propsSchema),
      Transforms.flattenStruct("parsed", "props_"),
      Transforms.sanitizeFields,
      Transforms.requireNonNull("event_id", "ts"),
      Transforms.validate($"value" >= 0.0),
      Transforms.addIngestionTimestamp())
    stages(Tables(s, dir, "events"))
  }

  val all: Seq[GraftQuery] = Seq(

    // ---- T1: JSON decode of the raw payload column. from_json is a
    // codegen'd expression — the parse fuses into the scan stage.
    GraftQuery(
      "e01_json_parse",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .withColumn("parsed", from_json($"props", propsSchema))
          .select($"event_id", $"event_type", $"parsed.k".as("k"))
      },
      Some("""SELECT event_id, event_type,
        CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events""")),

    // ---- T1+agg: parse then aggregate the extracted field.
    GraftQuery(
      "e02_json_agg",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .withColumn("k", from_json($"props", propsSchema).getField("k"))
          .groupBy($"event_type")
          .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"))
      },
      Some("""SELECT event_type,
        CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        count(*) AS n
        FROM events GROUP BY event_type""")),

    // ---- T2/T3/V1: normalize + null-handling + validity predicate.
    GraftQuery(
      "e03_clean_validate",
      (s, dir) => {
        import s.implicits._
        Transforms.pipeline(
          Transforms.requireNonNull("event_id", "user_id", "ts"),
          Transforms.validate($"value" >= 0.0 && $"event_type".isin(
            "click", "view", "purchase", "signup", "error")))(
          Tables(s, dir, "events"))
          .select($"event_id", $"user_id", $"event_type", $"value")
      },
      Some("""SELECT event_id, user_id, event_type, value FROM events
        WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
          AND value >= 0.0
          AND event_type IN ('click','view','purchase','signup','error')""")),

    // ---- T4: BSON field sanitation — schema rewrite is not ANSI-SQL
    // expressible, so the query exposes the *renamed data* on a nested
    // payload built from events; the oracle checks the same values under
    // the sanitized names.
    GraftQuery(
      "e04_sanitize_fields",
      (s, dir) => {
        import s.implicits._
        val nested = Tables(s, dir, "events")
          .select($"event_id",
            struct($"user_id".as("user.id"), $"event_type".as("$type")).as("payload.meta"))
        Sanitize(nested).select($"event_id",
          $"payload_meta.user_id".as("user_id"),
          $"payload_meta._type".as("_type"))
      },
      Some("""SELECT event_id, user_id, event_type AS "_type" FROM events""")),

    // ---- L2: idempotent dedup-by-key (first version wins on re-load).
    GraftQuery(
      "e05_dedup_by_key",
      (s, dir) => {
        import s.implicits._
        // simulate a double-load then recover uniqueness by key
        val ev = Tables(s, dir, "events").select($"event_id", $"user_id", $"value")
        ev.union(ev)
          .groupBy($"event_id")
          .agg(min($"user_id").as("user_id"), min($"value").as("value"),
            count(lit(1)).as("n_copies"))
      },
      Some("""SELECT event_id, min(user_id) AS user_id, min(value) AS value,
        count(*) AS n_copies FROM
        (SELECT event_id, user_id, value FROM events
         UNION ALL SELECT event_id, user_id, value FROM events)
        GROUP BY event_id""")),

    // ---- V1b: quarantine split — the reject path of validation, with
    // the reason attached for a dead-letter sink.
    GraftQuery(
      "e06_quarantine_rejects",
      (s, dir) => {
        import s.implicits._
        val (_, rejects) = Transforms.quarantine(
          Tables(s, dir, "events").select($"event_id", $"value"),
          $"value" < 100.0, "value >= 100")
        rejects
      },
      Some("""SELECT event_id, value, 'value >= 100' AS reject_reason
        FROM events WHERE NOT (value < 100.0) OR value IS NULL"""))
  )
}
