package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JSON-lines as a TEXT source format on the oracle lane (round 17 — the
  * format axis' last feasible member after parquet/ORC/CSV; Avro stays
  * blocked: no connector jar in `/opt/spark/jars`). JSONL is the log-lake
  * format, and it exercises the one inference shape CSV cannot: NESTED
  * STRUCTS. The contract query reads a derived JSONL copy of `events`
  * whose `props` field is a real JSON object (not a quoted string), so
  * `spark.read.json` must discover `props: struct<k: bigint>` from the
  * text. The reference's only inference-adjacent behavior is
  * schema-on-read (`pd.read_parquet`, `etl_benchmark.py:27` — parquet
  * carries its types); inference over schemaless NESTED text is this
  * engine's extension beyond it. The DuckDB oracle reads
  * the SOURCE parquet, so the hash meeting proves write → infer → read
  * round-trips every value AND every inferred type, including the nested
  * field and microsecond timestamps.
  *
  * Cross-engine traps, handled by construction and documented:
  *  - Timestamp precision: Spark's DEFAULT JSON formats
  *    (`timestampFormat` = `yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]`,
  *    `timestampNTZFormat` = `yyyy-MM-dd'T'HH:mm:ss[.SSS]`) write at most
  *    MILLIseconds — a micro-precision event log silently loses its last
  *    three digits on a default round-trip. This lane pins an explicit
  *    6-digit format on BOTH sides ([[TsFormat]]); the spec proves the
  *    default is lossy and the pin is not. NOTE the option is per
  *    timestamp TYPE: `events.ts` is TIMESTAMP_NTZ (the star schema's
  *    convention, `Tables.events`), so the WRITE must pin
  *    `timestampNTZFormat` — pinning only `timestampFormat` is silently
  *    ignored for an NTZ column.
  *  - Timestamp inference is OFF by default (`inferTimestamp=false`,
  *    disabled for performance in SPARK-26325's follow-ups): without the
  *    option, `ts` lands as STRING and every downstream range predicate
  *    becomes a lexicographic comparison. The read sets it explicitly.
  *  - JSON text has NO LTZ/NTZ distinction: a timezone-less string
  *    infers as the SESSION-default timestamp type
  *    (`spark.sql.timestampType`, LTZ unless overridden), interpreted in
  *    the session timezone. The lane therefore casts the inferred `ts`
  *    back to TIMESTAMP_NTZ in the projection — an exact inverse for any
  *    fixed session zone (parse naive→instant and cast instant→naive use
  *    the same zone; the engine's UTC pin also removes DST gap/overlap
  *    ambiguity).
  *  - Integral doubles: Jackson prints a Spark DOUBLE with at least one
  *    fractional digit ("54.0"), so a double column never collapses to
  *    bigint under inference even when every value is integral.
  *  - Null fields: Spark OMITS null fields on write by default
  *    (`ignoreNullFields=true`), which reads back as null — round-trip
  *    safe, but a schema inferred from a sample where some field is
  *    always-null will simply not contain it. `events` is null-free, so
  *    the contract hash is immune; a production JSONL drop pins the
  *    inferred schema after first discovery for exactly this reason.
  *
  * Scale: as on the CSV lane, inference is an EXTRA full scan before the
  * real one — the price of schema-on-read, paid once. A 100 TB deployment
  * runs inference on a sample (`samplingRatio`), pins the result as a
  * declared schema, and reads with it thereafter; this lane re-infers per
  * query call because the inference IS the thing under test. The JSONL
  * copy is a fixture artifact (DerivedCopy registry: built once per
  * (context, dir), fingerprint-validated, per-process scratch); at 100 TB
  * nothing is copied — the log lake already lands as JSONL.
  */
object JsonSource {

  /** Six-digit (microsecond) timestamp format, pinned on write AND read.
    * The default format truncates to millis — see the scaladoc trap. */
  val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private[sources] def jsonEvents(spark: SparkSession, dir: String): String =
    DerivedCopy(spark, dir, "jsonl", "events", "JsonSource.jsonEvents") { path =>
      import spark.implicits._
      val ev = graft.Tables.events(spark, dir)
      // Discover the props sub-schema with Spark's OWN json inference
      // over the string column — nothing is declared anywhere on this
      // lane; a fixture drift to e.g. {"k":1,"tag":"a"} rebuilds (the
      // registry fingerprint moves) and re-infers.
      val propsSchema = spark.read.json(ev.select($"props").as[String]).schema
      ev.withColumn("props", from_json($"props", propsSchema))
        .write.mode(SaveMode.Overwrite)
        .option("timestampNTZFormat", TsFormat) // ts is NTZ — see scaladoc trap
        .json(path)
    }

  /** Event-log slice read FROM JSONL with a fully INFERRED schema:
    * `event_id`/`user_id` land as BIGINT, `value` as DOUBLE, `props` as
    * `struct<k: bigint>` — and `ts` as a microsecond TIMESTAMP because
    * the read opts into `inferTimestamp` with the pinned format (both
    * format options are passed so the read is correct under either
    * session `spark.sql.timestampType`; the projection casts to NTZ, the
    * star schema's timestamp convention — see the scaladoc trap). The
    * filter mixes a top-level equality (pushed to the JSON parser —
    * since SPARK-32346 JsonFilters skips row materialization on
    * non-matching records) with a NESTED predicate on `props.k` (not
    * pushable — asserted as the honest limit in PlanSpec). Row-level
    * output: every surviving value is hash-compared against the source
    * parquet, so the inference's type choices gate the hash too. */
  def qJsonScan(spark: SparkSession, dir: String): DataFrame = {
    val path = jsonEvents(spark, dir)
    spark.read
      .option("inferTimestamp", "true")
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsFormat)
      .json(path)
      .filter(col("event_type") === "purchase" && col("props.k") > 50)
      // user_id is deliberately NOT referenced: its absence from the
      // scan's ReadSchema is the lane's column-pruning proof (PlanSpec)
      .select(col("event_id"),
        col("ts").cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"),
        col("event_type"), col("value"), col("props.k").as("prop_k"))
      .orderBy("event_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_scan" -> qJsonScan
  )

  /** Oracle reads the SOURCE parquet and extracts the nested field from
    * the original JSON string — the JSONL copy must round-trip values
    * (micros included) and the inference must land the same types for
    * the hashes to meet. */
  def oracleSql: Map[String, String] = Map(
    "q_json_scan" ->
      """SELECT event_id, ts, event_type, value,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        |FROM events
        |WHERE event_type = 'purchase'
        |  AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin
  )
}
