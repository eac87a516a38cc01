package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming source plumbing (SURVEY §2 streaming block): the Kafka
  * wire contract and its test-substitutable decode stage.
  *
  * The split matters: [[kafka]] is just the connector incantation
  * (format, bootstrap, subscribe — the spark-sql-kafka connector jar
  * ships separately from Spark core and is absent in this test
  * environment), while [[decode]] is the part with semantics — schema'd
  * JSON value parsing. `decode` takes ANY frame with a Kafka-shaped
  * `value` column, so `MemoryStream[String].toDF("value")` substitutes
  * for the Kafka scan in specs and the downstream operators
  * (windowAggStream, sessionizeStreamEventTime, dedupStream) cannot
  * tell the difference. At scale the decode stage is a codegen'd
  * projection over the Kafka micro-batch scan — no extra shuffle.
  */
object EventSource {

  /** JSON payload schema of one event on the wire. Schema is REQUIRED,
    * never inferred: schema inference on a stream samples whatever
    * arrived first and silently drifts.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  /** Kafka readStream contract: subscribe to `topic`, decode each
    * record's value as one JSON event. Offsets/ordering semantics are
    * Kafka's; event-time correctness downstream comes from watermarks,
    * not arrival order.
    */
  def kafka(s: SparkSession, bootstrapServers: String, topic: String,
            startingOffsets: String = "latest"): DataFrame =
    decode(s.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load())

  /** Shared decode stage: a frame with a Kafka-shaped `value` column
    * (binary or string JSON) → typed event rows. Malformed payloads
    * yield null structs (from_json PERMISSIVE) and are dropped, AND so
    * are payloads missing any required key field (user_id/event_id/ts)
    * — a null key would otherwise kill the typed downstream stream at
    * runtime. A production pipeline would fork both to a dead-letter
    * sink instead; the filter keeps the contract explicit either way.
    * A missing `value` amount is a valid zero-value event.
    */
  def decode(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), eventSchema).as("e"))
      .filter(col("e").isNotNull && col("e.ts").isNotNull
        && col("e.user_id").isNotNull && col("e.event_id").isNotNull)
      .select(col("e.user_id").as("user_id"), col("e.event_id").as("event_id"),
        col("e.ts").as("ts"), col("e.event_type").as("event_type"),
        coalesce(col("e.value"), lit(0.0)).as("value"))

  /** Decoded frame → the event-time sessionization input type
    * (integer-cents value, same convention as the batch operators).
    */
  def asEvT(df: DataFrame): Dataset[EventStreams.EvT] = {
    import df.sparkSession.implicits._
    df.select(col("user_id"), col("event_id"), col("ts"),
      round(col("value") * 100).cast("long").as("vc"))
      .as[EventStreams.EvT]
  }
}
