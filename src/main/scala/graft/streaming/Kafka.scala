package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** S4/S5 — REAL `format("kafka")` source/sink surface (reference
  * README.md:98-166 Kafka topics; user_posting_emulation_streaming.py
  * Kinesis streams).
  *
  * `format("kafka")` resolves the connector BY NAME at `load()`/
  * `start()` time, so this compiles and ships in a zero-egress build
  * with no Kafka jar (the no-new-dependencies rule) and runs unchanged
  * on any cluster that carries `spark-sql-kafka`. Where no connector is
  * present the calls fail fast with Spark's "Failed to find data
  * source: kafka" — pinned in KafkaSurfaceSpec, alongside round-trip
  * tests of the (pure, engine-side) record envelope.
  *
  * Kinesis (S5) has no Apache-official Structured Streaming connector;
  * the declared path is the same envelope with the stream's partition
  * key, routed to Kafka or the checkpointed file sink
  * ([[StreamJobs.cleanToParquet]]) behind the same interface.
  */
object Kafka {

  /** Wrap every row as a (key, value) Kafka record: `key` = the
    * partition column as text (same-key records land in one partition,
    * preserving per-entity order), `value` = the full row as JSON.
    * Pure DataFrame transform — testable without a broker.
    */
  def envelope(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))

  /** Inverse of [[envelope]]: parse the JSON `value` back into typed
    * columns under the declared schema (never inferred — ST1 rule).
    */
  def unenvelope(records: DataFrame, schema: StructType): DataFrame =
    records.select(from_json(col("value").cast("string"), schema).as("r"))
      .select(col("r.*"))

  /** The decode half of [[source]], split out so it runs against ANY
    * Kafka-shaped relation — rows carrying (`value`, `timestamp`), which
    * is what `format("kafka").load()` emits and what a MemoryStream
    * rehearsal feeds in tests: parse `value` under the declared schema
    * (never inferred — ST1 rule) and surface the broker ingest time as
    * `kafka_ts` (the watermark column when the payload carries no event
    * time). Keeping this a pure DataFrame transform is what lets the
    * zero-egress build execute the full source→clean→sink streaming
    * pipeline without a broker.
    */
  def decode(records: DataFrame, schema: StructType): DataFrame =
    records
      .select(from_json(col("value").cast("string"), schema).as("r"),
        col("timestamp").as("kafka_ts"))
      .select(schema.fieldNames.map(n => col(s"r.`$n`")).toSeq :+ col("kafka_ts"): _*)

  /** S4 source — subscribe to a topic; emits the declared-schema
    * columns plus `kafka_ts` via [[decode]].
    */
  def source(spark: SparkSession, bootstrapServers: String, topic: String,
             schema: StructType,
             startingOffsets: String = "earliest"): DataFrame =
    decode(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load(),
      schema)

  /** S4 sink — checkpointed exactly-once-per-epoch write of the
    * enveloped stream into a topic.
    */
  def sink(stream: DataFrame, bootstrapServers: String, topic: String,
           keyCol: String, checkpointDir: String,
           continuous: Boolean = false): StreamingQuery = {
    val w = envelope(stream, keyCol).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
    (if (continuous) w else w.trigger(Trigger.AvailableNow())).start()
  }
}
