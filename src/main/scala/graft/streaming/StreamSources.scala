package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Streaming source factory (S7; context.py:122-147
  * `getStreamingSource`): the reference passes a Glue connection-
  * options bag to an opaque backend; the public Glue Kafka option
  * vocabulary maps 1:1 onto the spark-sql-kafka source, so the
  * Spark-first translation is a rename table, not a connector.
  *
  * The Kafka connector jar itself is a deploy-time dependency
  * (spark-sql-kafka is not bundled with core Spark); in environments
  * without it, [[kafkaOptions]] is still the full contract — the
  * stream construction is one `format("kafka")` away. Kinesis has no
  * in-box Spark source and stays out of engine scope (SURVEY §2.1).
  */
object StreamSources {

  /** Translate a Glue Kafka connection-options bag to spark-sql-kafka
    * options. Unknown keys are dropped rather than passed through —
    * the kafka source rejects foreign options, and Glue bags carry
    * job-side keys (connectionName, callSite) that must not reach it.
    *
    * Glue-only knobs with no Spark analogue: numRetries /
    * retryIntervalMs (Spark has task retries), classification /
    * delimiter (payload FORMAT — in Spark that is a downstream
    * from_json/from_csv projection over `value`, not a source
    * concern).
    */
  def kafkaOptions(glue: Map[String, String]): Map[String, String] = {
    val renames = Map(
      "bootstrap.servers" -> "kafka.bootstrap.servers",
      "topicName"         -> "subscribe",
      "pollTimeoutMs"     -> "kafkaConsumer.pollTimeoutMs")
    val passthrough = Set(
      "subscribe", "subscribePattern", "assign",
      "startingOffsets", "endingOffsets", "startingTimestamp",
      "maxOffsetsPerTrigger", "minPartitions", "failOnDataLoss",
      "includeHeaders", "groupIdPrefix")
    // Kafka client security configs keep their name under the
    // consumer prefix the Spark source strips back off
    val clientPrefixes = Seq("security.", "ssl.", "sasl.")
    val mapped = glue.flatMap { case (k, v) =>
      if (renames.contains(k)) Some(renames(k) -> v)
      else if (passthrough.contains(k)) Some(k -> v)
      else if (k.startsWith("kafka.")) Some(k -> v)
      else if (clientPrefixes.exists(k.startsWith)) Some(s"kafka.$k" -> v)
      else None
    }
    require(mapped.contains("kafka.bootstrap.servers"),
      "kafka source needs bootstrap.servers")
    require(Seq("subscribe", "subscribePattern", "assign")
        .exists(mapped.contains),
      "kafka source needs topicName, subscribePattern or assign")
    mapped
  }

  /** Kafka stream from Glue-shaped options (connector jar required at
    * runtime).
    */
  def kafkaStream(
      spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.readStream.format("kafka").options(kafkaOptions(options)).load()

  /** File-based streaming source (the sandbox-testable S7 path):
    * format + path + mandatory reader schema, as Structured Streaming
    * requires for file sources.
    */
  def fileStream(
      spark: SparkSession, format: String, path: String,
      schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(schema).options(options)
      .format(format).load(path)
}
