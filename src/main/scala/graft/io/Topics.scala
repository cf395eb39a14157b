package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Local stand-in for the Kafka broker in topic-parity mode (S2): each
  * topic is an append-only parquet directory of (key STRING, value BINARY)
  * records — the same observable contract as the reference's chained
  * topics (every derived table materializes to its own topic,
  * generate_personalized_commands.sh:315,347,355,367,412), runnable with
  * zero brokers. A real deployment swaps this for the Kafka writers in
  * streaming.StreamingOps; everything upstream of the sink is unchanged.
  */
final class LocalTopicStore(dir: String) extends Serializable {

  private def path(topic: String) = s"$dir/$topic"

  /** Record shape: key, Avro value, and the broker-assigned record
    * timestamp — the column Flink exposes as `$rowtime` (E7; reference
    * generate_personalized_commands.sh:493-501). Assigned at append time
    * like Kafka's LogAppendTime. */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", BinaryType),
    StructField("rowtime", TimestampType)))

  /** Append framed records. `df` must be (key STRING, value BINARY). */
  def append(df: DataFrame, topic: String): Unit =
    df.select(col("key").cast("string").as("key"), col("value"),
        current_timestamp().as("rowtime"))
      .write.mode(SaveMode.Append).parquet(path(topic))

  def read(spark: SparkSession, topic: String): DataFrame =
    spark.read.schema(recordSchema).parquet(path(topic))

  /** Continuous consumer: a streaming file source over the topic
    * directory — every appended file is a new batch of records, the
    * subscribe-to-topic analog. The directory is created up front so the
    * stream can start before the first producer append. `options` maps
    * to source options (e.g. maxFilesPerTrigger to bound micro-batch
    * size, the max.poll.records analog). */
  def readStream(spark: SparkSession, topic: String,
                 options: Map[String, String] = Map.empty): DataFrame = {
    new java.io.File(path(topic)).mkdirs()
    spark.readStream.options(options).schema(recordSchema).parquet(path(topic))
  }

  def exists(topic: String): Boolean =
    new java.io.File(path(topic)).exists()
}
