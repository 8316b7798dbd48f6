package graft.sources

import org.apache.spark.sql.DataFrame

import graft.net.MqttClient

/** MQTT JSON sink — the reference's R5 semantics (serialize each row to
  * JSON, publish to a topic; reference/src/main/java/stream/
  * StreamProcessor.java:110-131 does this with a KafkaProducer per
  * record) over the wire protocol this environment can actually speak
  * (no Kafka broker/connector jar exists offline; the MQTT stack is
  * in-repo, `graft.net`).
  *
  * Shape: one client PER PARTITION, opened in `foreachPartition` on the
  * executors — the same producer-per-task economics as a Kafka sink, not
  * a driver-side collect. QoS 1 means every publish is broker-acked
  * before the task proceeds (already stronger than the reference's
  * fire-and-forget producer). Delivery is AT-LEAST-ONCE under Spark task
  * retries, exactly like every Kafka-producer sink without transactional
  * ids — the streaming entry point takes `foreachBatch`, where the
  * batch-id gives callers the dedup key if the downstream needs
  * idempotence (the repo's parquet sinks show the exactly-once
  * alternative).
  *
  * At scale: fan-in to ONE broker endpoint is the reference's own
  * bottleneck (BASELINE.md §1); a production deployment shards topics
  * across brokers or fronts a replayable log. The Spark side is already
  * shaped for that — partitions publish independently. */
object MqttSink {

  /** Publish every row of `df` as one JSON message. Batch or foreachBatch. */
  def publish(df: DataFrame, host: String, port: Int, topic: String,
      clientIdPrefix: String = "graft-sink"): Unit =
    df.toJSON.rdd.foreachPartition { rows =>
      if (rows.nonEmpty) {
        val part = org.apache.spark.TaskContext.getPartitionId()
        val c = new MqttClient(host, port, s"$clientIdPrefix-$part").connect()
        try rows.foreach(r => c.publish(topic, r)) // QoS 1: per-message ack
        finally c.close()
      }
    }
}
