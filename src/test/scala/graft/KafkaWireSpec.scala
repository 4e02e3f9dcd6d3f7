package graft

import graft.cdc.{Cdc, CdcQueries}
import graft.sources.KafkaWire
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One Kafka record as the Spark Kafka source would emit it. */
final case class WireRecord(
    key: Array[Byte], value: Array[Byte], topic: String, partition: Int,
    offset: Long, timestamp: java.sql.Timestamp, timestampType: Int)

class KafkaWireSpec extends AnyFunSuite with SparkSpec {

  test("wire records carry the Kafka source schema") {
    val wire = KafkaWire.toWire(CdcQueries.feed(spark, sfDir), "olr.cdc")
    // literal columns come out non-nullable; names + types must match
    assert(wire.schema.map(f => (f.name, f.dataType)) ==
      KafkaWire.wireSchema.map(f => (f.name, f.dataType)))
  }

  test("batch round-trip: feed -> wire -> parse equals the direct parse") {
    val feed = CdcQueries.feed(spark, sfDir)
    val viaWire = KafkaWire.parse(KafkaWire.toWire(feed, "olr.cdc"))
      .drop("topic", "partition", "offset")
    val direct = Cdc.parse(feed, col("json"))
    assert(viaWire.exceptAll(direct).isEmpty && direct.exceptAll(viaWire).isEmpty)
    // keyed partitioning: same key -> same partition, bounded range
    val parts = KafkaWire.toWire(feed, "olr.cdc")
      .select(col("key").cast("string").cast("long").as("k"), col("partition"))
      .distinct()
    assert(parts.groupBy("k").count().filter(col("count") > 1).isEmpty)
    assert(parts.agg(max("partition")).head.getInt(0) <= 2)
  }

  test("streaming ingest over MemoryStream wire records matches batch parse") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = KafkaWire.toWire(CdcQueries.feed(spark, sfDir), "olr.cdc")
      .limit(200).as[WireRecord].collect()
    val in = MemoryStream[WireRecord]
    val parsed = KafkaWire.parse(in.toDF())
    val q = parsed.writeStream.format("memory")
      .queryName("kafka_wire_test").outputMode("append").start()
    try {
      // two deliveries, as two micro-batches
      in.addData(rows.take(100).toSeq)
      q.processAllAvailable()
      in.addData(rows.drop(100).toSeq)
      q.processAllAvailable()
      val got = spark.table("kafka_wire_test")
      assert(got.count() == rows.length)
      val batch = KafkaWire.parse(
        spark.createDataFrame(spark.sparkContext.parallelize(
          rows.map(r => org.apache.spark.sql.Row(
            r.key, r.value, r.topic, r.partition, r.offset, r.timestamp,
            r.timestampType)).toSeq), KafkaWire.wireSchema))
      assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    } finally q.stop()
  }

  test("stream() staged branch emits exactly the Kafka source schema") {
    // the flag-gated builder's contract: both branches produce the
    // same wire shape, so the downstream parse chain is source-agnostic
    val dir = java.nio.file.Files.createTempDirectory("graft_wire_staged")
    KafkaWire.toWire(CdcQueries.feed(spark, sfDir), "olr.cdc")
      .limit(50).write.mode("overwrite").parquet(dir.toString)
    val staged = KafkaWire.stream(spark, "olr.cdc", dir.toString,
      bootstrap = None)
    assert(staged.isStreaming)
    assert(staged.schema == KafkaWire.wireSchema)
    // and the identical parse chain runs on it
    val q = KafkaWire.parse(staged).writeStream.format("memory")
      .queryName("kafka_wire_staged").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("kafka_wire_staged").count() == 50)
    } finally q.stop()
  }

  test("stream() with a bootstrap flag selects the real Kafka source, not the files") {
    // no broker or spark-sql-kafka connector ships in this container,
    // so the branch must fail on the MISSING KAFKA DATA SOURCE — proof
    // the flag genuinely switches transports instead of silently
    // streaming the staged files
    val ex = intercept[Exception] {
      KafkaWire.stream(spark, "olr.cdc", "/nonexistent",
        bootstrap = Some("broker-1:9092")).schema
    }
    val msg = ex.toString.toLowerCase
    assert(msg.contains("kafka"), s"expected the kafka source lookup to fail: $ex")
  }
}
