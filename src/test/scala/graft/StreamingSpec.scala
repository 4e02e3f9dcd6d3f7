package graft

import graft.streaming.{ChangeRow, Streams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Incremental (multi-batch) semantics of the streaming operators —
  * the part the bounded-run DuckDB oracles can't see. */
class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def ins(key: Long, scn: Long, cents: Long): ChangeRow =
    ChangeRow(key, scn, s"x.$scn", "c", Some(key), Some(cents), Some("t"))
  private def upd(key: Long, scn: Long, cents: Long): ChangeRow =
    ChangeRow(key, scn, s"x.$scn", "u", Some(key), Some(cents), Some("t"))
  private def del(key: Long, scn: Long): ChangeRow =
    ChangeRow(key, scn, s"x.$scn", "d", None, None, None)

  test("materializeStream: upsert/delete state transitions across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[ChangeRow]
    val q = Streams.materializeStream(in.toDS()).writeStream
      .format("memory").queryName("mat_test").outputMode("update").start()
    try {
      in.addData(ins(1, 10, 100), ins(2, 11, 200))
      q.processAllAvailable()
      val afterB1 = spark.table("mat_test").collect()
        .map(r => (r.getLong(0), r.getLong(2))).sorted
      assert(afterB1.toSeq == Seq((1L, 100L), (2L, 200L)))

      // batch 2: update key 1, delete key 2, and a LATE event for key 1
      // (scn 5 < 10) that must NOT win
      in.addData(upd(1, 20, 150), del(2, 12), ins(1, 5, 999))
      q.processAllAvailable()
      val updates = spark.table("mat_test").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
      // update-mode sink accumulates per-batch emissions: batch 2 emits
      // key 1 at scn 20 (cents 150) and nothing for deleted key 2
      assert(updates.count(r => r._1 == 1L && r._3 == 20L && r._2 == 150L) == 1)
      assert(!updates.exists(r => r._1 == 2L && r._3 > 11L))
      assert(!updates.exists(r => r._1 == 1L && r._3 == 5L))
    } finally q.stop()
  }

  test("materializeStream: delete then re-insert with higher scn resurrects the key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[ChangeRow]
    val q = Streams.materializeStream(in.toDS()).writeStream
      .format("memory").queryName("mat_test2").outputMode("update").start()
    try {
      in.addData(ins(7, 1, 70), del(7, 2))
      q.processAllAvailable()
      assert(spark.table("mat_test2").collect().isEmpty)
      in.addData(ins(7, 3, 77))
      q.processAllAvailable()
      val rows = spark.table("mat_test2").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
      assert(rows.toSeq == Seq((7L, 77L, 3L)))
    } finally q.stop()
  }

  test("bounded streaming queries agree with their batch equivalents") {
    // tumbling-window streaming agg == batch tumbling agg at sf0.001
    val streamed = Streams.qStreamTumbling.run(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val batch = graft.sources.Tables(spark, sfDir).events
      .selectExpr("(unix_micros(ts) div 3600000000) * 3600000000 AS window_start_us",
        "event_type", "value")
      .groupBy("window_start_us", "event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum("value"), 2).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
