package graft

import graft.sinks.JdbcUpsert
import graft.streaming.ChangeRow
import org.apache.spark.sql.DataFrame

/** The JDBC upsert/delete sink against embedded Derby
  * (`jdbc:derby:memory:`): the micro-batch apply path the
  * `cdc_jdbc_upsert` registry row drives end to end. Covers the three
  * contracts the reference's JDBC sink connector provides
  * (insert.mode=upsert, pk.mode=record_key, delete.enabled=true):
  * upsert/delete state transitions, redelivered-batch idempotency via
  * the monotonic-scn guard, and parity with the batch materializer. */
class JdbcUpsertSpec extends SparkSpec {

  private def ins(key: Long, scn: Long, cents: Long): ChangeRow =
    ChangeRow(key, scn, s"x.$scn", "c", Some(key), Some(cents), Some("t"))
  private def upd(key: Long, scn: Long, cents: Long): ChangeRow =
    ChangeRow(key, scn, s"x.$scn", "u", Some(key), Some(cents), Some("t"))
  private def del(key: Long, scn: Long): ChangeRow =
    ChangeRow(key, scn, s"x.$scn", "d", None, None, None)

  private def toBatch(rows: Seq[ChangeRow]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  private def snapshot(url: String): Seq[(Long, Long, Long)] =
    JdbcUpsert.readBack(spark, url, "snapshot").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSeq.sorted

  test("insert -> update -> delete across micro-batches") {
    val url = JdbcUpsert.memUrl()
    JdbcUpsert.ensureTable(url, "snapshot")
    JdbcUpsert.applyBatch(toBatch(Seq(ins(1, 10, 100), ins(2, 11, 200))), url, "snapshot")
    assert(snapshot(url) == Seq((1L, 100L, 10L), (2L, 200L, 11L)))

    JdbcUpsert.applyBatch(toBatch(Seq(upd(1, 20, 150), del(2, 12))), url, "snapshot")
    assert(snapshot(url) == Seq((1L, 150L, 20L)))

    // delete then re-insert with a higher scn resurrects the key
    JdbcUpsert.applyBatch(toBatch(Seq(ins(2, 30, 222))), url, "snapshot")
    assert(snapshot(url) == Seq((1L, 150L, 20L), (2L, 222L, 30L)))
  }

  test("redelivered batch is idempotent (monotonic-scn guard)") {
    val url = JdbcUpsert.memUrl()
    JdbcUpsert.ensureTable(url, "snapshot")
    val batch = Seq(ins(1, 10, 100), upd(1, 20, 150), ins(2, 11, 200), del(3, 5))
    JdbcUpsert.applyBatch(toBatch(batch), url, "snapshot")
    val first = snapshot(url)
    // the at-least-once transport redelivers the whole batch
    JdbcUpsert.applyBatch(toBatch(batch), url, "snapshot")
    assert(snapshot(url) == first)
    assert(first == Seq((1L, 150L, 20L), (2L, 200L, 11L)))
  }

  test("out-of-order older event does not overwrite newer state") {
    val url = JdbcUpsert.memUrl()
    JdbcUpsert.ensureTable(url, "snapshot")
    JdbcUpsert.applyBatch(toBatch(Seq(upd(1, 50, 500))), url, "snapshot")
    // a straggler batch with only an older event for the same key
    JdbcUpsert.applyBatch(toBatch(Seq(upd(1, 40, 999))), url, "snapshot")
    assert(snapshot(url) == Seq((1L, 500L, 50L)))
    // and an older delete must not remove newer state
    JdbcUpsert.applyBatch(toBatch(Seq(del(1, 45))), url, "snapshot")
    assert(snapshot(url) == Seq((1L, 500L, 50L)))
  }

  test("end state parity with the batch cdc_materialize operator") {
    import org.apache.spark.sql.functions.col
    val url = JdbcUpsert.memUrl()
    JdbcUpsert.ensureTable(url, "snapshot")
    val parsed = graft.cdc.Cdc.parse(
      graft.cdc.CdcQueries.feed(spark, sfDir), col("json"))
    val typed = parsed.select(col("key"), col("scn"), col("xid"), col("op"),
      org.apache.spark.sql.functions
        .when(col("op") === "d", col("before.id")).otherwise(col("after.id")).as("id"),
      org.apache.spark.sql.functions
        .when(col("op") === "d", col("before.cents")).otherwise(col("after.cents")).as("cents"),
      org.apache.spark.sql.functions
        .when(col("op") === "d", col("before.type")).otherwise(col("after.type")).as("typ"))
    JdbcUpsert.applyBatch(typed, url, "snapshot")
    val viaJdbc = JdbcUpsert.readBack(spark, url, "snapshot")
      .collect().map(_.toSeq).toSet
    val viaBatch = graft.cdc.Cdc.materialize(parsed)
      .collect().map(_.toSeq).toSet
    assert(viaJdbc == viaBatch)
  }

  test("MERGE-free fallback path produces the identical table (sf3 Derby-MERGE defect route)") {
    // the portable update-then-insert loop is what every MERGE failure
    // ultimately falls back to; run the full state-transition +
    // redelivery + out-of-order matrix through it and require the end
    // state to match the MERGE path bit for bit
    val urlM = JdbcUpsert.memUrl()
    val urlN = JdbcUpsert.memUrl()
    JdbcUpsert.ensureTable(urlM, "snapshot")
    JdbcUpsert.ensureTable(urlN, "snapshot")
    val batches = Seq(
      Seq(ins(1, 10, 100), ins(2, 11, 200), ins(3, 12, 300)),
      Seq(upd(1, 20, 150), del(2, 13), ins(4, 14, 400)),
      Seq(upd(1, 20, 150), del(2, 13), ins(4, 14, 400)), // redelivery
      Seq(upd(3, 5, 999), del(4, 2)),                    // stragglers lose
      Seq(ins(2, 30, 222)))                              // resurrect
    batches.foreach { b =>
      JdbcUpsert.applyBatch(toBatch(b), urlM, "snapshot")
      JdbcUpsert.applyBatchNoMerge(toBatch(b), urlN, "snapshot")
    }
    assert(snapshot(urlN) == snapshot(urlM))
    assert(snapshot(urlN) ==
      Seq((1L, 150L, 20L), (2L, 222L, 30L), (3L, 300L, 12L), (4L, 400L, 14L)))
  }

  test("chunk-severity classification: rollback and connection classes rethrow, statement classes fall back per-row") {
    import java.sql._
    // chunk-severe: the in-flight transaction or connection is gone —
    // per-row recovery would lose applied rows / cascade on a corpse
    assert(JdbcUpsert.chunkSeverity(new SQLTransactionRollbackException("deadlock", "40001")))
    assert(JdbcUpsert.chunkSeverity(new SQLException("lock timeout", "40XL1")))
    assert(JdbcUpsert.chunkSeverity(new SQLException("dead statement", "40XC0")))
    assert(JdbcUpsert.chunkSeverity(new SQLNonTransientConnectionException("No current connection.", "08003")))
    assert(JdbcUpsert.chunkSeverity(new SQLException("connection closed", "08006")))
    assert(JdbcUpsert.chunkSeverity(new SQLTransientConnectionException("blip")))
    // statement-severity: MERGE machinery failing on a live connection
    // — the per-row MERGE-free loop is the right recovery
    assert(!JdbcUpsert.chunkSeverity(new SQLException("_actionRS is null", "XJ001")))
    assert(!JdbcUpsert.chunkSeverity(new SQLException("duplicate key", "23505")))
    assert(!JdbcUpsert.chunkSeverity(new SQLException("no state")))
  }

  test("writer layout: embedded Derby is single-writer; server targets get disjoint ascending key ranges") {
    import spark.implicits._
    val latest = (0L until 1000L).map(k => (k, k * 10, "c", k, k, "t"))
      .toDF("key", "scn", "op", "id", "cents", "typ")
    // embedded Derby: ONE writer task, no concurrency — the captured
    // buffer-manager monitor deadlock makes any >1 layout unsafe
    val derby = JdbcUpsert.writerPartitioned(latest, "jdbc:derby:memory:x")
    assert(derby.rdd.getNumPartitions == 1)
    // server-class target: N writers over DISJOINT key ranges, each
    // applied in ascending key order — a globally consistent row-lock
    // acquisition order, so no wait cycle is constructible
    val srv = JdbcUpsert.writerPartitioned(latest, "jdbc:postgresql://db/x")
    val parts = srv.select("key").rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator.single(i -> it.map(_.getLong(0)).toVector) }
      .collect().toMap.filter(_._2.nonEmpty)
    assert(parts.size > 1)
    parts.values.foreach(ks => assert(ks == ks.sorted, "ascending within writer"))
    val ranges = parts.values.map(ks => (ks.head, ks.last)).toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax < bMin, "disjoint ranges")
      case _ => ()
    }
    assert(parts.values.flatten.toSet == (0L until 1000L).toSet, "no row lost")
  }
}
