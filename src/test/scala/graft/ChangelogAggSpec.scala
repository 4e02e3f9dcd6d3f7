package graft

import graft.cdc.{Cdc, CdcQueries, ChangelogAgg}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A full-image change row as it would arrive on an OLR wire with
  * supplemental logging: before image NULL for inserts / across a
  * delete, after image NULL for deletes. Top-level so the Dataset
  * encoder derives (MemoryStream needs a static case class). */
private[graft] case class FullRow(
    key: Long, scn: Long, xid: String,
    a_cents: Option[Long], a_type: Option[String],
    b_cents: Option[Long], b_type: Option[String])

/** Retraction-based aggregate maintenance: the delta path must equal
  * the snapshot path exactly — including updates that move a key
  * between groups, deletes, and re-inserts — and must do it without
  * grouping on the key. */
class ChangelogAggSpec extends AnyFunSuite with SparkSpec {

  private def row(key: Long, scn: Long,
      before: Option[(Long, String)], after: Option[(Long, String)]): FullRow =
    FullRow(key, scn, s"x.$scn",
      after.map(_._1), after.map(_._2), before.map(_._1), before.map(_._2))

  test("delta aggregate equals snapshot aggregate on the real feed") {
    val delta = ChangelogAgg.aggregateDeltas(
      ChangelogAgg.fullImageColumns(Cdc.parse(
        spark.read.parquet(ChangelogAgg.stagedFullFeed(spark, sfDir)),
        col("json"))))
      .orderBy("type").collect()
    val snapshot = Cdc.materialize(
        Cdc.parse(CdcQueries.feed(spark, sfDir), col("json")))
      .groupBy("type")
      .agg(sum("cents").as("sum_cents"), count(lit(1)).as("live_rows"))
      .orderBy("type").collect()
    assert(delta.nonEmpty)
    assert(delta.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      snapshot.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("group-migrating update, delete, and re-insert all retract correctly") {
    import spark.implicits._
    val history = Seq(
      // key 1: insert into group A, then move to group B with new value
      row(1, 10, None, Some((100L, "A"))),
      row(1, 11, Some((100L, "A")), Some((250L, "B"))),
      // key 2: insert into A, delete (group A must lose its contribution)
      row(2, 20, None, Some((40L, "A"))),
      row(2, 21, Some((40L, "A")), None),
      // key 3: insert, delete, re-insert into a different group
      row(3, 30, None, Some((7L, "A"))),
      row(3, 31, Some((7L, "A")), None),
      row(3, 32, None, Some((9L, "C"))))
    val out = ChangelogAgg.aggregateDeltas(history.toDF())
      .orderBy("type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // group A netted to zero live rows and must VANISH, not show 0
    assert(out == Seq(("B", 250L, 1L), ("C", 9L, 1L)))
  }

  test("delta aggregation is order- and batch-split-independent") {
    import spark.implicits._
    val history = Seq(
      row(1, 10, None, Some((100L, "A"))),
      row(1, 11, Some((100L, "A")), Some((250L, "B"))),
      row(2, 20, None, Some((40L, "A"))),
      row(2, 21, Some((40L, "A")), None))
    val shuffled = Seq(history(3), history(0), history(2), history(1))
    val a = ChangelogAgg.aggregateDeltas(history.toDF()).orderBy("type").collect().toSeq
    val b = ChangelogAgg.aggregateDeltas(shuffled.toDF()).orderBy("type").collect().toSeq
    assert(a == b)
  }

  test("operator plan: one exchange on the group key, no per-key window") {
    import spark.implicits._
    val full = Seq(row(1, 10, None, Some((100L, "A")))).toDF()
    val p = ChangelogAgg.aggregateDeltas(full).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Window"), p)
    // partial aggregation must happen map-side before the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("wire-native registry row: ZERO windows anywhere in the plan") {
    // the before-images arrive ON the staged wire (supplemental-logging
    // shape), so the whole operator plan — bytes to aggregate — must be
    // window-free; the lag lives only in feed generation
    val p = SparkEntry.queries("cdc_changelog_agg")(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), p)
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1, p)
  }

  test("streaming: per-group state merges across micro-batches, latest emission wins") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[FullRow]
    val agg = ChangelogAgg.contributions(in.toDF())
      .groupBy("type")
      .agg(sum("d_cents").as("sum_cents"), sum("d_rows").as("live_rows"),
        count(lit(1)).as("n_contrib"))
    val q = agg.writeStream.format("memory").queryName("chagg_test")
      .outputMode("update").start()
    try {
      in.addData(row(1, 10, None, Some((100L, "A"))),
        row(2, 20, None, Some((40L, "A"))))
      q.processAllAvailable()
      // batch 2: key 1 migrates A -> B, key 2 deleted: group A must be
      // re-emitted with zero live rows
      in.addData(row(1, 11, Some((100L, "A")), Some((250L, "B"))),
        row(2, 21, Some((40L, "A")), None))
      q.processAllAvailable()
      val collapsed = spark.table("chagg_test")
        .groupBy("type")
        .agg(max_by(struct(col("sum_cents"), col("live_rows")),
          col("n_contrib")).as("v"))
        .select(col("type"), col("v.sum_cents"), col("v.live_rows"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(collapsed == Seq(("A", 0L, 0L), ("B", 250L, 1L)))
      // after the live_rows > 0 filter the dead group disappears,
      // matching the snapshot-path oracle
      assert(collapsed.filter(_._3 > 0) == Seq(("B", 250L, 1L)))
    } finally q.stop()
  }
}
