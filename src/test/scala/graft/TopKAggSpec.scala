package graft

import graft.sources.Tables
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_topk (custom TypedImperativeAggregate): heap semantics must
  * equal the window-rank formulation exactly, survive arbitrary
  * partitioning (partial heaps merged across map tasks), and plan as a
  * pre-shuffle partial aggregation. */
class TopKAggSpec extends AnyFunSuite with SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("graft_topk == row_number window on real data") {
    val o = Tables(spark, sfDir).orders.select(
      (col("o_custkey") % 10).as("grp"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderkey"))
    val viaAgg = o.groupBy("grp")
      .agg(expr("graft_topk(cents, o_orderkey, 5)").as("top"))
      .select(col("grp"), col("top.v").as("vs"), col("top.id").as("ids"))
      .select(col("grp"), posexplode(arrays_zip(col("vs"), col("ids"))))
      .select(col("grp"), col("col.vs").as("cents"), col("col.ids").as("o_orderkey"))
    val viaWindow = o.withColumn("rank", row_number().over(
        Window.partitionBy("grp").orderBy(col("cents").desc, col("o_orderkey").desc)))
      .filter(col("rank") <= 5).drop("rank")
    assert(pairs(viaAgg.orderBy("grp", "cents", "o_orderkey")) ==
      pairs(viaWindow.orderBy("grp", "cents", "o_orderkey")))
  }

  test("result is independent of input partitioning (partial-heap merge)") {
    val o = Tables(spark, sfDir).orders.select(
      (col("o_custkey") % 7).as("grp"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderkey"))
    def run(df: org.apache.spark.sql.DataFrame) = pairs(
      df.groupBy("grp").agg(expr("graft_topk(cents, o_orderkey, 4)").as("top"))
        .select(col("grp"), posexplode(col("top")))
        .select(col("grp"), col("col.v"), col("col.id"))
        .orderBy("grp", "v", "id"))
    assert(run(o.repartition(1)) == run(o.repartition(13)))
  }

  test("ties at the K boundary break on the id, matching ORDER BY v DESC, id DESC") {
    import spark.implicits._
    // four rows with identical value: ids 9, 8 must win at K=2
    val df = Seq((1L, 100L, 6L), (1L, 100L, 9L), (1L, 100L, 7L), (1L, 100L, 8L))
      .toDF("grp", "cents", "id")
    val got = pairs(df.groupBy("grp")
      .agg(expr("graft_topk(cents, id, 2)").as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), col("col.v"), col("col.id"))
      .orderBy(col("col.id").desc))
    assert(got == Seq((1L, 100L, 9L), (1L, 100L, 8L)))
  }

  test("streaming: heap state merges across micro-batches in the state store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Long, Long)]
    val agg = in.toDF().toDF("grp", "cents", "id")
      .groupBy("grp")
      .agg(expr("graft_topk(cents, id, 2)").as("top"),
        count(lit(1)).as("n_seen"))
    val q = agg.writeStream.format("memory").queryName("topk_stream")
      .outputMode("update").start()
    try {
      in.addData((1L, 10L, 100L), (1L, 30L, 101L))
      q.processAllAvailable()
      // batch 2: 20 displaces 10 but not 30 — the K=2 heap restored
      // from the STATE STORE must still know about both earlier rows
      in.addData((1L, 20L, 102L), (1L, 5L, 103L))
      q.processAllAvailable()
      val last = spark.table("topk_stream")
        .groupBy("grp").agg(max_by(col("top"), col("n_seen")).as("top"))
        .select(posexplode(col("top")))
        .collect().map(r => (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))).toSeq
      assert(last == Seq((30L, 101L), (20L, 102L)))
    } finally q.stop()
  }

  test("analysis rejects fractional inputs and non-literal k with readable errors") {
    import spark.implicits._
    val df = Seq((1L, 1.5, 2L)).toDF("grp", "v", "id")
    val fractional = intercept[Exception] {
      df.groupBy("grp").agg(expr("graft_topk(v, id, 3)")).collect()
    }
    assert(fractional.getMessage.contains("integral"), fractional.getMessage)
    val nonLiteral = intercept[Exception] {
      df.select(col("grp"), col("id"), col("id").as("k2"))
        .groupBy("grp").agg(expr("graft_topk(id, id, k2)")).collect()
    }
    assert(nonLiteral.getMessage.contains("literal"), nonLiteral.getMessage)
  }

  test("groups smaller than K return whole; plan partial-aggregates before the exchange") {
    import spark.implicits._
    val small = Seq((1L, 5L, 1L), (1L, 6L, 2L), (2L, 7L, 3L))
      .toDF("grp", "cents", "id")
      .groupBy("grp").agg(expr("graft_topk(cents, id, 10)").as("top"))
      .select(col("grp"), size(col("top")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(small == Seq((1L, 2), (2L, 1)))

    val p = SparkEntry.queries("q_topk_agg")(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // typed-buffer aggregates plan as ObjectHashAggregate: partial
    // (map-side heaps) + final (merge) around ONE exchange
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1, p)
  }
}
