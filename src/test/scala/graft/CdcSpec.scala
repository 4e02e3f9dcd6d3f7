package graft

import graft.cdc.{Cdc, CdcQueries}
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  private lazy val parsed = Cdc.parse(CdcQueries.feed(spark, sfDir), col("json"))

  test("parse round-trips every event with a valid op") {
    val n = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(parsed.count() == n)
    assert(parsed.filter(!col("op").isin("c", "u", "d")).count() == 0)
    assert(parsed.filter(col("scn").isNull || col("key").isNull).count() == 0)
  }

  test("feed invariant: (key, scn) is unique — the contract the (scn, xid) tiebreaks and version collapses rely on") {
    // scn = event_id, globally unique by construction; every per-version
    // collapse keyed on (key, scn)/(key, valid_from) depends on this
    // (see Streams.cdcStreamScd2). If the feed generator ever changes,
    // this must fail before an operator silently drops a version.
    assert(parsed.groupBy("scn").count().filter(col("count") > 1).count() == 0)
  }

  test("materialize: one row per surviving key; deleted keys absent") {
    val snap = Cdc.materialize(parsed)
    assert(snap.groupBy("key").count().filter(col("count") > 1).count() == 0)
    // keys whose LAST event (max scn) is a delete must not appear
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("scn").desc)
    val lastDeleted = parsed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "d").select("key")
    assert(snap.join(lastDeleted, "key").count() == 0)
    // and the surviving rows carry the key's max non-stale scn
    val expected = parsed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "d").count()
    assert(snap.count() == expected)
  }

  test("unwrap rewrite keeps deletes flagged; non-rewrite drops them") {
    val rewrite = Cdc.unwrap(parsed, rewrite = true)
    val drop = Cdc.unwrap(parsed, rewrite = false)
    val nDeletes = parsed.filter(col("op") === "d").count()
    assert(rewrite.filter(col("__deleted") === "true").count() == nDeletes)
    assert(rewrite.count() - drop.count() == nDeletes)
    assert(drop.filter(col("__deleted") === "true").count() == 0)
  }

  test("dedup collapses redelivered events to exactly-once") {
    val doubled = parsed.union(parsed.filter(col("scn") % 7 === 0))
    assert(Cdc.dedup(doubled).count() == parsed.count())
  }

  test("single-pass redeliver emits the exact multiset of the union-with-filtered-self form") {
    // the explode-a-copy-array rewrite (one scan) must be row-for-row
    // equivalent to the naive self-union (two scans) it replaced
    val p = CdcQueries.flatten(parsed)
    val viaExplode = CdcQueries.redeliver(p)
    val viaUnion = p.union(p.filter(col("scn") % 10 === 0))
    assert(viaExplode.count() == viaUnion.count())
    assert(viaExplode.exceptAll(viaUnion).isEmpty &&
      viaUnion.exceptAll(viaExplode).isEmpty)
    // and it genuinely duplicates: strictly more rows than the feed
    assert(viaExplode.count() > p.count())
  }

  test("bootstrap: changed keys take events, untouched keys keep seeds, deletes win") {
    val snap = SparkEntry.queries("cdc_bootstrap")(spark, sfDir)
    val seeds = snap.filter(col("type") === "seed")
    val changed = snap.filter(col("type") =!= "seed")
    assert(seeds.count() > 0 && changed.count() > 0)
    // seed rows carry the pre-stream scn; changed rows a real one
    assert(seeds.filter(col("last_scn") =!= -1L).count() == 0)
    assert(changed.filter(col("last_scn") < 0L).count() == 0)
    // a key whose latest event is a delete is absent even if seeded
    val deletedLast = Cdc.materialize(parsed)  // keys surviving the feed
    val feedKeys = parsed.select("key").distinct()
    val deleted = feedKeys.except(deletedLast.select("key"))
    assert(snap.join(deleted, "key").count() == 0)
  }

  test("scd2 history: current versions equal the materialized snapshot; intervals are sane") {
    val scd2 = SparkEntry.queries("cdc_scd2_history")(spark, sfDir)
    val current = scd2.filter(col("is_current"))
      .select(col("key"), col("id"), col("cents"), col("type"),
        col("valid_from").as("last_scn"))
      .collect().map(_.toSeq).toSet
    val snap = Cdc.materialize(parsed).collect().map(_.toSeq).toSet
    assert(current == snap)
    // every closed interval ends strictly after it starts
    assert(scd2.filter(col("valid_to") =!= -1L)
      .filter(col("valid_to") <= col("valid_from")).count() == 0)
  }

  test("materialize plan has exactly one shuffle (on the key)") {
    val plan = Cdc.materialize(parsed).queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$plan")
  }

  test("q_pull_lookup: bucket pruning survives into the registry row's plan; answers match the snapshot") {
    val row = CdcQueries.qPullLookup.run(spark, sfDir)
    // the ksqlDB pull contract at 100 TB: each keyed lookup must reach
    // the scan as a PARTITION filter on the bucket directory, so one
    // `bucket=N` tree is opened per key, never the table
    // (ParquetUpsertSpec pins the scanned-file set; this pins the
    // registry row's own plan shape)
    val plan = row.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"pull lookups must prune to bucket directories; plan was:\n$plan")
    // batched shape (round 14): ONE scan node carrying a multi-value
    // bucket IN (...) partition filter — a server's 1000-key pull batch
    // plans one pruned scan, not 1000 unioned single-key scans
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).size == 1,
      s"pull batch must plan exactly one scan; plan was:\n$plan")
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("IN ("),
      s"expected a multi-value bucket IN partition filter, got: $pf")
    // answers: each fixed key's current state, exactly the batch
    // materialized snapshot restricted to those keys (tombstoned and
    // absent keys contribute no row on either side)
    val got = row.collect().map(_.toSeq).toSeq
    val snap = Cdc.materialize(parsed)
      .filter(col("key").isin(CdcQueries.PullKeys.map(Long.box): _*))
      .orderBy("key").collect().map(_.toSeq).toSeq
    assert(got == snap)
    assert(got.nonEmpty, "the fixed pull keys should exist at the spec SF")
  }
}
