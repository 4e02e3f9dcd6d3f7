package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Two-phase (hot-key-safe) sessionize == single-phase sessionize, on
  * the real events table and on a synthetic distribution where one key
  * owns 10% of all events (the skew the single-phase window funnels
  * through one reducer). */
class SkewSpec extends SparkSpec {

  private def input = {
    graft.sources.Tables(spark, sfDir).events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .select("user_id", "event_id", "us", "cents")
  }

  test("2-phase == 1-phase on the events table") {
    val one = Skew.sessionize1Phase(input).collect().map(_.toSeq).toSet
    val two = Skew.sessionize2Phase(input).collect().map(_.toSeq).toSet
    assert(one.nonEmpty)
    assert(two == one)
  }

  /** Deterministic synthetic skew: every 10th event belongs to user 0
    * (10% of 100k events); timestamps are a multiplicative scramble
    * over a 200-day range, tuned so the hot user's mean gap sits right
    * at the 30-min session threshold — thousands of sessions, spread
    * over thousands of 1-hour phase-A buckets. */
  private def skewedEvents = {
    val rangeUs = 200L * 24 * 3600 * 1000000L
    spark.range(100000L).select(
      when(col("id") % 10 === 0, 0L)
        .otherwise(pmod(hash(col("id")), lit(200)) + 1L).as("user_id"),
      col("id").as("event_id"),
      pmod(col("id") * 999999999989L, lit(rangeUs)).as("us"),
      (col("id") % 1000L).as("cents"))
  }

  test("2-phase == 1-phase under a 10%-hot-key distribution") {
    val one = Skew.sessionize1Phase(skewedEvents).collect().map(_.toSeq).toSet
    val two = Skew.sessionize2Phase(skewedEvents).collect().map(_.toSeq).toSet
    assert(two == one)

    // sanity: the hot key really is hot and really has many sessions
    val hotSessions = Skew.sessionize2Phase(skewedEvents)
      .filter(col("user_id") === 0L).count()
    assert(hotSessions > 100)
  }

  test("phase-A partitioning actually splits the hot key across buckets") {
    // the scale property: no single window partition in phase A holds
    // the hot key's full history — its events spread over many
    // (user, bucket) groups
    val hotBuckets = skewedEvents.filter(col("user_id") === 0L)
      .select(expr("us div 3600000000L").as("bucket"))
      .distinct().count()
    val hotEvents = skewedEvents.filter(col("user_id") === 0L).count()
    assert(hotBuckets > 100, s"hot key should spread over many buckets, got $hotBuckets")
    assert(hotEvents / hotBuckets < hotEvents / 10,
      "per-bucket load must be a small fraction of the hot key's events")
  }
}
