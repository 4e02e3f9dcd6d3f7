package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation for per-key sequential operators (SURVEY §5).
  *
  * Aggregation-shaped operators (latest-per-key, per-key counts) are
  * already skew-immune here — they run as declarative aggregates with
  * map-side partial aggregation (see [[graft.cdc.Cdc.materialize]]).
  * The remaining hot-key hazard is WINDOW-shaped work: sessionization
  * runs lag+cumsum over each key's full ordered history, so one hot key
  * (a bot user with 10% of all events) funnels through one reducer.
  *
  * The fix is the classic two-phase split on a time bucket:
  *
  *  - Phase A partitions by (key, time-bucket): each bucket of a hot
  *    key sessionizes independently on a different reducer, emitting
  *    per-bucket PARTIAL sessions (count/sum/min/max — mergeable).
  *  - Phase B partitions by key over partial sessions only — orders of
  *    magnitude fewer rows than events (≤ a few per bucket) — and
  *    stitches sessions across bucket boundaries: a partial session
  *    merges into the previous one when its first event is within the
  *    gap of the previous bucket's last event. Gap semantics are
  *    exactly the single-phase rule, because session breaks are decided
  *    by consecutive-event gaps and every gap is observed either inside
  *    a bucket (phase A) or at a boundary (phase B).
  *
  * Worst-case per-reducer load drops from O(events-of-hottest-key) to
  * O(max(events-per-(key,bucket), partial-sessions-per-key)) — bounded
  * by choosing the bucket width. SkewSpec pins 1-phase == 2-phase on
  * the real table AND on a synthetic 10%-hot-key distribution.
  */
object Skew {

  /** Single-phase sessionize (the baseline): 30-min-gap sessions per
    * user, lag+cumsum sharing ONE shuffle on user_id. Input columns:
    * user_id, event_id, us (epoch micros), cents. */
  def sessionize1Phase(events: DataFrame, gapUs: Long = 1800000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
    events
      .withColumn("prev_us", lag("us", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(byUser))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        sum("cents").as("session_cents"),
        min("us").as("start_us"), max("us").as("end_us"))
  }

  /** Two-phase (salted-by-time-bucket) sessionize: identical output to
    * [[sessionize1Phase]], hot-key-safe. */
  def sessionize2Phase(events: DataFrame, gapUs: Long = 1800000000L,
                       bucketUs: Long = 3600000000L): DataFrame = {
    val byUserBucket = Window.partitionBy("user_id", "bucket")
      .orderBy(col("us").asc, col("event_id").asc)
    val partial = events
      .withColumn("bucket", expr(s"us div ${bucketUs}L"))
      .withColumn("prev_us", lag("us", 1).over(byUserBucket))
      .withColumn("new_p",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("p_id", sum("new_p").over(byUserBucket))
      .groupBy("user_id", "bucket", "p_id")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("session_cents"),
        min("us").as("start_us"), max("us").as("end_us"))
    // phase B runs over partial sessions only; start_us ties cannot
    // occur within a user (same-us events share a bucket and thus a
    // partial session), bucket is a belt-and-braces tiebreak
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("start_us").asc, col("bucket").asc)
    partial
      .withColumn("prev_end", lag("end_us", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_end").isNull || col("start_us") - col("prev_end") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(byUser))
      .groupBy("user_id", "session_id")
      .agg(sum("n_events").as("n_events"),
        sum("session_cents").as("session_cents"),
        min("start_us").as("start_us"), max("end_us").as("end_us"))
  }
}
