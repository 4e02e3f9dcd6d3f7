package graft

import org.apache.spark.sql.SparkSession

/** Session factory tuned for the local[32] test rig but with settings
  * that translate directly to a multi-executor cluster: AQE on (skew
  * join + partition coalescing), shuffle partitions sized to cores
  * (on a cluster: 2-3x total executor cores), explicit broadcast
  * threshold for the star-schema dims.
  */
object GraftSession {
  def builder(cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // test tables carry TIMESTAMP(NANOS) which Spark has no type for;
      // read as long nanos (Tables.events converts to micros)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  def get(cores: Int = 32): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
