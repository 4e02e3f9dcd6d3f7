package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC event model and operators, re-expressing the reference
  * pipeline's semantics Spark-first:
  *
  *  - OpenLogReplicator emits JSON change events with scn / xid /
  *    timestamp, op c|u|d and before/after payloads
  *    (reference: scripts/OpenLogReplicator.json:14 "format" block).
  *  - The Kafka->Postgres sink applies them with upsert + delete +
  *    ExtractNewRecordState("unwrap") + delete.handling.mode=rewrite
  *    (reference: README.md:792-795 transforms=unwrap config).
  *
  * Everything here is declarative DataFrame code: parsing is a
  * codegen'd `from_json`, ordering/latest-per-key is ONE hash shuffle
  * on the key followed by a ranking window — the pattern that scales
  * linearly to 100 TB because state never leaves the executor that
  * owns the key range.
  */
object Cdc {

  /** Schema of a (flattened) OLR-style change event. */
  val changeSchema: StructType = StructType(Seq(
    StructField("scn", LongType),
    StructField("tm", LongType),
    StructField("xid", StringType),
    StructField("op", StringType),
    StructField("key", LongType),
    StructField("after", StructType(Seq(
      StructField("id", LongType),
      StructField("cents", LongType),
      StructField("type", StringType)))),
    StructField("before", StructType(Seq(
      StructField("id", LongType),
      StructField("cents", LongType),
      StructField("type", StringType))))))

  /** Parse a JSON change-event string column into typed columns. */
  def parse(df: DataFrame, jsonCol: Column): DataFrame =
    df.select(from_json(jsonCol, changeSchema).as("e"))
      .select(
        col("e.scn").as("scn"), col("e.tm").as("tm"), col("e.xid").as("xid"),
        col("e.op").as("op"), col("e.key").as("key"),
        col("e.after").as("after"), col("e.before").as("before"))

  /** Debezium ExtractNewRecordState ("unwrap") SMT: one flat row per
    * event carrying the new state; deletes carry the before-image with
    * `__deleted = 'true'` when rewrite=true (the reference sink's
    * delete.handling.mode=rewrite), or are dropped when rewrite=false.
    */
  def unwrap(parsed: DataFrame, rewrite: Boolean = true): DataFrame = {
    val payload = when(col("op") === "d", col("before")).otherwise(col("after"))
    val flat = parsed
      .withColumn("__deleted", when(col("op") === "d", lit("true")).otherwise(lit("false")))
      .select(col("scn"), col("key"),
        payload.getField("id").as("id"),
        payload.getField("cents").as("cents"),
        payload.getField("type").as("type"),
        col("__deleted"))
    if (rewrite) flat else flat.filter(col("__deleted") === "false")
  }

  /** At-least-once -> exactly-once: drop redelivered events, keeping
    * one row per (key, scn). ONE shuffle on key (scn dedup is
    * key-local, matching how redelivery happens per partition). */
  def dedup(parsed: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key", "scn").orderBy(col("xid").asc)
    parsed.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Changelog -> current-state snapshot: the JDBC-sink upsert/delete
    * semantics as a batch operator. Latest event per key wins (scn
    * order, xid tiebreak); keys whose latest op is a delete vanish.
    *
    * Expressed as a max_by AGGREGATION, not a ranking window: the
    * aggregate partial-aggregates map-side (max_by with a struct
    * payload plans as ObjectHashAggregate, whose >128-group fallback
    * still COMBINES per key while sorting — a sort-based combine, not
    * a re-shuffle), so a hot key
    * costs one combine per input partition plus a reduce of
    * #partitions pre-aggregated rows — skew-immune by construction,
    * where a per-key row_number window funnels the hot key's entire
    * history through one reducer. Still exactly one shuffle, on the
    * key, and it now moves one row per (key, map partition). */
  def materialize(parsed: DataFrame): DataFrame =
    parsed
      .groupBy("key")
      .agg(max_by(
        struct(col("op"), col("after"), col("scn")),
        struct(col("scn"), col("xid"))).as("w"))
      .filter(col("w.op") =!= "d")
      .select(col("key"),
        col("w.after.id").as("id"),
        col("w.after.cents").as("cents"),
        col("w.after.type").as("type"),
        col("w.scn").as("last_scn"))
}
