package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable capability: a named DataFrame program plus (when the
  * semantics are SQL-expressible and deterministic) an equivalent
  * DuckDB SQL oracle over the same parquet tables. Column names/types
  * and rounding MUST match between the two — the driver hash-compares
  * values after sorting columns by name.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
