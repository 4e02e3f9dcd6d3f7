package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Source/sink surface of the engine (SURVEY.md §G): schema'd readers
  * for parquet/csv/json/orc and writers with the layouts that matter at
  * 100 TB — hive-style partitioning (partition pruning at read) and
  * bucketing (shuffle-free joins on the bucket key).
  *
  * All readers take an explicit schema: schema inference is a full
  * extra pass over the data at scale, and a production feed's schema is
  * a contract, not a guess.
  */
object Formats {

  private def reader(spark: SparkSession, schema: org.apache.spark.sql.types.StructType): DataFrameReader =
    spark.read.schema(schema)

  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    reader(spark, schema).option("header", "true").csv(path)

  def readJson(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    reader(spark, schema).json(path)

  def readOrc(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    reader(spark, schema).orc(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** hive-style partitioned parquet: one directory per partition value;
    * a filter on the partition column prunes whole directories at plan
    * time (PartitionFilters in the scan, not data skipping). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** bucketed + sorted table: co-locates rows by hash(bucket key) at
    * WRITE time, so a join or aggregation on that key needs no shuffle
    * at READ time. Bucket count should match the downstream
    * parallelism (a divisor/multiple of shuffle.partitions). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, bucketCol: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
