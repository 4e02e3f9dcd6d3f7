package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema'd loaders for the driver-generated TPC-H-ish tables
  * (see TESTDATA.md). One place to hang partitioning/bucketing hints;
  * everything downstream takes these DataFrames, so a production
  * deployment swaps this for its own catalog without touching
  * operators.
  */
final case class Tables(spark: SparkSession, dir: String) {
  graft.functions.Native.install(spark)

  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects as a
    * timestamp type; read it as long nanos and truncate to micros —
    * the same truncation DuckDB applies casting TIMESTAMP_NS->TIMESTAMP,
    * so oracle comparisons agree. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")
}

object Tables {
  /** Read a lake table, or return an empty frame with `schema` ONLY
    * when the table does not exist yet — path missing, or a directory
    * holding nothing but hidden metadata (`_`/`.`-prefixed), which is
    * what a writer crash between its metadata write and first data
    * write leaves behind (documented-harmless in ParquetUpsert). Any
    * other failure — corrupt footer, truncated file, IO/permission
    * error — propagates: the callers' contract is provable
    * equivalence to a from-scratch run, and silently treating a
    * damaged index as empty is data corruption, not recovery. */
  def readOrEmpty(sp: SparkSession, path: String,
                  schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sp.sparkContext.hadoopConfiguration)
    val exists = fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (!exists)
      sp.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else sp.read.parquet(path)
  }
}
