package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Debug helper: print the formatted physical plan of one registry row
  * and its static hash-exchange count (the PlanAuditSpec metric). */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    println(p)
    println("HASHPART_COUNT=" + "hashpartitioning\\(".r.findAllIn(p).size)
    spark.stop()
  }
}
