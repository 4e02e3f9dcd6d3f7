package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Measurement tool behind PlanAuditSpec's registry-wide product
  * audit: prints every batch registry row whose static physical plan
  * contains a CartesianProduct or BroadcastNestedLoopJoin (node counts
  * from the formatted explain, which lists each node twice — tree +
  * detail). Run after adding an operator to refresh the committed
  * allowlist. Usage: `runMain graft.tools.BnljCensus [sfDir]` */
object BnljCensus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val streaming = graft.streaming.Streams.all.map(_.name).toSet
    graft.SparkEntry.queries.keys.toSeq.sorted.filterNot(streaming).foreach { n =>
      try {
        val p = graft.SparkEntry.queries(n)(spark, dir)
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
        val cp = "CartesianProduct".r.findAllIn(p).size
        if (bnlj + cp > 0) println(s"HIT $n bnlj=$bnlj cp=$cp")
      } catch { case e: Throwable => println(s"ERR $n ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
