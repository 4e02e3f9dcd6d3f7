package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ann
import graft.sources.Tables

/** Measurement harness for the IVFADC coarse-assign pass — the N×k
  * stage `ivfK`'s √N cap exists to bound (every test/bench SF sits
  * below the 2^18-vector crossover, so the cap's branch never executes
  * in the registry; this tool runs it past the crossover on a
  * ScaleUp-generated corpus and times it against the uncapped linear-k
  * sizing on the SAME corpus, same session, back to back).
  *
  * What is timed per k: exactly the training + index-add assign work
  * ann_ivfadc performs — one Lloyd stage ([[Ann.kmeansIterate]] at
  * R=1: seed → assign → integer-mean update, both N×k passes counted)
  * plus the reassignment of the full corpus to the trained centroids
  * (the index-add assign). Search stages are excluded: they are
  * nprobe-bounded and not what the cap protects.
  *
  * Usage: `runMain graft.tools.AssignTiming <sfDir> [capped|both]`
  * (default both). Emits one JSON line per measurement.
  */
object AssignTiming {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AssignTiming <sfDir> [capped|both]")
    val dir = args(0)
    val mode = args.lift(1).getOrElse("both")
    require(mode == "capped" || mode == "both",
      s"2nd arg must be capped|both, got: $mode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Native.install(spark)

    val n = Tables(spark, dir).embeddingsCount
    val kCapped = Ann.ivfK(n)
    val kLinear = Ann.kmeansK(n)
    // warm the input (decode + page cache) so timings measure assign
    spark.read.parquet(s"$dir/embeddings.parquet").count()

    def timeAssign(k: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val (codes, _, c1, _) = Ann.kmeansIterate(spark, dir, rounds = 1, k = k)
      val assigned = Ann.kmeansAssign(codes, c1).count()
      ((System.nanoTime() - t0) / 1e9, assigned)
    }

    def emit(label: String, k: Int): Unit = {
      val (sec, assigned) = timeAssign(k)
      println(
        s"""{"tool":"assign_timing","dir":"$dir","n":$n,"label":"$label",""" +
          s""""k":$k,"pairs":${3L * n * k},"sec":${math.round(sec * 10) / 10.0},""" +
          s""""assigned":$assigned}""")
    }

    emit("capped_ivfK", kCapped)
    if (mode == "both" && kLinear != kCapped) emit("linear_kmeansK", kLinear)
    spark.stop()
  }
}
