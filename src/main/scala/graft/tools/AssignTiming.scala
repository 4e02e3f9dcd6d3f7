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
    sys.env.get("SPARK_GRAFT_OBJ_FALLBACK").foreach(v =>
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))

    val n = Tables(spark, dir).embeddingsCount
    val kCapped = Ann.ivfK(n)
    // tool corpora stay far below the Int ceiling; kmeansK itself is
    // Long (its value is astronomically past Int only past N ≈ 2.7e11)
    val kLinear = Ann.kmeansK(n).toInt
    // warm the input (decode + page cache) so timings measure assign
    spark.read.parquet(s"$dir/embeddings.parquet").count()

    // One Lloyd training stage + the index-add reassign — exactly the
    // two N×k passes ann_ivfadc runs offline — stage by stage, so cost
    // lands on a named phase instead of one opaque number.
    def timeAssign(k: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      var last = t0
      def lap(tag: String): Unit = {
        val now = System.nanoTime()
        println(f"[phase] k=$k $tag ${(now - last) / 1e9}%.1f s (cum ${(now - t0) / 1e9}%.1f)")
        last = now
      }
      val codes = Ann.kmeansCodes(spark, dir).localCheckpoint()
      codes.count(); lap("codes_ckpt")
      val cents0 = codes.filter(col("vec_id") < k)
        .select(col("vec_id").as("c_id"), col("qd").as("cd"),
          col("qn2").as("cn2"))
      val a0 = Ann.kmeansAssign(codes, cents0).localCheckpoint()
      a0.count(); lap("train_assign_ckpt")
      a0.agg(sum(lit(1.0) - col("cos"))).head(); lap("inertia")
      val c1 = Ann.kmeansUpdate(a0).localCheckpoint()
      c1.count(); lap("update_ckpt")
      val assigned = Ann.kmeansAssign(codes, c1).localCheckpoint().count()
      lap("reassign_ckpt")
      ((System.nanoTime() - t0) / 1e9, assigned)
    }

    def emit(label: String, k: Int): Unit = {
      val (sec, assigned) = timeAssign(k)
      println(
        s"""{"tool":"assign_timing","dir":"$dir","n":$n,"label":"$label",""" +
          s""""k":$k,"pairs":${2L * n * k},"sec":${math.round(sec * 10) / 10.0},""" +
          s""""assigned":$assigned}""")
    }

    emit("capped_ivfK", kCapped)
    if (mode == "both" && kLinear != kCapped) emit("linear_kmeansK", kLinear)

    // The TWO-LEVEL total (round 12): coarse stage at ivfK(N) — the
    // same two N×k passes emit("capped_ivfK") times — PLUS the local
    // occupancy-128 stage inside each cell (seed/assign/update/
    // reassign on the cid-join pair stream). This is dedup_semantic /
    // cluster_kmeans's whole assign bill; against "linear_kmeansK"
    // (the flat scheme those rows ran through round 11) it is the
    // committed crossover evidence for the hierarchical design.
    {
      val t0 = System.nanoTime()
      val (_, la1) = Ann.kmeans2Stage(spark, dir)
      val finalAssigned = la1.count()
      val clusters = la1.select("cid", "lcid").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        s"""{"tool":"assign_timing","dir":"$dir","n":$n,"label":"two_level",""" +
          s""""k":$kCapped,"coarse_pairs":${2L * n * kCapped},"sec":${math.round(sec * 10) / 10.0},""" +
          s""""assigned":$finalAssigned,"final_clusters":$clusters}""")
    }
    spark.stop()
  }
}
