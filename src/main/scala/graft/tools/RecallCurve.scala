package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** The nprobe/shortlist recall-cost curve for trained IVFADC — the
  * standard deliverable after a recall headline: ONE trained index
  * (same cells, same codes), a grid of ONLINE operating points, so a
  * deployment can read the curve and pick its recall/latency point
  * instead of inheriting the registry default. Runs on the heavy-
  * jittered corpus (ScaleUp `jitter:500`) for the same reason the
  * ResidualGain ladder does: only a genuinely diverse corpus makes
  * index recall measure anything (SURVEY §9).
  *
  * Grid: nprobe ∈ {2, 4, 8, default k/8} × shortlist ∈ {40, 80};
  * recall@5 vs exact brute force per point, plus the wall seconds of
  * the full chain run (training is identical across points — the
  * online deltas ride on top of that shared floor).
  *
  * Usage: `runMain graft.tools.RecallCurve <outPath> <sfDir>`
  */
object RecallCurve {

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: RecallCurve <outPath> <sfDir>")
    val (out, dir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Native.install(spark)

    val n = graft.sources.Tables(spark, dir).embeddingsCount
    val k = Ann.ivfK(n)
    val defaultNprobe = math.max(2, k / 8)

    // exact ground truth, once
    val exact = Ann.annBruteforce.run(spark, dir)
      .filter(col("rank") <= 5).select("probe_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probes = exact.map(_._1)

    val grid = for {
      np <- Seq(2, 4, 8, defaultNprobe).distinct.sorted
      sl <- Seq(40, 80)
    } yield (np, sl)

    val points = grid.map { case (np, sl) =>
      val t0 = System.nanoTime()
      val approx = Ann.ivfAdcChain(spark, dir, Some(np), sl)
        .select("probe_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val hits = exact.count(approx.contains)
      // percentages in double (one-decimal rounding): integer division
      // floored mean recall and reported probed_fraction 0 for any
      // nprobe < k/100 (ADVICE r11)
      val recallPct = math.round(hits * 1000.0 / exact.size) / 10.0
      val perProbe = probes.toSeq.sorted.map { p =>
        val ex = exact.filter(_._1 == p)
        val pr = math.round(ex.count(approx.contains) * 1000.0 / ex.size) / 10.0
        s"""{"probe_id":$p,"recall_pct":$pr}"""
      }.mkString("[", ",", "]")
      val probedPct = math.round(np * 1000.0 / k) / 10.0
      println(s"[curve] nprobe=$np shortlist=$sl recall=$recallPct% " +
        f"(${sec}%.1f s)")
      f"""{"nprobe":$np,"shortlist":$sl,"probed_fraction_pct":$probedPct,"mean_recall_pct":$recallPct,"chain_sec":$sec%.1f,"per_probe":$perProbe}"""
    }

    val doc = points.mkString(
      s"""{"metric":"ivfadc_recall_cost_curve","dir":"$dir","n":$n,"k":$k,"default_nprobe":$defaultNprobe,"default_shortlist":80,"note":"shortlist 80 IS the registry default since round 12 (AdcShortlist, operators/Ann.scala) -- adopted from this curve's round-11 finding: recall flat in nprobe, 92 vs 72 @5 going 40->80 at flat cost","points":[""",
      ",", "]}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc + "\n")
    spark.stop()
    println(doc)
  }
}
