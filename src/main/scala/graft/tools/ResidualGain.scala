package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement harness for the index-training ladder: what does each
  * trained half buy at identical nprobe/M/K/shortlist depth —
  * ann_recall_ivfpq (seed cells + raw codebook) vs
  * ann_recall_ivfpq_opq (seed cells + OPQ-lite balanced-variance
  * permutation, identical storage/cost) vs
  * ann_recall_ivfpq_res (seed cells + trained residual codebook) vs
  * ann_recall_ivfpq_opq_res (seed cells + the OPQ permutation FEEDING
  * the trained residual codebook — do the levers stack?) vs
  * ann_recall_ivfpq_rvopq_res (the RESIDUAL-variance census
  * permutation feeding the trained residual codebook — round 15
  * measured the raw census composition as a LOSS and priced this as
  * the fix) vs
  * ann_recall_ivfadc (trained cells + trained residual codebook, the
  * full FAISS IndexIVFPQ shape)? Runs the six recall rows on each
  * given SF directory and emits one JSON document with per-probe
  * recall@5 side by side plus the mean deltas — the numbers a
  * deployment reads before turning each training stage on. This is
  * measurement tooling like ScaleUp, not a registry row; the rows
  * themselves stay oracle-verified.
  *
  * Usage: `runMain graft.tools.ResidualGain <outPath> <sfDir> [sfDir...]`
  */
object ResidualGain {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ResidualGain <outPath> <sfDir> [sfDir...]")
    val out = args(0)
    val dirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def recalls(name: String, dir: String): Map[Long, Long] =
      graft.SparkEntry.queries(name)(spark, dir)
        .select("probe_id", "recall_pct").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val sections = dirs.map { dir =>
      val base = recalls("ann_recall_ivfpq", dir)
      val opq = recalls("ann_recall_ivfpq_opq", dir)
      val res = recalls("ann_recall_ivfpq_res", dir)
      val opqres = recalls("ann_recall_ivfpq_opq_res", dir)
      val rvopqres = recalls("ann_recall_ivfpq_rvopq_res", dir)
      val adc = recalls("ann_recall_ivfadc", dir)
      require(base.keySet == res.keySet && base.keySet == adc.keySet &&
          base.keySet == opq.keySet && base.keySet == opqres.keySet &&
          base.keySet == rvopqres.keySet,
        s"probe sets diverge at $dir: ${base.keySet} vs ${res.keySet} vs ${adc.keySet} vs ${opq.keySet} vs ${opqres.keySet} vs ${rvopqres.keySet}")
      val probes = base.keys.toSeq.sorted
      def mean(m: Map[Long, Long]): Double =
        m.values.sum.toDouble / m.size
      val perProbe = probes.map { p =>
        s"""{"probe_id":$p,"ivfpq":${base(p)},"ivfpq_opq":${opq(p)},"ivfpq_res":${res(p)},"ivfpq_opq_res":${opqres(p)},"ivfpq_rvopq_res":${rvopqres(p)},"ivfadc":${adc(p)}}"""
      }.mkString("[", ",", "]")
      val sfName = new java.io.File(dir).getName
      f"""{"sf":"$sfName","mean_recall_ivfpq":${mean(base)}%.1f,"mean_recall_ivfpq_opq":${mean(opq)}%.1f,"mean_recall_ivfpq_res":${mean(res)}%.1f,"mean_recall_ivfpq_opq_res":${mean(opqres)}%.1f,"mean_recall_ivfpq_rvopq_res":${mean(rvopqres)}%.1f,"mean_recall_ivfadc":${mean(adc)}%.1f,"mean_delta_opq_pts":${mean(opq) - mean(base)}%.1f,"mean_delta_res_pts":${mean(res) - mean(base)}%.1f,"mean_delta_opq_res_pts":${mean(opqres) - mean(base)}%.1f,"mean_delta_rvopq_res_pts":${mean(rvopqres) - mean(base)}%.1f,"mean_delta_adc_pts":${mean(adc) - mean(base)}%.1f,"per_probe":$perProbe}"""
    }
    val doc = sections.mkString(
      """{"metric":"recall_at_5_pct","harness":"ann_recall_ivfpq vs ann_recall_ivfpq_opq vs ann_recall_ivfpq_res vs ann_recall_ivfpq_opq_res vs ann_recall_ivfpq_rvopq_res vs ann_recall_ivfadc","runs":[""",
      ",", "]}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc + "\n")
    spark.stop()
    println(doc)
  }
}
