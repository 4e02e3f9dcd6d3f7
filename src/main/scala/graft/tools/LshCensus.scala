package graft.tools

import org.apache.spark.sql.SparkSession

/** Output-growth audit for dedup_minhash_lsh (VERDICT r10 item 3):
  * the sf3→sf10 wall-clock growth outlier is either a plan defect or
  * output-driven — replica scaling packs band buckets toward the
  * MaxBucket cap, and a bucket of size m yields m²/2 candidate pairs,
  * so the DISTINCT-pair output can grow quadratically-in-the-cap
  * while input grows linearly. This prints the numbers that decide
  * it: result rows (distinct candidate pairs) and wall seconds per
  * corpus, same session back to back.
  *
  * Usage: `runMain graft.tools.LshCensus <sfDir> [<sfDir> ...]`
  */
object LshCensus {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LshCensus <sfDir> [<sfDir>...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Native.install(spark)
    args.foreach { dir =>
      spark.read.parquet(s"$dir/documents.parquet").count() // warm input
      val t0 = System.nanoTime()
      val pairs = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      println(s"""{"tool":"lsh_census","dir":"$dir","docs":$docs,"pairs":$pairs,"sec":${math.round(sec * 10) / 10.0}}""")
    }
    spark.stop()
  }
}
