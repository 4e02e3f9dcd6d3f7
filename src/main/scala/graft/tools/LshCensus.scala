package graft.tools

import org.apache.spark.sql.SparkSession

/** Output-growth audit for the heavy dedup rows (VERDICT r10 item 3):
  * a scale-chain wall-clock growth outlier is either a plan defect or
  * output-driven — on a replica-scaled corpus, duplicate families
  * co-bucket in every blocking scheme (minhash bands, simhash keys,
  * embedding cells), and a family of r replicas yields r²/2 candidate
  * pairs, so the result-row count can grow quadratically in the
  * replication factor while input grows linearly. This prints the
  * numbers that decide it per corpus, same session back to back:
  * result rows and wall seconds.
  *
  * Round-11 measurement for dedup_minhash_lsh (committed in SURVEY
  * §10): pairs 2.73M → 30.2M sf3→sf10 (11.1×) with wall 3.6 → 40.4 s
  * (11.2×) — wall tracks output exactly; the sf3→sf10 chain growth
  * the round-10 verdict flagged is the corpus construction, not the
  * plan.
  *
  * Usage: `runMain graft.tools.LshCensus [query] <sfDir> [<sfDir>...]`
  * (query defaults to dedup_minhash_lsh; any registry key works).
  */
object LshCensus {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LshCensus [query] <sfDir> [<sfDir>...]")
    val (query, dirs) =
      if (graft.SparkEntry.queries.contains(args.head) && args.length > 1)
        (args.head, args.tail)
      else ("dedup_minhash_lsh", args)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Native.install(spark)
    dirs.foreach { dir =>
      spark.read.parquet(s"$dir/documents.parquet").count() // warm input
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(query)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      println(s"""{"tool":"lsh_census","query":"$query","dir":"$dir","docs":$docs,"rows":$rows,"sec":${math.round(sec * 10) / 10.0}}""")
    }
    spark.stop()
  }
}
