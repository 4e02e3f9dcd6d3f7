package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-harness data generator: build an N×-scaled copy of a
  * driver-generated SF directory by unioning N key-shifted replicas of
  * every fact table (dimension tables `region`/`nation` stay fixed,
  * exactly like TPC-H scaling). Each replica shifts every primary and
  * foreign key by `i × (max(key)+1)` of its key domain, so referential
  * integrity (orders→customer, lineitem→orders/part/supplier,
  * events.user_id→customer) holds in the scaled corpus and per-key
  * cardinalities scale the way a real bigger SF would. Non-key payloads
  * repeat verbatim — fine for throughput measurement (and realistic for
  * the dedup suite, which exists precisely because real corpora carry
  * near-copies).
  *
  * Usage: `runMain graft.tools.ScaleUp <srcDir> <outDir> [factor]
  * [jitter]`, then point `SPARK_GRAFT_SF_DIR` at `<outDir>` for Bench.
  * This is measurement tooling, NOT a registry input: oracle
  * verification always runs on the driver's own directories.
  *
  * `jitter` mode additionally perturbs each embedding REPLICA
  * (i >= 1; replica 0 stays verbatim) by a deterministic per-element
  * delta in [-0.01, 0.01] derived from xxhash64(original vec_id,
  * replica, dim). Replicas stay near-duplicates of their original
  * (cosine ~0.999 — the realistic shape of a crawled corpus), but
  * exact nearest neighbours are no longer ties, so recall@k measured
  * on a jittered corpus is a real number instead of the trivial 100%
  * that verbatim replicas produce (any index that co-buckets identical
  * vectors aces that test). Used by the ResidualGain scale ladder;
  * throughput benches keep the unjittered corpus so wall-times stay
  * comparable across rounds.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <outDir> [factor] [jitter]")
    val (src, out) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val jitter = args.lift(3).contains("jitter")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts is TIMESTAMP(NANOS); carry it through as long nanos —
    // the same representation Tables.events reads
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def base(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    val t = (n: String) => spark.read.parquet(s"$src/$n.parquet")
    val cB = base(t("customer"), "c_custkey")
    val sB = base(t("supplier"), "s_suppkey")
    val pB = base(t("part"), "p_partkey")
    val oB = base(t("orders"), "o_orderkey")
    val eB = base(t("events"), "event_id")
    val dB = base(t("documents"), "doc_id")
    val vB = base(t("embeddings"), "vec_id")

    /** N replicas, each with the listed key columns shifted by its
      * replica index times that key's domain size. */
    def scaled(df: DataFrame, shifts: (String, Long)*): DataFrame =
      (0 until factor).map { i =>
        shifts.foldLeft(df) { case (d, (c, b)) =>
          d.withColumn(c, col(c) + lit(i * b))
        }
      }.reduce(_.unionByName(_))

    /** Embedding replicas with a deterministic per-element jitter
      * (replica 0 verbatim). Keyed on the ORIGINAL vec_id so the same
      * source vector gets the same family of perturbed copies at every
      * factor. The interpreted-HOF cost doesn't matter in a one-off
      * generator. */
    def scaledJittered(df: DataFrame, b: Long): DataFrame =
      (0 until factor).map { i =>
        val shifted = df.withColumn("vec_id", col("vec_id") + lit(i * b))
        if (i == 0) shifted
        else shifted.withColumn("embedding", expr(
          s"""transform(embedding, (x, d) -> cast(x +
             |  (pmod(xxhash64(vec_id - ${i * b}L, ${i}L, cast(d as bigint)), 2001) - 1000)
             |  / 100000.0d as float))""".stripMargin))
      }.reduce(_.unionByName(_))

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    write("region", t("region"))
    write("nation", t("nation"))
    write("customer", scaled(t("customer"), "c_custkey" -> cB))
    write("supplier", scaled(t("supplier"), "s_suppkey" -> sB))
    write("part", scaled(t("part"), "p_partkey" -> pB))
    write("orders", scaled(t("orders"), "o_orderkey" -> oB, "o_custkey" -> cB))
    write("lineitem", scaled(t("lineitem"),
      "l_orderkey" -> oB, "l_partkey" -> pB, "l_suppkey" -> sB))
    write("events", scaled(t("events"), "event_id" -> eB, "user_id" -> cB))
    write("documents", scaled(t("documents"), "doc_id" -> dB))
    write("embeddings",
      if (jitter) scaledJittered(t("embeddings"), vB)
      else scaled(t("embeddings"), "vec_id" -> vB))
    spark.stop()
  }
}
