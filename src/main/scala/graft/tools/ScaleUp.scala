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
  * `jitter[:permille]` mode additionally perturbs each embedding
  * REPLICA (i >= 1; replica 0 stays verbatim) by a deterministic
  * per-element delta derived from xxhash64(original vec_id, replica,
  * dim), with amplitude `permille`/1000 (default 10 → ±0.01). Small
  * amplitudes keep replicas near-duplicates (cosine ~0.999 — the
  * crawled-corpus shape the dedup suite wants) but leave every
  * replica FAMILY trivially co-bucketed, so recall@5 still saturates
  * at 100% (measured: the family is the top-5 and every cell-based
  * index co-locates it). A heavy amplitude (e.g. `jitter:500` →
  * ±0.5, element scale of the vectors themselves) scatters the
  * families into a genuinely diverse corpus where the true top-5
  * crosses family lines — the configuration the ResidualGain scale
  * ladder uses, because only there does index recall measure
  * anything. Throughput benches keep the unjittered corpus so
  * wall-times stay comparable across rounds.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleUp <srcDir> <outDir> [factor] [jitter[:permille]]")
    val (src, out) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // fail LOUD on a malformed 4th arg: this is measurement tooling, and
    // silently dropping a typo'd "jiter:500" would produce an UNjittered
    // corpus that quietly measures the wrong thing
    val jitterArg = args.lift(3)
    jitterArg.foreach { a =>
      require(a.matches("jitter(:[0-9]+)?"),
        s"4th arg must match jitter[:permille], got: $a")
    }
    val jitter = jitterArg.isDefined
    val jitterPermille = jitterArg.collect {
      case s if s.contains(":") => s.split(":")(1).toInt
    }.getOrElse(10)
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
      * replica index times that key's domain size. Replication is ONE
      * explode of a replica-index sequence, not an N-way union: the
      * left-deep union tree this used to build made Catalyst analysis
      * superlinear in the factor (factor 2000 sat >9 min in PLANNING
      * before a single task ran), while the explode plan is
      * constant-size at any factor. Repartition spreads the ballooned
      * partitions back across the cores for the write. */
    def scaled(df: DataFrame, shifts: (String, Long)*): DataFrame =
      shifts.foldLeft(
        df.withColumn("__i", explode(expr(s"sequence(0L, ${factor - 1}L)")))) {
        case (d, (c, b)) => d.withColumn(c, col(c) + col("__i") * lit(b))
      }.drop("__i").repartition(cpus * 2)

    /** Embedding replicas with a deterministic per-element jitter
      * (replica 0 verbatim). Keyed on the ORIGINAL vec_id so the same
      * source vector gets the same family of perturbed copies at every
      * factor. The interpreted-HOF cost doesn't matter in a one-off
      * generator. */
    def scaledJittered(df: DataFrame, b: Long): DataFrame =
      df.withColumn("__i", explode(expr(s"sequence(0L, ${factor - 1}L)")))
        // jitter keyed on the ORIGINAL vec_id (pre-shift), exactly the
        // xxhash64(vec_id - i*b, i, d) the union form computed
        .withColumn("embedding", expr(
          s"""CASE WHEN __i = 0L THEN embedding ELSE
             |transform(embedding, (x, d) -> cast(x +
             |  (pmod(xxhash64(vec_id, __i, cast(d as bigint)), 2001) - 1000)
             |  * ${jitterPermille}L / 1000000.0d as float)) END""".stripMargin))
        .withColumn("vec_id", col("vec_id") + col("__i") * lit(b))
        .drop("__i").repartition(cpus * 2)

    // SPARK_GRAFT_SCALEUP_ONLY=embeddings[,documents,...] restricts the
    // emitted tables — e.g. the past-2^18 AssignTiming corpus needs ONLY
    // a big embeddings table, not 500x-scaled facts. Unset = all tables.
    val onlyTables = sys.env.get("SPARK_GRAFT_SCALEUP_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def write(name: String, df: DataFrame): Unit = {
      if (onlyTables.forall(_.contains(name))) {
        df.write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
      }
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
