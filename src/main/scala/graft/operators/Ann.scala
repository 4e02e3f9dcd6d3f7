package graft.operators

import graft.Q
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors). Three tiers:
  *
  *  - ann_bruteforce: exact top-k for a probe set. The probe side is
  *    tiny and broadcast; cost is |probes| x n codegen'd fold cosines,
  *    embarrassingly parallel over the base-table partitions. This is
  *    the CORRECTNESS baseline, not the scale path.
  *  - ann_lsh: random-hyperplane buckets bound the candidate set; at
  *    100 TB the bucket join replaces the full scan per probe.
  *  - ann_ivf: IVF-style coarse quantization — vectors are assigned to
  *    their nearest of k centroids once (a partial-aggregatable argmax,
  *    no window), probes search only their own cell.
  *
  * All cosines are strict left folds (Portable.cosine) so the DuckDB
  * oracles reproduce them bit-for-bit and ranking ties cannot diverge.
  */
object Ann {

  /** vectors with the squared norm precomputed once: every pairwise
    * cosine then costs ONE dot product instead of three
    * (dot(a,b)/sqrt(n2a*n2b) — bit-identical to the all-dots form,
    * since it is the same three doubles combined the same way). */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).embeddings
      .select(col("vec_id"), expr(toDouble("embedding")).as("v"), col("label"))
      .withColumn("n2", expr(dot("v", "v")))

  private def cosWith(a: String, an2: String, b: String, bn2: String) =
    expr(s"${dot(a, b)} / sqrt($an2 * $bn2)")

  private val K = 10
  /** deterministic probe set: vec_id < 5. */
  private val ProbeFilter = "vec_id < 5"

  /** exact top-k cosine neighbors per probe (brute force baseline). */
  val annBruteforce: Q = Q(
    "ann_bruteforce",
    (s, dir) => {
      val e = emb(s, dir)
      val probes = broadcast(e.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("n2").as("pn2")))
      val scored = e.join(probes, col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("n_id"),
          cosWith("pv", "pn2", "v", "n2").as("cos"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("n_id"), col("rank"),
          round(col("cos"), 6).as("cos_sim"))
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), p AS (
            |  SELECT vec_id AS probe_id, v AS pv FROM e WHERE $ProbeFilter
            |), scored AS (
            |  SELECT probe_id, e.vec_id AS n_id, ${duckCosine("pv", "e.v")} AS cos
            |  FROM e JOIN p ON e.vec_id <> p.probe_id
            |), ranked AS (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM scored
            |)
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM ranked WHERE rank <= $K""".stripMargin))

  /** hyperplane-LSH ANN: candidates = vectors sharing any of the
    * probe's 4 bucket keys; exact rerank inside the candidate set. */
  val annLsh: Q = Q(
    "ann_lsh",
    (s, dir) => {
      val e = emb(s, dir)
      val keys = e.select(col("vec_id"), explode(expr(hyperplaneKeys("v"))).as("bk"))
      val probeKeys = broadcast(keys.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("bk")))
      val cand = keys.join(probeKeys, "bk")
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("n_id"))
        .distinct()
      val scored = cand
        .join(e.select(col("vec_id"), col("v").as("pv"), col("n2").as("pn2")),
          col("probe_id") === col("vec_id"))
        .drop("vec_id")
        .join(e.select(col("vec_id"), col("v").as("nv"), col("n2").as("nn2")),
          col("n_id") === col("vec_id"))
        .select(col("probe_id"), col("n_id"),
          cosWith("pv", "pn2", "nv", "nn2").as("cos"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("n_id"), col("rank"),
          round(col("cos"), 6).as("cos_sim"))
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), keys AS (
            |  SELECT vec_id, unnest(${duckHyperplaneKeys("v")}) AS bk FROM e
            |), pk AS (
            |  SELECT vec_id AS probe_id, bk FROM keys WHERE $ProbeFilter
            |), cand AS (
            |  SELECT DISTINCT pk.probe_id, k.vec_id AS n_id
            |  FROM keys k JOIN pk ON k.bk = pk.bk AND k.vec_id <> pk.probe_id
            |), scored AS (
            |  SELECT c.probe_id, c.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM cand c
            |  JOIN e ep ON c.probe_id = ep.vec_id
            |  JOIN e en ON c.n_id = en.vec_id
            |), ranked AS (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM scored
            |)
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM ranked WHERE rank <= $K""".stripMargin))

  /** The IVF top-5 search oracle (assign all vectors to nearest of the
    * 16 fixed centroids, probe searches its own cell, exact rerank) —
    * shared by ann_ivf (one batch plan) and ann_incremental (the same
    * result assembled through a streamed, persisted index). */
  private val ivfTopkOracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), c AS (
       |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
       |), assigned AS (
       |  SELECT vec_id, c_id AS cell FROM (
       |    SELECT e.vec_id, c_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${duckCosine("e.v", "cv")} DESC, c_id) AS rn
       |    FROM e CROSS JOIN c
       |  ) WHERE rn = 1
       |), p AS (
       |  SELECT vec_id AS probe_id, cell FROM assigned WHERE $ProbeFilter
       |), cand AS (
       |  SELECT p.probe_id, a.vec_id AS n_id
       |  FROM assigned a JOIN p ON a.cell = p.cell AND a.vec_id <> p.probe_id
       |), scored AS (
       |  SELECT cand.probe_id, cand.n_id, ${duckCosine("ep.v", "en.v")} AS cos
       |  FROM cand
       |  JOIN e ep ON cand.probe_id = ep.vec_id
       |  JOIN e en ON cand.n_id = en.vec_id
       |), ranked AS (
       |  SELECT probe_id, n_id, cos,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
       |  FROM scored
       |)
       |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
       |FROM ranked WHERE rank <= 5""".stripMargin

  /** IVF: the 16 vectors with vec_id < 16 act as coarse centroids;
    * every vector is assigned to its nearest centroid via the
    * partial-aggregatable codegen argmax ([[graft.functions.ArgMaxBy]]
    * — no window, one shuffle on vec_id, whole-stage HashAggregate);
    * probes then search only their own cell. */
  val annIvf: Q = Q(
    "ann_ivf",
    (s, dir) => {
      val e = emb(s, dir)
      val cents = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2")))
      val assigned = e.crossJoin(cents)
        .select(col("vec_id"), col("c_id"),
          cosWith("v", "n2", "cv", "cn2").as("c_cos"))
        .groupBy("vec_id")
        .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
      val probes = assigned.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("cell"))
      val cand = assigned.join(broadcast(probes), "cell")
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("n_id"))
      val scored = cand
        .join(e.select(col("vec_id"), col("v").as("pv"), col("n2").as("pn2")),
          col("probe_id") === col("vec_id"))
        .drop("vec_id")
        .join(e.select(col("vec_id"), col("v").as("nv"), col("n2").as("nn2")),
          col("n_id") === col("vec_id"))
        .select(col("probe_id"), col("n_id"),
          cosWith("pv", "pn2", "nv", "nn2").as("cos"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"), col("rank"),
          round(col("cos"), 6).as("cos_sim"))
    },
    Some(ivfTopkOracleSql))

  /** embedding norm/stats audit per label: a plain partial-agg pass. */
  val vecNorms: Q = Q(
    "vec_norms",
    (s, dir) => emb(s, dir)
      .withColumn("norm", expr(s"sqrt(${dot("v", "v")})"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(avg("norm"), 6).as("avg_norm"),
        round(min("norm"), 6).as("min_norm"),
        round(max("norm"), 6).as("max_norm")),
    Some(s"""WITH e AS (
            |  SELECT label, sqrt(${duckDot("CAST(embedding AS DOUBLE[])", "CAST(embedding AS DOUBLE[])")}) AS norm
            |  FROM embeddings
            |)
            |SELECT label, count(*) AS n,
            |  round(avg(norm), 6) AS avg_norm,
            |  round(min(norm), 6) AS min_norm,
            |  round(max(norm), 6) AS max_norm
            |FROM e GROUP BY label""".stripMargin))

  /** Recall@K evaluation of the LSH index against exact ground truth —
    * the quality harness any ANN deployment runs before trusting the
    * approximate path. Per probe: how many of the exact top-K the LSH
    * result recovered, as an integer percentage (no float boundary).
    * Both inputs are the deterministic ann_bruteforce / ann_lsh
    * results, so the oracle recomputes the same join of their CTEs. */
  val annRecall: Q = Q(
    "ann_recall",
    (s, dir) => {
      val exact = annBruteforce.run(s, dir).select(col("probe_id"), col("n_id"))
      val approx = annLsh.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), p AS (
            |  SELECT vec_id AS probe_id, v AS pv FROM e WHERE $ProbeFilter
            |), bf_scored AS (
            |  SELECT probe_id, e.vec_id AS n_id, ${duckCosine("pv", "e.v")} AS cos
            |  FROM e JOIN p ON e.vec_id <> p.probe_id
            |), bf_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM bf_scored
            |), exact AS (
            |  SELECT probe_id, n_id FROM bf_ranked WHERE rank <= $K
            |), keys AS (
            |  SELECT vec_id, unnest(${duckHyperplaneKeys("v")}) AS bk FROM e
            |), pk AS (
            |  SELECT vec_id AS probe_id, bk FROM keys WHERE $ProbeFilter
            |), cand AS (
            |  SELECT DISTINCT pk.probe_id, k.vec_id AS n_id
            |  FROM keys k JOIN pk ON k.bk = pk.bk AND k.vec_id <> pk.probe_id
            |), lsh_scored AS (
            |  SELECT c.probe_id, c.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM cand c
            |  JOIN e ep ON c.probe_id = ep.vec_id
            |  JOIN e en ON c.n_id = en.vec_id
            |), lsh_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM lsh_scored
            |), approx AS (
            |  SELECT probe_id, n_id FROM lsh_ranked WHERE rank <= $K
            |)
            |SELECT x.probe_id, count(*) AS k, count(a.n_id) AS hits,
            |  count(a.n_id) * 100 // count(*) AS recall_pct
            |FROM exact x LEFT JOIN approx a
            |  ON x.probe_id = a.probe_id AND x.n_id = a.n_id
            |GROUP BY 1 ORDER BY x.probe_id""".stripMargin))

  /** Recall@5 of the IVF index vs exact ground truth — the cell-local
    * search trades recall for touching one cell; this row quantifies
    * that trade exactly (and shows why production IVF probes multiple
    * cells). Same construction as [[annRecall]]. */
  val annRecallIvf: Q = Q(
    "ann_recall_ivf",
    (s, dir) => {
      val exact = annBruteforce.run(s, dir).filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annIvf.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), p AS (
            |  SELECT vec_id AS probe_id, v AS pv FROM e WHERE $ProbeFilter
            |), bf_scored AS (
            |  SELECT probe_id, e.vec_id AS n_id, ${duckCosine("pv", "e.v")} AS cos
            |  FROM e JOIN p ON e.vec_id <> p.probe_id
            |), bf_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM bf_scored
            |), exact AS (
            |  SELECT probe_id, n_id FROM bf_ranked WHERE rank <= 5
            |), c AS (
            |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
            |), assigned AS (
            |  SELECT vec_id, c_id AS cell FROM (
            |    SELECT e.vec_id, c_id,
            |      row_number() OVER (PARTITION BY e.vec_id
            |        ORDER BY ${duckCosine("e.v", "cv")} DESC, c_id) AS rn
            |    FROM e CROSS JOIN c
            |  ) WHERE rn = 1
            |), ip AS (
            |  SELECT vec_id AS probe_id, cell FROM assigned WHERE $ProbeFilter
            |), cand AS (
            |  SELECT ip.probe_id, a.vec_id AS n_id
            |  FROM assigned a JOIN ip ON a.cell = ip.cell AND a.vec_id <> ip.probe_id
            |), ivf_scored AS (
            |  SELECT cand.probe_id, cand.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM cand
            |  JOIN e ep ON cand.probe_id = ep.vec_id
            |  JOIN e en ON cand.n_id = en.vec_id
            |), ivf_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM ivf_scored
            |), approx AS (
            |  SELECT probe_id, n_id FROM ivf_ranked WHERE rank <= 5
            |)
            |SELECT x.probe_id, count(*) AS k, count(a.n_id) AS hits,
            |  count(a.n_id) * 100 // count(*) AS recall_pct
            |FROM exact x LEFT JOIN approx a
            |  ON x.probe_id = a.probe_id AND x.n_id = a.n_id
            |GROUP BY 1 ORDER BY x.probe_id""".stripMargin))

  /** IVF with nprobe=2: probes search their TWO nearest cells instead
    * of one — the standard recall lever (ann_recall_ivf quantifies how
    * much single-cell search loses). Base vectors are still assigned to
    * exactly one cell, so the candidate sets of the two probed cells
    * are disjoint and need no dedup; candidate cost is ~2x ann_ivf,
    * still cell-bounded, never O(n). */
  val annIvfNprobe: Q = Q(
    "ann_ivf_nprobe",
    (s, dir) => {
      val e = emb(s, dir)
      val cents = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2")))
      val cellScores = e.crossJoin(cents)
        .select(col("vec_id"), col("c_id"),
          cosWith("v", "n2", "cv", "cn2").as("c_cos"))
      val assigned = cellScores.groupBy("vec_id")
        .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
      // per-probe top-2 cells: a window over only |probes| x 16 rows
      val probeCells = cellScores.filter(expr(ProbeFilter))
        .withColumn("crn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))))
        .filter(col("crn") <= 2)
        .select(col("vec_id").as("probe_id"), col("c_id").as("cell"))
      val cand = assigned.join(broadcast(probeCells), "cell")
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("n_id"))
      val scored = cand
        .join(e.select(col("vec_id"), col("v").as("pv"), col("n2").as("pn2")),
          col("probe_id") === col("vec_id"))
        .drop("vec_id")
        .join(e.select(col("vec_id"), col("v").as("nv"), col("n2").as("nn2")),
          col("n_id") === col("vec_id"))
        .select(col("probe_id"), col("n_id"),
          cosWith("pv", "pn2", "nv", "nn2").as("cos"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"), col("rank"),
          round(col("cos"), 6).as("cos_sim"))
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), c AS (
            |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
            |), cs AS (
            |  SELECT e.vec_id, c_id, ${duckCosine("e.v", "cv")} AS c_cos
            |  FROM e CROSS JOIN c
            |), assigned AS (
            |  SELECT vec_id, c_id AS cell FROM (
            |    SELECT vec_id, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS rn
            |    FROM cs
            |  ) WHERE rn = 1
            |), pc AS (
            |  SELECT vec_id AS probe_id, c_id AS cell FROM (
            |    SELECT vec_id, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS crn
            |    FROM cs WHERE $ProbeFilter
            |  ) WHERE crn <= 2
            |), cand AS (
            |  SELECT pc.probe_id, a.vec_id AS n_id
            |  FROM assigned a JOIN pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
            |), scored AS (
            |  SELECT cand.probe_id, cand.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM cand
            |  JOIN e ep ON cand.probe_id = ep.vec_id
            |  JOIN e en ON cand.n_id = en.vec_id
            |), ranked AS (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM scored
            |)
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM ranked WHERE rank <= 5""".stripMargin))

  /** Per-vector symmetric int8 quantization — the compression step an
    * embedding store applies before indexing (4x smaller than float32,
    * dot products on integers). Codes are floor(x*127/maxabs + 0.5)
    * (floor, not round: half-even vs half-up can't diverge between
    * engines), surfaced as one scalar digest per vector because the
    * driver's comparator can't hash array cells; max reconstruction
    * error is the quality audit. Map-only over the scan: no shuffle at
    * any scale. The fold accumulator seeds maxabs at 1e-12 so a zero
    * vector can't divide by zero. */
  val vecQuantize: Q = Q(
    "vec_quantize",
    // one native eval per vector (graft_int8_quantize) — this scan runs
    // over EVERY vector, so the interpreted-HOF formulation (pinned
    // bit-identical in NativeVsSqlSpec) stays out of the hot path
    (s, dir) => Tables(s, dir).embeddings
      .select(col("vec_id"),
        expr(s"graft_int8_quantize(${toDouble("embedding")})").as("q"))
      .select(col("vec_id"),
        round(col("q.max_abs"), 6).as("max_abs"),
        col("q.code_digest").as("code_digest"),
        round(col("q.max_err"), 6).as("max_err"))
      .orderBy("vec_id"),
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), m AS (
            |  SELECT vec_id, v,
            |    list_reduce(list_prepend(CAST(1e-12 AS DOUBLE),
            |      list_transform(v, x -> abs(x))), (a, x) -> greatest(a, x)) AS maxabs
            |  FROM e
            |), q AS (
            |  SELECT vec_id, v, maxabs,
            |    list_transform(v, x -> CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT)) AS codes
            |  FROM m
            |)
            |SELECT vec_id, round(maxabs, 6) AS max_abs,
            |  ${duckSigDigest("list_transform(codes, c -> c + 127)")} AS code_digest,
            |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            |    list_transform(range(1, len(v) + 1), i -> abs(v[i] - codes[i] * maxabs / 127.0))),
            |    (a, y) -> greatest(a, y)), 6) AS max_err
            |FROM q ORDER BY vec_id""".stripMargin))

  /** Recall@5 of nprobe=2 IVF vs exact ground truth — paired with
    * ann_recall_ivf this quantifies exactly what the second probed cell
    * buys, the measurement that drives the nprobe knob in production.
    * Same construction as [[annRecallIvf]]. */
  val annRecallNprobe: Q = Q(
    "ann_recall_nprobe",
    (s, dir) => {
      val exact = annBruteforce.run(s, dir).filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annIvfNprobe.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), p AS (
            |  SELECT vec_id AS probe_id, v AS pv FROM e WHERE $ProbeFilter
            |), bf_scored AS (
            |  SELECT probe_id, e.vec_id AS n_id, ${duckCosine("pv", "e.v")} AS cos
            |  FROM e JOIN p ON e.vec_id <> p.probe_id
            |), bf_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM bf_scored
            |), exact AS (
            |  SELECT probe_id, n_id FROM bf_ranked WHERE rank <= 5
            |), c AS (
            |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
            |), cs AS (
            |  SELECT e.vec_id, c_id, ${duckCosine("e.v", "cv")} AS c_cos
            |  FROM e CROSS JOIN c
            |), assigned AS (
            |  SELECT vec_id, c_id AS cell FROM (
            |    SELECT vec_id, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS rn
            |    FROM cs
            |  ) WHERE rn = 1
            |), pc AS (
            |  SELECT vec_id AS probe_id, c_id AS cell FROM (
            |    SELECT vec_id, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS crn
            |    FROM cs WHERE $ProbeFilter
            |  ) WHERE crn <= 2
            |), cand AS (
            |  SELECT pc.probe_id, a.vec_id AS n_id
            |  FROM assigned a JOIN pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
            |), np_scored AS (
            |  SELECT cand.probe_id, cand.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM cand
            |  JOIN e ep ON cand.probe_id = ep.vec_id
            |  JOIN e en ON cand.n_id = en.vec_id
            |), np_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM np_scored
            |), approx AS (
            |  SELECT probe_id, n_id FROM np_ranked WHERE rank <= 5
            |)
            |SELECT x.probe_id, count(*) AS k, count(a.n_id) AS hits,
            |  count(a.n_id) * 100 // count(*) AS recall_pct
            |FROM exact x LEFT JOIN approx a
            |  ON x.probe_id = a.probe_id AND x.n_id = a.n_id
            |GROUP BY 1 ORDER BY x.probe_id""".stripMargin))

  /** candidate budget for the quantized search: 4x the final K, the
    * usual rerank headroom for int8 ANN. */
  private val QCand = 40

  /** ADC shortlist depth (candidates kept after the integer ADC pass,
    * before exact rerank) for the IVF-PQ/IVFADC family. 80, not
    * QCand's 40: the committed recall-cost curve (RECALL_CURVE.json,
    * round 11) measured recall@5 FLAT in nprobe but 92% vs 72% going
    * 40 → 80 at every nprobe, at indistinguishable chain cost
    * (4.9–5.8 s either way) — shortlist truncation, not cell misses,
    * was the dominant loss term, so the default buys the recall where
    * the curve says it lives. Cost shape at 100 TB: the rerank fetches
    * raw vectors for 80 instead of 40 finalists per probe — still
    * O(probes), unchanged index IO. The int8 row (ann_quantized) keeps
    * QCand: its codes approximate far better than 4-subspace PQ, so
    * the curve's finding does not transfer. */
  private val AdcShortlist = 80

  /** vectors + their int8 codes (same quantization as vec_quantize:
    * floor-half-up against the per-vector maxabs, seeded 1e-12).
    * Codes are carried as doubles — every product |code| <= 127 is
    * integer-exact in a double, so the quantized dot is deterministic
    * across engines while still using the codegen'd graft_dot. One
    * native eval per vector (graft_int8_codes, pinned bit-identical to
    * the SQL HOF formulation in NativeVsSqlSpec): this scan runs over
    * the whole corpus, the hot path the interpreted-lambda rule
    * exists for. */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .withColumn("qz", expr("graft_int8_codes(v)"))
      .withColumn("maxabs", col("qz.max_abs"))
      .withColumn("qd", col("qz.codes"))
      .drop("qz")

  /** int8-quantized ANN: candidates scored on 4x-compressed codes,
    * exact float rerank of the top [[QCand]] only — the memory-bound
    * scale lever (candidate generation streams 1/4 the bytes; the
    * full-precision column is only needed for <= QCand rows per
    * probe). The approximate cosine rescales the integer code dot by
    * (maxabs_a/127)(maxabs_b/127)/sqrt(n2a*n2b).
    *
    * Here codes are derived inline from the float column (the test
    * table stores no code column), so the single scan reads floats
    * anyway; in the production layout the codes are a STORED column
    * (written once by the vec_quantize step) and the candidate scan
    * never touches the float column at all — the rerank fetches full
    * vectors by key for the tiny candidate set. ann_recall_quantized
    * measures exactly what the compression costs in recall. */
  val annQuantized: Q = Q(
    "ann_quantized",
    (s, dir) => {
      val q = quantized(s, dir)
      val probes = broadcast(q.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("v").as("pv"),
          col("n2").as("pn2"), col("maxabs").as("pmax"), col("qd").as("pqd")))
      val scoredQ = q.join(probes, col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("n_id"),
          col("pv"), col("pn2"), col("v"), col("n2"),
          expr(s"${dot("pqd", "qd")} * pmax * maxabs / (16129.0 * sqrt(pn2 * n2))")
            .as("score_q"))
      scoredQ
        .withColumn("rank_q", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("score_q").desc, col("n_id"))))
        .filter(col("rank_q") <= QCand)
        .select(col("probe_id"), col("n_id"),
          cosWith("pv", "pn2", "v", "n2").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("n_id"), col("rank"),
          round(col("cos"), 6).as("cos_sim"))
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), n AS (
            |  SELECT vec_id, v, ${duckDot("v", "v")} AS n2 FROM e
            |), q AS (
            |  SELECT vec_id, v, n2, maxabs,
            |    list_transform(v, x -> CAST(CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT) AS DOUBLE)) AS qd
            |  FROM (
            |    SELECT vec_id, v, n2,
            |      list_reduce(list_prepend(CAST(1e-12 AS DOUBLE),
            |        list_transform(v, x -> abs(x))), (a, x) -> greatest(a, x)) AS maxabs
            |    FROM n)
            |), p AS (
            |  SELECT vec_id AS probe_id, v AS pv, n2 AS pn2, maxabs AS pmax,
            |    qd AS pqd
            |  FROM q WHERE $ProbeFilter
            |), scored_q AS (
            |  SELECT probe_id, q.vec_id AS n_id, pv, pn2, v, n2,
            |    ${duckDot("pqd", "qd")} * pmax * maxabs / (16129.0 * sqrt(pn2 * n2)) AS score_q
            |  FROM q JOIN p ON q.vec_id <> p.probe_id
            |), cand AS (
            |  SELECT * FROM (
            |    SELECT probe_id, n_id, pv, pn2, v, n2,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY score_q DESC, n_id) AS rank_q
            |    FROM scored_q
            |  ) WHERE rank_q <= $QCand
            |), reranked AS (
            |  SELECT probe_id, n_id,
            |    ${duckDot("pv", "v")} / sqrt(pn2 * n2) AS cos
            |  FROM cand
            |)
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM reranked
            |) WHERE rank <= $K""".stripMargin))

  /** Recall@5 of the int8-quantized search vs exact ground truth — the
    * number that justifies (or forbids) shipping the 4x compression.
    * With a 4xK rerank budget the quantization error has to displace a
    * true neighbor out of the top-40 candidates to cost recall at
    * all. */
  val annRecallQuantized: Q = Q(
    "ann_recall_quantized",
    (s, dir) => {
      val exact = annBruteforce.run(s, dir).filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annQuantized.run(s, dir).filter(col("rank") <= 5)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), bf_p AS (
            |  SELECT vec_id AS probe_id, v AS pv FROM e WHERE $ProbeFilter
            |), bf_scored AS (
            |  SELECT probe_id, e.vec_id AS n_id, ${duckCosine("pv", "e.v")} AS cos
            |  FROM e JOIN bf_p ON e.vec_id <> bf_p.probe_id
            |), bf_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM bf_scored
            |), exact AS (
            |  SELECT probe_id, n_id FROM bf_ranked WHERE rank <= 5
            |), n AS (
            |  SELECT vec_id, v, ${duckDot("v", "v")} AS n2 FROM e
            |), q AS (
            |  SELECT vec_id, v, n2, maxabs,
            |    list_transform(v, x -> CAST(CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT) AS DOUBLE)) AS qd
            |  FROM (
            |    SELECT vec_id, v, n2,
            |      list_reduce(list_prepend(CAST(1e-12 AS DOUBLE),
            |        list_transform(v, x -> abs(x))), (a, x) -> greatest(a, x)) AS maxabs
            |    FROM n)
            |), p AS (
            |  SELECT vec_id AS probe_id, v AS pv, n2 AS pn2, maxabs AS pmax,
            |    qd AS pqd
            |  FROM q WHERE $ProbeFilter
            |), scored_q AS (
            |  SELECT probe_id, q.vec_id AS n_id, pv, pn2, v, n2,
            |    ${duckDot("pqd", "qd")} * pmax * maxabs / (16129.0 * sqrt(pn2 * n2)) AS score_q
            |  FROM q JOIN p ON q.vec_id <> p.probe_id
            |), cand AS (
            |  SELECT * FROM (
            |    SELECT probe_id, n_id, pv, pn2, v, n2,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY score_q DESC, n_id) AS rank_q
            |    FROM scored_q
            |  ) WHERE rank_q <= $QCand
            |), reranked AS (
            |  SELECT probe_id, n_id,
            |    ${duckDot("pv", "v")} / sqrt(pn2 * n2) AS cos
            |  FROM cand
            |), approx AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT probe_id, n_id,
            |      row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |    FROM reranked
            |  ) WHERE rank <= 5
            |)
            |SELECT x.probe_id, count(*) AS k, count(a.n_id) AS hits,
            |  count(a.n_id) * 100 // count(*) AS recall_pct
            |FROM exact x LEFT JOIN approx a
            |  ON x.probe_id = a.probe_id AND x.n_id = a.n_id
            |GROUP BY 1 ORDER BY x.probe_id""".stripMargin))

  /** Deterministic k-means over the int8-quantized vectors — the
    * clustering stage of cluster-balanced curation (group the corpus
    * by embedding neighborhood, then sample/dedup per cluster instead
    * of globally). One full Lloyd iteration per level: seed centroids
    * = codes of the k lowest vec_ids (globally for the coarse level,
    * per cell for the local level), assign (argmax cosine), recompute
    * centroids, reassign; cluster_kmeans outputs per-final-cluster
    * membership before/after plus a centroid digest.
    *
    * Every arithmetic step is ORDER-INDEPENDENT, which is what makes a
    * clustering loop oracle-comparable at all: coordinates are int8
    * codes (graft_int8_codes), centroid updates are INTEGER sums with
    * floor-div means (no float accumulation to diverge with partition
    * order — explicitly floor(double-div), since BIGINT `div`
    * truncation differs between engines on negatives), and cosines are
    * the usual shared-fold doubles. Assignment ties break to the
    * smaller centroid id, mirroring the oracle's ORDER BY.
    *
    * Scale: centroids broadcast both times; assignment is the same
    * partial-aggregated argmax as ann_ivf (the exchange moves one row
    * per vector); centroid update shuffles (cluster, dim) partial sums
    * — k x dims groups regardless of corpus size. More Lloyd rounds =
    * repeat the two broadcast stages; at real scale you run them on a
    * sample (mini-batch k-means), which changes nothing structurally. */
  /** int8 code vectors (see [[clusterKmeans]]). */
  private[graft] def kmeansCodes(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .withColumn("qz", expr("graft_int8_codes(v)"))
      .select(col("vec_id"), col("qz.codes").as("qd"))
      .withColumn("qn2", expr(s"greatest(${dot("qd", "qd")}, 1e-12)"))

  /** argmax-cosine assignment of every vector to its nearest centroid
    * (broadcast cross join + partial-agg argmax, ann_ivf's shape).
    *
    * The N×k pair stream carries ONLY (vec_id, c_id, c_cos) — ~30
    * bytes/pair; the 64-double qd array is re-attached afterwards by a
    * vec_id join (N rows, riding the argmax's own hash partitioning on
    * the winner side). The previous shape aggregated first(qd) over the
    * pair stream, so every one of the N×k rows dragged the ~550-byte
    * array through the hash-agg input — measured 57× slower per pair
    * at N=200k/k=1563 (68.5 s for the fat 2-pass training pipeline vs
    * 0.6 s for a slim one-pass reassign, AssignTiming, quiet host).
    * At the 100 TB N×k this delta IS the operator. Results are
    * bit-identical: qd is constant per vec_id and max(c_cos) is the
    * winning cosine either way. */
  private[graft] def kmeansAssign(codes: DataFrame, cents: DataFrame): DataFrame =
    codes.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("c_id"),
        expr(s"${dot("qd", "cd")} / sqrt(qn2 * cn2)").as("c_cos"))
      .groupBy("vec_id")
      .agg(expr("graft_argmax(c_id, c_cos)").as("cid"),
        max(col("c_cos")).as("cos")) // the winning cosine, for inertia
      .join(codes.select(col("vec_id"), col("qd")), "vec_id")
      .select(col("vec_id"), col("cid"), col("qd"), col("cos"))

  /** Integer-mean centroid update from an assignment: per (cluster,
    * dim) INTEGER sums (order-independent), floor-of-double-div means
    * (not BIGINT div, whose negative truncation differs between
    * engines), reassembled into array<double> centroids for graft_dot. */
  private[graft] def kmeansUpdate(a: DataFrame): DataFrame =
    a.select(col("cid"), posexplode(col("qd")))
      .groupBy("cid", "pos")
      .agg(sum(col("col").cast("long")).as("s"), count(lit(1)).as("n"))
      .withColumn("m", floor(col("s").cast("double") / col("n")).cast("double"))
      .groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
        .as("cd"),
        // n is the cluster's membership count replicated per dim —
        // carrying it here makes the n_before join disappear
        max("n").as("n_before"))
      .select(col("cid").as("c_id"), col("cd"), col("n_before"),
        expr(s"greatest(${dot("cd", "cd")}, 1e-12)").as("cn2"))

  /** R deterministic Lloyd rounds: seed (vec_id < 16) -> repeat
    * [assign, integer-mean update] R times. Every round is the same
    * order-independent arithmetic, so ANY round count stays
    * oracle-comparable; the registry row runs R=1 (one demonstrated
    * stage), and the convergence spec runs R>1 and watches the
    * per-round inertia (sum of 1 − winning cosine, captured on the
    * assignment each round BEFORE its update) fall. Returns (codes,
    * last assignment, last centroids, inertia per round). Stages are
    * localCheckpoint-ed: each is consumed several ways with different
    * column pruning, so lineage replay would recompute it per consumer
    * (the same truncation dedup_clusters applies) — and the loop would
    * otherwise replay all prior rounds per action. */
  /** The occupancy-bound cluster count: k = max(16, ceil(N / 128))
    * holds expected cluster occupancy at ~128 members. Since round 12
    * this is no longer any row's FLAT cluster count — a k ∝ N flat
    * assign is N×k = O(N²/128) pairs, the registry's last quadratic
    * (what dedup_semantic ran through round 11) — it survives only as
    * (a) the occupancy branch inside [[ivfK]]'s min and (b) the
    * flat-linear arm of the AssignTiming A/B. Returns Long: the old
    * `.toInt` wrapped negative past N ≈ 2.7e11 (128·2^31), inside the
    * 100 TB regime (~4e11 vectors); [[ivfK]] already computed its min
    * in Long for exactly that reason. */
  private[graft] def kmeansK(n: Long): Long =
    math.max(16L, (n + 127L) / 128L)

  /** The matching SQL for [[kmeansK]] over a counted corpus. */
  private def duckKmeansK(countExpr: String): String =
    s"greatest(16, (($countExpr) + 127) // 128)"

  /** IVF cell count for the trained coarse quantizer: [[kmeansK]]'s
    * ~128-member occupancy bound while that is the cheaper regime,
    * capped at FAISS's `nlist ≈ 4·√N` guidance past the crossover
    * (N > 2^18 ≈ 262k): with k ∝ N the one-pass N×k assign that both
    * training and index-add must run goes QUADRATIC in the corpus,
    * while k ≈ 4√N keeps it N^1.5 — the reason every production IVF
    * sizes nlist by √N, not by occupancy. Both branches are exact in
    * both engines (IEEE sqrt is correctly rounded, floor of it is
    * deterministic), and at the verify/bench SFs (N ≤ 262k) the min
    * always resolves to [[kmeansK]], so every verified plan is
    * unchanged — this is the 100 TB asymptotic, not a behavior fork.
    *
    * The min is computed ENTIRELY in Long (as is [[kmeansK]] itself
    * since round 12): an Int-narrowed occupancy branch would wrap
    * negative past N ≈ 2.7e11 (128·2^31) — exactly the 100 TB regime
    * this function exists for (100 TB / 256 B ≈ 4e11 vectors) — and a
    * negative k would produce empty centroid frames while the BIGINT
    * SQL mirror stays positive. The √N branch always wins there and
    * its value fits an Int until N ≈ 2.9e17. */
  private[graft] def ivfK(n: Long): Int =
    math.min(kmeansK(n),
      math.max(16L, math.floor(4.0 * math.sqrt(n.toDouble)).toLong)).toInt

  /** The matching SQL for [[ivfK]] over a counted corpus. */
  private[graft] def duckIvfK(countExpr: String): String =
    s"least(${duckKmeansK(countExpr)}, " +
      s"greatest(16, CAST(floor(4.0 * sqrt(CAST(($countExpr) AS DOUBLE))) AS BIGINT)))"

  private[graft] def kmeansIterate(s: SparkSession, dir: String, rounds: Int,
      k: Int = 16, inertia: Boolean = true)
      : (DataFrame, DataFrame, DataFrame, Seq[Double]) = {
    require(rounds >= 1, "kmeansIterate needs at least one Lloyd round")
    val codes = kmeansCodes(s, dir).localCheckpoint()
    var cents = codes.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("qd").as("cd"),
        col("qn2").as("cn2"))
    var assign: DataFrame = null
    val inertias = Seq.newBuilder[Double]
    (1 to rounds).foreach { _ =>
      // With inertia OFF (every registry caller — both kmeansStage
      // consumers discard the assignment), the per-round assignment is
      // consumed exactly once (by the update), so neither its
      // localCheckpoint job nor the inertia aggregation job runs: a
      // one-Lloyd-stage trains in 2 actions (codes, cents) instead of
      // 4. Arithmetic is untouched — same plan, evaluated lazily
      // inside the update's job. Inertia ON (the convergence spec)
      // keeps the original shape: checkpoint each round's assignment,
      // then aggregate 1 − winning cosine on it before the update.
      assign = kmeansAssign(codes, cents)
      if (inertia) {
        assign = assign.localCheckpoint()
        inertias += assign.agg(sum(lit(1.0) - col("cos"))).head().getDouble(0)
      }
      cents = kmeansUpdate(assign).localCheckpoint()
    }
    (codes, assign, cents, inertias.result())
  }

  /** One Lloyd stage — [[kmeansIterate]] at R=1 (the oracle-verified
    * registry configuration). */
  private def kmeansStage(s: SparkSession, dir: String, k: Int = 16)
      : (DataFrame, DataFrame, DataFrame) = {
    val (codes, a0, c1, _) =
      kmeansIterate(s, dir, rounds = 1, k = k, inertia = false)
    (codes, a0, c1)
  }

  /** The LOCAL half of the two-level (hierarchical) k-means: takes a
    * coarse assignment `a1` (vec_id, cid, qd) and runs an
    * occupancy-128 one-Lloyd-stage k-means INSIDE each coarse cell —
    * per cell of n members, kloc = ceil(n/128) sub-clusters, seeds =
    * the cell's kloc lowest vec_ids, assign (argmax cosine, ties to
    * the smaller local id), integer-mean update, reassign. Returns
    * (lc1: per-(cid, lcid) updated local centroids + n_before,
    *  la1: the final (vec_id, cid, lcid) assignment).
    *
    * This is the subquadratic replacement for the flat k ∝ N assign
    * (the registry's last scale-killer through round 11): with coarse
    * cells at [[ivfK]](N) ≈ 4·√N past the crossover, coarse assign is
    * N×4√N = O(N^1.5) pairs and the local assign is
    * Σ_c occ(c)·ceil(occ(c)/128) ≈ N·√N/512 = O(N^1.5) — while the
    * final clusters keep the ~128 expected occupancy that bounds every
    * downstream within-cluster pair pass, the same contract the flat
    * scheme bought at O(N²/128). Below the crossover occ ≈ 128 already,
    * kloc = 1 everywhere, and the local stage degenerates to one
    * mean-recentering per cell.
    *
    * Scale shape: the local-centroid frame is ~N/128 rows — far past
    * broadcast at corpus scale (the flat scheme's ~2 GB broadcast at
    * N = 1e9 was its second killer) — so BOTH local assigns are
    * SHUFFLE equi-joins on cid: each cell meets only its own ≤
    * ceil(occ/128) centroids, and the join key is the coarse cell id,
    * the same key the membership window already partitioned by (a
    * degenerate hot cell is AQE-skew-splittable; the downstream
    * MaxEmbBucket cap still bounds the pair side regardless). All
    * arithmetic is the global stage's order-independent integer
    * arithmetic (int8 codes, integer sums, floor-of-double-div means,
    * shared-fold cosines), so the whole two-level pipeline stays
    * oracle-hash-deterministic; mirrored CTE-for-stage by
    * [[kmeans2OracleCtes]]. `mem` and `lc1` are localCheckpoint-ed
    * (each is consumed by several downstream stages); `la1` is NOT —
    * consumers see the argmax HashAggregate in their own plans (the
    * PlanAudit argmax pin), and a self-joining consumer reuses the
    * aggregate's exchange. */
  private[graft] def kmeans2Local(a1: DataFrame): (DataFrame, DataFrame) = {
    val (lc1, la1, _) = kmeans2LocalIterate(a1, rounds = 1, inertia = false)
    (lc1, la1)
  }

  /** R-round form of the local stage: seed -> repeat [assign,
    * integer-mean update] R times -> final reassign. R = 1 with
    * inertia off IS [[kmeans2Local]] (the registry configuration) —
    * plan-identical, since the per-round lcos max is pruned when
    * unused. Every round is the same order-independent arithmetic as
    * the flat scheme's [[kmeansIterate]], so ANY round count stays
    * oracle-comparable — the contract the flat convergence spec pins
    * globally, pinned for the LOCAL stage by the kmeans2 convergence
    * spec (inertia = sum over members of 1 − winning local cosine,
    * captured on each round's assignment BEFORE its update, exactly
    * the flat spec's measure restricted to within-cell geometry).
    * With inertia on, each round's assignment is localCheckpoint-ed
    * (consumed by the inertia action AND the update); off, the
    * assignment stays pure lineage and no extra action runs. */
  private[graft] def kmeans2LocalIterate(a1: DataFrame, rounds: Int,
      inertia: Boolean): (DataFrame, DataFrame, Seq[Double]) = {
    require(rounds >= 1, "kmeans2LocalIterate needs at least one local round")
    val wCell = Window.partitionBy("cid")
    val mem = a1
      .withColumn("qn2", expr(s"greatest(${dot("qd", "qd")}, 1e-12)"))
      .withColumn("rn", row_number().over(wCell.orderBy("vec_id")))
      .withColumn("nc", count(lit(1)).over(wCell))
      .withColumn("kloc", expr("(nc + 127) div 128"))
      .drop("nc")
      .localCheckpoint()
    val seeds = mem.filter(col("rn") <= col("kloc"))
      .select(col("cid"), col("rn").cast("long").as("lcid"),
        col("qd").as("ld"), col("qn2").as("ln2"))
    // argmax-cosine assignment to the cell's own local centroids: a
    // shuffle equi-join on cid (never a broadcast — the centroid side
    // is corpus-sized/128), then the same slim partial-agg argmax as
    // every coarse assign (the N×kloc pair stream carries ~30 B/pair).
    // The winning cosine rides along for inertia; Catalyst prunes the
    // max when no consumer reads it (the registry path).
    def assignLocal(cents: DataFrame): DataFrame =
      mem.select(col("vec_id"), col("cid"), col("qd"), col("qn2"))
        .join(cents, "cid")
        .select(col("vec_id"), col("cid"), col("lcid"),
          expr(s"${dot("qd", "ld")} / sqrt(qn2 * ln2)").as("lcos"))
        .groupBy(col("vec_id"), col("cid"))
        .agg(expr("graft_argmax(lcid, lcos)").as("lcid"),
          max(col("lcos")).as("lcos"))
    // integer-mean update per (cell, local cluster): kmeansUpdate's
    // exact arithmetic with the composite key
    def updateLocal(la: DataFrame): DataFrame =
      la.join(mem.select(col("vec_id"), col("qd")), "vec_id")
        .select(col("cid"), col("lcid"), posexplode(col("qd")))
        .groupBy("cid", "lcid", "pos")
        .agg(sum(col("col").cast("long")).as("s"), count(lit(1)).as("n"))
        .withColumn("m", floor(col("s").cast("double") / col("n")).cast("double"))
        .groupBy("cid", "lcid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
          .as("ld"),
          max("n").as("n_before"))
        .withColumn("ln2", expr(s"greatest(${dot("ld", "ld")}, 1e-12)"))
        .localCheckpoint()
    var cents = seeds
    var lc: DataFrame = null
    val inertias = Seq.newBuilder[Double]
    (1 to rounds).foreach { _ =>
      var la = assignLocal(cents)
      if (inertia) {
        la = la.localCheckpoint()
        inertias += la.agg(sum(lit(1.0) - col("lcos"))).head().getDouble(0)
      }
      lc = updateLocal(la)
      cents = lc.select(col("cid"), col("lcid"), col("ld"), col("ln2"))
    }
    (lc, assignLocal(cents).drop("lcos"), inertias.result())
  }

  /** The full two-level k-means over the embeddings corpus: coarse
    * one-Lloyd-stage k-means at [[ivfK]](N) cells (the trained-coarse
    * machinery ann_ivfadc verifies), then [[kmeans2Local]] inside each
    * cell. Total assign work O(N^1.5); final clusters keyed
    * (cid, lcid) at ~128 expected occupancy. */
  private[graft] def kmeans2Stage(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    kmeans2Local(kmeans2CoarseAssign(s, dir))

  /** The coarse half alone — the (vec_id, cid, qd) assignment the
    * local stage partitions on (exposed so the convergence spec can
    * drive [[kmeans2LocalIterate]] at R > 1 on the real coarse
    * geometry). */
  private[graft] def kmeans2CoarseAssign(s: SparkSession, dir: String)
      : DataFrame = {
    val kc = ivfK(Tables(s, dir).embeddingsCount)
    val (codes, _, c1) = kmeansStage(s, dir, kc)
    kmeansAssign(codes, c1).select(col("vec_id"), col("cid"), col("qd"))
  }

  /** Shared oracle CTE chain for the one-Lloyd-stage k-means
    * (codes -> seed centroids -> assignment -> integer-mean update ->
    * reassignment a1) — used by cluster_kmeans (fixed k=16) and
    * dedup_semantic / dedup_blocking_recall (corpus-scaled k via a
    * scalar-subquery kExpr). */
  private def kmeansOracleCtes(kExpr: String = "16"): String =
    s"""e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), q AS (
            |  SELECT vec_id,
            |    list_transform(v, x -> CAST(CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT) AS DOUBLE)) AS qd
            |  FROM (
            |    SELECT vec_id, v,
            |      list_reduce(list_prepend(CAST(1e-12 AS DOUBLE),
            |        list_transform(v, x -> abs(x))), (a, x) -> greatest(a, x)) AS maxabs
            |    FROM e)
            |), qn AS (
            |  SELECT vec_id, qd, greatest(${duckDot("qd", "qd")}, 1e-12) AS qn2 FROM q
            |), c0 AS (
            |  SELECT vec_id AS c_id, qd AS cd, qn2 AS cn2 FROM qn WHERE vec_id < ($kExpr)
            |), a0 AS (
            |  SELECT vec_id, qd, c_id AS cid FROM (
            |    SELECT qn.vec_id, qn.qd, c_id,
            |      row_number() OVER (PARTITION BY qn.vec_id
            |        ORDER BY ${duckDot("qd", "cd")} / sqrt(qn2 * cn2) DESC, c_id) AS rn
            |    FROM qn CROSS JOIN c0
            |  ) WHERE rn = 1
            |), sums AS (
            |  SELECT cid, t.x['pos'] AS pos,
            |    CAST(sum(t.x['code']) AS BIGINT) AS s, count(*) AS n
            |  FROM a0, unnest([{'pos': i, 'code': CAST(qd[i] AS BIGINT)}
            |    FOR i IN range(1, len(qd) + 1)]) AS t(x)
            |  GROUP BY 1, 2
            |), c1 AS (
            |  SELECT cid AS c_id,
            |    list(floor(CAST(s AS DOUBLE) / n) ORDER BY pos) AS cd
            |  FROM sums GROUP BY 1
            |), c1n AS (
            |  SELECT c_id, cd, greatest(${duckDot("cd", "cd")}, 1e-12) AS cn2 FROM c1
            |), a1 AS (
            |  SELECT vec_id, c_id AS cid FROM (
            |    SELECT qn.vec_id, c_id,
            |      row_number() OVER (PARTITION BY qn.vec_id
            |        ORDER BY ${duckDot("qd", "cd")} / sqrt(qn2 * cn2) DESC, c_id) AS rn
            |    FROM qn CROSS JOIN c1n
            |  ) WHERE rn = 1
            |)""".stripMargin

  /** [[kmeansOracleCtes]] extended stage-for-stage with the LOCAL half
    * of the two-level k-means ([[kmeans2Local]]): per-cell membership
    * ranks and kloc = ceil(n/128) (`mem`), the kloc lowest-id seeds
    * (`ls0`), local argmax assignment with ties to the smaller local
    * id (`la0`), integer-mean update (`lsums`/`lc1`/`lc1n`), and the
    * final reassignment (`la1`, keyed (cid, lcid)). */
  private def kmeans2OracleCtes(kExpr: String): String =
    s"""${kmeansOracleCtes(kExpr)},
       |mem AS (
       |  SELECT a1.vec_id, a1.cid, qn.qd, qn.qn2,
       |    row_number() OVER (PARTITION BY a1.cid ORDER BY a1.vec_id) AS rn,
       |    (count(*) OVER (PARTITION BY a1.cid) + 127) // 128 AS kloc
       |  FROM a1 JOIN qn ON a1.vec_id = qn.vec_id
       |), ls0 AS (
       |  SELECT cid, rn AS lcid, qd AS ld, qn2 AS ln2 FROM mem
       |  WHERE rn <= kloc
       |), la0 AS (
       |  SELECT vec_id, cid, lcid, qd FROM (
       |    SELECT m.vec_id, m.cid, s.lcid, m.qd,
       |      row_number() OVER (PARTITION BY m.vec_id
       |        ORDER BY ${duckDot("m.qd", "s.ld")} / sqrt(m.qn2 * s.ln2) DESC,
       |          s.lcid) AS r
       |    FROM mem m JOIN ls0 s ON m.cid = s.cid
       |  ) WHERE r = 1
       |), lsums AS (
       |  SELECT cid, lcid, t.x['pos'] AS pos,
       |    CAST(sum(t.x['code']) AS BIGINT) AS s, count(*) AS n
       |  FROM la0, unnest([{'pos': i, 'code': CAST(qd[i] AS BIGINT)}
       |    FOR i IN range(1, len(qd) + 1)]) AS t(x)
       |  GROUP BY 1, 2, 3
       |), lc1 AS (
       |  SELECT cid, lcid,
       |    list(floor(CAST(s AS DOUBLE) / n) ORDER BY pos) AS ld,
       |    max(n) AS n_before
       |  FROM lsums GROUP BY 1, 2
       |), lc1n AS (
       |  SELECT cid, lcid, ld, n_before,
       |    greatest(${duckDot("ld", "ld")}, 1e-12) AS ln2 FROM lc1
       |), la1 AS (
       |  SELECT vec_id, cid, lcid FROM (
       |    SELECT m.vec_id, m.cid, c.lcid,
       |      row_number() OVER (PARTITION BY m.vec_id
       |        ORDER BY ${duckDot("m.qd", "c.ld")} / sqrt(m.qn2 * c.ln2) DESC,
       |          c.lcid) AS r
       |    FROM mem m JOIN lc1n c ON m.cid = c.cid
       |  ) WHERE r = 1
       |)""".stripMargin

  /** Corpus clustering as the TWO-LEVEL scheme (round 12; the flat
    * one-stage form survives inside it as the coarse half and in the
    * kmeansIterate convergence spec): coarse cells at [[ivfK]](N),
    * then [[kmeans2Local]]'s occupancy-128 k-means inside each cell.
    * Output is one row per FINAL cluster (cc_id = coarse cell,
    * lc_id = local sub-cluster): members at local-assign time
    * (n_before), members after the local reassign (n_after — a
    * sub-cluster can win or lose members when its centroid moves off
    * its seed), and the local-centroid digest. At the verify SFs
    * (N ≤ 2048, kc = 16, most cells under 128 members) most cells
    * carry a single sub-cluster and the output is the familiar
    * ~16-row table; the oracle mirrors the full two-level chain so
    * any occupancy split is verified, not special-cased. */
  val clusterKmeans: Q = Q(
    "cluster_kmeans",
    (s, dir) => {
      val (lc1, la1) = kmeans2Stage(s, dir)
      val n1 = la1.groupBy("cid", "lcid").agg(count(lit(1)).as("n_after"))
      // both sides are ~N/128 rows at scale: a shuffle equi-join on the
      // composite key (NOT a broadcast — the flat row's k-row broadcast
      // assumption died with the flat scheme)
      lc1.join(n1, Seq("cid", "lcid"), "left")
        .select(col("cid").as("cc_id"), col("lcid").as("lc_id"),
          col("n_before"), coalesce(col("n_after"), lit(0L)).as("n_after"),
          expr(sigDigest("transform(ld, x -> CAST(x AS BIGINT) + 127)"))
            .as("centroid_digest"))
        .orderBy("cc_id", "lc_id")
    },
    Some(s"""WITH pk AS (
            |  SELECT ${duckIvfK("count(*)")} AS kk FROM embeddings
            |), ${kmeans2OracleCtes("SELECT kk FROM pk")},
            |n1 AS (SELECT cid, lcid, count(*) AS n_after FROM la1 GROUP BY 1, 2)
            |SELECT c.cid AS cc_id, c.lcid AS lc_id, c.n_before,
            |  coalesce(n1.n_after, 0) AS n_after,
            |  ${duckSigDigest("list_transform(ld, x -> CAST(x AS BIGINT) + 127)")}
            |    AS centroid_digest
            |FROM lc1n c
            |LEFT JOIN n1 ON c.cid = n1.cid AND c.lcid = n1.lcid
            |ORDER BY cc_id, lc_id""".stripMargin))

  /** SemDeDup-style semantic near-dup detection: the two-level
    * k-means clusters are the BLOCKING key — exact float cosines are
    * computed only WITHIN a final (cid, lcid) cluster, never across
    * the corpus. This is dedup_embedding with a learned partition of
    * the space instead of random hyperplanes: at 100 TB the candidate
    * set per vector is its ~128-member final cluster, the pair join is
    * a self-join on the composite cluster key, and everything upstream
    * is the already-audited coarse Lloyd stage plus [[kmeans2Local]].
    * Pairs at cosine >= 0.4 (dedup_embedding's threshold, so the two
    * blocking strategies are directly comparable on the same data). */
  val dedupSemantic: Q = Q(
    "dedup_semantic",
    (s, dir) => {
      // Two-level blocking (round 12 — kills the flat N×(N/128) assign,
      // the registry's last quadratic): coarse cells at ivfK(N) ≈ 4√N
      // past the crossover, then occupancy-128 local k-means per cell;
      // total assign work O(N^1.5) with NO corpus-sized broadcast
      // anywhere (the flat scheme's k×dims centroid broadcast hit ~2 GB
      // at N = 1e9). The blocking key is the FINAL (cid, lcid) cluster,
      // whose ~128 expected occupancy keeps the exact-cosine pair side
      // linear in N — the same contract the flat scheme bought
      // quadratically. Below the 2^18 crossover the coarse half is
      // IDENTICAL to the old flat assign (ivfK = kmeansK there); the
      // local half just re-centers cells under 128 members and splits
      // the ones above.
      val (_, la1) = kmeans2Stage(s, dir)
      // The MaxEmbBucket cap remains as the skew guard (a degenerate
      // cluster — e.g. one vector value repeated N times — still gets
      // sampled down instead of exploding the join); at the
      // verify/bench SFs every cluster is under it, unchanged.
      val bounded = la1
        .withColumn("rn", row_number().over(
          Window.partitionBy("cid", "lcid")
            .orderBy(expr(Dedup.embPriority("vec_id")), col("vec_id"))))
        .filter(col("rn") <= Dedup.MaxEmbBucket).drop("rn")
      val e = emb(s, dir).select(col("vec_id"), col("v"), col("n2"))
      val cand = bounded.as("a")
        .join(bounded.as("b"),
          col("a.cid") === col("b.cid") && col("a.lcid") === col("b.lcid") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      cand
        .join(e.as("ea"), col("va") === col("ea.vec_id"))
        .join(e.as("eb"), col("vb") === col("eb.vec_id"))
        .withColumn("cos", expr(s"${dot("ea.v", "eb.v")} / sqrt(ea.n2 * eb.n2)"))
        .filter(col("cos") >= 0.4)
        .select(col("va"), col("vb"), round(col("cos"), 6).as("cos_sim"))
    },
    Some(s"""WITH pk AS (
            |  SELECT ${duckIvfK("count(*)")} AS kk FROM embeddings
            |), ${kmeans2OracleCtes("SELECT kk FROM pk")},
            |ab AS (
            |  SELECT vec_id, cid, lcid FROM la1
            |  QUALIFY row_number() OVER (PARTITION BY cid, lcid
            |    ORDER BY ${Dedup.embPriority("vec_id")}, vec_id)
            |    <= ${Dedup.MaxEmbBucket}),
            |pairs AS (
            |  SELECT a.vec_id AS va, b.vec_id AS vb
            |  FROM ab a JOIN ab b ON a.cid = b.cid AND a.lcid = b.lcid
            |    AND a.vec_id < b.vec_id),
            |scored AS (
            |  SELECT va, vb, ${duckCosine("ea.v", "eb.v")} AS cos
            |  FROM pairs
            |  JOIN e ea ON va = ea.vec_id
            |  JOIN e eb ON vb = eb.vec_id)
            |SELECT va, vb, round(cos, 6) AS cos_sim
            |FROM scored WHERE cos >= 0.4""".stripMargin))

  /** Anchors for the blocking-recall ground truth: exact recall needs
    * an all-pairs baseline, which is quadratic and impossible at
    * corpus scale — so the harness estimates it on a deterministic
    * anchor sample instead, the way production eval harnesses do.
    * A pair (va < vb) is evaluated iff va ≡ 0 (mod S); S grows with
    * the corpus so truth work is N × (N/S) ≈ N × AnchorCap — LINEAR
    * in N. Since va is uniform over ids this keeps a 1/S uniform
    * sample of true pairs, an unbiased recall estimator. At the
    * oracle/verify SFs (≤ AnchorCap vectors) S = 1 and the estimate
    * IS the exact all-pairs recall. */
  private val AnchorCap = 2048L

  /** Blocking-recall harness for near-dup detection: BOTH blocking
    * strategies (random-hyperplane LSH = dedup_embedding's, learned
    * k-means clusters = dedup_semantic's) measured against the
    * anchor-sampled exact ground truth at the same 0.4 threshold —
    * the evidence that justifies trusting a blocked pipeline's pair
    * coverage before pointing it at a corpus where all-pairs is
    * impossible. The truth pass broadcasts only the ≤ AnchorCap
    * anchor vectors under a BroadcastNestedLoopJoin (each input row
    * scans the anchor set once), and the recall join shuffles on the
    * sampled pair keys — no data-dependent set is ever hinted
    * broadcast. e.count() is bounded driver metadata (one scalar). */
  val dedupBlockingRecall: Q = Q(
    "dedup_blocking_recall",
    (s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("v"), col("n2"))
      val sMod = math.max(1L,
        (Tables(s, dir).embeddingsCount + AnchorCap - 1L) / AnchorCap)
      val anchors = e.filter(col("vec_id") % sMod === 0L)
        .select(col("vec_id").as("a_id"), col("v").as("av"),
          col("n2").as("an2"))
      val truth = e.as("b")
        .join(broadcast(anchors), col("a_id") < col("vec_id"))
        .withColumn("cos", expr(s"${dot("av", "v")} / sqrt(an2 * n2)"))
        .filter(col("cos") >= 0.4)
        .select(col("a_id").as("va"), col("vec_id").as("vb"))
        .localCheckpoint()
      val nTrue = truth.count()
      // guard the ratio at tiny SFs where the truth set can be empty
      // (0/0 would be null here but an error in the oracle dialect)
      val denom = math.max(nTrue, 1L)

      def recallOf(found: DataFrame, strategy: String): DataFrame = {
        // restrict the found side to anchor pairs first (a no-op for
        // the join result — every truth row has va ≡ 0 mod S — but it
        // shrinks the join input by the sample factor). For the
        // kmeans strategy va IS the a-side vec_id, so Catalyst pushes
        // this predicate to the scan. The hyperplane strategy's
        // shipped row hides member ids under `least()` (round 15's
        // measured 23 → 47 s sf10 harness regression), so the harness
        // enters the machinery through the EVAL-ONLY anchored
        // expansion below — anchor predicate applied before the
        // member-expansion joins; identical rep pairs, identical
        // anchored pair set, none of the full member-pair
        // materialization. The filter here stays as a (no-op) guard
        // for that path too.
        val f = found.filter(col("va") % sMod === 0L)
          .select(col("va").as("f_va"), col("vb").as("f_vb"))
        truth.join(f,
            col("va") === col("f_va") && col("vb") === col("f_vb"), "left")
          .agg(count(col("f_va")).as("n_found"))
          .select(lit(strategy).as("strategy"), col("n_found"),
            lit(nTrue).as("n_true"),
            expr(s"n_found * 100 div $denom").as("recall_pct"))
      }

      val hp = Dedup.embeddingFoundPairs(s, dir, Some(sMod))
        .select("va", "vb")
      val km = dedupSemantic.run(s, dir).select("va", "vb")
      recallOf(hp, "hyperplane").unionByName(recallOf(km, "kmeans"))
        .orderBy("strategy")
    },
    Some(s"""WITH pk AS (
            |  SELECT ${duckIvfK("count(*)")} AS kk,
            |    ${Dedup.duckEmbBitsFrom("count(*)")} AS bits
            |  FROM embeddings
            |), ${kmeans2OracleCtes("SELECT kk FROM pk")},
            |params AS (
            |  SELECT greatest(1, CAST(ceil(count(*) / 2048.0) AS BIGINT)) AS s
            |  FROM e
            |), truth AS (
            |  SELECT a.vec_id AS va, b.vec_id AS vb
            |  FROM e a CROSS JOIN params p
            |  JOIN e b ON a.vec_id < b.vec_id
            |  WHERE a.vec_id % p.s = 0
            |    AND ${duckCosine("a.v", "b.v")} >= 0.4
            |), keys AS (
            |  SELECT vec_id, v, unnest(${duckHyperplaneKeysN("v", "pk.bits")}) AS bk
            |  FROM e CROSS JOIN pk
            |), kb AS (
            |  SELECT vec_id, v, bk FROM keys
            |  QUALIFY row_number() OVER (PARTITION BY bk
            |    ORDER BY ${Dedup.embPriority("vec_id")}, vec_id)
            |    <= ${Dedup.MaxEmbBucket}
            |), hp AS (
            |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
            |  FROM kb a JOIN kb b ON a.bk = b.bk AND a.vec_id < b.vec_id
            |  WHERE ${duckCosine("a.v", "b.v")} >= 0.4
            |), km AS (
            |  SELECT a.vec_id AS va, b.vec_id AS vb
            |  FROM (SELECT vec_id, cid, lcid FROM la1
            |        QUALIFY row_number() OVER (PARTITION BY cid, lcid
            |          ORDER BY ${Dedup.embPriority("vec_id")}, vec_id)
            |          <= ${Dedup.MaxEmbBucket}) a
            |  JOIN (SELECT vec_id, cid, lcid FROM la1
            |        QUALIFY row_number() OVER (PARTITION BY cid, lcid
            |          ORDER BY ${Dedup.embPriority("vec_id")}, vec_id)
            |          <= ${Dedup.MaxEmbBucket}) b
            |    ON a.cid = b.cid AND a.lcid = b.lcid AND a.vec_id < b.vec_id
            |  JOIN e ea ON a.vec_id = ea.vec_id
            |  JOIN e eb ON b.vec_id = eb.vec_id
            |  WHERE ${duckCosine("ea.v", "eb.v")} >= 0.4
            |), t AS (SELECT count(*) AS n_true,
            |  greatest(count(*), 1) AS denom FROM truth)
            |SELECT 'hyperplane' AS strategy,
            |  (SELECT count(*) FROM truth JOIN hp USING (va, vb)) AS n_found,
            |  n_true,
            |  (SELECT count(*) FROM truth JOIN hp USING (va, vb)) * 100 // denom
            |    AS recall_pct
            |FROM t
            |UNION ALL
            |SELECT 'kmeans',
            |  (SELECT count(*) FROM truth JOIN km USING (va, vb)),
            |  n_true,
            |  (SELECT count(*) FROM truth JOIN km USING (va, vb)) * 100 // denom
            |FROM t
            |ORDER BY strategy""".stripMargin))

  /** One staged embeddings directory per (session, source dir) — TWO
    * parquet files so `maxFilesPerTrigger=1` forces two genuine
    * ingest batches through the index. */
  private val annStreamDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Incremental IVF index ingest — the maintenance half of a living
    * vector-search system (ann_ivf is the one-shot batch build; a real
    * corpus GROWS): embedding batches stream in, each vector is
    * assigned map-side to its nearest fixed coarse centroid (broadcast
    * — the trained quantizer of a production IVF) and APPENDED to a
    * cell-partitioned lake index carrying (v, n2). Nothing is ever
    * rewritten or shuffled on ingest; per-batch cost is O(batch).
    * The search side collects the probes' cell ids (≤ #probes values —
    * metadata) and scans ONLY those cell directories (literal
    * partition pruning), exact-reranking inside — at 100 TB a query
    * reads its probed cells, never the index. The oracle is ann_ivf's
    * from-scratch SQL verbatim: a hash match proves the streamed,
    * persisted index answers queries identically to the one-shot
    * batch build under an arbitrary ingest split (spec also pins the
    * cell-partitioned append-only layout and the pruned search scan). */
  val annIncremental: Q = Q(
    "ann_incremental",
    (s, dir) => {
      val indexRoot = graft.sources.Formats.scratchDir("graft_ann_index")
      val staged = annStreamDirs.computeIfAbsent(
        (s.sparkContext.applicationId, dir), { _ =>
          val tmp = java.nio.file.Files.createTempDirectory("graft_ann_feed")
          graft.sources.Formats.deleteRecursivelyOnExit(tmp)
          val p = tmp.toString + "/emb"
          Tables(s, dir).embeddings.select("vec_id", "embedding")
            .repartition(2).write.mode("overwrite").parquet(p)
          p
        })
      val cents = emb(s, dir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2"))
        .localCheckpoint(true)
      val schema = s.read.parquet(staged).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", graft.streaming.Streams.filesPerTrigger).parquet(staged)
      val q = stream.writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val e = batch
            .select(col("vec_id"), expr(toDouble("embedding")).as("v"))
            .withColumn("n2", expr(dot("v", "v")))
            .localCheckpoint()
          // slim pair stream (vec_id, c_id, c_cos) into a codegen
          // HashAggregate argmax; v/n2 re-attached by a vec_id join
          // rather than dragged through the aggregate as first()
          e.crossJoin(broadcast(cents))
            .select(col("vec_id"), col("c_id"),
              cosWith("v", "n2", "cv", "cn2").as("c_cos"))
            .groupBy("vec_id")
            .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
            .join(e, "vec_id")
            .select(col("vec_id"), col("cell"), col("v"), col("n2"))
            .write.mode("append").partitionBy("cell")
            .parquet(s"$indexRoot/vectors")
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      // maintenance pass the append-only ingest needs to survive years
      // of batches: coalesce each fragmented cell back to target file
      // count (here: the two ingest batches' files per cell -> 1)
      compactIndex(s, s"$indexRoot/vectors")
      val idx = s.read.parquet(s"$indexRoot/vectors")
      val probes = idx.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("cell"),
          col("v").as("pv"), col("n2").as("pn2"))
        .localCheckpoint(true)
      // ≤ #probes cell ids — metadata; the literal IN prunes the scan
      // to the probed cell directories (partition inference types the
      // directory column as int, hence the Number bridge)
      val probeCells = probes.select("cell").distinct()
        .collect().map(_.get(0).asInstanceOf[Number].longValue).sorted
      idx.filter(col("cell").isin(probeCells.map(Long.box): _*))
        .join(broadcast(probes), "cell")
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("n_id"),
          cosWith("v", "n2", "pv", "pn2").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"), col("rank"),
          round(col("cos"), 6).as("cos_sim"))
    },
    Some(ivfTopkOracleSql))

  /** Small-file compaction for the cell-partitioned incremental index:
    * append-only ingest writes one file per (micro-batch x cell), so a
    * year of daily batches leaves 365 x k files — the classic
    * small-file death (every search task pays an open/footer-read per
    * file, and the namenode/listing cost grows without bound).
    *
    * The pass is O(fragmented cells), never O(index):
    *  1. a filesystem LISTING (metadata only) finds the cells whose
    *     data-file count exceeds `targetFilesPerCell`;
    *  2. ONE job reads exactly those cells (the literal `cell IN`
    *     prunes the scan to their directories) and repartitions on
    *     `cell`, so each cell's rows land in a single task -> a single
    *     output file per cell;
    *  3. dynamic partition overwrite swaps only the rewritten cell
    *     directories — untouched cells' files are never opened.
    *
    * The rewrite is a pure physical re-layout (same rows, same
    * schema), so search results bit-match pre-compaction — spec-pinned
    * (AnnMultimodalSpec), and the registry row runs it between ingest
    * and search. The fragmented cells are pinned (localCheckpoint)
    * before the overwrite because the write replaces the very files
    * the plan reads; a deployment bounds each pass's cell list to keep
    * that pinned set within executor storage — the pass is idempotent,
    * so chunking it is safe.
    *
    * Returns (cells rewritten, total cells). */
  private[graft] def compactIndex(s: SparkSession, vectorsRoot: String,
      targetFilesPerCell: Int = 1): (Int, Int) = {
    require(targetFilesPerCell >= 1, "targetFilesPerCell must be >= 1")
    val root = new org.apache.hadoop.fs.Path(vectorsRoot)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (0, 0)
    val cellDirs = fs.listStatus(root).filter { st =>
      st.isDirectory && st.getPath.getName.startsWith("cell=")
    }
    def dataFileCount(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    val fragmented = cellDirs
      .filter(d => dataFileCount(d.getPath) > targetFilesPerCell)
      .map(_.getPath.getName.stripPrefix("cell=").toLong).sorted
    if (fragmented.isEmpty) return (0, cellDirs.length)
    val pinned = s.read.parquet(vectorsRoot)
      .filter(col("cell").isin(fragmented.map(Long.box): _*))
      .repartition(fragmented.length, col("cell"))
      .localCheckpoint(true)
    try
      pinned.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell").parquet(vectorsRoot)
    finally { pinned.unpersist(false); () }
    (fragmented.length, cellDirs.length)
  }

  // ---- product quantization (PQ/ADC) -------------------------------

  /** PQ geometry: M subspaces of SubDim dims over the 64-dim int8 code
    * vectors, K=16 centroids per subspace (seeded from vec_id < 16 —
    * codebook TRAINING is cluster_kmeans's already-demonstrated
    * integer-Lloyd machinery, run per subspace; this row pins the
    * ENCODE + ADC SEARCH path, the part that touches the whole corpus
    * at query time). Distances are squared L2 between int8 code
    * vectors — codes are x * 127/maxabs, i.e. L-inf-normalized
    * coordinates, so code-space L2 is a consistent scale-free
    * geometry — and EVERY distance is a sum of integer-valued doubles
    * (exact far below 2^53): no float rounding exists anywhere in the
    * operator, output distances are BIGINT. */
  private[graft] val PqM = 4
  private[graft] val PqSubDim = 16 // 64 dims / 4 subspaces

  /** (vec_id, m, sv, sn2): a (vec_id, qd) code-vector frame split into
    * per-subspace code vectors; sn2 = <sv,sv> (exact integer-valued
    * double). Shared by the natural-order and OPQ-permuted chains. */
  private def subvectorsOf(codes: DataFrame): DataFrame =
    codes
      .select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${PqM - 1}), " +
          s"m -> struct(m AS m, slice(qd, m * $PqSubDim + 1, $PqSubDim) AS sv))"))
        .as("x"))
      .select(col("vec_id"), col("x.m").as("m"), col("x.sv").as("sv"))
      .withColumn("sn2", expr(dot("sv", "sv")))

  /** The corpus split into per-subspace code vectors (natural
    * coordinate order). */
  private def pqSubvectors(s: SparkSession, dir: String): DataFrame =
    subvectorsOf(kmeansCodes(s, dir))

  /** OPQ-lite subvectors: a balanced-variance coordinate PERMUTATION
    * applied before the subspace split — the parameter-free baseline
    * of OPQ (Ge et al., CVPR 2013: optimize the space rotation so
    * subquantizers share the variance; their "OPQ-NP" ablation shows a
    * permutation balancing per-subspace variance captures much of the
    * gain without the float SVD, which would not oracle-verify).
    * Dimensions are ranked by exact-integer corpus variance
    * (N·Σx² − (Σx)² over the int8 codes, BIGINT arithmetic) and dealt
    * round-robin across the M subspaces — each subspace receives every
    * M-th variance rank, so no subquantizer is starved while another
    * carries all the energy. The 64-row census is index-build
    * metadata (collected like the probed-cell list; at extreme N a
    * deployment computes it on a sample — the ranks, not the moments,
    * are what matters). Identical census + tie-break (varn desc, dim
    * asc) in the DuckDB oracle. Storage and search cost are IDENTICAL
    * to ann_ivf_pq — the permutation is free at query time. */
  /** position → original dim, the permutation [[opqSubvectors]]
    * applies (private[graft] so the spec can pin bijection +
    * round-robin dealing against its own variance recompute). */
  private[graft] def opqPermutation(s: SparkSession, dir: String): Seq[Int] = {
    val stats = kmeansCodes(s, dir).select(explode(expr(
        "transform(sequence(0, 63), d -> struct(d AS d, CAST(element_at(qd, d + 1) AS BIGINT) AS x))"))
        .as("t"))
      .select(col("t.d").as("d"), col("t.x").as("x"))
      .groupBy("d")
      .agg((count(lit(1)) * sum(expr("x * x")) - sum(col("x")) * sum(col("x")))
        .as("varn"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val perm = new Array[Int](64)
    stats.sortBy { case (d, v) => (-v, d) }.map(_._1).zipWithIndex
      .foreach { case (d, r) => perm((r % PqM) * PqSubDim + r / PqM) = d }
    perm.toSeq
  }

  private def opqSubvectors(s: SparkSession, dir: String): DataFrame = {
    val perm = opqPermutation(s, dir)
    subvectorsOf(kmeansCodes(s, dir).withColumn("qd", expr(
      s"transform(array(${perm.mkString(", ")}), i -> element_at(qd, i + 1))")))
  }

  /** 64-row codebook (m, c_id, cd, cn2): subspace slices of the 16
    * seed vectors. Broadcast everywhere it is used. */
  private def pqCodebook(sub: DataFrame): DataFrame =
    sub.filter(col("vec_id") < 16)
      .select(col("m"), col("vec_id").as("c_id"), col("sv").as("cd"),
        col("sn2").as("cn2"))

  /** squared L2 via the shared dot fold: |a|^2 + |b|^2 - 2<a,b> —
    * three exact integers combined exactly. */
  private def sqDist(an2: String, bn2: String, a: String, b: String) =
    expr(s"$an2 + $bn2 - 2 * ${dot(a, b)}")

  /** PQ search with asymmetric distance computation — the 100 TB ANN
    * workhorse (IVF-PQ's scoring half): the corpus is stored as M
    * small integer codes per vector (here 4 bytes vs 64 floats, a 64x
    * read shrink), probes stay UNquantized, and scoring a vector is M
    * lookups into a per-probe distance table + a sum — no raw vector
    * is ever read at query time.
    *
    *  - encode (once, offline): per (vector, subspace) argmin over the
    *    broadcast 64-row codebook — the partial-aggregated codegen
    *    argmax (`graft_argmax(c_id, -d)`), one
    *    exchange on vec_id, exactly ann_ivf's assignment shape. At
    *    100 TB this is the index build; its output is 4 small ints
    *    per vector.
    *  - search: the probe LUT (|probes| x M x K = 320 rows here) is
    *    built from the probes' own subvectors and broadcast; each
    *    encoded row joins its M LUT entries map-side, and the ADC
    *    distance is a partial-aggregated SUM over m — the exchange
    *    moves one (probe, vec) row per vector, carrying only integer
    *    partial sums. Top-5 per probe by (distance, id).
    *
    * Ties cannot diverge: every distance is an exact integer, ordering
    * breaks on (adist, n_id) in both engines. */
  val annPq: Q = Q(
    "ann_pq",
    (s, dir) => {
      val sub = pqSubvectors(s, dir).localCheckpoint()
      val cb = pqCodebook(sub)
      val enc = sub.join(broadcast(cb), "m")
        .select(col("vec_id"), col("m"), col("c_id"),
          sqDist("sn2", "cn2", "sv", "cd").as("d"))
        .groupBy("vec_id", "m")
        .agg(expr("graft_argmax(c_id, -d)").as("code"))
      val lut = sub.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("m").as("pm"),
          col("sv").as("psv"), col("sn2").as("psn2"))
        .join(cb, col("pm") === col("m"))
        .select(col("probe_id"), col("m"), col("c_id"),
          sqDist("psn2", "cn2", "psv", "cd").as("d"))
      enc.join(broadcast(lut),
          enc("m") === lut("m") && enc("code") === lut("c_id") &&
            enc("vec_id") =!= lut("probe_id"))
        .select(col("probe_id"), col("vec_id").as("n_id"), col("d"))
        .groupBy("probe_id", "n_id")
        .agg(sum(col("d")).cast("long").as("adist"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("adist"), col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"), col("rank"), col("adist"))
    },
    Some(pqOracle(
      s"""SELECT probe_id, n_id, rank, adist FROM adc_ranked WHERE rank <= 5""")))

  /** Recall@5 of PQ/ADC against the EXACT top-5 in the same code-space
    * L2 geometry (full 64-dim integer distances, no codebook) — so the
    * number isolates pure codebook-quantization loss, the metric that
    * sizes M and K in production. Both sides are exact integer
    * arithmetic; ties break on id in both engines. */
  val annRecallPq: Q = Q(
    "ann_recall_pq",
    (s, dir) => {
      val codes = kmeansCodes(s, dir).localCheckpoint()
      val probes = broadcast(codes.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("qd").as("pqd"),
          col("qn2").as("pqn2")))
      val exact = codes.join(probes, col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("n_id"),
          sqDist("pqn2", "qn2", "pqd", "qd").cast("long").as("ed"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("ed"), col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annPq.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(pqOracle(
      s"""exact AS (
         |  SELECT probe_id, n_id FROM (
         |    SELECT p.vec_id AS probe_id, q.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |        ${duckDot("p.qd", "p.qd")} + ${duckDot("q.qd", "q.qd")}
         |          - 2 * ${duckDot("p.qd", "q.qd")}, q.vec_id) AS rank
         |    FROM q JOIN q p ON q.vec_id <> p.vec_id
         |    WHERE p.$ProbeFilter
         |  ) WHERE rank <= 5
         |), approx AS (
         |  SELECT probe_id, n_id FROM adc_ranked WHERE rank <= 5
         |)
         |SELECT x.probe_id, count(*) AS k, count(a.n_id) AS hits,
         |  count(a.n_id) * 100 // count(*) AS recall_pct
         |FROM exact x LEFT JOIN approx a
         |  ON x.probe_id = a.probe_id AND x.n_id = a.n_id
         |GROUP BY 1 ORDER BY x.probe_id""".stripMargin, extraCte = true)))

  /** Squared L2 distance via precomputed squared norms — the ADC/encode
    * distance every PQ oracle interpolates. */
  private def duckSqDist(a: String, b: String, an2: String, bn2: String) =
    s"$an2 + $bn2 - 2 * ${duckDot(a, b)}"

  /** The int8 quantization (`q`) + subspace split (`sub`) CTEs — the
    * single home of the floor(x*127/maxabs+0.5) formula; expects an
    * `e` CTE in scope. Shared by [[pqCoreCtes]] and
    * [[ivfPqResOracleCtes]] so the engines' quantization can never
    * silently diverge between the residual and non-residual chains. */
  // lazy: referenced from other lazy-val initializers whose first use
  // happens during the PQ rows' val initializers above
  /** The int8-quantization CTE alone (`q`: vec_id, qd) — factored so
    * chains can split either the raw or the OPQ-permuted codes. */
  private lazy val duckQuantizeCte: String =
    s"""q AS (
       |  SELECT vec_id,
       |    list_transform(v, x -> CAST(CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT) AS DOUBLE)) AS qd
       |  FROM (
       |    SELECT vec_id, v,
       |      list_reduce(list_prepend(CAST(1e-12 AS DOUBLE),
       |        list_transform(v, x -> abs(x))), (a, x) -> greatest(a, x)) AS maxabs
       |    FROM e)
       |)""".stripMargin

  private lazy val pqSubCtes: String = s"$duckQuantizeCte, $pqSplitCte"

  /** The subspace-split CTE over any (vec_id, qd) source — for chains
    * whose `q` already exists under another name's formula (the
    * trained-cell chain reuses kmeansOracleCtes' identical `q`; the
    * OPQ∘residual chain splits the permuted `qp`). */
  private def pqSplitCteFrom(src: String): String =
    s"""sub AS (
       |  SELECT vec_id, t.m,
       |    list_slice(qd, t.m * $PqSubDim + 1, t.m * $PqSubDim + $PqSubDim) AS sv
       |  FROM $src, unnest([i FOR i IN range(0, $PqM)]) AS t(m)
       |)""".stripMargin

  private lazy val pqSplitCte: String = pqSplitCteFrom("q")

  /** The OPQ-lite permutation census CTEs (expects `q`; yields `qp` —
    * the permuted (vec_id, qd)): exact-integer variance
    * N·Σx² − (Σx)² per dim, ranked varn DESC / d ASC, dealt
    * round-robin across the M subspaces. Shared by the plain OPQ
    * chain and the OPQ∘residual composition. */
  private lazy val opqCensusCtes: String =
    s"""opqstats AS (
       |  SELECT t.d AS d,
       |    count(*) * sum(CAST(qd[t.d + 1] AS BIGINT) * CAST(qd[t.d + 1] AS BIGINT))
       |      - sum(CAST(qd[t.d + 1] AS BIGINT)) * sum(CAST(qd[t.d + 1] AS BIGINT)) AS varn
       |  FROM q, unnest([i FOR i IN range(0, 64)]) AS t(d)
       |  GROUP BY 1
       |), permt AS (
       |  SELECT ((r % $PqM) * $PqSubDim + r // $PqM) AS pos, d FROM (
       |    SELECT d, row_number() OVER (ORDER BY varn DESC, d) - 1 AS r
       |    FROM opqstats)
       |), qp AS (
       |  SELECT vec_id, list(x ORDER BY pos) AS qd FROM (
       |    SELECT q.vec_id, p.pos, q.qd[p.d + 1] AS x FROM q, permt p
       |  ) GROUP BY 1
       |)""".stripMargin

  /** The PQ index/LUT oracle CTE chain (int8 codes -> subspace split
    * -> seed codebook -> argmin encode -> probe LUT), shared verbatim
    * by the three PQ rows; expects an `e` CTE in scope. */
  // lazy: referenced from pqOracle during the PQ rows' val initializers
  // above, which run before this declaration in object init order
  private lazy val pqCoreCtes: String = {
    val d = duckSqDist _
    s"""$pqSubCtes, sn AS (
       |  SELECT vec_id, m, sv, ${duckDot("sv", "sv")} AS sn2 FROM sub
       |), cb AS (
       |  SELECT m, vec_id AS c_id, sv AS cd, sn2 AS cn2 FROM sn WHERE vec_id < 16
       |), enc AS (
       |  SELECT vec_id, m, c_id AS code FROM (
       |    SELECT sn.vec_id, sn.m, cb.c_id,
       |      row_number() OVER (PARTITION BY sn.vec_id, sn.m
       |        ORDER BY ${d("sv", "cd", "sn2", "cn2")}, cb.c_id) AS rn
       |    FROM sn JOIN cb ON sn.m = cb.m
       |  ) WHERE rn = 1
       |), lut AS (
       |  SELECT p.vec_id AS probe_id, cb.m, cb.c_id,
       |    ${d("p.sv", "cd", "p.sn2", "cn2")} AS dist
       |  FROM sn p JOIN cb ON p.m = cb.m WHERE p.$ProbeFilter
       |)""".stripMargin
  }

  /** Oracle for the flat PQ rows: the core chain + whole-corpus ADC +
    * per-probe ranking. `extraCte` appends the tail as further CTEs
    * (the recall harness) instead of a final SELECT. */
  private def pqOracle(tail: String, extraCte: Boolean = false): String = {
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), $pqCoreCtes, adc AS (
       |  SELECT probe_id, enc.vec_id AS n_id,
       |    CAST(sum(dist) AS BIGINT) AS adist
       |  FROM enc JOIN lut ON enc.m = lut.m AND enc.code = lut.c_id
       |    AND enc.vec_id <> lut.probe_id
       |  GROUP BY 1, 2
       |), adc_ranked AS (
       |  SELECT probe_id, n_id, adist,
       |    row_number() OVER (PARTITION BY probe_id
       |      ORDER BY adist, n_id) AS rank
       |  FROM adc
       |)${if (extraCte) "," else ""}
       |$tail""".stripMargin
  }

  /** IVF-PQ — the two halves composed into the production ANN
    * architecture (what FAISS/SCaNN-class systems deploy at billion
    * scale): the OFFLINE index stores, per vector, one coarse cell id
    * (ann_ivf's broadcast-argmax assignment) plus M=4 PQ codes
    * (ann_pq's broadcast-argmin encode) — a handful of small ints,
    * never the raw vector. The ONLINE search (a) partition-prunes to
    * the probe's nprobe=2 nearest cells, (b) scores ONLY those cells'
    * candidates by ADC table lookups (integer sums — no vector math,
    * no raw-vector reads), (c) exact-reranks the [[AdcShortlist]]-deep
    * ADC shortlist with true cosines. At 100 TB each query touches
    * 2/k of the index rows, reads 4 ints per candidate, and fetches
    * raw vectors for only AdcShortlist finalists — the IO shape that makes
    * vector search affordable. Every stage is the already-verified
    * arithmetic of its parent row, so the composition hash-matches the
    * composed oracle. */
  /** The composed IVF-PQ search given the PQ half's subvector frame —
    * shared by ann_ivf_pq (natural order) and ann_ivfpq_opq (permuted)
    * so the two variants can never drift anywhere except the input
    * coordinate order. */
  private def ivfPqSearchWith(s: SparkSession, dir: String,
                              sub0: DataFrame): DataFrame = {
      val e = emb(s, dir)
      // offline: coarse cells + PQ codes
      val cents = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2")))
      val cellScores = e.crossJoin(cents)
        .select(col("vec_id"), col("c_id"),
          cosWith("v", "n2", "cv", "cn2").as("c_cos"))
      val assigned = cellScores.groupBy("vec_id")
        .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
      val sub = sub0.localCheckpoint()
      val cb = pqCodebook(sub)
      val enc = sub.join(broadcast(cb), "m")
        .select(col("vec_id"), col("m"), col("c_id"),
          sqDist("sn2", "cn2", "sv", "cd").as("d"))
        .groupBy("vec_id", "m")
        .agg(expr("graft_argmax(c_id, -d)").as("c_id"))
      val indexed = enc.join(assigned, "vec_id")
      // online: probed cells -> ADC shortlist -> exact rerank
      val probeCells = cellScores.filter(expr(ProbeFilter))
        .withColumn("crn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))))
        .filter(col("crn") <= 2)
        .select(col("vec_id").as("probe_id"), col("c_id").as("cell"))
      val lut = sub.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("m").as("pm"),
          col("sv").as("psv"), col("sn2").as("psn2"))
        .join(cb, col("pm") === col("m"))
        .select(col("probe_id"), col("m"), col("c_id"),
          sqDist("psn2", "cn2", "psv", "cd").as("d"))
      val shortlist = indexed.join(broadcast(probeCells), "cell")
        .filter(col("vec_id") =!= col("probe_id"))
        .join(broadcast(lut), Seq("probe_id", "m", "c_id"))
        .select(col("probe_id"), col("vec_id").as("n_id"), col("d"))
        .groupBy("probe_id", "n_id")
        .agg(sum(col("d")).cast("long").as("adist"))
        .withColumn("rq", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("adist"), col("n_id"))))
        .filter(col("rq") <= AdcShortlist)
      shortlist
        .join(e.select(col("vec_id"), col("v").as("pv"), col("n2").as("pn2")),
          col("probe_id") === col("vec_id")).drop("vec_id")
        .join(e.select(col("vec_id"), col("v").as("nv"), col("n2").as("nn2")),
          col("n_id") === col("vec_id"))
        .select(col("probe_id"), col("n_id"),
          cosWith("pv", "pn2", "nv", "nn2").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"), col("rank"),
          round(col("cos"), 6).as("cos_sim"))
  }

  val annIvfPq: Q = Q(
    "ann_ivf_pq",
    (s, dir) => ivfPqSearchWith(s, dir, pqSubvectors(s, dir)),
    Some(s"""WITH $ivfPqOracleCtes
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id
            |      ORDER BY cos DESC, n_id) AS rank
            |  FROM reranked
            |) WHERE rank <= 5""".stripMargin))

  /** The coarse-cell oracle chain (`e` load -> seed centroids `c` ->
    * all-pairs cell cosines `cs` -> corpus assignment `assigned` ->
    * nprobe=2 probed cells `pc`) — shared verbatim by the residual and
    * non-residual IVF-PQ chains so a future nprobe/seed edit cannot
    * diverge them. */
  private lazy val coarseCellCtes: String =
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), c AS (
       |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
       |), cs AS (
       |  SELECT e.vec_id, c_id, ${duckCosine("e.v", "cv")} AS c_cos
       |  FROM e CROSS JOIN c
       |), assigned AS (
       |  SELECT vec_id, c_id AS cell FROM (
       |    SELECT vec_id, c_id,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY c_cos DESC, c_id) AS rn
       |    FROM cs
       |  ) WHERE rn = 1
       |), pc AS (
       |  SELECT vec_id AS probe_id, c_id AS cell FROM (
       |    SELECT vec_id, c_id,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY c_cos DESC, c_id) AS crn
       |    FROM cs WHERE $ProbeFilter
       |  ) WHERE crn <= 2
       |)""".stripMargin

  /** The IVF-PQ oracle chain through `reranked` (coarse cells + probed
    * cells + PQ core + ADC shortlist + exact rerank), shared with the
    * recall harness. Lazy: referenced from val initializers above. */
  private lazy val ivfPqOracleCtes: String =
    s"""$coarseCellCtes, $pqCoreCtes, adcp AS (
       |  SELECT pc.probe_id, a.vec_id AS n_id,
       |    CAST(sum(lut.dist) AS BIGINT) AS adist
       |  FROM assigned a
       |  JOIN pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
       |  JOIN enc ON enc.vec_id = a.vec_id
       |  JOIN lut ON lut.probe_id = pc.probe_id AND lut.m = enc.m
       |    AND lut.c_id = enc.code
       |  GROUP BY 1, 2
       |), short AS (
       |  SELECT probe_id, n_id FROM (
       |    SELECT probe_id, n_id,
       |      row_number() OVER (PARTITION BY probe_id
       |        ORDER BY adist, n_id) AS rq
       |    FROM adcp
       |  ) WHERE rq <= $AdcShortlist
       |), reranked AS (
       |  SELECT s.probe_id, s.n_id, ${duckCosine("ep.v", "en.v")} AS cos
       |  FROM short s
       |  JOIN e ep ON s.probe_id = ep.vec_id
       |  JOIN e en ON s.n_id = en.vec_id
       |)""".stripMargin

  /** Recall@5 of the composed IVF-PQ vs exact brute force — the
    * end-to-end number a deployment actually watches (coarse-cell
    * misses + codebook loss + shortlist truncation, measured together
    * against ground truth). Same harness construction as every other
    * recall row, with one eval-harness property made explicit: the
    * approx side is MATERIALIZED (localCheckpoint — |probes| x 5 rows)
    * before the comparison, exactly as a deployment scores stored
    * search output against ground truth. The comparison plan therefore
    * contains the brute-force chain plus one broadcast join + one
    * aggregation — it never replans the composed IVF-PQ pipeline
    * (whose plan shape is audited on its own row). */
  val annRecallIvfPq: Q = Q(
    "ann_recall_ivfpq",
    (s, dir) => {
      val exact = annBruteforce.run(s, dir).filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annIvfPq.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
        .localCheckpoint()
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(s"""WITH $ivfPqOracleCtes, approx AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT probe_id, n_id,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY cos DESC, n_id) AS rank
            |    FROM reranked
            |  ) WHERE rank <= 5
            |), bf AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT p.vec_id AS probe_id, x.vec_id AS n_id,
            |      row_number() OVER (PARTITION BY p.vec_id
            |        ORDER BY ${duckCosine("p.v", "x.v")} DESC, x.vec_id) AS rank
            |    FROM e x JOIN e p ON x.vec_id <> p.vec_id
            |    WHERE p.$ProbeFilter
            |  ) WHERE rank <= 5
            |)
            |SELECT b.probe_id, count(*) AS k, count(a.n_id) AS hits,
            |  count(a.n_id) * 100 // count(*) AS recall_pct
            |FROM bf b LEFT JOIN approx a
            |  ON b.probe_id = a.probe_id AND b.n_id = a.n_id
            |GROUP BY 1 ORDER BY b.probe_id""".stripMargin))

  /** The OPQ-permuted IVF-PQ oracle chain through `rerankedp`: the
    * same coarse-cell CTEs, then the permutation census (exact-integer
    * variance N·Σx² − (Σx)², ranked varn DESC, d ASC, dealt
    * round-robin: rank r → position (r mod M)·SubDim + r div M), the
    * permuted split, and the p-suffixed PQ/ADC/rerank chain — textually
    * parallel to [[ivfPqOracleCtes]] with `q` → `qp`. (`$pqSubCtes`
    * also declares the natural-order `sub`; it is unreferenced here
    * and DuckDB never evaluates unreferenced CTEs.) */
  private lazy val ivfPqOpqOracleCtes: String = {
    val d = duckSqDist _
    s"""$coarseCellCtes, $pqSubCtes, $opqCensusCtes, subp AS (
       |  SELECT vec_id, t.m,
       |    list_slice(qd, t.m * $PqSubDim + 1, t.m * $PqSubDim + $PqSubDim) AS sv
       |  FROM qp, unnest([i FOR i IN range(0, $PqM)]) AS t(m)
       |), snp AS (
       |  SELECT vec_id, m, sv, ${duckDot("sv", "sv")} AS sn2 FROM subp
       |), cbp AS (
       |  SELECT m, vec_id AS c_id, sv AS cd, sn2 AS cn2 FROM snp WHERE vec_id < 16
       |), encp AS (
       |  SELECT vec_id, m, c_id AS code FROM (
       |    SELECT snp.vec_id, snp.m, cbp.c_id,
       |      row_number() OVER (PARTITION BY snp.vec_id, snp.m
       |        ORDER BY ${d("sv", "cd", "sn2", "cn2")}, cbp.c_id) AS rn
       |    FROM snp JOIN cbp ON snp.m = cbp.m
       |  ) WHERE rn = 1
       |), lutp AS (
       |  SELECT p.vec_id AS probe_id, cbp.m, cbp.c_id,
       |    ${d("p.sv", "cd", "p.sn2", "cn2")} AS dist
       |  FROM snp p JOIN cbp ON p.m = cbp.m WHERE p.$ProbeFilter
       |), adcpp AS (
       |  SELECT pc.probe_id, a.vec_id AS n_id,
       |    CAST(sum(lutp.dist) AS BIGINT) AS adist
       |  FROM assigned a
       |  JOIN pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
       |  JOIN encp ON encp.vec_id = a.vec_id
       |  JOIN lutp ON lutp.probe_id = pc.probe_id AND lutp.m = encp.m
       |    AND lutp.c_id = encp.code
       |  GROUP BY 1, 2
       |), shortp AS (
       |  SELECT probe_id, n_id FROM (
       |    SELECT probe_id, n_id,
       |      row_number() OVER (PARTITION BY probe_id
       |        ORDER BY adist, n_id) AS rq
       |    FROM adcpp
       |  ) WHERE rq <= $AdcShortlist
       |), rerankedp AS (
       |  SELECT s.probe_id, s.n_id, ${duckCosine("ep.v", "en.v")} AS cos
       |  FROM shortp s
       |  JOIN e ep ON s.probe_id = ep.vec_id
       |  JOIN e en ON s.n_id = en.vec_id
       |)""".stripMargin
  }

  /** IVF-PQ with the OPQ-lite permutation — identical index bytes,
    * identical search cost, the coordinate order the codebook
    * quantizes just balanced across subquantizers (see
    * [[opqSubvectors]]). Every stage downstream of the permuted split
    * is [[ivfPqSearchWith]] verbatim. */
  val annIvfPqOpq: Q = Q(
    "ann_ivfpq_opq",
    (s, dir) => ivfPqSearchWith(s, dir, opqSubvectors(s, dir)),
    Some(s"""WITH $ivfPqOpqOracleCtes
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id
            |      ORDER BY cos DESC, n_id) AS rank
            |  FROM rerankedp
            |) WHERE rank <= 5""".stripMargin))

  /** Recall@5 of the OPQ-permuted IVF-PQ vs exact brute force — the
    * ladder point that prices the permutation: same harness as
    * ann_recall_ivfpq (approx side materialized before comparison). */
  val annRecallIvfPqOpq: Q = Q(
    "ann_recall_ivfpq_opq",
    (s, dir) => {
      val exact = annBruteforce.run(s, dir).filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annIvfPqOpq.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
        .localCheckpoint()
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(s"""WITH $ivfPqOpqOracleCtes, approx AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT probe_id, n_id,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY cos DESC, n_id) AS rank
            |    FROM rerankedp
            |  ) WHERE rank <= 5
            |), bf AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT p.vec_id AS probe_id, x.vec_id AS n_id,
            |      row_number() OVER (PARTITION BY p.vec_id
            |        ORDER BY ${duckCosine("p.v", "x.v")} DESC, x.vec_id) AS rank
            |    FROM e x JOIN e p ON x.vec_id <> p.vec_id
            |    WHERE p.$ProbeFilter
            |  ) WHERE rank <= 5
            |)
            |SELECT b.probe_id, count(*) AS k, count(a.n_id) AS hits,
            |  count(a.n_id) * 100 // count(*) AS recall_pct
            |FROM bf b LEFT JOIN approx a
            |  ON b.probe_id = a.probe_id AND b.n_id = a.n_id
            |GROUP BY 1 ORDER BY b.probe_id""".stripMargin))

  /** Lloyd rounds for the residual codebook (mirrored verbatim in the
    * oracle's generated CTE rounds — [[resCbTrainCtes]]). */
  private val ResTrainRounds = 2

  /** TRAIN the shared residual codebook: seed with the 16 seed
    * vectors' own residuals, then run [[ResTrainRounds]] deterministic
    * Lloyd rounds over the FULL residual distribution (argmin-sqdist
    * assignment, per-(subspace, codeword, dim) INTEGER sums,
    * floor-of-double-div means — kmeansUpdate's exact arithmetic; a
    * codeword that attracts no members keeps its previous value via
    * left-join-coalesce, so the round is total and deterministic in
    * both engines). Training is what FAISS does for IVFADC codebooks,
    * and round 9's committed measurement (RESIDUAL_GAIN.json) is why:
    * the UNtrained seed codebook underfits as the corpus grows — the
    * 16 seed residuals stop spanning the residual distribution — and
    * recall@5 fell 72→52 at 10× while the trained path tracks the
    * distribution at any size. Each round reads the checkpointed
    * residual frame once (broadcast codebook, partial-agg argmin — one
    * exchange — then k×M×dim-group integer sums: ann_pq's encode shape,
    * corpus-size-independent update state). Returns the 64-row
    * (m, c_id, cd, cn2) frame, localCheckpoint-ed so every consumer —
    * encode, LUT, and the plan audit — sees a tiny leaf, not the
    * training lineage. */
  private def trainResCodebook(res: DataFrame): DataFrame = {
    var cb = res.filter(col("vec_id") < 16)
      .select(col("m"), col("vec_id").as("c_id"), col("rv").as("cd"),
        col("rn2").as("cn2"))
      .localCheckpoint()
    (1 to ResTrainRounds).foreach { _ =>
      // slim pair stream into the codegen HashAggregate argmin; rv is
      // re-attached by a (vec_id, m) join against the checkpointed
      // residual frame instead of riding every pair row as first()
      val assign = res.join(broadcast(cb), "m")
        .select(col("vec_id"), col("m"), col("c_id"),
          sqDist("rn2", "cn2", "rv", "cd").as("d"))
        .groupBy("vec_id", "m")
        .agg(expr("graft_argmax(c_id, -d)").as("c_id"))
        .join(res.select(col("vec_id"), col("m"), col("rv")), Seq("vec_id", "m"))
      val upd = assign.select(col("m"), col("c_id"), posexplode(col("rv")))
        .groupBy("m", "c_id", "pos")
        .agg(sum(col("col").cast("long")).as("sm"), count(lit(1)).as("n"))
        .withColumn("cm", floor(col("sm").cast("double") / col("n")).cast("double"))
        .groupBy("m", "c_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cm))), x -> x.cm)")
          .as("ucd"))
      cb = cb.join(upd, Seq("m", "c_id"), "left")
        .select(col("m"), col("c_id"), coalesce(col("ucd"), col("cd")).as("cd"))
        .withColumn("cn2", expr(dot("cd", "cd")))
        .localCheckpoint()
    }
    cb
  }

  /** The residual-ADC search half, shared by ann_ivf_pq_res (seed
    * coarse cells) and ann_ivfadc (trained coarse cells): takes the
    * coarse half as inputs — `assigned` (vec_id, cell: every vector's
    * coarse cell) and `probeCells` (probe_id, cell: each probe's
    * nprobe=2 cells) — and runs the identical offline/online residual
    * pipeline on top: per-(cell, subspace) integer cell centroids,
    * residual subvectors, the TRAINED residual codebook
    * ([[trainResCodebook]]), argmin encode, per-(probe, probed-cell)
    * ADC table, broadcast prune+lookup join, integer partial-agg
    * shortlist, exact rerank. Mirrored by the oracle's
    * [[residualTailCtes]] so the two callers cannot diverge. */
  private def residualAdcSearch(s: SparkSession, dir: String,
      assigned: DataFrame, probeCells: DataFrame,
      qcand: Int = AdcShortlist,
      subvectors: Option[DataFrame] = None): DataFrame = {
    val e = emb(s, dir)
    // `subvectors` lets a caller swap the subspace split (the
    // OPQ∘residual composition hands the PERMUTED split) — everything
    // downstream is coordinate-order agnostic
    val sub = subvectors.getOrElse(pqSubvectors(s, dir))
      .join(assigned, "vec_id").localCheckpoint()
    // per-(cell, subspace) integer centroid of the member subvectors:
    // per-dim INTEGER sums (order-independent), floor-of-double-div
    // means — kmeansUpdate's exact arithmetic, k x M tiny rows
    val cellCent = sub.select(col("cell"), col("m"), posexplode(col("sv")))
      .groupBy("cell", "m", "pos")
      .agg(sum(col("col").cast("long")).as("sm"), count(lit(1)).as("n"))
      .withColumn("cm", floor(col("sm").cast("double") / col("n")).cast("double"))
      .groupBy("cell", "m")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cm))), x -> x.cm)")
        .as("ccd"))
    // residual subvectors: rv = sv − centroid(cell, m), exact ints
    val res = sub.join(broadcast(cellCent), Seq("cell", "m"))
      .select(col("vec_id"), col("cell"), col("m"),
        expr("zip_with(sv, ccd, (a, b) -> a - b)").as("rv"))
      .withColumn("rn2", expr(dot("rv", "rv")))
      .localCheckpoint()
    // residual codebook: seeded by the 16 seed vectors' residuals,
    // trained by ResTrainRounds Lloyd rounds over the residual
    // distribution (shared across cells — the standard
    // shared-codebook-on-residuals shape)
    val rcb = trainResCodebook(res)
    // encode: per (vector, subspace) argmin over the broadcast
    // residual codebook — ann_pq's one-exchange partial-agg shape
    val enc = res.join(broadcast(rcb), "m")
      .select(col("vec_id"), col("cell"), col("m"), col("c_id"),
        sqDist("rn2", "cn2", "rv", "cd").as("d"))
      .groupBy("vec_id", "cell", "m")
      .agg(expr("graft_argmax(c_id, -d)").as("code"))
    // online: the ADC table is built from the probe's residual
    // AGAINST EACH PROBED CELL's centroid
    val lut = sub.filter(expr(ProbeFilter))
      .select(col("vec_id").as("probe_id"), col("m"), col("sv"))
      .join(broadcast(probeCells), "probe_id")
      .join(broadcast(cellCent), Seq("cell", "m"))
      .select(col("probe_id"), col("cell"), col("m"),
        expr("zip_with(sv, ccd, (a, b) -> a - b)").as("prv"))
      .withColumn("prn2", expr(dot("prv", "prv")))
      .join(broadcast(rcb), "m")
      .select(col("probe_id"), col("cell"), col("m"), col("c_id"),
        sqDist("prn2", "cn2", "prv", "cd").as("d"))
    // one broadcast join does BOTH the cell prune and the table
    // lookup: candidates outside probed cells have no LUT row and
    // drop map-side; survivors carry only integer partial sums
    val shortlist = enc.join(broadcast(lut),
        enc("cell") === lut("cell") && enc("m") === lut("m") &&
          enc("code") === lut("c_id") && enc("vec_id") =!= lut("probe_id"))
      .select(col("probe_id"), enc("vec_id").as("n_id"), col("d"))
      .groupBy("probe_id", "n_id")
      .agg(sum(col("d")).cast("long").as("adist"))
      .withColumn("rq", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("adist"), col("n_id"))))
      .filter(col("rq") <= qcand)
    shortlist
      .join(e.select(col("vec_id"), col("v").as("pv"), col("n2").as("pn2")),
        col("probe_id") === col("vec_id")).drop("vec_id")
      .join(e.select(col("vec_id"), col("v").as("nv"), col("n2").as("nn2")),
        col("n_id") === col("vec_id"))
      .select(col("probe_id"), col("n_id"),
        cosWith("pv", "pn2", "nv", "nn2").as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("n_id"), col("rank"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** IVF-PQ with RESIDUAL encoding — what production IVF-PQ actually
    * quantizes (FAISS `IndexIVFPQ` default, the original Jégou PQ
    * paper's IVFADC): each vector's PQ codes describe (v − centroid of
    * its coarse cell), not v itself. Residuals concentrate near the
    * origin, so a fixed-size codebook spends its 16 ids describing a
    * much smaller ball — typically the single largest recall lever in
    * the composition at the same storage cost (4 codes/vector,
    * unchanged). The codebook is TRAINED on the residual distribution
    * ([[trainResCodebook]] — FAISS trains IVFADC codebooks for the
    * same reason). Everything stays integer-exact: subvectors are int8
    * codes, cell centroids and trained codewords are
    * floor-of-double-div integer means of member codes (kmeansUpdate's
    * arithmetic — IEEE-deterministic in both engines), so residuals,
    * the residual codebook, and every ADC distance are exact
    * integers; ranking ties cannot diverge.
    *
    * The online half changes shape in one way worth noting for scale:
    * the ADC table is per (probe, PROBED CELL) — the probe's residual
    * depends on which cell it is probing — so the broadcast LUT is
    * |probes| × nprobe × M × K rows (640 here) instead of
    * |probes| × M × K (320). Still trivially broadcast at any real
    * probe batch size, and the candidate-side cost is identical:
    * 4 ints read per candidate, partial-aggregated integer sums.
    * Shortlist depth, rerank, and output contract match ann_ivf_pq
    * exactly, so the two rows' recall harnesses are directly
    * comparable (ann_recall_ivfpq_res vs ann_recall_ivfpq measures
    * the residual gain end-to-end). */
  val annIvfPqRes: Q = Q(
    "ann_ivf_pq_res",
    (s, dir) => {
      val e = emb(s, dir)
      // offline: coarse cells (ann_ivf's broadcast argmax assignment)
      val cents = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2")))
      val cellScores = e.crossJoin(cents)
        .select(col("vec_id"), col("c_id"),
          cosWith("v", "n2", "cv", "cn2").as("c_cos"))
      val assigned = cellScores.groupBy("vec_id")
        .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
      // online: nprobe=2 cells per probe
      val probeCells = cellScores.filter(expr(ProbeFilter))
        .withColumn("crn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))))
        .filter(col("crn") <= 2)
        .select(col("vec_id").as("probe_id"), col("c_id").as("cell"))
      residualAdcSearch(s, dir, assigned, probeCells)
    },
    Some(s"""WITH $ivfPqResOracleCtes
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id
            |      ORDER BY cos DESC, n_id) AS rank
            |  FROM rerankedr
            |) WHERE rank <= 5""".stripMargin))

  /** The residual-codebook training CTE rounds, generated to match
    * [[trainResCodebook]] CTE-for-CTE: `rcb0` = the 16 seed vectors'
    * residuals; each round t = argmin assignment (`rasn$t`, ties to
    * the smaller codeword id exactly like the Spark max_by), per-dim
    * BIGINT sums (`rsum$t`), floor-of-double-div means (`rupd$t`),
    * and the left-join-coalesce update (`rcb$t` — empty codewords
    * keep their previous value). The final round is aliased `rcb`,
    * the name the encode/LUT CTEs consume. Expects `resn` in scope. */
  private lazy val resCbTrainCtes: String = {
    val d = duckSqDist _
    val rounds = (1 to ResTrainRounds).map { t =>
      val prev = s"rcb${t - 1}"
      s"""rasn$t AS (
         |  SELECT m, c_id, rv FROM (
         |    SELECT r.vec_id, r.m, r.rv, p.c_id,
         |      row_number() OVER (PARTITION BY r.vec_id, r.m
         |        ORDER BY ${d("rv", "cd", "rn2", "cn2")}, p.c_id) AS rn
         |    FROM resn r JOIN $prev p ON r.m = p.m
         |  ) WHERE rn = 1
         |), rsum$t AS (
         |  SELECT m, c_id, t.x['pos'] AS pos,
         |    CAST(sum(t.x['v']) AS BIGINT) AS sm, count(*) AS n
         |  FROM rasn$t, unnest([{'pos': i, 'v': CAST(rv[i] AS BIGINT)}
         |    FOR i IN range(1, len(rv) + 1)]) AS t(x)
         |  GROUP BY 1, 2, 3
         |), rupd$t AS (
         |  SELECT m, c_id,
         |    list(floor(CAST(sm AS DOUBLE) / n) ORDER BY pos) AS ucd
         |  FROM rsum$t GROUP BY 1, 2
         |), rcb$t AS (
         |  SELECT m, c_id, cd, ${duckDot("cd", "cd")} AS cn2 FROM (
         |    SELECT p.m, p.c_id, coalesce(u.ucd, p.cd) AS cd
         |    FROM $prev p LEFT JOIN rupd$t u
         |      ON p.m = u.m AND p.c_id = u.c_id)
         |)""".stripMargin
    }
    s"""rcb0 AS (
       |  SELECT m, vec_id AS c_id, rv AS cd, rn2 AS cn2
       |  FROM resn WHERE vec_id < 16
       |), ${rounds.mkString(", ")}, rcb AS (
       |  SELECT * FROM rcb$ResTrainRounds
       |)""".stripMargin
  }

  /** The residual IVF-PQ oracle chain through `rerankedr` — the
    * non-residual chain with four insertions: integer cell centroids
    * (kmeansUpdate's floor-of-double-div means), residual subvectors
    * on both the corpus and probe sides, the trained residual
    * codebook ([[resCbTrainCtes]]), and a per-(probe, probed cell)
    * ADC table. Lazy: referenced from val initializers above. */
  private lazy val ivfPqResOracleCtes: String =
    s"""$coarseCellCtes, $pqSubCtes, $residualTailCtes"""

  /** The residual-ADC tail (cell centroids `ccent` -> residuals `resn`
    * -> codebook training -> encode `renc` -> probe residual LUT
    * `plut` -> ADC `adcr` -> shortlist -> exact rerank `rerankedr`) —
    * the oracle twin of [[residualAdcSearch]], shared by the seed-cell
    * (ann_ivf_pq_res) and trained-cell (ann_ivfadc) chains. Expects
    * `e` (raw doubles), `sub` (subspace code vectors), `assigned`
    * (vec_id, cell) and `pc` (probe_id, cell) in scope. */
  private lazy val residualTailCtes: String = {
    val d = duckSqDist _
    s"""suba AS (
       |  SELECT sub.vec_id, sub.m, sub.sv, a.cell
       |  FROM sub JOIN assigned a ON sub.vec_id = a.vec_id
       |), csums AS (
       |  SELECT cell, m, t.x['pos'] AS pos,
       |    CAST(sum(t.x['v']) AS BIGINT) AS sm, count(*) AS n
       |  FROM suba, unnest([{'pos': i, 'v': CAST(sv[i] AS BIGINT)}
       |    FOR i IN range(1, len(sv) + 1)]) AS t(x)
       |  GROUP BY 1, 2, 3
       |), ccent AS (
       |  SELECT cell, m,
       |    list(floor(CAST(sm AS DOUBLE) / n) ORDER BY pos) AS ccd
       |  FROM csums GROUP BY 1, 2
       |), resn AS (
       |  SELECT vec_id, cell, m, rv, ${duckDot("rv", "rv")} AS rn2 FROM (
       |    SELECT s.vec_id, s.cell, s.m,
       |      [s.sv[i] - ct.ccd[i] FOR i IN range(1, len(s.sv) + 1)] AS rv
       |    FROM suba s JOIN ccent ct ON s.cell = ct.cell AND s.m = ct.m)
       |), $resCbTrainCtes, renc AS (
       |  SELECT vec_id, cell, m, c_id AS code FROM (
       |    SELECT r.vec_id, r.cell, r.m, rcb.c_id,
       |      row_number() OVER (PARTITION BY r.vec_id, r.m
       |        ORDER BY ${d("rv", "cd", "rn2", "cn2")}, rcb.c_id) AS rn
       |    FROM resn r JOIN rcb ON r.m = rcb.m
       |  ) WHERE rn = 1
       |), presn AS (
       |  SELECT probe_id, cell, m, prv, ${duckDot("prv", "prv")} AS prn2 FROM (
       |    SELECT pc.probe_id, pc.cell, s.m,
       |      [s.sv[i] - ct.ccd[i] FOR i IN range(1, len(s.sv) + 1)] AS prv
       |    FROM sub s JOIN pc ON s.vec_id = pc.probe_id
       |    JOIN ccent ct ON ct.cell = pc.cell AND ct.m = s.m)
       |), plut AS (
       |  SELECT p.probe_id, p.cell, p.m, rcb.c_id,
       |    ${d("prv", "cd", "prn2", "cn2")} AS dist
       |  FROM presn p JOIN rcb ON p.m = rcb.m
       |), adcr AS (
       |  SELECT plut.probe_id, renc.vec_id AS n_id,
       |    CAST(sum(dist) AS BIGINT) AS adist
       |  FROM renc JOIN plut ON renc.cell = plut.cell AND renc.m = plut.m
       |    AND renc.code = plut.c_id AND renc.vec_id <> plut.probe_id
       |  GROUP BY 1, 2
       |), shortr AS (
       |  SELECT probe_id, n_id FROM (
       |    SELECT probe_id, n_id,
       |      row_number() OVER (PARTITION BY probe_id
       |        ORDER BY adist, n_id) AS rq
       |    FROM adcr
       |  ) WHERE rq <= $AdcShortlist
       |), rerankedr AS (
       |  SELECT s.probe_id, s.n_id, ${duckCosine("ep.v", "en.v")} AS cos
       |  FROM shortr s
       |  JOIN e ep ON s.probe_id = ep.vec_id
       |  JOIN e en ON s.n_id = en.vec_id
       |)""".stripMargin
  }

  /** Recall@5 of residual IVF-PQ vs exact brute force — directly
    * comparable to ann_recall_ivfpq (identical harness, identical
    * nprobe/M/K/shortlist depth); the delta between the two rows IS
    * the measured residual-encoding gain. Like ann_recall_ivfpq, the
    * approx side is materialized before the comparison so the scoring
    * plan consumes search OUTPUT (25 rows) rather than re-embedding
    * the residual chain's exchanges. */
  val annRecallIvfPqRes: Q = Q(
    "ann_recall_ivfpq_res",
    (s, dir) => {
      val exact = annBruteforce.run(s, dir).filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annIvfPqRes.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
        .localCheckpoint()
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(s"""WITH $ivfPqResOracleCtes, approx AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT probe_id, n_id,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY cos DESC, n_id) AS rank
            |    FROM rerankedr
            |  ) WHERE rank <= 5
            |), bf AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT p.vec_id AS probe_id, x.vec_id AS n_id,
            |      row_number() OVER (PARTITION BY p.vec_id
            |        ORDER BY ${duckCosine("p.v", "x.v")} DESC, x.vec_id) AS rank
            |    FROM e x JOIN e p ON x.vec_id <> p.vec_id
            |    WHERE p.$ProbeFilter
            |  ) WHERE rank <= 5
            |)
            |SELECT b.probe_id, count(*) AS k, count(a.n_id) AS hits,
            |  count(a.n_id) * 100 // count(*) AS recall_pct
            |FROM bf b LEFT JOIN approx a
            |  ON b.probe_id = a.probe_id AND b.n_id = a.n_id
            |GROUP BY 1 ORDER BY b.probe_id""".stripMargin))

  /** The OPQ∘residual oracle chain through `rerankedr`: coarse cells,
    * the quantize + permutation census CTEs, the subspace split over
    * the PERMUTED codes (named `sub`, the residual tail's contract),
    * then the residual tail verbatim — centroids, residuals, TRAINED
    * codebook, encode, per-(probe, cell) LUT, ADC, rerank. */
  private lazy val ivfPqOpqResOracleCtes: String =
    s"""$coarseCellCtes, $duckQuantizeCte, $opqCensusCtes,
       |${pqSplitCteFrom("qp")}, $residualTailCtes""".stripMargin

  /** IVF-PQ with BOTH measured levers composed — the OPQ-lite
    * balanced-variance permutation ([[opqSubvectors]]) feeding the
    * TRAINED-residual-codebook pipeline ([[residualAdcSearch]]):
    * residuals are taken in the permuted coordinate order, so the
    * shared codebook trains on variance-balanced residual subspaces.
    * RESIDUAL_GAIN.json prices whether the levers STACK — the ladder
    * measured opq (52→72 at sf1j) and trained-residual (52→64/92)
    * separately; this row is the composed arm on the same harness.
    * Storage and search cost identical to ann_ivf_pq_res (the
    * permutation is free at query time); identical seed cells, nprobe,
    * M/K, shortlist, rerank.
    *
    * MEASURED ANSWER (round 15, artifact regenerated with this arm):
    * they do NOT stack as composed here — sf1j mean recall@5 is 48 vs
    * the 52 baseline (opq alone 72, trained-residual alone 64), and
    * sf0.1 reads 84 vs 92. The census ranks dimensions by RAW-code
    * variance, but subtracting the coarse centroid removes exactly the
    * cell-level component that dominates that ranking, so the permuted
    * dealing is near-arbitrary for the residual distribution and
    * breaks the subspace coherence residual training exploits. The
    * priced next step is a RESIDUAL-variance census (rank dims by the
    * variance of v − centroid, which requires assignment before the
    * permutation); this row stays as the measured "naive composition"
    * arm the ladder needs either way. */
  val annIvfPqOpqRes: Q = Q(
    "ann_ivfpq_opq_res",
    (s, dir) => {
      val e = emb(s, dir)
      val cents = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2")))
      val cellScores = e.crossJoin(cents)
        .select(col("vec_id"), col("c_id"),
          cosWith("v", "n2", "cv", "cn2").as("c_cos"))
      val assigned = cellScores.groupBy("vec_id")
        .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
      val probeCells = cellScores.filter(expr(ProbeFilter))
        .withColumn("crn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))))
        .filter(col("crn") <= 2)
        .select(col("vec_id").as("probe_id"), col("c_id").as("cell"))
      residualAdcSearch(s, dir, assigned, probeCells,
        subvectors = Some(opqSubvectors(s, dir)))
    },
    Some(s"""WITH $ivfPqOpqResOracleCtes
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id
            |      ORDER BY cos DESC, n_id) AS rank
            |  FROM rerankedr
            |) WHERE rank <= 5""".stripMargin))

  /** Recall@5 of the composed OPQ∘residual IVF-PQ vs exact brute
    * force — the fifth point on the measured training ladder, same
    * harness and depths as every other recall row, so the deltas
    * against ann_recall_ivfpq_opq and ann_recall_ivfpq_res read
    * directly as "do the levers stack". */
  val annRecallIvfPqOpqRes: Q = Q(
    "ann_recall_ivfpq_opq_res",
    (s, dir) => {
      val exact = annBruteforce.run(s, dir).filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annIvfPqOpqRes.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
        .localCheckpoint()
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(s"""WITH $ivfPqOpqResOracleCtes, approx AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT probe_id, n_id,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY cos DESC, n_id) AS rank
            |    FROM rerankedr
            |  ) WHERE rank <= 5
            |), bf AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT p.vec_id AS probe_id, x.vec_id AS n_id,
            |      row_number() OVER (PARTITION BY p.vec_id
            |        ORDER BY ${duckCosine("p.v", "x.v")} DESC, x.vec_id) AS rank
            |    FROM e x JOIN e p ON x.vec_id <> p.vec_id
            |    WHERE p.$ProbeFilter
            |  ) WHERE rank <= 5
            |)
            |SELECT b.probe_id, count(*) AS k, count(a.n_id) AS hits,
            |  count(a.n_id) * 100 // count(*) AS recall_pct
            |FROM bf b LEFT JOIN approx a
            |  ON b.probe_id = a.probe_id AND b.n_id = a.n_id
            |GROUP BY 1 ORDER BY b.probe_id""".stripMargin))

  /** position → original dim under the RESIDUAL-variance census: the
    * permutation [[opqSubvectors]] computes from RAW-code variance,
    * recomputed over r = code − floor-mean(assigned cell) instead —
    * round 15's measured answer on the naive composition
    * (ann_ivfpq_opq_res: 48 vs 52 baseline at sf1j) named the
    * mechanism: subtracting the coarse centroid removes exactly the
    * cell-level component that dominates the raw ranking, so the raw
    * census's dealing is near-arbitrary FOR THE RESIDUAL
    * distribution. This census ranks dimensions by what the residual
    * codebook actually has to describe. Assignment must come first
    * (the census depends on cells), so the build order is
    * assign → census → permute → split → residual tail. Exactness:
    * per-(cell, dim) centroids are the kmeansUpdate floor-of-double-
    * div integer means; residuals are exact integers; the variance
    * numerator N·Σr² − (Σr)² is computed in decimal(38,0) (Spark) /
    * HUGEINT (DuckDB) so the RANKING cannot diverge by overflow at
    * any bench SF. 64-row census = index-build metadata, the
    * opqPermutation stance. */
  private[graft] def opqResidualPermutation(s: SparkSession, dir: String,
      assigned: DataFrame): Seq[Int] = {
    val rexp = kmeansCodes(s, dir).join(assigned, "vec_id")
      .select(col("cell"), posexplode(expr(
        "transform(qd, x -> CAST(x AS BIGINT))")))
      .select(col("cell"), col("pos").as("d"), col("col").as("x"))
    val cent = rexp.groupBy("cell", "d")
      .agg(sum("x").as("sm"), count(lit(1)).as("n"))
      .withColumn("cm", floor(col("sm").cast("double") / col("n")).cast("long"))
      .select(col("cell"), col("d"), col("cm"))
    val stats = rexp.join(cent, Seq("cell", "d"))
      .withColumn("r", col("x") - col("cm"))
      .groupBy("d")
      .agg((count(lit(1)).cast("decimal(38,0)") *
            sum(expr("r * r")).cast("decimal(38,0)") -
            sum(col("r")).cast("decimal(38,0)") *
            sum(col("r")).cast("decimal(38,0)")).as("varn"))
      .collect().map(r => (r.getInt(0), r.getDecimal(1)))
    val dims = PqM * PqSubDim
    require(stats.length == dims, s"census must cover $dims dims, got ${stats.length}")
    val ordered = stats.sortWith { (a, b) =>
      val c = a._2.compareTo(b._2)
      if (c != 0) c > 0 else a._1 < b._1 // varn DESC, d ASC
    }.map(_._1)
    val perm = new Array[Int](dims)
    ordered.zipWithIndex.foreach { case (d, r) =>
      perm((r % PqM) * PqSubDim + r / PqM) = d }
    perm.toSeq
  }

  /** The residual-variance-census oracle chain through `rerankedr`:
    * coarse cells, quantize, the per-cell floor-mean residual census
    * (exact integers; HUGEINT variance numerator mirrors the Spark
    * decimal(38,0)), the round-robin dealing, the split over the
    * rv-permuted codes (named `sub`, the residual tail's contract),
    * then [[residualTailCtes]] verbatim. */
  private lazy val ivfPqRvOpqResOracleCtes: String =
    s"""$coarseCellCtes, $duckQuantizeCte, rexp AS (
       |  SELECT cell, t.x['pos'] AS pos, CAST(t.x['v'] AS BIGINT) AS x
       |  FROM (SELECT a.cell, q.qd FROM q JOIN assigned a ON q.vec_id = a.vec_id) j,
       |    unnest([{'pos': i, 'v': qd[i]} FOR i IN range(1, len(qd) + 1)]) AS t(x)
       |), rcent AS (
       |  SELECT cell, pos,
       |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS cm
       |  FROM rexp GROUP BY 1, 2
       |), rvstats AS (
       |  SELECT pos - 1 AS d, count(*) * sum(r * r) - sum(r) * sum(r) AS varn
       |  FROM (SELECT rexp.pos, rexp.x - rc.cm AS r
       |        FROM rexp JOIN rcent rc
       |          ON rexp.cell = rc.cell AND rexp.pos = rc.pos)
       |  GROUP BY 1
       |), permrv AS (
       |  SELECT ((r % $PqM) * $PqSubDim + r // $PqM) AS pos, d FROM (
       |    SELECT d, row_number() OVER (ORDER BY varn DESC, d) - 1 AS r
       |    FROM rvstats)
       |), qprv AS (
       |  SELECT vec_id, list(x ORDER BY pos) AS qd FROM (
       |    SELECT q.vec_id, p.pos, q.qd[p.d + 1] AS x FROM q, permrv p
       |  ) GROUP BY 1
       |), ${pqSplitCteFrom("qprv")}, $residualTailCtes""".stripMargin

  /** IVF-PQ with the RESIDUAL-variance-census permutation feeding the
    * trained residual codebook — round 15's priced next step, built:
    * the naive OPQ∘residual composition measured a LOSS (48 vs 52 at
    * sf1j) because the raw-code census ranks by cell-level energy the
    * residual subtraction then removes; this arm computes the census
    * on the residuals themselves (assignment before permutation), so
    * the round-robin dealing balances what the shared residual
    * codebook actually quantizes. Storage and search cost identical
    * to ann_ivf_pq_res / ann_ivfpq_opq_res (a permutation is free at
    * query time); identical seed cells, nprobe, M/K, shortlist,
    * rerank — the recall delta against those two rows reads directly
    * off the ladder (RESIDUAL_GAIN.json carries this as its sixth
    * arm).
    *
    * MEASURED ANSWER (round 16, six-arm artifact): the residual-aware
    * census recovers PART of the naive composition's loss at sf1j —
    * 56 vs the naive 48, back above the 52 baseline — confirming the
    * round-15 mechanism diagnosis (the raw census does misrank
    * residual energy), but the levers STILL do not stack: both single
    * levers stay ahead (opq 72, res 64). And at sf0.1 (N=2000, ~125
    * codes per cell) it reads 68 vs base 92: per-cell floor-means are
    * noisy at small occupancy, so the census ranks noise. Conclusion
    * recorded for the ladder: any variance-census permutation breaks
    * the subspace COHERENCE (adjacent correlated dims quantized
    * together) that residual training exploits — the next real step
    * up is a learned rotation (full OPQ SVD), which would not
    * oracle-verify bit-exactly and is out of scope by design. */
  val annIvfPqRvOpqRes: Q = Q(
    "ann_ivfpq_rvopq_res",
    (s, dir) => {
      val e = emb(s, dir)
      val cents = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2")))
      val cellScores = e.crossJoin(cents)
        .select(col("vec_id"), col("c_id"),
          cosWith("v", "n2", "cv", "cn2").as("c_cos"))
      val assigned = cellScores.groupBy("vec_id")
        .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
      val probeCells = cellScores.filter(expr(ProbeFilter))
        .withColumn("crn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))))
        .filter(col("crn") <= 2)
        .select(col("vec_id").as("probe_id"), col("c_id").as("cell"))
      val perm = opqResidualPermutation(s, dir, assigned)
      val permSub = subvectorsOf(kmeansCodes(s, dir).withColumn("qd", expr(
        s"transform(array(${perm.mkString(", ")}), i -> element_at(qd, i + 1))")))
      residualAdcSearch(s, dir, assigned, probeCells,
        subvectors = Some(permSub))
    },
    Some(s"""WITH $ivfPqRvOpqResOracleCtes
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id
            |      ORDER BY cos DESC, n_id) AS rank
            |  FROM rerankedr
            |) WHERE rank <= 5""".stripMargin))

  /** Recall@5 of the residual-variance-census composition vs exact
    * brute force — the sixth point on the measured training ladder,
    * same harness and depths as every other recall row; the question
    * it answers is whether a residual-aware census makes the
    * permutation and the trained codebook finally stack
    * (beats max(opq, res)?). */
  val annRecallIvfPqRvOpqRes: Q = Q(
    "ann_recall_ivfpq_rvopq_res",
    (s, dir) => {
      val exact = annBruteforce.run(s, dir).filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annIvfPqRvOpqRes.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
        .localCheckpoint()
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(s"""WITH $ivfPqRvOpqResOracleCtes, approx AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT probe_id, n_id,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY cos DESC, n_id) AS rank
            |    FROM rerankedr
            |  ) WHERE rank <= 5
            |), bf AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT p.vec_id AS probe_id, x.vec_id AS n_id,
            |      row_number() OVER (PARTITION BY p.vec_id
            |        ORDER BY ${duckCosine("p.v", "x.v")} DESC, x.vec_id) AS rank
            |    FROM e x JOIN e p ON x.vec_id <> p.vec_id
            |    WHERE p.$ProbeFilter
            |  ) WHERE rank <= 5
            |)
            |SELECT b.probe_id, count(*) AS k, count(a.n_id) AS hits,
            |  count(a.n_id) * 100 // count(*) AS recall_pct
            |FROM bf b LEFT JOIN approx a
            |  ON b.probe_id = a.probe_id AND b.n_id = a.n_id
            |GROUP BY 1 ORDER BY b.probe_id""".stripMargin))

  /** The trained-cell CTE block for the IVFADC oracle: reuses
    * [[kmeansOracleCtes]] verbatim for the one-Lloyd-stage coarse
    * quantizer (codes -> seed centroids -> assign -> integer-mean
    * update -> reassignment `a1`) at the corpus-scaled k (`pk` —
    * [[ivfK]] over the counted corpus, the dedup_semantic scalar-
    * subquery construction with the √N cap), then renames a1 to the residual-tail
    * contract (`assigned`) and ranks each probe's nprobe trained cells
    * (`pc` — the same cosine the assignment used, over the UPDATED
    * centroids c1n; nprobe = max(2, k/8), co-scaled with k). */
  private lazy val ivfAdcCoarseCtes: String =
    s"""pk AS (
       |  SELECT ${duckIvfK("count(*)")} AS kk FROM embeddings
       |), ${kmeansOracleCtes("SELECT kk FROM pk")}, assigned AS (
       |  SELECT vec_id, cid AS cell FROM a1
       |), pc AS (
       |  SELECT vec_id AS probe_id, c_id AS cell FROM (
       |    SELECT qn.vec_id, c_id,
       |      row_number() OVER (PARTITION BY qn.vec_id
       |        ORDER BY ${duckDot("qd", "cd")} / sqrt(qn2 * cn2) DESC, c_id) AS crn
       |    FROM qn CROSS JOIN c1n WHERE qn.$ProbeFilter
       |  ) WHERE crn <= (SELECT greatest(2, kk // 8) FROM pk)
       |)""".stripMargin

  /** Full trained IVFADC — the composition FAISS ships as
    * `IndexIVFPQ` with a trained coarse quantizer: BOTH halves of the
    * index are now learned from the corpus. The coarse quantizer is
    * the one-Lloyd-stage k-means the registry already verifies on its
    * own (cluster_kmeans's codes-domain assignment — seed centroids,
    * assign, integer-mean update, REassign to the updated centroids),
    * replacing ann_ivf_pq_res's raw seed-vector cells; the PQ half is
    * the trained residual codebook ([[trainResCodebook]]). Everything
    * downstream of the coarse half is [[residualAdcSearch]], shared
    * verbatim with ann_ivf_pq_res, so the recall delta between the
    * two rows isolates exactly what TRAINING THE COARSE QUANTIZER
    * buys (fewer cell misses at the same nprobe — the dominant loss
    * term once the codebook is trained).
    *
    * Scale shape: cell count is corpus-scaled — k = [[ivfK]](N):
    * ~128-member occupancy below the 2^18 crossover, FAISS's
    * nlist ≈ 4·√N above it (so the unavoidable N×k assign pass stays
    * N^1.5 instead of quadratic) — and nprobe co-scales as
    * max(2, k/8), so the probed fraction of the index stays fixed
    * (the verify/bench SFs floor at the historical k=16 /
    * nprobe=2). Training is one assign + one update over the corpus
    * (broadcast centroids, partial-agg argmax, k x dims integer update
    * state), done ONCE offline; the online search is identical to
    * ann_ivf_pq_res. Arithmetic is the k-means rows' int8-code cosine
    * (exact integer dots, IEEE double division) for the coarse half
    * and the residual chain's exact integers for the rest —
    * oracle-hash-deterministic end to end. */
  /** The full trained-IVFADC chain, with the two ONLINE depth knobs a
    * deployment tunes exposed for the recall/cost-curve harness
    * (graft.tools.RecallCurve): nprobe (probed trained cells per
    * probe; default the registry's corpus-co-scaled max(2, k/8)) and
    * qcand (ADC shortlist depth before exact rerank; default
    * [[AdcShortlist]] = 80, adopted from the round-11 recall-cost
    * curve — see AdcShortlist's doc).
    * Neither override touches the OFFLINE index — same trained cells,
    * same codes — which is the point of the curve: one index, many
    * operating points. The registry row runs the defaults. */
  private[graft] def ivfAdcChain(s: SparkSession, dir: String,
      nprobeOverride: Option[Int] = None,
      qcand: Int = AdcShortlist): DataFrame = {
    // offline: trained coarse quantizer (one Lloyd stage). Cell
    // count scales with the corpus — k = ivfK(N): ~128-member
    // occupancy in the small regime, 4·√N past the crossover. A
    // fixed k would make every cell N/16 vectors and each query a
    // near-full scan at 100 TB. nprobe scales with k (probed
    // fraction ~nprobe/k stays ~1/8 of the index's cells' worth of
    // recall opportunity, FAISS's usual co-scaling) — both formulas
    // exactly mirrored in the oracle's pk CTE; at the verify/bench
    // SFs (N <= 2048) they floor at the historical k=16 / nprobe=2.
    // ivfK (not kmeansK): k ∝ N would make the N×k assign pass
    // quadratic — the sf3 run measured it (291 s at 60k vectors) —
    // so past N = 2^18 the cell count follows FAISS's nlist ≈ 4·√N.
    val k = ivfK(Tables(s, dir).embeddingsCount)
    val nprobe = nprobeOverride.getOrElse(math.max(2, k / 8))
    val (codes, _, c1) = kmeansStage(s, dir, k)
    val cents = broadcast(c1.select(col("c_id"), col("cd"), col("cn2")))
    val cellScores = codes.crossJoin(cents)
      .select(col("vec_id"), col("c_id"),
        expr(s"${dot("qd", "cd")} / sqrt(qn2 * cn2)").as("c_cos"))
    val assigned = cellScores.groupBy("vec_id")
      .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
    // online: nprobe trained cells per probe
    val probeCells = cellScores.filter(expr(ProbeFilter))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))))
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("probe_id"), col("c_id").as("cell"))
    residualAdcSearch(s, dir, assigned, probeCells, qcand)
  }

  val annIvfAdc: Q = Q(
    "ann_ivfadc",
    (s, dir) => ivfAdcChain(s, dir),
    Some(s"""WITH $ivfAdcCoarseCtes, $pqSplitCte, $residualTailCtes
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id
            |      ORDER BY cos DESC, n_id) AS rank
            |  FROM rerankedr
            |) WHERE rank <= 5""".stripMargin))

  /** Recall@5 of trained IVFADC vs exact brute force — the third
    * point on the measured ladder (ann_recall_ivfpq: seed cells + raw
    * codebook; ann_recall_ivfpq_res: seed cells + trained residual
    * codebook; this row: trained cells + trained residual codebook).
    * Same harness, same materialized-approx construction. */
  val annRecallIvfAdc: Q = Q(
    "ann_recall_ivfadc",
    (s, dir) => {
      val exact = annBruteforce.run(s, dir).filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annIvfAdc.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
        .localCheckpoint()
      exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
        .withColumn("recall_pct", expr("hits * 100 div k"))
        .orderBy("probe_id")
    },
    Some(s"""WITH $ivfAdcCoarseCtes, $pqSplitCte, $residualTailCtes, approx AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT probe_id, n_id,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY cos DESC, n_id) AS rank
            |    FROM rerankedr
            |  ) WHERE rank <= 5
            |), bf AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT p.vec_id AS probe_id, x.vec_id AS n_id,
            |      row_number() OVER (PARTITION BY p.vec_id
            |        ORDER BY ${duckCosine("p.v", "x.v")} DESC, x.vec_id) AS rank
            |    FROM e x JOIN e p ON x.vec_id <> p.vec_id
            |    WHERE p.$ProbeFilter
            |  ) WHERE rank <= 5
            |)
            |SELECT b.probe_id, count(*) AS k, count(a.n_id) AS hits,
            |  count(a.n_id) * 100 // count(*) AS recall_pct
            |FROM bf b LEFT JOIN approx a
            |  ON b.probe_id = a.probe_id AND b.n_id = a.n_id
            |GROUP BY 1 ORDER BY b.probe_id""".stripMargin))

  /** Johnson–Lindenstrauss random projection (Achlioptas ±1 variant):
    * 64-dim embeddings down to 16 dims through a DETERMINISTIC sign
    * matrix — sign(j,k) from an LCG on the flattened index, so the
    * "random" matrix needs no stored state, no broadcast, and is
    * identical in both engines. Input is the int8 code vector (the
    * same quantization vec_quantize pins), so every projected
    * coordinate is an exact BIGINT sum (|y_k| ≤ 64·127) — no float
    * accumulation order to disagree on.
    *
    * Scale shape: map-only — a pure per-row fold that fuses into the
    * parquet scan with ZERO shuffles at any corpus size; the array
    * cells are surfaced as a scalar digest + L1/first-coordinate
    * scalars (the driver comparator cannot hash array cells). This is
    * the standard cheap front-end before pair-heavy stages: a 4×
    * narrower vector makes every downstream distance pass (LSH
    * bucketing, candidate verify) proportionally cheaper while JL
    * preserves pairwise geometry to O(1/√16) distortion. */
  /** The interpreted-HOF formulation of the projection fold over a
    * BIGINT `codes` column — NativeVsSqlSpec pins graft_jl_project
    * bit-identical to it; the hot path runs the native loop (the HOF
    * form walks an expression tree per (j, k) cell — ~1024 interpreted
    * evals per row, measured 13.5 s over 2k vectors). */
  private[graft] val jlProjectSql: String = {
    // y_k = Σ_j codes[j] · sign(j·16+k); sign(i) = high bit of TWO
    // chained LCG rounds mod 2^31 (x2 = a·((a·i+c) mod m)+c mod m,
    // sign = 1 − 2·(x2 div 2^30)). The low bit of a power-of-two-
    // modulus LCG is parity(i) = parity(k), which collapses the sign
    // matrix to rank 1, and one round's high bit is still affine
    // enough to leave rank 9/16; two rounds measure full-rank
    // (see JlProject16).
    val sign =
      "(1 - 2 * (((CAST(1103515245 AS BIGINT) * ((CAST(1103515245 AS BIGINT) * (j * 16 + k) + 12345) % 2147483648) + 12345) % 2147483648) div 1073741824))"
    "transform(sequence(0, 15), k -> aggregate(sequence(0, 63), " +
      s"CAST(0 AS BIGINT), (acc, j) -> acc + codes[j] * $sign))"
  }

  val vecProject: Q = {
    // DuckDB mirror of JlProject16's two-round high-bit LCG sign
    // (// = int div)
    val sign =
      "(1 - 2 * (((CAST(1103515245 AS BIGINT) * ((CAST(1103515245 AS BIGINT) * (j * 16 + k) + 12345) % 2147483648) + 12345) % 2147483648) // 1073741824))"
    Q(
      "vec_project",
      // CAST(array<float> AS array<double>) instead of the HOF
      // transform: elementwise-identical, but Cast supports codegen
      // while a lambda transform is CodegenFallback — with it the
      // whole quantize→project Project fuses into the scan's
      // WholeStageCodegen span (pinned in PlanAuditSpec)
      (s, dir) => Tables(s, dir).embeddings
        .withColumn("y", expr(
          "graft_jl_project(graft_int8_codes(CAST(embedding AS ARRAY<DOUBLE>)).codes)"))
        .select(col("vec_id"),
          expr(sigDigest("transform(y, v -> v + 8192)")).as("proj_digest"),
          expr("aggregate(y, CAST(0 AS BIGINT), (acc, v) -> acc + abs(v))")
            .as("proj_l1"),
          expr("y[0]").as("proj_first"))
        .orderBy("vec_id"),
      Some(s"""WITH e AS (
              |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              |), m AS (
              |  SELECT vec_id, v,
              |    list_reduce(list_prepend(CAST(1e-12 AS DOUBLE),
              |      list_transform(v, x -> abs(x))), (a, x) -> greatest(a, x)) AS maxabs
              |  FROM e
              |), q AS (
              |  SELECT vec_id,
              |    list_transform(v, x -> CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT)) AS codes
              |  FROM m
              |), p AS (
              |  SELECT vec_id,
              |    list_transform(range(0, 16), k ->
              |      list_reduce(list_prepend(CAST(0 AS BIGINT),
              |        list_transform(range(0, 64), j -> codes[j + 1] * $sign)),
              |        (acc, t) -> acc + t)) AS y
              |  FROM q)
              |SELECT vec_id,
              |  ${duckSigDigest("list_transform(y, v -> v + 8192)")} AS proj_digest,
              |  list_reduce(list_prepend(CAST(0 AS BIGINT),
              |    list_transform(y, v -> abs(v))), (acc, v) -> acc + v) AS proj_l1,
              |  y[1] AS proj_first
              |FROM p ORDER BY vec_id""".stripMargin))
  }

  /** FILTERED vector search — the production shape every vector store
    * serves ("nearest neighbors WHERE metadata predicate"): each probe
    * searches its own IVF cell restricted to candidates sharing the
    * probe's `label`. The predicate is applied to the index slice
    * BEFORE any rerank join, so at 100 TB an index laid out as
    * parquet partitioned by cell gets partition pruning on the cell
    * AND row-group predicate pushdown on the label column — the
    * filter never rides through the distance computation. This is
    * pre-filtering (candidate set = cell ∩ predicate), the variant
    * that keeps cost cell-bounded; post-filtering (search first,
    * filter the top-k after) returns < k rows whenever the cell's
    * top-k is predicate-poor, which ann_recall_filtered quantifies.
    * Plan: same one-exchange argmax assign as [[annIvf]], candidates
    * label-filtered map-side under the broadcast probe join, exact
    * rerank only on survivors. */
  val annFiltered: Q = Q(
    "ann_filtered",
    (s, dir) => {
      val e = emb(s, dir)
      val cents = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2")))
      val assigned = e.crossJoin(cents)
        .select(col("vec_id"), col("label"), col("c_id"),
          cosWith("v", "n2", "cv", "cn2").as("c_cos"))
        .groupBy("vec_id", "label")
        .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
      val probes = assigned.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("label").as("p_label"),
          col("cell"))
      // the metadata predicate lands HERE — on the index slice, before
      // the rerank joins ever see a candidate
      val cand = assigned.join(broadcast(probes), "cell")
        .filter(col("vec_id") =!= col("probe_id") &&
          col("label") === col("p_label"))
        .select(col("probe_id"), col("vec_id").as("n_id"))
      val scored = cand
        .join(e.select(col("vec_id"), col("v").as("pv"), col("n2").as("pn2")),
          col("probe_id") === col("vec_id"))
        .drop("vec_id")
        .join(e.select(col("vec_id"), col("v").as("nv"), col("n2").as("nn2")),
          col("n_id") === col("vec_id"))
        .select(col("probe_id"), col("n_id"),
          cosWith("pv", "pn2", "nv", "nn2").as("cos"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"), col("rank"),
          round(col("cos"), 6).as("cos_sim"))
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
            |), c AS (
            |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
            |), assigned AS (
            |  SELECT vec_id, label, c_id AS cell FROM (
            |    SELECT e.vec_id, e.label, c_id,
            |      row_number() OVER (PARTITION BY e.vec_id
            |        ORDER BY ${duckCosine("e.v", "cv")} DESC, c_id) AS rn
            |    FROM e CROSS JOIN c
            |  ) WHERE rn = 1
            |), p AS (
            |  SELECT vec_id AS probe_id, label AS p_label, cell
            |  FROM assigned WHERE $ProbeFilter
            |), cand AS (
            |  SELECT p.probe_id, a.vec_id AS n_id
            |  FROM assigned a JOIN p ON a.cell = p.cell
            |    AND a.vec_id <> p.probe_id AND a.label = p.p_label
            |), scored AS (
            |  SELECT cand.probe_id, cand.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM cand
            |  JOIN e ep ON cand.probe_id = ep.vec_id
            |  JOIN e en ON cand.n_id = en.vec_id
            |), ranked AS (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM scored
            |)
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM ranked WHERE rank <= 5""".stripMargin))

  /** Recall@5 of filtered IVF search vs filtered EXACT ground truth
    * (brute-force top-5 among all same-label vectors, cells ignored).
    * Filtered search loses recall two ways at once — the cell boundary
    * (as ann_recall_ivf) plus predicate starvation (a cell may hold
    * few same-label candidates; k_found < 5 shows as a smaller k on
    * the exact side only, so hits/k exposes it) — and this row
    * measures the compound effect. Production systems size nprobe UP
    * under selective filters for exactly this reason. */
  val annRecallFiltered: Q = Q(
    "ann_recall_filtered",
    (s, dir) => {
      val e = emb(s, dir)
      val probes = broadcast(e.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("label").as("p_label"),
          col("v").as("pv"), col("n2").as("pn2")))
      val exact = e.join(probes,
          col("vec_id") =!= col("probe_id") && col("label") === col("p_label"))
        .select(col("probe_id"), col("vec_id").as("n_id"),
          cosWith("pv", "pn2", "v", "n2").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annFiltered.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
      val per = exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
      // LEFT join from the PROBE set: a probe whose label has zero
      // same-label neighbors must appear with k=0 — a starved probe
      // silently vanishing from the starvation metric would defeat
      // the row (its recall is vacuously 100: nothing to find)
      e.filter(expr(ProbeFilter)).select(col("vec_id").as("probe_id"))
        .join(per, Seq("probe_id"), "left")
        .select(col("probe_id"),
          coalesce(col("k"), lit(0L)).as("k"),
          coalesce(col("hits"), lit(0L)).as("hits"))
        .withColumn("recall_pct",
          when(col("k") === 0, lit(100L)).otherwise(expr("hits * 100 div k")))
        .orderBy("probe_id")
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
            |), p AS (
            |  SELECT vec_id AS probe_id, label AS p_label, v AS pv
            |  FROM e WHERE $ProbeFilter
            |), bf_scored AS (
            |  SELECT probe_id, e.vec_id AS n_id, ${duckCosine("pv", "e.v")} AS cos
            |  FROM e JOIN p ON e.vec_id <> p.probe_id AND e.label = p.p_label
            |), bf_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM bf_scored
            |), exact AS (
            |  SELECT probe_id, n_id FROM bf_ranked WHERE rank <= 5
            |), c AS (
            |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
            |), assigned AS (
            |  SELECT vec_id, label, c_id AS cell FROM (
            |    SELECT e.vec_id, e.label, c_id,
            |      row_number() OVER (PARTITION BY e.vec_id
            |        ORDER BY ${duckCosine("e.v", "cv")} DESC, c_id) AS rn
            |    FROM e CROSS JOIN c
            |  ) WHERE rn = 1
            |), ip AS (
            |  SELECT vec_id AS probe_id, label AS p_label, cell
            |  FROM assigned WHERE $ProbeFilter
            |), cand AS (
            |  SELECT ip.probe_id, a.vec_id AS n_id
            |  FROM assigned a JOIN ip ON a.cell = ip.cell
            |    AND a.vec_id <> ip.probe_id AND a.label = ip.p_label
            |), f_scored AS (
            |  SELECT cand.probe_id, cand.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM cand
            |  JOIN e ep ON cand.probe_id = ep.vec_id
            |  JOIN e en ON cand.n_id = en.vec_id
            |), f_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM f_scored
            |), approx AS (
            |  SELECT probe_id, n_id FROM f_ranked WHERE rank <= 5
            |), per AS (
            |  SELECT x.probe_id, count(*) AS k, count(a.n_id) AS hits
            |  FROM exact x LEFT JOIN approx a
            |    ON x.probe_id = a.probe_id AND x.n_id = a.n_id
            |  GROUP BY 1
            |)
            |SELECT p.probe_id, coalesce(per.k, 0) AS k,
            |  coalesce(per.hits, 0) AS hits,
            |  CASE WHEN coalesce(per.k, 0) = 0 THEN 100
            |       ELSE per.hits * 100 // per.k END AS recall_pct
            |FROM p LEFT JOIN per ON p.probe_id = per.probe_id
            |ORDER BY p.probe_id""".stripMargin))

  /** [[annFiltered]] with nprobe=2 — the lever a production store
    * pulls under SELECTIVE predicates: ann_recall_filtered measures
    * predicate starvation (a probe's single cell may hold fewer than
    * k same-label candidates), and probing the probe's TWO nearest
    * cells refills the candidate pool the predicate drained. Shape is
    * ann_ivf_nprobe's: base vectors keep their single argmax cell, so
    * the two probed cells' candidate sets are disjoint (no dedup);
    * the label predicate still lands on the index slice BELOW the
    * rerank joins and Window (plan-pinned) — candidate cost is
    * ~2x ann_filtered, cell-bounded, never O(n). */
  val annFilteredNprobe: Q = Q(
    "ann_filtered_nprobe",
    (s, dir) => {
      val e = emb(s, dir)
      val cents = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2")))
      val cellScores = e.crossJoin(cents)
        .select(col("vec_id"), col("label"), col("c_id"),
          cosWith("v", "n2", "cv", "cn2").as("c_cos"))
      val assigned = cellScores.groupBy("vec_id", "label")
        .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
      // per-probe top-2 cells: a window over only |probes| x 16 rows
      val probeCells = cellScores.filter(expr(ProbeFilter))
        .withColumn("crn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))))
        .filter(col("crn") <= 2)
        .select(col("vec_id").as("probe_id"), col("label").as("p_label"),
          col("c_id").as("cell"))
      val cand = assigned.join(broadcast(probeCells), "cell")
        .filter(col("vec_id") =!= col("probe_id") &&
          col("label") === col("p_label"))
        .select(col("probe_id"), col("vec_id").as("n_id"))
      val scored = cand
        .join(e.select(col("vec_id"), col("v").as("pv"), col("n2").as("pn2")),
          col("probe_id") === col("vec_id"))
        .drop("vec_id")
        .join(e.select(col("vec_id"), col("v").as("nv"), col("n2").as("nn2")),
          col("n_id") === col("vec_id"))
        .select(col("probe_id"), col("n_id"),
          cosWith("pv", "pn2", "nv", "nn2").as("cos"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"), col("rank"),
          round(col("cos"), 6).as("cos_sim"))
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
            |), c AS (
            |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
            |), cs AS (
            |  SELECT e.vec_id, e.label, c_id, ${duckCosine("e.v", "cv")} AS c_cos
            |  FROM e CROSS JOIN c
            |), assigned AS (
            |  SELECT vec_id, label, c_id AS cell FROM (
            |    SELECT vec_id, label, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS rn
            |    FROM cs
            |  ) WHERE rn = 1
            |), pc AS (
            |  SELECT vec_id AS probe_id, label AS p_label, c_id AS cell FROM (
            |    SELECT vec_id, label, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS crn
            |    FROM cs WHERE $ProbeFilter
            |  ) WHERE crn <= 2
            |), cand AS (
            |  SELECT pc.probe_id, a.vec_id AS n_id
            |  FROM assigned a JOIN pc ON a.cell = pc.cell
            |    AND a.vec_id <> pc.probe_id AND a.label = pc.p_label
            |), scored AS (
            |  SELECT cand.probe_id, cand.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM cand
            |  JOIN e ep ON cand.probe_id = ep.vec_id
            |  JOIN e en ON cand.n_id = en.vec_id
            |), ranked AS (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM scored
            |)
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM ranked WHERE rank <= 5""".stripMargin))

  /** Recall@5 of nprobe=2 filtered search vs the same filtered-exact
    * ground truth as [[annRecallFiltered]] — the same harness, so the
    * two recall rows are directly comparable and price exactly what
    * the second probe buys back from predicate starvation. Starved
    * probes (zero same-label neighbors anywhere) appear with k=0. */
  val annRecallFilteredNprobe: Q = Q(
    "ann_recall_filtered_nprobe",
    (s, dir) => {
      val e = emb(s, dir)
      val probes = broadcast(e.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("label").as("p_label"),
          col("v").as("pv"), col("n2").as("pn2")))
      val exact = e.join(probes,
          col("vec_id") =!= col("probe_id") && col("label") === col("p_label"))
        .select(col("probe_id"), col("vec_id").as("n_id"),
          cosWith("pv", "pn2", "v", "n2").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annFilteredNprobe.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
      val per = exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
      e.filter(expr(ProbeFilter)).select(col("vec_id").as("probe_id"))
        .join(per, Seq("probe_id"), "left")
        .select(col("probe_id"),
          coalesce(col("k"), lit(0L)).as("k"),
          coalesce(col("hits"), lit(0L)).as("hits"))
        .withColumn("recall_pct",
          when(col("k") === 0, lit(100L)).otherwise(expr("hits * 100 div k")))
        .orderBy("probe_id")
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
            |), p AS (
            |  SELECT vec_id AS probe_id, label AS p_label, v AS pv
            |  FROM e WHERE $ProbeFilter
            |), bf_scored AS (
            |  SELECT probe_id, e.vec_id AS n_id, ${duckCosine("pv", "e.v")} AS cos
            |  FROM e JOIN p ON e.vec_id <> p.probe_id AND e.label = p.p_label
            |), bf_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM bf_scored
            |), exact AS (
            |  SELECT probe_id, n_id FROM bf_ranked WHERE rank <= 5
            |), c AS (
            |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
            |), cs AS (
            |  SELECT e.vec_id, e.label, c_id, ${duckCosine("e.v", "cv")} AS c_cos
            |  FROM e CROSS JOIN c
            |), assigned AS (
            |  SELECT vec_id, label, c_id AS cell FROM (
            |    SELECT vec_id, label, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS rn
            |    FROM cs
            |  ) WHERE rn = 1
            |), pc AS (
            |  SELECT vec_id AS probe_id, label AS p_label, c_id AS cell FROM (
            |    SELECT vec_id, label, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS crn
            |    FROM cs WHERE $ProbeFilter
            |  ) WHERE crn <= 2
            |), cand AS (
            |  SELECT pc.probe_id, a.vec_id AS n_id
            |  FROM assigned a JOIN pc ON a.cell = pc.cell
            |    AND a.vec_id <> pc.probe_id AND a.label = pc.p_label
            |), f_scored AS (
            |  SELECT cand.probe_id, cand.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM cand
            |  JOIN e ep ON cand.probe_id = ep.vec_id
            |  JOIN e en ON cand.n_id = en.vec_id
            |), f_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM f_scored
            |), approx AS (
            |  SELECT probe_id, n_id FROM f_ranked WHERE rank <= 5
            |), per AS (
            |  SELECT x.probe_id, count(*) AS k, count(a.n_id) AS hits
            |  FROM exact x LEFT JOIN approx a
            |    ON x.probe_id = a.probe_id AND x.n_id = a.n_id
            |  GROUP BY 1
            |)
            |SELECT p.probe_id, coalesce(per.k, 0) AS k,
            |  coalesce(per.hits, 0) AS hits,
            |  CASE WHEN coalesce(per.k, 0) = 0 THEN 100
            |       ELSE per.hits * 100 // per.k END AS recall_pct
            |FROM p LEFT JOIN per ON p.probe_id = per.probe_id
            |ORDER BY p.probe_id""".stripMargin))

  /** Filtered search over the COMPRESSED index — ann_filtered_nprobe's
    * metadata pre-filter composed with ann_ivf_pq's coded index: the
    * query shape a production vector store actually serves (FAISS
    * IDSelector / Milvus filtered search / Vespa filtered ANN). The
    * label predicate lands on the (cell, label, codes) index slice —
    * BELOW the ADC LUT join, so disqualified candidates never cost a
    * table lookup, let alone a raw-vector read — then ADC-sums the
    * survivors and exact-reranks the [[AdcShortlist]]-deep shortlist.
    * At 100 TB each filtered query touches nprobe/k of the CODED
    * index (4 ints + a label per row), and raw vectors are fetched
    * for shortlist finalists only; nprobe=2 is carried over from
    * ann_filtered_nprobe because a selective predicate starves
    * single-cell candidate pools (measured on ann_recall_filtered).
    * Every stage is the already-verified arithmetic of its parents,
    * so the composition hash-matches the composed oracle. */
  val annFilteredPq: Q = Q(
    "ann_filtered_pq",
    (s, dir) => {
      val e = emb(s, dir)
      // offline: labeled coarse cells + PQ codes
      val cents = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2")))
      val cellScores = e.crossJoin(cents)
        .select(col("vec_id"), col("label"), col("c_id"),
          cosWith("v", "n2", "cv", "cn2").as("c_cos"))
      val assigned = cellScores.groupBy("vec_id", "label")
        .agg(expr("graft_argmax(c_id, c_cos)").as("cell"))
      val sub = pqSubvectors(s, dir).localCheckpoint()
      val cb = pqCodebook(sub)
      val enc = sub.join(broadcast(cb), "m")
        .select(col("vec_id"), col("m"), col("c_id"),
          sqDist("sn2", "cn2", "sv", "cd").as("d"))
        .groupBy("vec_id", "m")
        .agg(expr("graft_argmax(c_id, -d)").as("c_id"))
      val indexed = enc.join(assigned, "vec_id")
      // online: probed cells -> label filter on the coded slice ->
      // ADC -> exact rerank
      val probeCells = cellScores.filter(expr(ProbeFilter))
        .withColumn("crn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))))
        .filter(col("crn") <= 2)
        .select(col("vec_id").as("probe_id"), col("label").as("p_label"),
          col("c_id").as("cell"))
      val lut = sub.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("m").as("pm"),
          col("sv").as("psv"), col("sn2").as("psn2"))
        .join(cb, col("pm") === col("m"))
        .select(col("probe_id"), col("m"), col("c_id"),
          sqDist("psn2", "cn2", "psv", "cd").as("d"))
      val shortlist = indexed.join(broadcast(probeCells), "cell")
        .filter(col("vec_id") =!= col("probe_id") &&
          col("label") === col("p_label"))
        .join(broadcast(lut), Seq("probe_id", "m", "c_id"))
        .select(col("probe_id"), col("vec_id").as("n_id"), col("d"))
        .groupBy("probe_id", "n_id")
        .agg(sum(col("d")).cast("long").as("adist"))
        .withColumn("rq", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("adist"), col("n_id"))))
        .filter(col("rq") <= AdcShortlist)
      shortlist
        .join(e.select(col("vec_id"), col("v").as("pv"), col("n2").as("pn2")),
          col("probe_id") === col("vec_id")).drop("vec_id")
        .join(e.select(col("vec_id"), col("v").as("nv"), col("n2").as("nn2")),
          col("n_id") === col("vec_id"))
        .select(col("probe_id"), col("n_id"),
          cosWith("pv", "pn2", "nv", "nn2").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"), col("rank"),
          round(col("cos"), 6).as("cos_sim"))
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
            |), c AS (
            |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
            |), cs AS (
            |  SELECT e.vec_id, e.label, c_id, ${duckCosine("e.v", "cv")} AS c_cos
            |  FROM e CROSS JOIN c
            |), assigned AS (
            |  SELECT vec_id, label, c_id AS cell FROM (
            |    SELECT vec_id, label, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS rn
            |    FROM cs
            |  ) WHERE rn = 1
            |), pc AS (
            |  SELECT vec_id AS probe_id, label AS p_label, c_id AS cell FROM (
            |    SELECT vec_id, label, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS crn
            |    FROM cs WHERE $ProbeFilter
            |  ) WHERE crn <= 2
            |), $pqCoreCtes, adcf AS (
            |  SELECT pc.probe_id, a.vec_id AS n_id,
            |    CAST(sum(lut.dist) AS BIGINT) AS adist
            |  FROM assigned a
            |  JOIN pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
            |    AND a.label = pc.p_label
            |  JOIN enc ON enc.vec_id = a.vec_id
            |  JOIN lut ON lut.probe_id = pc.probe_id AND lut.m = enc.m
            |    AND lut.c_id = enc.code
            |  GROUP BY 1, 2
            |), shortf AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT probe_id, n_id,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY adist, n_id) AS rq
            |    FROM adcf
            |  ) WHERE rq <= $AdcShortlist
            |), rerankedf AS (
            |  SELECT s.probe_id, s.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM shortf s
            |  JOIN e ep ON s.probe_id = ep.vec_id
            |  JOIN e en ON s.n_id = en.vec_id
            |)
            |SELECT probe_id, n_id, rank, round(cos, 6) AS cos_sim
            |FROM (
            |  SELECT probe_id, n_id, cos,
            |    row_number() OVER (PARTITION BY probe_id
            |      ORDER BY cos DESC, n_id) AS rank
            |  FROM rerankedf
            |) WHERE rank <= 5""".stripMargin))

  /** Recall@5 of filtered IVF-PQ vs the same filtered-exact ground
    * truth as [[annRecallFiltered]] / [[annRecallFilteredNprobe]] —
    * the three rows share one harness, so they price each lever
    * separately: what the second probe buys back from predicate
    * starvation, and what PQ compression then costs on top. Approx
    * side materialized (localCheckpoint) before scoring, per the
    * IVF-PQ recall discipline; starved probes surface with k=0. */
  val annRecallFilteredPq: Q = Q(
    "ann_recall_filtered_pq",
    (s, dir) => {
      val e = emb(s, dir)
      val probes = broadcast(e.filter(expr(ProbeFilter))
        .select(col("vec_id").as("probe_id"), col("label").as("p_label"),
          col("v").as("pv"), col("n2").as("pn2")))
      val exact = e.join(probes,
          col("vec_id") =!= col("probe_id") && col("label") === col("p_label"))
        .select(col("probe_id"), col("vec_id").as("n_id"),
          cosWith("pv", "pn2", "v", "n2").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("n_id"))
      val approx = annFilteredPq.run(s, dir)
        .select(col("probe_id").as("a_probe"), col("n_id").as("a_n"))
        .localCheckpoint()
      val per = exact.join(approx,
          col("probe_id") === col("a_probe") && col("n_id") === col("a_n"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("k"), count(col("a_n")).as("hits"))
      e.filter(expr(ProbeFilter)).select(col("vec_id").as("probe_id"))
        .join(per, Seq("probe_id"), "left")
        .select(col("probe_id"),
          coalesce(col("k"), lit(0L)).as("k"),
          coalesce(col("hits"), lit(0L)).as("hits"))
        .withColumn("recall_pct",
          when(col("k") === 0, lit(100L)).otherwise(expr("hits * 100 div k")))
        .orderBy("probe_id")
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
            |), p AS (
            |  SELECT vec_id AS probe_id, label AS p_label, v AS pv
            |  FROM e WHERE $ProbeFilter
            |), bf_scored AS (
            |  SELECT probe_id, e.vec_id AS n_id, ${duckCosine("pv", "e.v")} AS cos
            |  FROM e JOIN p ON e.vec_id <> p.probe_id AND e.label = p.p_label
            |), bf_ranked AS (
            |  SELECT probe_id, n_id,
            |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, n_id) AS rank
            |  FROM bf_scored
            |), exact AS (
            |  SELECT probe_id, n_id FROM bf_ranked WHERE rank <= 5
            |), c AS (
            |  SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16
            |), cs AS (
            |  SELECT e.vec_id, e.label, c_id, ${duckCosine("e.v", "cv")} AS c_cos
            |  FROM e CROSS JOIN c
            |), assigned AS (
            |  SELECT vec_id, label, c_id AS cell FROM (
            |    SELECT vec_id, label, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS rn
            |    FROM cs
            |  ) WHERE rn = 1
            |), pc AS (
            |  SELECT vec_id AS probe_id, label AS p_label, c_id AS cell FROM (
            |    SELECT vec_id, label, c_id,
            |      row_number() OVER (PARTITION BY vec_id
            |        ORDER BY c_cos DESC, c_id) AS crn
            |    FROM cs WHERE $ProbeFilter
            |  ) WHERE crn <= 2
            |), $pqCoreCtes, adcf AS (
            |  SELECT pc.probe_id, a.vec_id AS n_id,
            |    CAST(sum(lut.dist) AS BIGINT) AS adist
            |  FROM assigned a
            |  JOIN pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
            |    AND a.label = pc.p_label
            |  JOIN enc ON enc.vec_id = a.vec_id
            |  JOIN lut ON lut.probe_id = pc.probe_id AND lut.m = enc.m
            |    AND lut.c_id = enc.code
            |  GROUP BY 1, 2
            |), shortf AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT probe_id, n_id,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY adist, n_id) AS rq
            |    FROM adcf
            |  ) WHERE rq <= $AdcShortlist
            |), rerankedf AS (
            |  SELECT s.probe_id, s.n_id, ${duckCosine("ep.v", "en.v")} AS cos
            |  FROM shortf s
            |  JOIN e ep ON s.probe_id = ep.vec_id
            |  JOIN e en ON s.n_id = en.vec_id
            |), approx AS (
            |  SELECT probe_id, n_id FROM (
            |    SELECT probe_id, n_id,
            |      row_number() OVER (PARTITION BY probe_id
            |        ORDER BY cos DESC, n_id) AS rank
            |    FROM rerankedf
            |  ) WHERE rank <= 5
            |), per AS (
            |  SELECT x.probe_id, count(*) AS k, count(a.n_id) AS hits
            |  FROM exact x LEFT JOIN approx a
            |    ON x.probe_id = a.probe_id AND x.n_id = a.n_id
            |  GROUP BY 1
            |)
            |SELECT p.probe_id, coalesce(per.k, 0) AS k,
            |  coalesce(per.hits, 0) AS hits,
            |  CASE WHEN coalesce(per.k, 0) = 0 THEN 100
            |       ELSE per.hits * 100 // per.k END AS recall_pct
            |FROM p LEFT JOIN per ON p.probe_id = per.probe_id
            |ORDER BY p.probe_id""".stripMargin))

  val all: Seq[Q] = Seq(annBruteforce, annLsh, annIvf, vecNorms, annRecall,
    annRecallIvf, annIvfNprobe, vecQuantize, annRecallNprobe, annQuantized,
    annRecallQuantized, clusterKmeans, dedupSemantic, dedupBlockingRecall,
    annIncremental, annPq, annRecallPq, annIvfPq, annRecallIvfPq,
    annIvfPqOpq, annRecallIvfPqOpq,
    annIvfPqRes, annRecallIvfPqRes, annIvfPqOpqRes, annRecallIvfPqOpqRes,
    annIvfPqRvOpqRes, annRecallIvfPqRvOpqRes,
    annIvfAdc, annRecallIvfAdc, vecProject,
    annFiltered, annRecallFiltered, annFilteredNprobe, annRecallFilteredNprobe,
    annFilteredPq, annRecallFilteredPq)
}
