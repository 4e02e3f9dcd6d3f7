package graft.operators

import graft.Q
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite over the `documents` table — the operators an
  * LLM-training-data pipeline runs before anything else. Reference
  * pipeline context: the CDC sink dedups by key (README.md upsert
  * config); here we add content-level dedup as first-class operators.
  *
  * Scale design (100 TB): no candidate generator is ever O(n^2) —
  * exact/norm dedup is one hash-partition groupBy on the text (or a
  * 60-bit fingerprint of it, so the shuffle key is 8 bytes, not the
  * document); near-dup candidates come from bounded blocking keys
  * (shingles, MinHash LSH bands, SimHash hamming bands, hyperplane
  * buckets) followed by exact verification within blocks only.
  * Signatures (MinHash/SimHash) are computed per-document with folds
  * over array columns — codegen'd, zero explode, zero shuffle — so the
  * only shuffles are the block-key joins themselves.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents

  /** max LSH bucket size before the bucket is considered degenerate
    * and dropped from pair enumeration (see dedup_minhash_lsh). */
  private[operators] val MaxBucket = 1000

  /** max docs sharing one shingle before that shingle's block is
    * dropped from pair enumeration. A block of m docs yields m^2/2
    * candidate pairs, so ONE degenerate shingle (a boilerplate header
    * repeated across a web corpus) makes the whole join quadratic;
    * past this size the shingle is so common it carries no dedup
    * signal — exactly the LSH MaxBucket argument, applied to the
    * shingle-block join. The guard is a count window partitioned on
    * the join key itself, so it rides the exchange the self-join
    * needs anyway: zero extra shuffles (PlanAuditSpec pins this).
    * Every oracle applies the identical cap. */
  private[operators] val MaxShingleBlock = 1000

  /** Per-bucket member cap for the embedding-blocking self-joins — at
    * 30x data an uncapped bucket's candidate set hit ~10^8 pairs and
    * OOM'd. Bounding KEEPS a deterministic sample of MaxEmbBucket
    * members (dropping whole hot buckets, the minhash-LSH guard, would
    * empty the operator when every bucket is hot). Priority is a
    * portable LCG over vec_id — id-uniform, so the kept members are
    * an unbiased sample and the measured recall (dedup_blocking_recall)
    * honestly reflects the capped pipeline.
    *
    * Since round 9 the cap is a GUARD, not the workload ceiling: the
    * blocking keyspaces scale with the corpus ([[embBits]] /
    * [[Ann.kmeansK]] keep expected occupancy constant at ~64/~128
    * members), so the cap only truncates adversarial skew (e.g. one
    * vector value repeated N times) instead of an unbounded fraction
    * of every bucket.
    *
    * Declared ABOVE every oracle string that interpolates it: a val
    * referenced from an earlier val's initializer is still 0 during
    * object init, which silently turned the simhash oracle's cap into
    * `<= 0` (EntrySpec pins the interpolated values). */
  val MaxEmbBucket = 512

  /** ceil(log2(n)) in pure integer arithmetic (mirrors
    * [[graft.functions.Portable.duckCeilLog2]] — no floating log2, so
    * the engines cannot disagree at exact-power boundaries). */
  private[graft] def ceilLog2(n: Long): Int =
    if (n <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)

  /** Corpus-scaled hyperplane bit count: bits = max(6, ceil(log2 N) -
    * 6), i.e. expected bucket occupancy N / 2^bits held at ~64 —
    * constant per-bucket pair work however large the corpus, which is
    * what makes the capped blocking's recall scale-stable instead of
    * decaying toward zero (pre-r9 the keyspace was FIXED at 6 bits, so
    * the 512-member cap kept a vanishing 512*256/N fraction at scale).
    * Deterministic from a corpus count; the oracles interpolate the
    * identical integer formula ([[duckEmbBitsFrom]]). At the
    * verify/bench SFs (N <= 2^12) this floors at 6 — the historical
    * configuration. */
  private[graft] def embBits(n: Long): Int = math.max(6, ceilLog2(n) - 6)

  /** The matching SQL for [[embBits]] over a counted corpus. */
  private[graft] def duckEmbBitsFrom(countExpr: String): String =
    s"greatest(6, ${duckCeilLog2(countExpr)} - 6)"

  /** Shingle rows bounded to blocks of 2..[[MaxShingleBlock]] docs —
    * the pair-generator input. The lower bound is free pruning, not a
    * semantic change: a singleton block (a shingle unique to one doc —
    * MOST shingles in natural text) can never produce a pair, yet
    * without the filter every such row is sorted and probed by the
    * self-join. NOT used for the per-doc shingle counts (the Jaccard
    * denominator), which stay exact over all shingles. */
  private[operators] def boundedBlocks(sh: DataFrame): DataFrame = sh
    .withColumn("bn", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("sh")))
    .filter(col("bn").between(2, MaxShingleBlock))
    .drop("bn")

  /** The capped blocking CTE for the DuckDB oracles — mirrors
    * [[boundedBlocks]] (cnt stays on the UNCAPPED sh). */
  private[operators] def duckBoundedBlocks: String =
    "SELECT * FROM sh QUALIFY count(*) OVER (PARTITION BY sh) " +
      s"BETWEEN 2 AND $MaxShingleBlock"

  /** exact dedup: one representative (min doc_id) per distinct text.
    * The groupBy key at scale should be fp60(text), not the raw text —
    * demonstrated in dedup_exact_norm; here we keep the semantic
    * baseline on the raw text. */
  val dedupExact: Q = Q(
    "dedup_exact",
    (s, dir) => docs(s, dir)
      .groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies"),
    Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
           |FROM documents GROUP BY text""".stripMargin))

  /** normalized exact dedup: group on a 60-bit fingerprint of the
    * lower/whitespace-squeezed text — an 8-byte shuffle key instead of
    * the full document, which at 100 TB is the difference between
    * shuffling 100 TB and shuffling ~1% of it. */
  val dedupExactNorm: Q = Q(
    "dedup_exact_norm",
    (s, dir) => docs(s, dir)
      .withColumn("fp", expr(fp60(normText("text"))))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies"),
    Some(s"""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
            |FROM documents GROUP BY ${duckFp60(duckNormText("text"))}""".stripMargin))

  /** word-3-gram Jaccard >= 0.8 duplicate pairs. Candidates are
    * blocked by shared shingle (the self-join key), so cost is
    * sum(block^2) over shingle blocks — bounded because natural-text
    * shingles are rare AND because degenerate blocks (web boilerplate
    * shared by >MaxShingleBlock docs) are dropped before enumeration;
    * never an O(n^2) cross join. The join key is
    * the 60-bit shingle hash, not the shingle string: an 8-byte
    * shuffle key instead of ~25 bytes of text, and the oracle blocks
    * on the same hash so any collision affects both sides equally. */
  /** Per-document DISTINCT shingle-hash arrays: deduplication happens
    * row-locally with array_distinct (no shuffle), so downstream
    * consumers get unique (doc_id, sh) pairs from a plain explode and
    * the per-doc shingle count is just size(hs) — the
    * distinct-as-aggregation formulation costs an extra exchange of
    * every (doc, shingle) row. */
  private[operators] def shingleArrays(s: SparkSession, dir: String): DataFrame =
    shingleArraysOf(docs(s, dir))

  /** Same, over an arbitrary (doc_id, text) frame — the pair
    * generators run this on exact-dup-group REPRESENTATIVES only. */
  private[operators] def shingleArraysOf(d: DataFrame): DataFrame = d
    .withColumn("words", expr(words("text")))
    .filter(expr("size(words) >= 3"))
    .withColumn("hs", expr(s"array_distinct(${shingleHashes60("words")})"))

  /** (doc_id, shingle-hash) rows, unique — the blocking base for the
    * Jaccard pair generator and the contamination check. */
  private[operators] def shingleRows(s: SparkSession, dir: String): DataFrame =
    shingleArrays(s, dir).select(col("doc_id"), explode(col("hs")).as("sh"))

  /** Exact-duplicate text groups: every doc tagged with `gid` (the min
    * doc_id among byte-identical texts — the group representative) and
    * `gn` (the group size). ONE exchange, keyed on the text itself
    * (the dedup_exact precedent; at 100 TB the key would be a 128-bit
    * content hash — dedup_exact_norm demonstrates the fingerprint
    * variant). Checkpointed because members and representatives are
    * both consumed downstream and the window must run once.
    *
    * This is the standard production pipeline order (exact dedup
    * FIRST, near-dup on distinct texts): pair-generation cost is
    * quadratic in block sizes, and byte-identical copies inflate every
    * shingle block by the duplication factor — running the pair join
    * on one representative per text makes generation scale with
    * DISTINCT texts while the copy fan-out moves to the expansion
    * joins, which scale with OUTPUT pairs. At 30x replica data (every
    * text x30) the direct join ran 609 s and OOM'd under ensemble
    * memory pressure; the rep form does the identical-result join on
    * 1/30th the docs. */
  private[operators] def textGroups(s: SparkSession, dir: String): DataFrame =
    // The window key is a 120-bit text fingerprint (two independent
    // 60-bit polynomial hashes), NOT the raw text: this exchange is
    // the widest shuffle in the repo, and 16 bytes per row vs whole
    // documents is the difference between shuffling ids and shuffling
    // the corpus. Collision stance (same as the sig digests): two
    // DISTINCT texts sharing both fingerprints merge groups with
    // per-pair odds ~2^-120 — birthday bound ~4e-19 at 10^9 distinct
    // texts — so grouping is identical to partitioning on the text
    // itself (the oracles keep PARTITION BY text; a disagreement IS
    // the collision detector).
    docs(s, dir).select(col("doc_id"), col("text"))
      .withColumn("fpa", expr(fp60("text")))
      .withColumn("fpb", expr(fp60b("text")))
      .withColumn("gid", min("doc_id").over(Window.partitionBy("fpa", "fpb")))
      .withColumn("gn", count(lit(1)).over(Window.partitionBy("fpa", "fpb")))
      .drop("fpa", "fpb")
      // only representatives are ever read back with text
      // ([[groupReps]]); nulling the copies' text before the
      // checkpoint shrinks the pinned storage from O(corpus text) to
      // O(ids + DISTINCT texts) — under the duplication factors that
      // motivate dedup, that is the difference between pinning the
      // corpus and pinning its unique core
      .withColumn("text", when(col("doc_id") === col("gid"), col("text")))
      .localCheckpoint(true)

  /** Members eligible for pair expansion: groups over MaxShingleBlock
    * are dropped wholesale — the direct formulation dropped their
    * every shingle block as degenerate (a >1000-copy text saturates
    * all its blocks), so they produced no pairs there either; a
    * mega-dup group's pair list is exact-dedup noise, its docs are
    * handled by the one-representative contract. */
  private[operators] def groupMembers(g: DataFrame): DataFrame =
    g.filter(col("gn") <= MaxShingleBlock)

  /** One (doc_id, text) row per group representative. */
  private[operators] def groupReps(g: DataFrame): DataFrame =
    groupMembers(g).filter(col("doc_id") === col("gid"))
      .select(col("doc_id"), col("text"))

  /** Bounded-shingle-block pair stats over representatives:
    * (ga, gb, inter, na, nb) with ga < gb, inter the shared-shingle
    * count, na/nb the per-rep distinct-shingle counts. The
    * denominator counts ride the exploded rows as constants (one
    * corpus scan, no separate count-attach joins). */
  private def repPairStats(reps: DataFrame): DataFrame = {
    val base = shingleArraysOf(reps)
    // hot-shingle guard: see MaxShingleBlock — degenerate blocks are
    // dropped BEFORE pair enumeration, the denominator counts are not
    val sh = boundedBlocks(
      base.select(col("doc_id"), expr("size(hs)").as("n"),
        explode(col("hs")).as("sh")))
    sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ga"), col("b.doc_id").as("gb"))
      .agg(count(lit(1)).as("inter"),
        min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
  }

  /** Groups whose representative has >= 3 words (shorter texts have no
    * 3-gram shingles and can never pair — in the direct formulation
    * they simply never reach the join). */
  private def eligibleGids(reps: DataFrame): DataFrame =
    shingleArraysOf(reps).select(col("doc_id").as("egid"))

  /** word-3-gram Jaccard >= 0.8 duplicate pairs (da < db, jac),
    * via [[textGroups]]: the quadratic join runs on representatives,
    * then pairs expand to members — cross-group pairs inherit the rep
    * pair's Jaccard (identical texts have identical shingle sets, so
    * the value is bit-identical to the direct computation), intra-group
    * pairs are exactly 1.0. */
  private def ngramPairs(s: SparkSession, dir: String): DataFrame = {
    val g = textGroups(s, dir)
    val m = groupMembers(g).select(col("doc_id"), col("gid"))
    val reps = groupReps(g)
    val rp = repPairStats(reps)
      .withColumn("jac", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jac") >= 0.8)
    val cross = rp
      .join(m.as("x"), col("ga") === col("x.gid"))
      .join(m.as("y"), col("gb") === col("y.gid"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("da"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("db"),
        col("jac"))
    val intra = m.as("x")
      .join(m.as("y"),
        col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id"))
      .join(eligibleGids(reps), col("x.gid") === col("egid"), "left_semi")
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        lit(1.0).as("jac"))
    cross.unionByName(intra)
  }

  /** The rep-grouping CTEs shared by the pair-generating oracles —
    * mirrors [[textGroups]]/[[groupMembers]]/[[groupReps]] exactly. */
  private[operators] def duckGroupCtes: String =
    s"""g AS (
       |  SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS gid,
       |    count(*) OVER (PARTITION BY text) AS gn
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, gid, gn FROM g WHERE gn <= $MaxShingleBlock
       |), reps AS (
       |  SELECT doc_id, text FROM g WHERE doc_id = gid AND gn <= $MaxShingleBlock
       |), w AS (
       |  SELECT doc_id, ${duckWords("text")} AS words FROM reps
       |), elig AS (
       |  SELECT doc_id AS egid FROM w WHERE len(words) >= 3
       |), sh AS (
       |  SELECT DISTINCT doc_id, unnest(${duckShingleHashes60(duckShingles3("words"))}) AS sh
       |  FROM w WHERE len(words) >= 3
       |), cnt AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
       |), shb AS (
       |  $duckBoundedBlocks
       |), rpairs AS (
       |  SELECT a.doc_id AS ga, b.doc_id AS gb, count(*) AS inter
       |  FROM shb a JOIN shb b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)""".stripMargin

  val dedupNgramJaccard: Q = Q(
    "dedup_ngram_jaccard",
    (s, dir) => ngramPairs(s, dir)
      .select(col("da"), col("db"), round(col("jac"), 6).as("jaccard")),
    Some(s"""WITH $duckGroupCtes,
            |rp AS (
            |  SELECT ga, gb, inter*1.0 / (ca.n + cb.n - inter) AS jac
            |  FROM rpairs
            |  JOIN cnt ca ON ga = ca.doc_id
            |  JOIN cnt cb ON gb = cb.doc_id
            |  WHERE inter*1.0 / (ca.n + cb.n - inter) >= 0.8
            |)
            |SELECT least(x.doc_id, y.doc_id) AS da,
            |  greatest(x.doc_id, y.doc_id) AS db, round(jac, 6) AS jaccard
            |FROM rp JOIN m x ON x.gid = rp.ga JOIN m y ON y.gid = rp.gb
            |UNION ALL
            |SELECT x.doc_id AS da, y.doc_id AS db, CAST(1.0 AS DOUBLE) AS jaccard
            |FROM m x JOIN m y ON x.gid = y.gid AND x.doc_id < y.doc_id
            |JOIN elig ON x.gid = egid""".stripMargin))

  /** Asymmetric n-gram CONTAINMENT (inter / min(|A|,|B|) >= 0.9) — the
    * quote/subset detector Jaccard structurally misses: a short doc
    * fully embedded in a long one has tiny Jaccard (union is the long
    * doc) but containment ~1. Near-dedup pipelines run BOTH measures;
    * this row reuses the identical exact-dedup-first blocked pair
    * machinery (same blocks, same caps, same member expansion — only
    * the denominator changes), so it costs the same bounded plan. */
  val dedupContainment: Q = Q(
    "dedup_containment",
    (s, dir) => {
      val g = textGroups(s, dir)
      val m = groupMembers(g).select(col("doc_id"), col("gid"))
      val reps = groupReps(g)
      val rp = repPairStats(reps)
        .withColumn("cont", col("inter") / least(col("na"), col("nb")))
        .filter(col("cont") >= 0.9)
      val cross = rp
        .join(m.as("x"), col("ga") === col("x.gid"))
        .join(m.as("y"), col("gb") === col("y.gid"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("da"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("db"),
          col("cont"))
      val intra = m.as("x")
        .join(m.as("y"),
          col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id"))
        .join(eligibleGids(reps), col("x.gid") === col("egid"), "left_semi")
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
          lit(1.0).as("cont"))
      cross.unionByName(intra)
        .select(col("da"), col("db"), round(col("cont"), 6).as("containment"))
    },
    Some(s"""WITH $duckGroupCtes,
            |rp AS (
            |  SELECT ga, gb, inter*1.0 / least(ca.n, cb.n) AS cont
            |  FROM rpairs
            |  JOIN cnt ca ON ga = ca.doc_id
            |  JOIN cnt cb ON gb = cb.doc_id
            |  WHERE inter*1.0 / least(ca.n, cb.n) >= 0.9
            |)
            |SELECT least(x.doc_id, y.doc_id) AS da,
            |  greatest(x.doc_id, y.doc_id) AS db, round(cont, 6) AS containment
            |FROM rp JOIN m x ON x.gid = rp.ga JOIN m y ON y.gid = rp.gb
            |UNION ALL
            |SELECT x.doc_id AS da, y.doc_id AS db, CAST(1.0 AS DOUBLE) AS containment
            |FROM m x JOIN m y ON x.gid = y.gid AND x.doc_id < y.doc_id
            |JOIN elig ON x.gid = egid""".stripMargin))

  /** span window length for [[dedupSpans]]: 8 words ≈ the shortest
    * span worth cutting (Lee et al. use 50 BPE tokens; 8 words on the
    * synthetic corpus keeps sf0.01 oracle work tractable while
    * exercising the identical plan shape). */
  private[operators] val SpanW = 8

  /** Exact duplicated-span census — the exact-substring counterpart of
    * the MinHash rows ("Deduplicating Training Data Makes Language
    * Models Better", Lee et al. 2022: near-dup via MinHash AND exact
    * repeated substrings via suffix arrays). A w=8-word window whose
    * fp60 fingerprint occurs more than once ANYWHERE in the corpus
    * (another document, or again in the same one) is duplicated text
    * mass; the output is each document's window count, duplicated-
    * window count, and duplicated fraction — the quantity an
    * exact-substring cut pass would remove.
    *
    * Scale design — strictly aggregate-class (§5 rule), NO pair
    * enumeration at any stage: the window stream is one 8-byte fp60
    * per word position (map-side native hash fused into the scan, no
    * window strings materialized); then (doc_id, wh) partial-count,
    * a census groupBy(wh), and a join back on wh where the census
    * side arrives already hash-partitioned by the join key; the
    * per-doc rollup is the final 8-byte-key shuffle. Every stage is
    * linear in corpus words. A boilerplate span repeated 10^9 times
    * across a web corpus is ONE census row with total=10^9 — the
    * degenerate case that makes pair-based designs quadratic is this
    * design's cheapest row. */
  val dedupSpans: Q = Q(
    "dedup_spans",
    (s, dir) => {
      val wh = docs(s, dir)
        .withColumn("words", expr(words("text")))
        .filter(expr(s"size(words) >= $SpanW"))
        .select(col("doc_id"),
          explode(expr(windowHashes60("words", SpanW))).as("wh"))
      val perDoc = wh.groupBy("doc_id", "wh").agg(count(lit(1)).as("cnt"))
      val census = perDoc.groupBy("wh").agg(sum("cnt").as("total"))
      perDoc.join(census, "wh")
        .groupBy("doc_id")
        .agg(sum("cnt").as("n_windows"),
          sum(when(col("total") > 1, col("cnt")).otherwise(lit(0L)))
            .as("dup_windows"))
        .select(col("doc_id"), col("n_windows"), col("dup_windows"),
          round(col("dup_windows").cast("double") / col("n_windows"), 6)
            .as("dup_frac"))
        .orderBy("doc_id")
    },
    Some(s"""WITH w AS (
            |  SELECT doc_id, ${duckWords("text")} AS words FROM documents
            |), x AS (
            |  SELECT doc_id,
            |    unnest(${duckShingleHashes60(duckWindows("words", SpanW))}) AS wh
            |  FROM w WHERE len(words) >= $SpanW
            |), dw AS (
            |  SELECT doc_id, wh, count(*) AS cnt FROM x GROUP BY doc_id, wh
            |), tot AS (
            |  SELECT wh, sum(cnt) AS total FROM dw GROUP BY wh
            |)
            |SELECT dw.doc_id AS doc_id,
            |  CAST(sum(cnt) AS BIGINT) AS n_windows,
            |  CAST(sum(CASE WHEN total > 1 THEN cnt ELSE 0 END) AS BIGINT)
            |    AS dup_windows,
            |  round(CAST(sum(CASE WHEN total > 1 THEN cnt ELSE 0 END) AS DOUBLE)
            |    / sum(cnt), 6) AS dup_frac
            |FROM dw JOIN tot USING (wh)
            |GROUP BY dw.doc_id
            |ORDER BY doc_id""".stripMargin))

  /** The CUT half of the Lee-et-al. exact-substring operator
    * ([[dedupSpans]] is the census; this row REMOVES the duplicated
    * mass): every word covered by any w=8 window whose fp60 occurs
    * more than once in the corpus is excised; the output is each
    * document's word count, cut-word count, and an ORDER-SENSITIVE
    * digest (md5) of the kept text — the artifact a training-data
    * pipeline ships downstream.
    *
    * Scale design — aggregate/join-class end to end, NO pair
    * enumeration and NO per-doc quadratic HOF: the duplicated-
    * fingerprint set is the census' >1 slice (like text_line_dedup's
    * boilerplate set it is output of a full-corpus aggregate, so it is
    * NEVER statically broadcast — billions of rows at web scale; AQE
    * may demote the join from measured sizes); duplicated window
    * positions expand ×w to covered word indices (bounded fan-out);
    * the kept stream is one LEFT ANTI join of the exploded words
    * against the covered set on (doc_id, idx) — every stage linear in
    * corpus words, shuffles keyed by 8-byte hashes or (doc, idx)
    * composites. The per-doc reassembly sorts ONLY within a document
    * (collect + array_sort under the doc_id aggregate). */
  val dedupSpansCut: Q = Q(
    "dedup_spans_cut",
    (s, dir) => {
      val d = docs(s, dir).withColumn("words", expr(words("text")))
      val wh = d.filter(expr(s"size(words) >= $SpanW"))
        .select(col("doc_id"),
          posexplode(expr(windowHashes60("words", SpanW))))
        .select(col("doc_id"), (col("pos") + lit(1)).cast("long").as("pos"),
          col("col").as("wh"))
      val dup = wh.groupBy("wh").agg(count(lit(1)).as("total"))
        .filter(col("total") > 1).select("wh")
      val dpos = wh.join(dup, "wh").select(col("doc_id"), col("pos"))
      val cov = dpos.select(col("doc_id"),
          explode(expr(s"sequence(pos, pos + ${SpanW - 1})")).as("idx"))
        .distinct()
      val wx = d.select(col("doc_id"), posexplode(col("words")))
        .select(col("doc_id"), (col("pos") + lit(1)).cast("long").as("idx"),
          col("col").as("word"))
      val kept = wx.join(cov, Seq("doc_id", "idx"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("kept_words"),
          concat_ws(" ", expr(
            "transform(array_sort(collect_list(struct(idx, word))), x -> x.word)"))
            .as("kept_text"))
      d.select(col("doc_id"), size(col("words")).cast("long").as("n_words"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          (col("n_words") - coalesce(col("kept_words"), lit(0L)))
            .as("cut_words"),
          md5(coalesce(col("kept_text"), lit(""))).as("kept_digest"))
        .orderBy("doc_id")
    },
    Some(s"""WITH w AS (
            |  SELECT doc_id, ${duckWords("text")} AS words FROM documents
            |), xp AS (
            |  SELECT doc_id, t.x['pos'] AS pos, t.x['wh'] AS wh
            |  FROM (SELECT doc_id,
            |          ${duckShingleHashes60(duckWindows("words", SpanW))} AS whs
            |        FROM w WHERE len(words) >= $SpanW),
            |    unnest([{'pos': i, 'wh': whs[i]}
            |      FOR i IN range(1, len(whs) + 1)]) AS t(x)
            |), dup AS (
            |  SELECT wh FROM xp GROUP BY wh HAVING count(*) > 1
            |), dpos AS (
            |  SELECT doc_id, pos FROM xp JOIN dup USING (wh)
            |), cov AS (
            |  SELECT DISTINCT doc_id, u.i AS idx
            |  FROM dpos, unnest(range(pos, pos + $SpanW)) AS u(i)
            |), wx AS (
            |  SELECT doc_id, t.x['i'] AS idx, t.x['w'] AS word
            |  FROM w, unnest([{'i': i, 'w': words[i]}
            |    FOR i IN range(1, len(words) + 1)]) AS t(x)
            |), kept AS (
            |  SELECT doc_id, count(*) AS kept_words,
            |    string_agg(word, ' ' ORDER BY idx) AS kept_text
            |  FROM wx ANTI JOIN cov USING (doc_id, idx)
            |  GROUP BY doc_id
            |)
            |SELECT w.doc_id, len(words) AS n_words,
            |  len(words) - coalesce(kept_words, 0) AS cut_words,
            |  md5(coalesce(kept_text, '')) AS kept_digest
            |FROM w LEFT JOIN kept USING (doc_id)
            |ORDER BY w.doc_id""".stripMargin))

  /** 64-permutation MinHash signatures, one row per doc. Computed as a
    * single fold per document (no 64x explode); at scale this is a
    * map-only stage fused into the scan. The 64-lane signature is
    * surfaced as two independent scalar digests (plus min/max lanes) —
    * the driver's comparator can't sort array cells, and two digests
    * under different multipliers pin all 64 lanes with collision
    * probability ~2^-62. `sig` is materialized as a column BEFORE the
    * digest folds so the HOF lambdas don't re-evaluate the signature
    * per element. */
  val dedupMinhash: Q = Q(
    "dedup_minhash",
    (s, dir) => docs(s, dir)
      .withColumn("words", expr(words("text")))
      .filter(expr("size(words) >= 3"))
      .withColumn("hashes", expr(shingleHashes("words")))
      .withColumn("sig", expr(minhashSig("hashes")))
      .select(col("doc_id"),
        expr(sigDigest("sig")).as("sig_digest"),
        expr(sigDigest("sig", 1000033L, P1)).as("sig_digest2"),
        expr("array_min(sig)").as("sig_min"),
        expr("array_max(sig)").as("sig_max")),
    Some(s"""WITH w AS (
            |  SELECT doc_id, ${duckWords("text")} AS words FROM documents
            |), hs AS (
            |  SELECT doc_id, ${duckShingleHashes(duckShingles3("words"))} AS hashes
            |  FROM w WHERE len(words) >= 3
            |), sig AS (
            |  SELECT doc_id, ${duckMinhashSig("hashes")} AS sig FROM hs
            |)
            |SELECT doc_id, ${duckSigDigest("sig")} AS sig_digest,
            |  ${duckSigDigest("sig", 1000033L, P1)} AS sig_digest2,
            |  CAST(list_min(sig) AS BIGINT) AS sig_min,
            |  CAST(list_max(sig) AS BIGINT) AS sig_max
            |FROM sig""".stripMargin))

  /** MinHash LSH: 16 bands x 4 rows -> candidate pairs sharing any
    * band bucket, with the signature-estimated Jaccard.
    *
    * Runs REP-LEVEL (exact-dedup-first, round 15): byte-identical
    * texts have identical signatures, hence identical band keys, so
    * enumerating a copy family member-by-member through the band
    * self-join is pure waste — at 300-copy replica scale it was the
    * repo's #1 cost (a 300-member family is 44,850 pairs through the
    * join) and once spilled a 71 GB scratch disk. Instead: group by
    * text ([[textGroups]]), run the band machinery over ONE
    * representative per family, and recover member pairs by group
    * expansion at output — generation cost scales with DISTINCT
    * texts, the copy fan-out lives in output-sized joins (the
    * contam_fuzzy pattern).
    *
    * The output is BIT-IDENTICAL to the direct doc-level form at any
    * corpus (the oracle below is still the direct form): the bucket
    * census weights each rep by its family size (`sum(gn)` = exactly
    * the doc count the direct census saw), so hot-bucket drops agree;
    * cross-family pairs inherit the rep pair's estimate (signatures
    * are a pure function of the text); intra-family pairs are est 1.0
    * (64/64 lanes — exact in binary), emitted iff the family has >= 1
    * surviving bucket, which under the weighted census is exactly
    * when the direct form emitted them. */
  val dedupMinhashLsh: Q = Q(
    "dedup_minhash_lsh",
    (s, dir) => {
      val g = textGroups(s, dir)
      val m = g.select(col("doc_id"), col("gid"))
      // ALL reps, no MaxShingleBlock drop: the weighted census below is
      // the authority on hot families (a family over MaxBucket saturates
      // every bucket it touches, exactly as its members did directly)
      val reps = g.filter(col("doc_id") === col("gid"))
        .select(col("doc_id"), col("text"), col("gn"))
      // `hashes` is materialized as a column BEFORE the signature fold:
      // inlining it into the per-permutation lambda would re-evaluate
      // the shingle hashing once per permutation (64x).
      val sig = reps
        .withColumn("words", expr(words("text")))
        .filter(expr("size(words) >= 3"))
        .withColumn("hashes", expr(shingleHashes("words")))
        .select(col("doc_id").as("sgid"), col("gn"),
          expr(minhashSig("hashes")).as("sig"))
      val bands = sig.select(col("sgid"), col("gn"),
        explode(expr(minhashBands("sig"))).as("bk"))
      // hot-bucket guard: a band bucket of size m yields m^2/2 pairs, so
      // one pathological bucket (boilerplate, empty docs) can dominate
      // the whole join; buckets over the cap are dropped — their
      // contents are so common that pair enumeration inside them is
      // noise, not dedup signal. The oracle applies the same cap. The
      // census is MEMBER-weighted (sum of family sizes, not rep count):
      // bit-identical drops to the direct form. A window (not agg+join)
      // computes it: it hash-partitions on bk, and the self-join below
      // reuses that exact partitioning, so the guard costs zero extra
      // shuffles. The >=2 bound is free pruning (a weight-1 bucket is a
      // singleton doc), not a semantic change.
      val bounded = bands
        .withColumn("bn", sum("gn").over(
          org.apache.spark.sql.expressions.Window.partitionBy("bk")))
        .filter(col("bn").between(2, MaxBucket))
        .drop("bn")
      val cand = bounded.as("a")
        .join(bounded.as("b"), col("a.bk") === col("b.bk") && col("a.sgid") < col("b.sgid"))
        .select(col("a.sgid").as("ga"), col("b.sgid").as("gb"))
        .distinct()
      val repPairs = cand
        .join(sig.as("sa"), col("ga") === col("sa.sgid"))
        .join(sig.as("sb"), col("gb") === col("sb.sgid"))
        .select(col("ga"), col("gb"),
          round(expr(minhashEstJaccard("sa.sig", "sb.sig")), 6).as("est_jaccard"))
      val cross = repPairs
        .join(m.as("x"), col("ga") === col("x.gid"))
        .join(m.as("y"), col("gb") === col("y.gid"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("da"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("db"),
          col("est_jaccard"))
      // families with >= 2 members and >= 1 surviving bucket: every
      // member pair is a pair the direct join emitted, est exactly 1.0
      val intraGids = bounded.filter(col("gn") >= 2)
        .select(col("sgid")).distinct()
      val intra = m.as("x")
        .join(m.as("y"),
          col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id"))
        .join(intraGids, col("x.gid") === col("sgid"), "left_semi")
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
          lit(1.0).as("est_jaccard"))
      cross.unionByName(intra)
    },
    Some(s"""WITH w AS (
            |  SELECT doc_id, ${duckWords("text")} AS words FROM documents
            |), hs AS (
            |  SELECT doc_id, ${duckShingleHashes(duckShingles3("words"))} AS hashes
            |  FROM w WHERE len(words) >= 3
            |), sig AS (
            |  SELECT doc_id, ${duckMinhashSig("hashes")} AS sig FROM hs
            |), bands AS (
            |  SELECT doc_id, sig, unnest(${duckMinhashBands("sig")}) AS bk FROM sig
            |), ok AS (
            |  SELECT bk FROM bands GROUP BY bk
            |  HAVING count(*) BETWEEN 2 AND $MaxBucket
            |), bounded AS (
            |  SELECT bands.* FROM bands JOIN ok USING (bk)
            |)
            |SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
            |  round(${duckMinhashEstJaccard("a.sig", "b.sig")}, 6) AS est_jaccard
            |FROM bounded a JOIN bounded b ON a.bk = b.bk AND a.doc_id < b.doc_id""".stripMargin))

  /** 60-bit SimHash fingerprints + hamming<=8 near-dup pairs from
    * 15-bit hamming band buckets (a pair within hamming 3 of the 60
    * bits must agree exactly on at least one of the 4 bands; we block
    * on that and verify the exact hamming distance inside blocks).
    * Votes are cast by 3-gram shingle hashes, not single words: on a
    * corpus with a shared vocabulary, word-level fingerprints collapse
    * onto a few values and every band bucket goes hot; shingle-level
    * features keep non-dup fingerprints uniform so bucket sizes stay
    * ~n/2^15 per band. That ratio is still linear in n — the band
    * keyspace is FIXED (4 bands x 2^15 values), so past ~32M docs the
    * AVERAGE bucket exceeds any drop-cap and dropping hot buckets
    * (the minhash-LSH guard) would empty the operator. Same bound as
    * the embedding buckets instead: keep a deterministic LCG-uniform
    * sample of [[MaxEmbBucket]] DISTINCT FINGERPRINTS per bucket
    * (rep-level since round 15), so candidates are <= 4 * 2^15 *
    * cap^2 / 2 rep pairs at any corpus size and recall degrades
    * gracefully rather than the plan exploding. The window partitions
    * on the join key and runs as a WindowGroupLimit, riding the
    * self-join's own exchange; at oracle SFs every bucket is under
    * the cap (no-op). */
  val dedupSimhash: Q = Q(
    "dedup_simhash",
    (s, dir) => {
      // REP-LEVEL by FINGERPRINT VALUE (round 15): identical texts have
      // identical fps, so a copy family enters the band machinery as
      // ONE representative — and so do distinct texts that happen to
      // share an fp (hamming 0 to each other, so expansion is exact for
      // them too). The per-bucket cap counts DISTINCT fps, ordered by
      // the same LCG priority over the rep id; the oracle applies the
      // identical rep-level cap. Member pairs come back by group
      // expansion: intra = all same-fp pairs at hamming 0 (emitted iff
      // the rep is retained in >= 1 bucket), cross = the rep pair's
      // hamming, fp-constant. Unlike mm_phash_pairs (byte-distinct
      // variants, no collapse — measured and reverted), replica copies
      // here are byte-identical, so the collapse is real: at 300-copy
      // scale the band self-join input shrinks 300x and intra pairs
      // come from a gid equi-join instead of the self-join + distinct.
      val fp = docs(s, dir)
        .withColumn("words", expr(words("text")))
        .filter(expr("size(words) >= 3"))
        .withColumn("hashes", expr(shingleHashes60("words")))
        .select(col("doc_id"), expr(simhash60("hashes")).as("fp"))
      // checkpointed like textGroups: members and reps are both
      // consumed downstream (m four times across the expansion
      // branches), and the fp window must run once, not per branch
      val fam = fp.withColumn("gid",
        min("doc_id").over(Window.partitionBy("fp")))
        .localCheckpoint(true)
      val m = fam.select(col("doc_id"), col("gid"))
      val reps = fam.filter(col("doc_id") === col("gid"))
        .select(col("gid"), col("fp"))
      val bands = reps.select(col("gid"), col("fp"),
        explode(expr(simhashBands("fp"))).as("bk"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("bk")
            .orderBy(expr(embPriority("gid")), col("gid"))))
        .filter(col("rn") <= MaxEmbBucket).drop("rn")
      val cand = bands.as("a")
        .join(bands.as("b"), col("a.bk") === col("b.bk") && col("a.gid") < col("b.gid"))
        .select(col("a.gid").as("ga"), col("b.gid").as("gb"),
          expr("bit_count(a.fp ^ b.fp)").as("hamming"))
        .filter(col("hamming") <= 8)
        .distinct()
      val cross = cand
        .join(m.as("x"), col("ga") === col("x.gid"))
        .join(m.as("y"), col("gb") === col("y.gid"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("da"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("db"),
          col("hamming"))
      val intraGids = bands.select(col("gid").as("igid")).distinct()
      val intra = m.as("x")
        .join(m.as("y"),
          col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id"))
        .join(intraGids, col("x.gid") === col("igid"), "left_semi")
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
          lit(0).cast("integer").as("hamming"))
      cross.unionByName(intra)
    },
    Some(s"""WITH w AS (
            |  SELECT doc_id, ${duckWords("text")} AS words FROM documents
            |), hs AS (
            |  SELECT doc_id, ${duckShingleHashes60(duckShingles3("words"))} AS hashes
            |  FROM w WHERE len(words) >= 3
            |), fp AS (
            |  SELECT doc_id, ${duckSimhash60("hashes")} AS fp FROM hs
            |), fam AS (
            |  SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS gid
            |  FROM fp
            |), reps AS (
            |  SELECT gid, fp FROM fam WHERE doc_id = gid
            |), bands0 AS (
            |  SELECT gid, fp, unnest(${duckSimhashBands("fp")}) AS bk FROM reps
            |), bands AS (
            |  SELECT gid, fp, bk FROM bands0
            |  QUALIFY row_number() OVER (PARTITION BY bk
            |    ORDER BY ${embPriority("gid")}, gid) <= $MaxEmbBucket
            |), cand AS (
            |  SELECT DISTINCT a.gid AS ga, b.gid AS gb,
            |    bit_count(xor(a.fp, b.fp)) AS hamming
            |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.gid < b.gid
            |  WHERE bit_count(xor(a.fp, b.fp)) <= 8
            |)
            |SELECT least(x.doc_id, y.doc_id) AS da,
            |  greatest(x.doc_id, y.doc_id) AS db, c.hamming AS hamming
            |FROM cand c JOIN fam x ON c.ga = x.gid JOIN fam y ON c.gb = y.gid
            |UNION ALL
            |SELECT x.doc_id AS da, y.doc_id AS db,
            |  CAST(0 AS INTEGER) AS hamming
            |FROM fam x JOIN fam y ON x.gid = y.gid AND x.doc_id < y.doc_id
            |WHERE x.gid IN (SELECT gid FROM bands)""".stripMargin))

  /** Portable deterministic bucket priority: same arithmetic in Spark
    * and DuckDB, mod-first so BIGINT multiplication cannot overflow
    * DuckDB's checked 64-bit range for any id. */
  private[operators] def embPriority(id: String): String =
    s"(($id % 2147483648) * 1103515245 + 12345) % 2147483648"

  /** embedding near-dup: random-hyperplane LSH buckets (4 tables x
    * corpus-scaled bits — [[embBits]] holds expected occupancy at ~64
    * so pair work is LINEAR in N and the cap never truncates an
    * unbounded fraction) generate candidates; exact left-fold cosine
    * >= 0.4 verifies inside buckets. Both the bucket keys and the
    * cosine are bit-identical across engines (the oracle computes the
    * same bit count from the same count(*)), so the oracle reproduces
    * the exact candidate set. The count() driving the bit width is one
    * scalar of driver metadata, same as dedup_blocking_recall's. */
  val dedupEmbedding: Q = Q(
    "dedup_embedding",
    (s, dir) => embeddingFoundPairs(s, dir, None),
    embeddingOracleSql)

  /** The hyperplane near-dup machinery behind [[dedupEmbedding]],
    * parameterized for eval: `anchorMod = Some(S)` restricts the
    * member expansion to pairs whose MIN member id ≡ 0 (mod S) —
    * dedup_blocking_recall's anchor predicate — applied BEFORE the
    * expansion joins (the shipped row's `least()` output hides the
    * member ids from Catalyst, so a post-hoc filter pays full
    * member-pair materialization; round-15's measured 23 → 47 s sf10
    * regression). With `None` this IS the shipped row, bit for bit.
    * Everything up to the rep-pair cosines is identical either way —
    * the anchor path changes only which member pairs are enumerated,
    * never which rep pairs are found, so the recall it measures is
    * exactly the shipped pipeline's. */
  private[graft] def embeddingFoundPairs(
      s: org.apache.spark.sql.SparkSession, dir: String,
      anchorMod: Option[Long]): DataFrame = {
      // REP-LEVEL by VECTOR VALUE (round 15): byte-identical vectors
      // (a crawl's replica copies, and exactly what replica scaling
      // produces) have identical hyperplane keys and pairwise cosine
      // 1.0, so a copy family enters the bucket machinery as ONE
      // representative and member pairs come back by group expansion —
      // intra pairs at cos 1.0 (iff the rep is retained in >= 1
      // bucket), cross pairs inheriting the rep pair's exact cosine
      // (a pure function of the two vectors). The grouping key in
      // Spark is a 128-bit pair (the fp60/fp60b collision stance —
      // 16-byte shuffle key, never the vector): xxhash64 of the array
      // plus SALTED xxhash64 of the REVERSED array — two different
      // input byte streams, an independent family rather than a seed
      // tweak of the same stream; the salt keeps the streams distinct
      // even for reversal-symmetric vectors, where reverse(v) == v
      // would otherwise collapse the 128-bit key to a single 64-bit
      // hash. The oracle partitions by the
      // vector itself, so a collision would surface as a hash
      // mismatch at tested SFs. The per-bucket cap
      // counts DISTINCT vectors, LCG-ordered by rep id; the oracle
      // applies the identical rep-level cap. Bucket join still moves
      // (id, bk) only; cosines are computed once per rep pair.
      val tbl = Tables(s, dir)
      val raw = tbl.embeddings
      val bits = embBits(tbl.embeddingsCount)
      // checkpointed like textGroups (the window must run once, not
      // once per expansion branch); non-rep vectors are nulled before
      // the checkpoint so pinned storage is O(ids + DISTINCT vectors)
      val fam = raw
        .withColumn("ha", xxhash64(col("embedding")))
        .withColumn("hb", xxhash64(reverse(col("embedding")), lit(1L)))
        .withColumn("gid", min("vec_id").over(Window.partitionBy("ha", "hb")))
        .withColumn("embedding",
          when(col("vec_id") === col("gid"), col("embedding")))
        .select(col("vec_id"), col("gid"), col("embedding"))
        .localCheckpoint(true)
      val m = fam.select(col("vec_id"), col("gid"))
      val reps = fam.filter(col("vec_id") === col("gid"))
        .select(col("gid"), expr(toDouble("embedding")).as("v"))
        .withColumn("n2", expr(dot("v", "v")))
      val keys = reps.select(col("gid"),
        explode(expr(hyperplaneKeysN("v", bits.toString))).as("bk"))
      // per-bucket truncation window partitions on the join key, so it
      // rides the join's own exchange — zero extra shuffles
      val bounded = keys
        .withColumn("rn", row_number().over(
          Window.partitionBy("bk")
            .orderBy(expr(embPriority("gid")), col("gid"))))
        .filter(col("rn") <= MaxEmbBucket).drop("rn")
      val cand = bounded.as("a")
        .join(bounded.as("b"), col("a.bk") === col("b.bk") && col("a.gid") < col("b.gid"))
        .select(col("a.gid").as("ga"), col("b.gid").as("gb"))
        .distinct()
      val repPairs = cand
        .join(reps.select(col("gid").as("ga"), col("v").as("av"), col("n2").as("an2")), "ga")
        .join(reps.select(col("gid").as("gb"), col("v").as("bv"), col("n2").as("bn2")), "gb")
        .withColumn("cos", expr(s"${dot("av", "bv")} / sqrt(an2 * bn2)"))
        .filter(col("cos") >= 0.4)
        .select(col("ga"), col("gb"), round(col("cos"), 6).as("cos_sim"))
      val intraGids = bounded.select(col("gid").as("igid")).distinct()
      anchorMod match {
        case None =>
          val cross = repPairs
            .join(m.as("x"), col("ga") === col("x.gid"))
            .join(m.as("y"), col("gb") === col("y.gid"))
            .select(least(col("x.vec_id"), col("y.vec_id")).as("va"),
              greatest(col("x.vec_id"), col("y.vec_id")).as("vb"),
              col("cos_sim"))
          val intra = m.as("x")
            .join(m.as("y"),
              col("x.gid") === col("y.gid") && col("x.vec_id") < col("y.vec_id"))
            .join(intraGids, col("x.gid") === col("igid"), "left_semi")
            .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"),
              lit(1.0).as("cos_sim"))
          cross.unionByName(intra)
        case Some(sMod) =>
          // Eval-only anchored expansion: a pair survives the recall
          // harness's `va % S == 0` iff its MIN member is an anchor,
          // so enumerate only (anchor member) × (member) with
          // anchor < member. The anchor member table is ~AnchorCap
          // rows corpus-wide (ids are uniform mod S), so the
          // expansion is bounded by anchors × family size instead of
          // the full member-pair product. The bounded rep-pair set is
          // materialized first (localCheckpoint — the same discipline
          // as the IVF-PQ recall harnesses' approx-output
          // checkpoint): it is consumed in BOTH orientations (the min
          // can live on either side of a cross pair), and the
          // checkpoint runs the band machinery once instead of
          // embedding it per orientation branch.
          val mA = m.filter(col("vec_id") % sMod === 0L)
          val rp = repPairs.localCheckpoint(true)
          val rp2 = rp.unionByName(rp.select(col("gb").as("ga"),
            col("ga").as("gb"), col("cos_sim")))
          // retained-gid list checkpointed too: id-sized, and it keeps
          // the band-machinery subtree out of the expansion plan
          val rg = intraGids.localCheckpoint(true)
          val crossA = rp2
            .join(mA.as("x"), col("ga") === col("x.gid"))
            .join(m.as("y"), col("gb") === col("y.gid"))
            .filter(col("x.vec_id") < col("y.vec_id"))
            .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"),
              col("cos_sim"))
          val intraA = mA.as("x")
            .join(m.as("y"),
              col("x.gid") === col("y.gid") && col("x.vec_id") < col("y.vec_id"))
            .join(rg, col("x.gid") === col("igid"), "left_semi")
            .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"),
              lit(1.0).as("cos_sim"))
          crossA.unionByName(intraA)
      }
  }

  // lazy: referenced by dedupEmbedding's eager Q construction above
  private lazy val embeddingOracleSql: Option[String] =
    Some(s"""WITH p AS (
            |  SELECT ${duckEmbBitsFrom("count(*)")} AS bits FROM embeddings
            |), e AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            |), fam AS (
            |  SELECT vec_id, v, min(vec_id) OVER (PARTITION BY v) AS gid
            |  FROM e
            |), reps AS (
            |  SELECT gid, v FROM fam WHERE vec_id = gid
            |), keys AS (
            |  SELECT gid, v, unnest(${duckHyperplaneKeysN("v", "p.bits")}) AS bk
            |  FROM reps CROSS JOIN p
            |), bounded AS (
            |  SELECT gid, v, bk FROM keys
            |  QUALIFY row_number() OVER (PARTITION BY bk
            |    ORDER BY ${embPriority("gid")}, gid) <= $MaxEmbBucket
            |), rp AS (
            |  SELECT ga, gb, cos FROM (
            |    SELECT DISTINCT a.gid AS ga, b.gid AS gb,
            |      ${duckCosine("a.v", "b.v")} AS cos
            |    FROM bounded a JOIN bounded b ON a.bk = b.bk AND a.gid < b.gid
            |  ) WHERE cos >= 0.4
            |)
            |SELECT least(x.vec_id, y.vec_id) AS va,
            |  greatest(x.vec_id, y.vec_id) AS vb,
            |  round(r.cos, 6) AS cos_sim
            |FROM rp r JOIN fam x ON r.ga = x.gid JOIN fam y ON r.gb = y.gid
            |UNION ALL
            |SELECT x.vec_id AS va, y.vec_id AS vb, CAST(1.0 AS DOUBLE) AS cos_sim
            |FROM fam x JOIN fam y ON x.gid = y.gid AND x.vec_id < y.vec_id
            |WHERE x.gid IN (SELECT gid FROM bounded)""".stripMargin)

  /** Iterative min-label connected components over an edge list
    * (columns a, b). Each round does TWO label moves:
    *
    *  1. propagate — every vertex takes the min of its own and its
    *     neighbors' labels (the Pregel step; alone it needs
    *     O(cluster diameter) rounds, which stalls on chain-shaped
    *     clusters);
    *  2. shortcut — every vertex then jumps to its label's label
    *     (classic Shiloach–Vishkin pointer doubling).
    *
    * The shortcut roughly doubles how far the component min has
    * traveled per round, so convergence is O(log diameter) — on a
    * 256-vertex path: 9 rounds instead of 255 (CurationSpec pins
    * this worst case). The invariant label(u) <= u (labels start as
    * the vertex id and only min-decrease) makes the jump safe, and a
    * combined-step fixpoint implies a propagate fixpoint, so the
    * stop condition is unchanged. All data-sized work is joins and
    * aggregates keyed on id/label; the only driver-side value per
    * round is the scalar changed-count, and localCheckpoint truncates
    * the iterative lineage (established dedup_clusters pattern). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // checkpoint the edge list BEFORE the symmetric union: both union
    // branches consume it, and an expensive edge generator (the
    // ngram-pair join for dedup_clusters) must run once, not once per
    // branch — physical exchange reuse only dedups up to the last
    // exchange, re-running everything above it
    val e = edges.select(col("a"), col("b")).localCheckpoint(true)
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    e.unpersist(false)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      val msgs = sym.join(labels, sym("a") === labels("id"))
        .select(sym("b").as("id"), labels("label"))
      val prop = labels.union(msgs)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(true) // consumed twice below (both jump sides)
      // the jump side is prop itself; checkpointing the aliased
      // projection gives it independent attribute ids, so the
      // self-join can't trip Catalyst's self-join/union rewrites
      val jump = prop.select(col("id").as("pid"), col("label").as("plabel"))
        .localCheckpoint(true)
      val next = prop
        .join(jump, col("label") === col("pid"), "left")
        .select(col("id"),
          coalesce(col("plabel"), col("label")).as("label"))
        .localCheckpoint(true)
      // localCheckpoint(true) is eager, so prop/jump are baked into
      // `next` already — release their storage blocks NOW: three
      // checkpoints per round left to GC starve execution memory for
      // every row that runs after this one in a whole-registry pass
      // (the established lingering-block pitfall at 10x data)
      prop.unpersist(false)
      jump.unpersist(false)
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.label") =!= col("o.label")).count()
      labels.unpersist(false) // superseded; `changed` is materialized
      labels = next
      done = changed == 0
      i += 1
    }
    sym.unpersist(false)
    labels
  }

  /** Duplicate CLUSTERS, not just pairs: connected components over the
    * exact-Jaccard duplicate-pair graph, labeling every involved doc
    * with the min doc_id of its transitive cluster — what a training
    * pipeline actually keeps/drops (one representative per cluster).
    * The oracle replays the same closure with a recursive CTE. */
  val dedupClusters: Q = Q(
    "dedup_clusters",
    (s, dir) => {
      // cluster labels distribute over exact-dup groups: the full
      // pair graph is the rep graph with each rep blown up into a
      // clique of its members, and cliques are connected — so the
      // full-graph component of a member IS its rep's component, and
      // the component min over docs IS the min over gids (gid = min
      // of its group). CC therefore runs on the REP graph (distinct
      // texts — the sf-independent small graph) and labels join back:
      // members of an edged rep take the rep's CC label; members of a
      // group with >= 2 eligible copies but no rep edge form their own
      // cluster labeled gid; everything else is in no pair and absent.
      val g = textGroups(s, dir)
      val m = groupMembers(g).select(col("doc_id"), col("gid"), col("gn"))
      val reps = groupReps(g)
      val edges = repPairStats(reps)
        .withColumn("jac", col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jac") >= 0.8)
        .select(col("ga").as("a"), col("gb").as("b"))
      val labels = connectedComponents(edges)
        .select(col("id").as("lgid"), col("label"))
      val elig = eligibleGids(reps).withColumn("has3", lit(true))
      m.join(labels, col("gid") === col("lgid"), "left")
        .join(elig, col("gid") === col("egid"), "left")
        .filter(col("label").isNotNull ||
          (col("gn") >= 2 && col("has3").isNotNull))
        .select(col("doc_id"),
          coalesce(col("label"), col("gid")).as("cluster_id"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $duckGroupCtes,
            |dup AS (
            |  SELECT ga, gb FROM rpairs
            |  JOIN cnt ca ON ga = ca.doc_id JOIN cnt cb ON gb = cb.doc_id
            |  WHERE inter*1.0 / (ca.n + cb.n - inter) >= 0.8
            |), edges AS (
            |  SELECT ga AS a, gb AS b FROM dup UNION SELECT gb AS a, ga AS b FROM dup
            |), reach(a, b) AS (
            |  SELECT a, b FROM (SELECT a, b FROM edges UNION SELECT a, a AS b FROM edges)
            |  UNION
            |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
            |), replab AS (
            |  SELECT a AS lgid, min(b) AS label FROM reach GROUP BY a
            |)
            |SELECT m.doc_id AS doc_id, coalesce(r.label, m.gid) AS cluster_id
            |FROM m LEFT JOIN replab r ON m.gid = r.lgid
            |LEFT JOIN elig e ON m.gid = e.egid
            |WHERE r.label IS NOT NULL OR (m.gn >= 2 AND e.egid IS NOT NULL)
            |ORDER BY doc_id""".stripMargin))

  /** MinHash estimator quality audit: for every true near-dup pair
    * (word-3-gram Jaccard >= 0.8), how far is the signature's
    * lane-agreement estimate from the exact Jaccard? The eval harness
    * that justifies trusting MinHash/LSH at scale — all arithmetic is
    * integer (agreeing lanes out of 64, floor-div percents), so no
    * float boundary exists. Candidates come from the same bounded
    * shingle-block join as dedup_ngram_jaccard; signatures are
    * re-attached to the (few) pairs only. */
  val dedupMinhashQuality: Q = Q(
    "dedup_minhash_quality",
    (s, dir) => {
      // rep form (see ngramPairs): identical texts have identical
      // shingle sets AND identical signatures, so every member pair's
      // (true_pct, est_pct, err_pct) equals its rep pair's — and an
      // intra-group pair is (100, 100, 0) by definition. Signatures
      // are computed on DISTINCT texts only, which is also how a
      // production pipeline materializes them.
      val g = textGroups(s, dir)
      val m = groupMembers(g).select(col("doc_id"), col("gid"))
      val reps = groupReps(g)
      val base = shingleArraysOf(reps)
      val sh = boundedBlocks(
        base.select(col("doc_id"), expr("size(hs)").as("n"),
          explode(col("hs")).as("sh")))
      val pairs = sh.as("a")
        .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("ga"), col("b.doc_id").as("gb"))
        .agg(count(lit(1)).as("inter"),
          min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
        .withColumn("true_pct",
          expr("inter * 100 div (na + nb - inter)"))
        .filter(col("true_pct") >= 80)
        .select("ga", "gb", "true_pct")
      val sig = base
        .withColumn("hashes", expr(shingleHashes("words")))
        .select(col("doc_id"), expr(minhashSig("hashes")).as("sig"))
      val repRows = pairs
        .join(sig.select(col("doc_id"), col("sig").as("siga")), col("ga") === col("doc_id"))
        .drop("doc_id")
        .join(sig.select(col("doc_id"), col("sig").as("sigb")), col("gb") === col("doc_id"))
        .withColumn("agree_lanes", expr(
          "aggregate(zip_with(siga, sigb, (x, y) -> CASE WHEN x = y THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .select(col("ga"), col("gb"), col("true_pct"),
          expr("agree_lanes * 100 div 64").as("est_pct"),
          expr("abs(agree_lanes * 100 div 64 - true_pct)").as("err_pct"))
      val cross = repRows
        .join(m.as("x"), col("ga") === col("x.gid"))
        .join(m.as("y"), col("gb") === col("y.gid"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("da"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("db"),
          col("true_pct"), col("est_pct"), col("err_pct"))
      val intra = m.as("x")
        .join(m.as("y"),
          col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id"))
        .join(eligibleGids(reps), col("x.gid") === col("egid"), "left_semi")
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
          lit(100L).as("true_pct"), lit(100L).as("est_pct"),
          lit(0L).as("err_pct"))
      cross.unionByName(intra).orderBy("da", "db")
    },
    Some(s"""WITH $duckGroupCtes,
            |tp AS (
            |  SELECT ga, gb, inter * 100 // (ca.n + cb.n - inter) AS true_pct
            |  FROM rpairs
            |  JOIN cnt ca ON ga = ca.doc_id
            |  JOIN cnt cb ON gb = cb.doc_id
            |  WHERE inter * 100 // (ca.n + cb.n - inter) >= 80
            |), hsx AS (
            |  SELECT doc_id, ${duckShingleHashes(duckShingles3("words"))} AS hashes
            |  FROM w WHERE len(words) >= 3
            |), sig AS (
            |  SELECT doc_id, ${duckMinhashSig("hashes")} AS sig FROM hsx
            |), est AS (
            |  SELECT ga, gb, true_pct,
            |    CAST(list_sum(list_transform(range(1, 65),
            |      i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS BIGINT) AS agree_lanes
            |  FROM tp
            |  JOIN sig sa ON ga = sa.doc_id
            |  JOIN sig sb ON gb = sb.doc_id
            |), reprows AS (
            |  SELECT ga, gb, true_pct,
            |    agree_lanes * 100 // 64 AS est_pct,
            |    abs(agree_lanes * 100 // 64 - true_pct) AS err_pct
            |  FROM est
            |)
            |SELECT least(x.doc_id, y.doc_id) AS da,
            |  greatest(x.doc_id, y.doc_id) AS db, true_pct, est_pct, err_pct
            |FROM reprows JOIN m x ON x.gid = ga JOIN m y ON y.gid = gb
            |UNION ALL
            |SELECT x.doc_id AS da, y.doc_id AS db, CAST(100 AS BIGINT),
            |  CAST(100 AS BIGINT), CAST(0 AS BIGINT)
            |FROM m x JOIN m y ON x.gid = y.gid AND x.doc_id < y.doc_id
            |JOIN elig ON x.gid = egid
            |ORDER BY da, db""".stripMargin))

  val all: Seq[Q] = Seq(dedupExact, dedupExactNorm, dedupNgramJaccard,
    dedupContainment, dedupSpans, dedupSpansCut, dedupMinhash,
    dedupMinhashLsh, dedupSimhash, dedupEmbedding, dedupClusters,
    dedupMinhashQuality)
}
