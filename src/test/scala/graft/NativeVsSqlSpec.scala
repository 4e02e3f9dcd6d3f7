package graft

import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-identity of the native expressions against the pure-SQL
  * higher-order-function formulations they replaced. The DuckDB oracle
  * gate proves value-identity on the (ASCII) corpus; this spec pins it
  * on adversarial inputs — unicode, empty strings, short word lists —
  * so a future native-loop edit can't silently fork the semantics. */
class NativeVsSqlSpec extends AnyFunSuite with SparkSpec {

  import Portable.{P1, P2, TWO30}

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",
    "",
    "naïve café über straße",            // multi-byte code points
    "汉字 漢字 かな mixed ascii too",      // CJK
    "x " * 200 + "y"                      // long, repetitive
  )

  private def df = {
    graft.functions.Native.install(spark)
    import spark.implicits._
    samples.toDF("s").withColumn("words", expr(Portable.words("s")))
  }

  test("graft_char_hash == SQL fold (split + ascii + aggregate)") {
    for ((mult, p) <- Seq((31, P1), (37, P2))) {
      val sqlFold =
        s"aggregate(filter(split(s, ''), c -> c <> ''), CAST(0 AS BIGINT), (acc, c) -> (acc * $mult + ascii(c)) % $p)"
      val rows = df.select(
        expr(s"graft_char_hash(s, $mult, $p)"), expr(sqlFold)).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"mult=$mult"))
    }
  }

  test("graft_shingle_hashes(60) == charHash over materialized shingle strings") {
    val sh = Portable.shingles3("words")
    val narrow =
      s"transform($sh, g -> aggregate(filter(split(g, ''), c -> c <> ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + ascii(c)) % $P1))"
    val wide =
      s"transform($sh, g -> aggregate(filter(split(g, ''), c -> c <> ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + ascii(c)) % $P1) * $TWO30 + " +
        s"aggregate(filter(split(g, ''), c -> c <> ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 37 + ascii(c)) % $P2))"
    val rows = df.select(
      expr("graft_shingle_hashes(words)"), expr(narrow),
      expr("graft_shingle_hashes60(words)"), expr(wide)).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("graft_window_hashes60 == fp60 over materialized w-word window strings") {
    // w=8 (the dedup_spans setting) and w=2 (the smallest legal window)
    for (w <- Seq(2, 8)) {
      val spans =
        s"CASE WHEN size(words) < $w THEN array() " +
          s"ELSE transform(sequence(1, size(words) - ${w - 1}), i -> concat_ws(' ', slice(words, i, $w))) END"
      val viaSql =
        s"transform($spans, g -> aggregate(filter(split(g, ''), c -> c <> ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + ascii(c)) % $P1) * $TWO30 + " +
          s"aggregate(filter(split(g, ''), c -> c <> ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 37 + ascii(c)) % $P2))"
      val rows = df.select(
        expr(s"graft_window_hashes60(words, $w)"), expr(viaSql)).collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"w=$w"))
    }
  }

  test("graft_minhash_sig == SQL per-permutation array_min") {
    val sqlSig =
      s"transform(sequence(0, 63), i -> array_min(transform(hs, h -> ((2*i+5)*h + (i*i+13)) % $P2)))"
    val rows = df.filter(expr("size(words) >= 3"))
      .withColumn("hs", expr("graft_shingle_hashes(words)"))
      .select(expr("graft_minhash_sig(hs)"), expr(sqlSig)).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("graft_simhash60 == SQL bit-vote fold") {
    val sqlFp =
      "aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, j) -> acc + IF(" +
        "aggregate(hs, 0, (a, h) -> a + IF((h div shiftleft(CAST(1 AS BIGINT), j)) % 2 = 1, 1, -1)) > 0, " +
        "shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))"
    val rows = df.filter(expr("size(words) >= 3"))
      .withColumn("hs", expr("graft_shingle_hashes60(words)"))
      .select(expr("graft_simhash60(hs)"), expr(sqlFp)).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("GraftExtensions injects the graft_* functions at session build time") {
    // the spark-submit path: --conf spark.sql.extensions=graft.GraftExtensions.
    // Function registries are session-scoped, so a session built THROUGH
    // the extension must resolve graft_* without Tables' lazy install.
    import org.apache.spark.sql.SparkSession
    val old = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate() // reuses the JVM's SparkContext, new session state
      val v = s2.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
        .collect()(0).getDouble(0)
      assert(v == 11.0)
    } finally old.foreach { o =>
      SparkSession.setDefaultSession(o)
      SparkSession.setActiveSession(o)
    }
  }

  test("graft_int8_quantize == SQL HOF formulation on real vectors") {
    val e = graft.sources.Tables(spark, sfDir).embeddings.limit(20)
      .withColumn("v", expr(Portable.toDouble("embedding")))
      .withColumn("maxabs",
        expr("aggregate(v, CAST(1e-12 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"))
      .withColumn("codes",
        expr("transform(v, x -> CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT))"))
    val rows = e.select(
      expr("graft_int8_quantize(v)").as("q"),
      col("maxabs"),
      expr(Portable.sigDigest("transform(codes, c -> c + 127)")).as("dig"),
      expr("aggregate(zip_with(v, codes, (x, c) -> abs(x - c * maxabs / 127.0)), CAST(0 AS DOUBLE), (a, y) -> greatest(a, y))").as("err"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getStruct(0)
      // exact equality IS the contract: same arithmetic, same order
      assert(q.getDouble(0) == r.getDouble(1))
      assert(q.getLong(1) == r.getLong(2))
      assert(q.getDouble(2) == r.getDouble(3))
    }
  }

  test("graft_int8_codes == SQL HOF formulation on real vectors") {
    val e = graft.sources.Tables(spark, sfDir).embeddings.limit(20)
      .withColumn("v", expr(Portable.toDouble("embedding")))
      .withColumn("maxabs",
        expr("aggregate(v, CAST(1e-12 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"))
      .withColumn("codes",
        expr("transform(v, x -> CAST(CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT) AS DOUBLE))"))
    val rows = e.select(expr("graft_int8_codes(v)").as("q"),
        col("maxabs"), col("codes"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getStruct(0)
      assert(q.getDouble(0) == r.getDouble(1))
      assert(q.getSeq[Double](1) == r.getSeq[Double](2))
    }
  }

  test("graft_jl_project == SQL HOF formulation on real vectors") {
    // the HOF form is ~1024 interpreted expression evals per row — the
    // reason the native loop exists — but it IS the semantics; any
    // native-loop edit that forks the signs or the fold dies here
    val e = graft.sources.Tables(spark, sfDir).embeddings.limit(20)
      .withColumn("codes", expr(
        s"transform(graft_int8_codes(${Portable.toDouble("embedding")}).codes, x -> CAST(x AS BIGINT))"))
    val rows = e.select(
        expr(s"graft_jl_project(graft_int8_codes(${Portable.toDouble("embedding")}).codes)"),
        expr(graft.operators.Ann.jlProjectSql))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("graft_dot and graft_hyperplane_keys == SQL folds on real vectors") {
    val e = graft.sources.Tables(spark, sfDir).embeddings.limit(20)
      .withColumn("v", expr(Portable.toDouble("embedding")))
    val sqlDot =
      "aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, w) -> acc + w)"
    val sqlKeys =
      "transform(sequence(0, 3), t -> t*64 + aggregate(sequence(0, 5), CAST(0 AS BIGINT), (acc, j) -> acc*2 + " +
        "IF(aggregate(sequence(0, 63), CAST(0 AS DOUBLE), (a, d) -> a + element_at(v, d+1) * " +
        "(((1103515245 * CAST((t*8+j)*64+d AS BIGINT) + 12345) % 2147483648) / 2147483648.0 - 0.5)) >= 0, 1, 0)))"
    val rows = e.select(expr("graft_dot(v, v)"), expr(sqlDot),
      expr("graft_hyperplane_keys(v)"), expr(sqlKeys)).collect()
    rows.foreach { r =>
      // exact double equality IS the contract (same fold order)
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("graft_hyperplane_keys_n == SQL fold at several bit widths") {
    val e = graft.sources.Tables(spark, sfDir).embeddings.limit(20)
      .withColumn("v", expr(Portable.toDouble("embedding")))
    Seq(6, 9, 12).foreach { bits =>
      // the corpus-scaled plane indexing: (t*32 + j) slots, key offset
      // t * 2^bits — mirrors Native.HyperplaneKeysN and the DuckDB twin
      val sqlKeys =
        s"transform(sequence(0, 3), t -> t*${1L << bits} + aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, j) -> acc*2 + " +
          "IF(aggregate(sequence(0, 63), CAST(0 AS DOUBLE), (a, d) -> a + element_at(v, d+1) * " +
          "(((1103515245 * CAST((t*32+j)*64+d AS BIGINT) + 12345) % 2147483648) / 2147483648.0 - 0.5)) >= 0, 1, 0)))"
      val rows = e.select(
        expr(s"graft_hyperplane_keys_n(v, $bits)"), expr(sqlKeys)).collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    }
  }

  test("corpus-scaled blocking parameters: integer formulas at the documented breakpoints") {
    import graft.operators.{Ann, Dedup}
    // bits floors at 6 through the verify/bench SFs, then grows with
    // ceil(log2 N) - 6; k floors at 16, then ceil(N/128) — the same
    // values the oracles' params CTEs compute in SQL
    assert(Seq(1L, 500L, 2000L, 4096L).map(Dedup.embBits) == Seq(6, 6, 6, 6))
    assert(Dedup.embBits(20000L) == 9)
    assert(Dedup.embBits(60000L) == 10)
    assert(Dedup.embBits(200000L) == 12)
    // exact power boundary: N = 2^18 -> ceilLog2 = 18 -> 12
    assert(Dedup.embBits(262144L) == 12 && Dedup.embBits(262145L) == 13)
    assert(Seq(1L, 500L, 2000L, 2048L).map(Ann.kmeansK) == Seq(16, 16, 16, 16))
    assert(Ann.kmeansK(20000L) == 157)
    assert(Ann.kmeansK(60000L) == 469)
    assert(Ann.kmeansK(200000L) == 1563)
  }

  test("graft_argmax ≡ max_by(id, struct(score, -id)) incl. exact ties; plans as codegen HashAggregate") {
    import spark.implicits._
    // adversarial stream: duplicate scores (tie → smaller id must win),
    // negative scores, a negated-long argmin shape, singleton and
    // thousand-member groups, ids out of order
    val rows = (0 until 50000).map { i =>
      val g = i % 997                       // ~50 members per group
      val id = ((i * 2654435761L) % 10007L) // scrambled ids
      val score = ((i * 40503L) % 101L).toDouble / 7.0 - 7.0 // many exact ties
      (g, id, score)
    } ++ Seq((99999, 1L, 1.0), (99999, 0L, 1.0)) // pinned exact tie
    val df = rows.toDF("g", "id", "score")
    val native = df.groupBy("g")
      .agg(expr("graft_argmax(id, score)").as("a"),
        expr("graft_argmax(id, -score)").as("amin"))
    val oracle = df.groupBy("g")
      .agg(max_by(col("id"), struct(col("score"), -col("id"))).as("a"),
        max_by(col("id"), struct(-col("score"), -col("id"))).as("amin"))
    val n = native.collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val o = oracle.collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(n == o)
    assert(n(99999)._1 == 0L) // tie resolved to the smaller id
    // the whole point: the argmax aggregate must be a HashAggregate
    // inside whole-stage codegen, never ObjectHashAggregate's
    // interpreted sort-based fallback
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }
}
