package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._

/** Curation operators: connected-component clustering semantics,
  * contamination detection, and deterministic sampling invariants. */
class CurationSpec extends SparkSpec {

  test("connectedComponents: chains merge transitively, min label wins") {
    import spark.implicits._
    // components: {1,2,3,4} via a chain, {10,11}, and 20-21-22 star
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (21L, 20L), (21L, 22L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents: a 256-vertex path converges in O(log n) rounds") {
    import spark.implicits._
    // the adversarial shape for plain label propagation: a chain needs
    // O(n) propagate-only rounds (the min travels one hop per round),
    // so capping at 12 rounds FAILS without the pointer-jumping
    // shortcut — and passes with it (doubling reach: ~9 rounds for 255
    // hops). This is the worst case the operator doc claims to handle.
    val n = 256L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, maxIter = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n)
    assert(got.forall(_._2 == 1L),
      s"chain not fully labeled in 12 rounds: ${got.filter(_._2 != 1L).take(5).toSeq}")
  }

  test("dedup_clusters labels every endpoint of every duplicate pair consistently") {
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // every cluster label is the min member of its cluster
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
    }
  }

  test("contamination flags the planted near-duplicates of benchmark docs") {
    val hits = SparkEntry.queries("text_contamination")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.nonEmpty)
    // flagged docs are non-benchmark, matched against benchmark ids,
    // with a real overlap
    hits.foreach { case (doc, bench, n) =>
      assert(doc % 20 != 0 && bench % 20 == 0 && n >= 5)
    }
  }

  test("fuzzy contamination: estimates bounded, split respected, exact copies always caught") {
    val hits = SparkEntry.queries("contam_fuzzy")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // flagged docs are corpus-side, matched against benchmark ids, at
    // or above the 0.5 operating point (MinHash estimates are k/64)
    hits.foreach { case (doc, bench, est) =>
      assert(doc % 20 != 0 && bench % 20 == 0)
      assert(est >= 0.5 && est <= 1.0)
    }
    // every exact corpus/bench text copy must be flagged at exactly 1.0
    // (the intra path needs no band collision — identical text IS
    // contamination, and a fuzzy pass that missed it would be broken)
    val docs = graft.sources.Tables(spark, sfDir).documents
    val exact = docs.as("c").join(docs.as("b"),
        col("c.text") === col("b.text") &&
          col("c.doc_id") % 20 =!= 0 && col("b.doc_id") % 20 === 0)
      .filter(expr("size(filter(split(c.text, ' '), w -> w <> '')) >= 3"))
      .select(col("c.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = hits.map(h => (h._1, h._2)).toSet
    assert(exact.subsetOf(got))
    exact.foreach { p =>
      assert(hits.find(h => (h._1, h._2) == p).get._3 == 1.0)
    }
  }

  test("pipeline_curate composes its stages consistently") {
    val curated = SparkEntry.queries("pipeline_curate")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(curated.nonEmpty)
    val curatedIds = curated.map(_._1).toSet

    // subset of the standalone stratified sample (same sampling hash)
    val sampled = SparkEntry.queries("sample_stratified")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(curated.toSet.subsetOf(sampled.toSet))

    // no benchmark docs and no contaminated docs survive
    val contaminated = SparkEntry.queries("text_contamination")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curatedIds.forall(_ % 20 != 0))
    assert(curatedIds.intersect(contaminated).isEmpty)

    // content dedup happened: curated docs have distinct normalized
    // fingerprints
    val fps = graft.sources.Tables(spark, sfDir).documents
      .filter(col("doc_id").isin(curatedIds.toSeq.map(Long.box): _*))
      .select(expr(graft.functions.Portable.fp60(
        graft.functions.Portable.normText("text"))).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps.length == fps.distinct.length)
  }

  test("stratified sample is deterministic and respects per-language rates") {
    val once = SparkEntry.queries("sample_stratified")(spark, sfDir)
      .collect().map(_.toSeq)
    val twice = SparkEntry.queries("sample_stratified")(spark, sfDir)
      .collect().map(_.toSeq)
    assert(once.toSeq == twice.toSeq, "sampling must be a pure function of the row")

    val total = graft.sources.Tables(spark, sfDir).documents
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = SparkEntry.queries("sample_stratified")(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en targets 10%, others 50% — allow generous sampling noise at
    // sf0.001 corpus sizes
    val enRate = sampled("en").toDouble / total("en")
    assert(enRate > 0.02 && enRate < 0.25, s"en rate $enRate")
    (sampled.keySet - "en").foreach { l =>
      val r = sampled(l).toDouble / total(l)
      assert(r > 0.3 && r < 0.7, s"$l rate $r")
    }
    // all three splits appear, and nothing else
    val splits = SparkEntry.queries("sample_stratified")(spark, sfDir)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
  }

  test("temperature mixing sits between natural and fully-flattened sampling") {
    val rows = graft.operators.Curation.sampleTemperature.run(spark, sfDir)
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))) // n_before, permille, n_after
    assert(rows.nonEmpty)
    val minBefore = rows.map(_._1).min
    rows.foreach { case (before, permille, after) =>
      assert(permille >= 1 && permille <= 1000)
      assert(after <= before)
      // the smallest stratum is never sampled down at all
      if (before == minBefore) assert(permille == 1000L && after == before)
    }
    // keep-rate falls as the stratum grows (α = 1/2 damping), so the
    // permille sequence is monotone non-increasing in n_before
    rows.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"permille must fall with size: $a -> $b")
      case _ => ()
    }
  }
}
