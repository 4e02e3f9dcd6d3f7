package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract: unique query keys, oracles only for registered
  * queries, and a non-empty flagship result. */
class EntrySpec extends AnyFunSuite with SparkSpec {

  test("registry keys are unique (a duplicate would silently shadow a query)") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }.toSeq)
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle belongs to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every registered query carries a DuckDB oracle (no rows-only checks)") {
    // the driver downgrades oracle-less rows to a weaker rows>0 check;
    // the registry's standing claim is that EVERY row is hash-verified
    // against an independent engine — a new row without an oracle
    // should fail here, not silently weaken the gate
    val missing = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"rows without oracles: $missing")
  }

  test("oracle strings interpolate the real cap values, never init-order zeros") {
    // a Scala val referenced from an EARLIER val's initializer is
    // still 0 while the object initializes; an oracle string built
    // then silently caps at `<= 0` and returns nothing (bit us once:
    // dedup_simhash's bucket cap). The Spark closures read the val
    // lazily and were right — only the eager strings can rot.
    val caps = Map(
      "dedup_simhash" -> "<= 512", "dedup_embedding" -> "<= 512",
      "dedup_semantic" -> "<= 512", "dedup_blocking_recall" -> "<= 512",
      "dedup_minhash_lsh" -> "AND 1000", "dedup_ngram_jaccard" -> "AND 1000",
      "text_contamination" -> "AND 1000", "pipeline_curate" -> "AND 1000")
    for ((q, frag) <- caps)
      assert(SparkEntry.oracleSql(q).contains(frag), s"$q lost its cap")
    // every QUALIFY/HAVING-style cap comparison must carry a nonzero
    // bound (plain-value comparisons like `c_acctbal <= 0` are fine)
    val zeroedCap = "(?:doc_id|vec_id)\\) (?:<=|BETWEEN 2 AND) 0(?![0-9.])".r
    for ((q, sql) <- SparkEntry.oracleSql)
      assert(zeroedCap.findFirstIn(sql).isEmpty,
        s"$q interpolated a zeroed cap")
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
