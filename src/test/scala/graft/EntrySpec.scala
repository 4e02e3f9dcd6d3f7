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

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
