package graft.suite

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: SparkEntry.queries folds Registry.all into a
  * last-wins ListMap, so a duplicate key silently UNREGISTERS the
  * earlier query — no verify, no bench, no failure anywhere. It
  * happened once (two `agg_retention_cohorts` definitions; the round-5
  * daily triangle vanished for a round). Registry.all now asserts
  * uniqueness at build time; this spec pins that contract plus the
  * queries/oracle key alignment.
  */
class RegistrySpec extends AnyFunSuite {

  test("registry keys are unique (duplicate keys silently drop queries)") {
    val names = Registry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate registry keys: ${dups.mkString(", ")}")
    // the ListMap the driver consumes must be exactly the registry
    assert(graft.SparkEntry.queries.size == names.size)
  }

  test("every oracle key names a registered query") {
    val qs = graft.SparkEntry.queries.keySet
    val orphans = graft.SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("both retention forms are registered (the collision regression)") {
    val qs = graft.SparkEntry.queries.keySet
    assert(qs.contains("agg_retention_cohorts")) // daily triangle
    assert(qs.contains("agg_retention_weekly"))  // weekly matrix
  }
}
