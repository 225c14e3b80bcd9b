package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-consistency guards: `SparkEntry` merges the group maps
  * with `flatMap(...).toMap`, which would SILENTLY drop a key defined
  * in two groups (one wins), and an oracle entry whose key doesn't
  * exist in `queries` would silently never be checked by the driver.
  * Both must be loud.
  */
class RegistrySpec extends AnyFunSuite with SparkTestBase {

  test("no query key is defined by two groups (toMap would silently " +
      "keep one)") {
    val all = SparkEntry.groups.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate keys across groups: $dups")
  }

  test("no oracle entry is defined by two groups") {
    val all = SparkEntry.groups.flatMap(_.oracles.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate oracle keys across groups: $dups")
  }

  test("every oracle key has a matching query key (an orphan oracle " +
      "is never checked by the driver)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("key names are lower_snake (the driver's artifact conventions)") {
    val bad = SparkEntry.queries.keys.filterNot(
      _.matches("[a-z][a-z0-9_]*")).toSeq
    assert(bad.isEmpty, s"non-conforming key names: $bad")
  }

  test("flagship entry returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
