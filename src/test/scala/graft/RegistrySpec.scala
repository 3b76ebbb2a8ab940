package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract registry invariants.
  *
  * The `null/` check is a regression guard for a real bug class: oracle
  * SQL strings interpolate shared path vals, and a val initializing
  * before its dependency (trait-linearization order after the
  * RasterQueries family split) silently bakes a `null/` glob path into
  * the SQL — every affected oracle then fails at compare time, far from
  * the cause. Catch it at test time instead.
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle entry has a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("no oracle SQL captured a null path interpolation") {
    val bad = SparkEntry.oracleSql.collect {
      case (k, v) if v == null => s"$k: null SQL"
      case (k, v) if v.contains("null/") => s"$k: contains 'null/' path"
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("query and oracle names are well-formed and distinct") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.forall(_.matches("[a-z0-9_]+")),
      names.filterNot(_.matches("[a-z0-9_]+")).mkString(","))
    assert(names.distinct.size == names.size)
  }
}
