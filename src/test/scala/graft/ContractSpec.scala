package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that no individual query spec would catch:
  * the four query modules merge with `++`, which silently OVERRIDES
  * duplicate keys — a name reused across modules would drop a query from
  * the gate with no error anywhere. Same for oracle keys, and an oracle
  * entry without a matching query would surface only as a driver-side
  * "no spark output" failure. */
class ContractSpec extends AnyFunSuite {

  test("query names are pairwise disjoint across modules (no silent shadowing)") {
    val groups = SparkEntry.queryGroups.toSeq
    for {
      (na, a) <- groups
      (nb, b) <- groups if na < nb
    } {
      val overlap = a.intersect(b)
      assert(overlap.isEmpty, s"modules $na and $nb both define: ${overlap.mkString(", ")}")
    }
    assert(SparkEntry.queries.size == groups.map(_._2.size).sum)
  }

  test("oracle names are pairwise disjoint and every oracle has a query") {
    val groups = SparkEntry.oracleGroups.toSeq
    for {
      (na, a) <- groups
      (nb, b) <- groups if na < nb
    } {
      val overlap = a.intersect(b)
      assert(overlap.isEmpty, s"modules $na and $nb both define oracle: ${overlap.mkString(", ")}")
    }
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: ${dangling.mkString(", ")}")
  }

  test("the gate is fully hash-verified: every query carries an oracle") {
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty,
      s"rows-only queries reintroduced (round-9 closed this class): ${unchecked.mkString(", ")}")
  }
}
