package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-vs-registry drift guard (r10 verdict "What's wrong" #2):
  * `QueryDefs.benchNames` is a hand-maintained subset of the query
  * registry, and nothing used to force a DECISION when a new gate
  * entry landed — round 10 added 28 entries and silently benched 12.
  * This spec makes the cap explicit: every registered lane must either
  * be benched or appear in [[QueryDefs.benchExcluded]] with a reason,
  * and both lists must stay free of stale/duplicate names.
  */
class BenchRegistrySpec extends AnyFunSuite {

  test("every registered lane has an explicit bench decision") {
    val registry = SparkEntry.queries.keySet
    val undecided = registry -- QueryDefs.benchNames --
      QueryDefs.benchExcluded.keySet
    assert(undecided.isEmpty,
      s"lanes with no bench decision (add to benchNames or " +
        s"benchExcluded with a reason): ${undecided.toSeq.sorted}")
  }

  test("benchNames only contains registered lanes, no duplicates") {
    val registry = SparkEntry.queries.keySet
    val stale = QueryDefs.benchNames.filterNot(registry)
    assert(stale.isEmpty, s"benched lanes missing from registry: $stale")
    val dups = QueryDefs.benchNames.groupBy(identity)
      .collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate bench lanes: $dups")
  }

  test("benchExcluded only contains registered, un-benched lanes") {
    val registry = SparkEntry.queries.keySet
    val stale = QueryDefs.benchExcluded.keySet.filterNot(registry)
    assert(stale.isEmpty,
      s"stale exclusion rows (not in registry): ${stale.toSeq.sorted}")
    val both = QueryDefs.benchExcluded.keySet &
      QueryDefs.benchNames.toSet
    assert(both.isEmpty,
      s"lanes both benched and excluded: ${both.toSeq.sorted}")
  }
}
