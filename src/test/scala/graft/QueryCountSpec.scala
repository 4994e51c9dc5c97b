package graft

import org.scalatest.funsuite.AnyFunSuite

/** Query-count anti-drift (round-5 verdict item 3: the README's count went
  * stale twice). The literal below matches README.md — update BOTH when a
  * query is added, or this fails the build. */
class QueryCountSpec extends AnyFunSuite {

  test("every declared query has an oracle, and the README count is exact") {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    assert(q.keySet == o.keySet,
      s"query/oracle drift: only-query=${q.keySet -- o.keySet}, only-oracle=${o.keySet -- q.keySet}")
    assert(q.size == 221, s"README.md says 221 oracle queries; code declares ${q.size}")
  }
}
