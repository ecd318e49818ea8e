package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every catalog query must run on sf0.001 and produce rows; results must
  * be deterministic across two runs (total ordering discipline).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = Tables.session(8)
  val dir = "/root/testdata/sf0.001"

  SparkEntry.catalog.foreach { case (name, q) =>
    test(s"$name runs, returns rows, and is deterministic") {
      val a = q.fn(spark, dir)
      val rows = a.collect()
      assert(rows.nonEmpty, s"$name returned no rows")
      val b = q.fn(spark, dir).collect()
      assert(rows.sameElements(b), s"$name not deterministic")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries and every query has a name-safe key") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    qk.foreach(k => assert(k.matches("[a-z0-9_]+"), s"bad key $k"))
  }

  test("rows-only queries are exactly the known RNG/hash-internal set") {
    // guard: adding a query without an oracle (or dropping one) must be a
    // conscious decision — these are the ops whose internals (seeded fits,
    // signature hashes) make a cross-engine SQL oracle impossible; each is
    // pinned by specs instead
    val rowsOnly = SparkEntry.catalog.collect {
      case (n, q) if q.oracle.isEmpty => n
    }.toSet
    // q53/q54/q55 were moved to the oracled set in round 3, q57/q62 in
    // round 4, and q44/q46/q33/q34 in round 5 (recall/containment
    // contract rows against exact tiers on oracle-enumerable slices):
    // every catalog query now carries DuckDB-checkable output; the
    // RNG/seeded-hash internals remain spec-pinned (DedupSpec exhaustive
    // oracles, SessionIvfSpec neighbor pins).
    val known = Set.empty[String]
    assert(rowsOnly == known,
      s"unexpected rows-only queries: ${(rowsOnly -- known) ++ (known -- rowsOnly)}")
  }
}
