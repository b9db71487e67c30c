package graft

import org.scalatest.funsuite.AnyFunSuite

/** Battery-wide contracts over the query/oracle registry — pure string
  * checks, no Spark session. */
class QueriesContractSpec extends AnyFunSuite {

  test("every oracle entry names a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("no oracle SQL contains an interpolated-null artifact") {
    // Scala object vals initialize in declaration order: an s-string
    // that references a fragment val declared LATER in the file quietly
    // interpolates the literal "null" instead of failing — the oracle
    // then runs, types NULL columns, and hash-mismatches at gate time
    // (this bit similarity_matryoshka's first draft). Battery SQL spells
    // SQL NULL uppercase, so a lowercase bare `null` token is always the
    // init-order signature.
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql) if "(?<![A-Za-z0-9_])null(?![A-Za-z0-9_])".r
        .findFirstIn(sql).isDefined => name
    }
    assert(bad.isEmpty,
      s"oracles with a lowercase bare 'null' (fragment declared after use?): $bad")
  }

  test("benchmark names are registered queries") {
    val qs = SparkEntry.queries.keySet
    val missing = Queries.benchNames.filterNot(qs)
    assert(missing.isEmpty, s"bench names without queries: $missing")
  }
}
