package graft.runner

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Registry hygiene: every `SparkEntry.queries` entry is either
  * oracle-checked (a key in `oracleSql`) or EXPLICITLY declared
  * rows-only — never silently downgraded to the driver's weaker
  * rows-only check by simply lacking an oracle. Also pins that the
  * two sets don't overlap and that no oracle or declaration points at
  * a nonexistent query (catches renames). */
class RegistryConsistencySpec extends AnyFunSuite {

  test("every query is oracle-checked or explicitly rows-only; no strays") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val rowsOnly = SparkEntry.rowsOnlyByContract

    val undeclared = queries -- oracles -- rowsOnly
    assert(undeclared.isEmpty,
      "queries with NO oracle and NO rows-only declaration (the driver " +
        s"would silently weaken their check): ${undeclared.toSeq.sorted.mkString(", ")}")

    val both = oracles intersect rowsOnly
    assert(both.isEmpty,
      s"declared rows-only but an oracle exists — promote or undeclare: ${both.toSeq.sorted.mkString(", ")}")

    val strayOracles = oracles -- queries
    assert(strayOracles.isEmpty,
      s"oracles for nonexistent queries (rename drift): ${strayOracles.toSeq.sorted.mkString(", ")}")

    val strayDecls = rowsOnly -- queries
    assert(strayDecls.isEmpty,
      s"rows-only declarations for nonexistent queries: ${strayDecls.toSeq.sorted.mkString(", ")}")
  }
}
