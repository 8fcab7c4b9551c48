package graft

import graft.ops.Registry
import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: a throwing or key-colliding query
  * can never again reach the driver unnoticed (round-1 lesson: two
  * crashed queries silently vanished from CORRECTNESS_r01). */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("no duplicate query keys (map collision would drop a declared query)") {
    assert(Registry.duplicateKeys.isEmpty,
      s"duplicate keys: ${Registry.duplicateKeys.mkString(", ")}")
  }

  test("every oracle key has a query") {
    val qk = Registry.queries.keySet
    val orphans = Registry.oracleSql.keySet.diff(qk)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry() is non-empty (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes on sf0.001") {
    val failures = Registry.all.flatMap { op =>
      try { op.build(spark, TestSpark.sfSmoke).count(); None }
      catch { case e: Throwable => Some(s"${op.key}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("nearly all queries are non-empty on sf0.001") {
    // join_outer-style queries may legitimately produce few rows at the
    // smallest sf; require the overwhelming majority non-empty so a
    // broken filter shows up.
    val counts = Registry.all.map(op =>
      op.key -> (try op.build(spark, TestSpark.sfSmoke).count() catch { case _: Throwable => -1L }))
    val empty = counts.filter(_._2 <= 0).map(_._1)
    assert(empty.size <= 3, s"unexpectedly empty queries: ${empty.mkString(", ")}")
  }
}
