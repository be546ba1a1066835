package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Contract guards for the driver interface. */
class SparkEntrySpec extends AnyFunSuite {

  private val modules: Seq[QueryModule] =
    Seq(Relational, TraceOps, DomainModels, TextOps, VectorOps, ScaleOps,
      Extensions, PortableHashOps, ClassicQueries)

  test("no duplicate query keys across modules (a collision would " +
    "silently drop an operator from the gate)") {
    val all = modules.flatMap(_.all.map(_.name))
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a query") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
  }

  test("oracle SQL strings are DuckDB-parseable shapes (no stray quotes)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.count(_ == '\'') % 2 == 0, s"$name has unbalanced quotes")
      assert(sql.trim.toUpperCase.startsWith("SELECT") ||
        sql.trim.toUpperCase.startsWith("WITH"), s"$name: not a query")
    }
  }
}
