package graft
import org.scalatest.funsuite.AnyFunSuite
class CountCheckSpec extends AnyFunSuite {
  test("every oracle key has a query; counts as documented") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o diff q}")
    println(s"[counts] queries=${q.size} oracles=${o.size}")
    assert(q.size >= 49 && o.size >= 39)
  }
}
