package graft.queries

import graft.SparkSpec

/** Every registered query must run end-to-end at sf0.001. Queries whose
  * legitimate result can be empty at tiny scale are listed in
  * `mayBeEmpty`; everything else must return rows.
  */
class QueriesSpec extends SparkSpec {

  private val mayBeEmpty = Set("q08_anti_join")

  Registry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.run(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
      else assert(n >= 0)
    }
  }

  test("registry names are unique and SparkEntry maps derive from it") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(graft.SparkEntry.queries.keySet == names.toSet)
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }

  test("flagship entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
