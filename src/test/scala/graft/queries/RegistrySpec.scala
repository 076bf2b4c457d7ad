package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene at 124+ queries (VERDICT r11 #8): the registry is
  * the single source of truth for the verified surface, so its
  * invariants — unique names, an oracle per query, and agreement with
  * the driver's CORRECTNESS artifacts — are pinned here. The r9
  * failure mode this exists for: a driver-side harness change silently
  * DROPPING previously-verified queries from the correctness run; that
  * now surfaces as one labeled failure instead of a quietly-shrunk
  * round file.
  */
class RegistrySpec extends AnyFunSuite {

  private val all = Registry.all

  test("registry names are unique and keyed consistently") {
    val names = all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct).distinct}")
    // the bench stdout line shortens names to their first-'_' prefix;
    // that shortening must stay collision-free or keys go ambiguous
    val shorts = names.map(_.takeWhile(_ != '_'))
    assert(shorts.distinct.size == shorts.size,
      s"short-key collision: ${shorts.diff(shorts.distinct).distinct}")
  }

  test("every registered query carries a DuckDB oracle") {
    // spec-only components (E1–E4 live HTTP, streaming faces) are NOT
    // registry entries — anything that IS registered must be
    // hash-verifiable. An exception requires an explicit entry here
    // with its justification, not a silent None.
    val specOnly = Map.empty[String, String]
    val missing = all.filter(q => q.oracle.isEmpty && !specOnly.contains(q.name))
    assert(missing.isEmpty,
      s"queries without oracle or justification: ${missing.map(_.name)}")
  }

  test("SparkEntry derives exactly the registry (no drift between views)") {
    assert(graft.SparkEntry.queries.keySet == all.map(_.name).toSet)
    assert(graft.SparkEntry.oracleSql.keySet ==
      all.filter(_.oracle.isDefined).map(_.name).toSet)
  }

  test("no previously-verified query is dropped from the newest " +
    "CORRECTNESS round file") {
    val files = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .filter(f => f.getName.matches("CORRECTNESS_r\\d+\\.json"))
      .sortBy(f => f.getName.stripPrefix("CORRECTNESS_r")
        .stripSuffix(".json").toInt)
    // top-level keys only: entry values are flat objects, so every
    // `"name":{` match is a query key
    def keysOf(f: java.io.File): Set[String] = {
      val txt = scala.io.Source.fromFile(f).mkString
      """"([A-Za-z0-9_]+)":\s*\{""".r.findAllMatchIn(txt).map(_.group(1)).toSet
    }
    if (files.size >= 1) {
      val newest = keysOf(files.last)
      val registered = all.map(_.name).toSet
      // a key the driver verified that the registry no longer knows is
      // stale either way — renames must migrate, deletions must be
      // deliberate (and leave this list via a round turnover)
      assert((newest -- registered).isEmpty,
        s"CORRECTNESS keys outside the registry: ${newest -- registered}")
      // the r9 drop detector: anything verified in an OLDER round and
      // still registered must appear in the newest file too
      val older = files.init.map(keysOf).foldLeft(Set.empty[String])(_ ++ _)
      val dropped = (older & registered) -- newest
      assert(dropped.isEmpty,
        s"previously-verified queries missing from ${files.last.getName}: $dropped")
    }
  }

  test("the registered surface never shrinks (count floor)") {
    // raise the floor when queries are added; lowering it requires a
    // deliberate edit here, which is the point
    assert(all.size >= 180, s"registry shrank to ${all.size}")
  }
}
