package graft

import graft.queries.Registry

/** Plan inspector: prints the formatted physical plan of selected
  * queries (all when no names given). Used to audit pushdown, pruning,
  * broadcast choices, and whole-stage-codegen coverage.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Registry.all.map(_.name)
    val spark = GraftSession.local("graft-explain")
    names.foreach { n =>
      Registry.byName.get(n).foreach { q =>
        println(s"\n========== $n ==========")
        try q.run(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
