package graft.queries

/** Master list of every capability query the engine ships.
  * SparkEntry.queries / oracleSql are derived views of this registry;
  * tests and bench iterate it.
  */
object Registry {
  def all: Seq[GraftQuery] =
    RelationalQueries.all ++ AdvancedQueries.all ++ TemporalQueries.all ++
      EtlQueries.all ++ ExtensionQueries.all ++ AnalyticsQueries.all

  def byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
}
