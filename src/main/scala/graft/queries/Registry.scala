package graft.queries

/** Single registration point for every query the engine exposes through the
  * driver contract (SparkEntry). Each pack is a Seq[Q]; adding a pack here
  * wires it into Verify (correctness), Bench (bench=true subset), and the
  * SparkEntry.queries/oracleSql maps at once.
  */
object Registry {
  val all: Seq[Q] =
    CoreQueriesA.all ++ CoreQueriesB.all ++ CoreQueriesC.all ++
      CoreQueriesD.all ++ CoreQueriesE.all ++ CoreQueriesF.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ TextQueries.all ++
      SourceQueries.all ++ SamplingQueries.all ++ IncrementalQueries.all

  /** name -> implementation, the shape SparkEntry.queries needs. */
  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query name in Registry")
    m
  }
}
