package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** GraphX-backed graph algorithms over edge DataFrames.
  *
  * Used for the reference's SCC mode (DBSCAN-strongly-connected-component
  * .py:174, `stronglyConnectedComponents(maxIter=10)`) and as an independent
  * implementation to cross-check [[ConnectedComponents]] in tests.
  */
object GraphAlgs {

  private def toEdgeRdd(edges: DataFrame) =
    edges.selectExpr("CAST(src AS LONG)", "CAST(dst AS LONG)")
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))

  /** Undirected connected components; returns (id, component) for vertices
    * present in `edges`. Component ids are GraphX's (min vertex id). */
  def connectedComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    Graph.fromEdges(toEdgeRdd(edges), 0)
      .connectedComponents().vertices
      .toDF("id", "component")
  }

  /** Directed strongly connected components with bounded iterations —
    * faithful to the reference's `maxIter=10` mode. Border points (in-edges
    * only) form singleton SCCs and therefore end up as noise downstream.
    */
  def stronglyConnectedComponents(spark: SparkSession, edges: DataFrame,
                                  numIter: Int = 10): DataFrame = {
    import spark.implicits._
    Graph.fromEdges(toEdgeRdd(edges), 0)
      .stronglyConnectedComponents(numIter).vertices
      .toDF("id", "component")
  }
}
