package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph traversal over an edge relation — the layer above
  * [[Dedup.dupClusters]]'s connected components: CC answers "which
  * nodes touch at all", BFS answers "how far apart are they", which is
  * what link-graph crawl-frontier analysis and entity-neighborhood
  * expansion actually ask.
  */
object Graph {

  /** Breadth-first hop distances from `start` over an undirected edge
    * list, bounded at `maxHops`. Returns (node, hops) with hops =
    * minimum hop count, 0 for the start node; nodes beyond `maxHops`
    * are absent.
    *
    * Scale shape: per level, ONE equi-join of the (symmetrized) edge
    * relation against the current frontier on the node key, a distinct
    * to collapse parallel paths, and an anti-join against the visited
    * set so no node re-expands — the frontier relation is
    * reachable-set-sized, never path-count-sized. The driver loop runs
    * a bounded `maxHops` iterations (the dupClusters precedent);
    * frontiers are localCheckpoint'ed so lineage stays flat. */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              start: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 32, s"unreasonable maxHops $maxHops")
    val und = edges
      .select(col(srcCol).cast("string").as("a"), col(dstCol).cast("string").as("b"))
      .unionAll(edges
        .select(col(dstCol).cast("string").as("a"), col(srcCol).cast("string").as("b")))
      .distinct()
      .localCheckpoint()
    import edges.sparkSession.implicits._
    var visited = Seq((start, 0)).toDF("node", "hops").localCheckpoint()
    var frontier = visited.select("node")
    var h = 0
    while (h < maxHops) {
      h += 1
      val next = und.join(frontier, und("a") === frontier("node"))
        .select(col("b").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint()
      if (next.isEmpty) return visited
      visited = visited.unionAll(next).localCheckpoint()
      frontier = next.select("node")
    }
    visited
  }
}
