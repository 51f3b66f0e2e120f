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
    * frontiers are localCheckpoint'ed so lineage stays flat.
    *
    * `edgesDistinctDisjoint`: set when `edges` is already duplicate-free
    * AND no edge appears in both orientations (e.g. a bipartite graph
    * whose two sides use disjoint key prefixes) — the symmetrized union
    * is then provably duplicate-free and the post-union `distinct()`
    * (a full shuffle+dedup of the LARGEST relation in the whole
    * traversal) is skipped. Correctness without the flag is unchanged;
    * BFS itself tolerates duplicate edges (the per-level `distinct()`
    * collapses parallel paths), so the flag only trades one redundant
    * exchange, never answers. */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              start: String, maxHops: Int,
              edgesDistinctDisjoint: Boolean = false): DataFrame = {
    require(maxHops >= 0 && maxHops <= 32, s"unreasonable maxHops $maxHops")
    val sym = edges
      .select(col(srcCol).cast("string").as("a"), col(dstCol).cast("string").as("b"))
      .unionAll(edges
        .select(col(dstCol).cast("string").as("a"), col(srcCol).cast("string").as("b")))
    val und = (if (edgesDistinctDisjoint) sym else sym.distinct())
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

  /** PageRank by bounded power iteration: `iters` rounds of
    * PR'(v) = (1-d)/N + d * Σ_{u→v} PR(u)/outdeg(u), starting from the
    * uniform 1/N vector. With `undirected = true` the edge list is
    * symmetrized first, which guarantees every node has an out-edge —
    * no dangling mass exists, so the classic formula above is exact and
    * total rank stays 1 every round. Returns (node, rank) for EVERY
    * node; `rank` is mean-normalized (multiplied by N, so 1.0 = the
    * uniform score) — callers compare importance ratios, and the O(1)
    * scale keeps downstream rounding meaningful at any graph size.
    *
    * Scale shape: the contribution relation (src, dst, 1/outdeg) is
    * built ONCE (one aggregation + one join) and localCheckpoint'ed;
    * each iteration is then a single equi-join of the rank vector
    * (node-sized, not edge-sized) against it plus one map-side-combined
    * sum by dst — the canonical BSP step, shuffle keyed on the node id.
    * Nothing is collected to the driver; the loop is a bounded `iters`
    * (the [[bfsHops]] / dupClusters precedent), each rank vector
    * localCheckpoint'ed so lineage stays flat. Node count N is computed
    * once and folded in as a literal. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               undirected: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 32, s"unreasonable iters $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val raw = edges
      .select(col(srcCol).cast("string").as("a"), col(dstCol).cast("string").as("b"))
    val dir = (if (undirected)
      raw.unionAll(raw.select(col("b").as("a"), col("a").as("b"))) else raw)
      .distinct()
    val nodes = dir.select(col("a").as("node"))
      .unionAll(dir.select(col("b").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    // (a, b, w = 1/outdeg(a)): the per-edge share of a's rank
    val contrib = dir
      .join(dir.groupBy("a").agg(count(lit(1)).as("_deg")), "a")
      .select(col("a"), col("b"), (lit(1.0) / col("_deg")).as("w"))
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (_ <- 1 to iters) {
      val inflow = contrib
        .join(ranks, contrib("a") === ranks("node"))
        .groupBy(col("b").as("node"))
        .agg(sum(col("rank") * col("w")).as("_in"))
      // left join keeps isolated / in-edge-free nodes at pure teleport
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("_in"), lit(0.0)))
            .as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), (col("rank") * n).as("rank"))
  }
}
