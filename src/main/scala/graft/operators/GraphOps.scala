package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives needed by the curation pipeline. */
object GraphOps {

  /** Connected components by iterative min-label propagation: every node is
    * mapped to the minimum node id reachable from it (`comp`). Singletons map
    * to themselves.
    *
    * comp(v) ← min(comp(v), min over neighbors comp(u)) until fixpoint. Each
    * round is two distributed joins + an aggregation; only the CONVERGENCE
    * SCALAR (count of changed labels) reaches the driver, and
    * `localCheckpoint` truncates the per-round lineage so plans don't grow
    * with iterations (a cluster deployment would use reliable checkpointing).
    * Rounds ≤ component diameter — near-dup clusters are shallow; `maxRounds`
    * is a runaway guard, not a correctness knob.
    *
    * @param nodes one column `id` (distinct node ids)
    * @param edges columns `src`, `dst` — UNDIRECTED input, pass each pair
    *              once; both directions are derived here
    * @return (`id`, `comp`)
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sym = edges
      .select(col("src"), col("dst"))
      .union(edges.select(col("dst"), col("src")))
      .toDF("src", "dst")
      .persist()
    var labels  = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    var changed = 1L
    var rounds  = 0
    while (changed > 0 && rounds < maxRounds) {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("comp").as("ncomp")), Seq("dst"))
        .groupBy(col("src"))
        .agg(min(col("ncomp")).as("nmin"))
        .withColumnRenamed("src", "id")
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint()
      changed = next
        .join(labels.withColumnRenamed("comp", "prev"), Seq("id"))
        .filter(col("comp") =!= col("prev"))
        .count()
      labels = next
      rounds += 1
    }
    sym.unpersist()
    labels
  }
}
