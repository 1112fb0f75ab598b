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
    // Materialize the edge pipeline ONCE before deriving both directions:
    // building the symmetric closure straight off `edges` would evaluate
    // the (potentially expensive — q47 feeds the whole LSH candidate
    // pipeline in here) upstream plan twice, racing its own cache fill.
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val sym = e.union(e.select(col("dst"), col("src")).toDF("src", "dst")).persist()
    var labels  = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    var changed = 1L
    var rounds  = 0
    while (changed > 0 && rounds < maxRounds) {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("comp").as("ncomp")), Seq("dst"))
        .groupBy(col("src"))
        .agg(min(col("ncomp")).as("nmin"))
        .withColumnRenamed("src", "id")
      // carry the previous label through the checkpoint so the convergence
      // count is a scan of `next`, not another join against `labels`
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("next_comp"),
          col("comp").as("prev")
        )
        .localCheckpoint()
      changed = next.filter(col("next_comp") =!= col("prev")).count()
      labels = next.select(col("id"), col("next_comp").as("comp"))
      rounds += 1
    }
    sym.unpersist()
    labels
  }
}
