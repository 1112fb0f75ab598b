package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Connected components must close CHAINS transitively — the exact case the
  * one-pass "keep the lower id of each pair" dedup (q46) gets wrong: with
  * A~B and B~C but A≁C, C still belongs to A's component.
  */
class GraphOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def components(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps
      .connectedComponents(nodes.toDF("id"), edges.toDF("src", "dst"))
      .as[(Long, Long)]
      .collect()
      .toMap

  test("chain A-B-C collapses to one component rooted at the min id") {
    val comp = components(Seq(1L, 2L, 3L, 9L), Seq((1L, 2L), (2L, 3L)))
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("long path needs diameter rounds and still converges") {
    val n    = 40L
    val comp = components(1L to n, (1L until n).map(i => (i, i + 1)))
    assert(comp.values.forall(_ == 1L))
  }

  test("reliable checkpointing: a deep chain (many rounds) converges with checkpointDir set") {
    // depth 12 -> well past 2 rounds of label propagation, every round
    // re-checkpointed to the reliable dir (the cluster-deployment mode);
    // result must be identical to the localCheckpoint path.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val n   = 12L
    val comp = GraphOps
      .connectedComponents(
        (1L to n).toDF("id"),
        (1L until n).map(i => (i, i + 1)).toDF("src", "dst"),
        checkpointDir = Some(dir)
      )
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(comp.values.forall(_ == 1L), s"deep chain not closed: $comp")
    // the reliable checkpoints actually landed on disk
    val files = new java.io.File(dir).listFiles()
    assert(files != null && files.nonEmpty, "no reliable checkpoint written")
  }

  test("multiple components, edge direction irrelevant, singletons survive") {
    val comp = components(
      Seq(1L, 2L, 3L, 10L, 11L, 12L, 50L),
      Seq((2L, 1L), (3L, 2L), (12L, 10L), (11L, 12L))
    )
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L, 50L -> 50L))
  }

  // ---- large-star/small-star ----------------------------------------------

  private def starComponents(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps
      .connectedComponentsStars(nodes.toDF("id"), edges.toDF("src", "dst"))
      .as[(Long, Long)]
      .collect()
      .toMap

  test("stars: deep chain converges in far fewer than diameter rounds") {
    // a 200-node path has diameter 199 — min-label with default maxRounds=50
    // CANNOT close it, stars must (O(log²) rounds; maxRounds=30 is ample)
    val n    = 200L
    val comp = starComponents(1L to n, (1L until n).map(i => (i, i + 1)))
    assert(comp.size == 200 && comp.values.forall(_ == 1L), "deep chain not closed by star contraction")
  }

  test("stars: parity with min-label propagation on a seeded random graph") {
    val rnd   = new scala.util.Random(7)
    val nodes = 1L to 120L
    val edges = Seq.fill(90)((rnd.nextInt(120) + 1L, rnd.nextInt(120) + 1L)).filter(e => e._1 != e._2)
    val byStars = starComponents(nodes, edges)
    val byLabel = components(nodes, edges)
    assert(byStars == byLabel, "star contraction and min-label disagree")
  }

  test("stars: multiple components, direction irrelevant, singletons survive") {
    val comp = starComponents(
      Seq(1L, 2L, 3L, 10L, 11L, 12L, 50L),
      Seq((2L, 1L), (3L, 2L), (12L, 10L), (11L, 12L))
    )
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L, 50L -> 50L))
  }

  test("stars: empty edge set leaves every node a singleton") {
    val comp = starComponents(Seq(5L, 6L), Seq.empty)
    assert(comp == Map(5L -> 5L, 6L -> 6L))
  }

  test("exhausting maxRounds throws instead of returning partial labels") {
    // a 10-node path needs 9 min-label rounds; 3 is not enough — partial
    // labels are silently wrong downstream, so the operator must refuse
    val err = intercept[IllegalStateException] {
      GraphOps
        .connectedComponents(
          (1L to 10L).toDF("id"),
          (1L until 10L).map(i => (i, i + 1)).toDF("src", "dst"),
          maxRounds = 3
        )
        .collect()
    }
    assert(err.getMessage.contains("connectedComponentsStars"), err.getMessage)
  }
}
