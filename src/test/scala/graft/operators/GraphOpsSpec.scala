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

  test("multiple components, edge direction irrelevant, singletons survive") {
    val comp = components(
      Seq(1L, 2L, 3L, 10L, 11L, 12L, 50L),
      Seq((2L, 1L), (3L, 2L), (12L, 10L), (11L, 12L))
    )
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L, 50L -> 50L))
  }
}
