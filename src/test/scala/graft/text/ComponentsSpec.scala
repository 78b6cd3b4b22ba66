package graft.text

import graft.SparkSpec

/** Connected-components semantics on hand-checkable graphs. */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, Long] =
    Components.connected(pairs.toSeq.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain needs multi-hop propagation: 1-2-3-4 is one component") {
    val m = cc((1L, 2L), (2L, 3L), (3L, 4L))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint clusters get distinct min-id labels") {
    val m = cc((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L))
    assert(m(1L) == 1L && m(2L) == 1L)
    assert(m(10L) == 10L && m(11L) == 10L && m(12L) == 10L)
    assert(m(20L) == 20L && m(21L) == 20L)
  }

  test("pair order and direction do not matter") {
    val a = cc((4L, 3L), (2L, 3L), (1L, 2L))
    val b = cc((1L, 2L), (3L, 2L), (3L, 4L))
    assert(a == b)
    assert(a.values.toSet == Set(1L))
  }

  test("long chain converges within the iteration bound") {
    val chain = (1L until 12L).map(i => (i, i + 1))
    val m = cc(chain: _*)
    assert(m.values.toSet == Set(1L))
    assert(m.size == 12)
  }
}
