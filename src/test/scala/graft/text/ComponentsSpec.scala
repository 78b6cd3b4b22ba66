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

  test("100-hop chain converges WELL under the cap (O(log n) rounds)") {
    // Plain label propagation needs ~100 rounds here; alternating
    // large-star/small-star needs ~log2(100) ≈ 7. maxIters = 10 both
    // proves the speedup and leaves the default cap (20) a true
    // backstop rather than a practical limit.
    val chain = (1L until 101L).map(i => (i, i + 1)).toDF("a", "b")
    val m = Components.connected(chain, "a", "b", maxIters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.values.toSet == Set(1L) && m.size == 101)
  }

  test("iteration-cap exhaustion throws instead of returning wrong labels") {
    // A 1000-hop chain cannot finish in 2 alternating rounds; silent
    // return would split one true component into several (duplicates
    // kept). Must throw.
    val chain = (1L until 1001L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Components.connected(chain, "a", "b", maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // With the default bound the same graph converges to one component.
    val m = Components.connected(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.values.toSet == Set(1L) && m.size == 1001)
  }

  test("a configured checkpoint dir switches rounds to RELIABLE checkpoints") {
    // On a real cluster a checkpoint dir is standard; Components.pin
    // must then cut lineage through fault-tolerant checkpoint() (round
    // state survives executor loss) instead of localCheckpoint. The
    // dir stays set for the shared test session afterwards — reliable
    // checkpoints to temp disk are valid (just slower) everywhere.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val m = cc((1L, 2L), (2L, 3L), (7L, 8L))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
    // Proof the reliable path ran: checkpoint data landed in the dir.
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, s"no reliable checkpoint files under $dir")
  }

  test("random graph matches a driver-side union-find oracle") {
    val rnd = new scala.util.Random(1234)
    val pairs = Seq.fill(150)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    // Independent formulation: classic union-find with path compression.
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val vertices = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = vertices.map(v => v -> find(v)).toMap
    // find() roots at the min id of each set because unions always
    // attach the larger root under the smaller.
    assert(cc(pairs: _*) == expected)
  }
}
