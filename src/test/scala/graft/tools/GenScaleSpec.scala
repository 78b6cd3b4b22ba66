package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Machine-asserts the workload-shape invariants GenScale's scaladoc
  * promises (the sf1 soak in SCALE.md leans on these): modulo-derived
  * distributions preserved, FK integrity, copy-0 fidelity, zero
  * cross-copy text overlap, and rotation-preserved embedding geometry. */
class GenScaleSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-genscale").toString
    GenScale.generate(spark, src, dir, 2)
    dir
  }
  private def t(n: String) = spark.read.parquet(s"$out/$n.parquet")
  private def s(n: String) = spark.read.parquet(s"$src/$n.parquet")

  test("facts scale by the copy count; dimensions stay fixed") {
    assert(t("lineitem").count() == 2 * s("lineitem").count())
    assert(t("orders").count() == 2 * s("orders").count())
    assert(t("documents").count() == 2 * s("documents").count())
    assert(t("region").count() == s("region").count())
    assert(t("nation").count() == s("nation").count())
  }

  test("modulo-derived slices are identical in every copy") {
    val frac = t("orders")
      .groupBy((col("o_custkey") >= GenScale.CopyOffset).as("copy1"))
      .agg((sum(when(col("o_custkey") % 11 === 0, 1L).otherwise(0L)) /
        count(lit(1))).as("frac"))
      .collect().map(_.getDouble(1)).toSeq
    assert(frac.size == 2 && math.abs(frac.head - frac.last) < 1e-12)
  }

  test("foreign keys remap consistently (no orphan lineitem)") {
    val orphans = t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans == 0L)
  }

  test("copy 0 is byte-identical for documents; copies share zero tokens") {
    val drift = t("documents").as("d").join(s("documents").as("o"), "doc_id")
      .filter(col("d.text") =!= col("o.text")).count()
    assert(drift == 0L)
    val toks = t("documents")
      .select((col("doc_id") >= GenScale.CopyOffset).as("c1"),
        explode(split(col("text"), " ")).as("tok")).distinct()
    val shared = toks.filter(!col("c1")).select("tok")
      .intersect(toks.filter(col("c1")).select("tok")).count()
    assert(shared == 0L)
  }

  test("cross-copy name twins fail BOTH linkage predicates (dist > 3, JW < 0.9)") {
    // The jw_match leak regression: an untagged copy made every name a
    // clean prefix of its tagged twins (JW 0.91+). With uniform tags,
    // identical-base cross-copy pairs must sit outside both the
    // edit-distance-3 and the JW-0.9 acceptance regions.
    val twins = t("part").filter(col("p_partkey") === 7L)
      .select(col("p_name").as("a"))
      .crossJoin(t("part").filter(col("p_partkey") === 7L + GenScale.CopyOffset)
        .select(col("p_name").as("b")))
      .select(
        levenshtein(col("a"), col("b")).as("dist"),
        call_function("graft_jaro_winkler", col("a"), col("b")).as("jw"))
      .collect().head
    assert(twins.getInt(0) > 3, s"edit distance ${twins.getInt(0)}")
    assert(twins.getDouble(1) < 0.9, s"jw ${twins.getDouble(1)}")
  }

  test("embedding rotation preserves within-copy dot products") {
    def dots(df: org.apache.spark.sql.DataFrame, a: Long, b: Long): Double = {
      val va = df.filter(col("vec_id") === a).select("embedding")
        .collect().head.getSeq[Float](0)
      val vb = df.filter(col("vec_id") === b).select("embedding")
        .collect().head.getSeq[Float](0)
      va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
    }
    val orig = dots(s("embeddings"), 3L, 17L)
    val rot = dots(t("embeddings"),
      3L + GenScale.CopyOffset, 17L + GenScale.CopyOffset)
    assert(math.abs(orig - rot) < 1e-9, s"$orig vs $rot")
  }

  test("copy indexes past the embedding dimension stay valid and " +
      "fabricate no cross-copy twins (the sf10 c=75 regression)") {
    // Generate with a copy index that wraps the 64-dim rotation: the
    // r10 sf10 run failed outright at c >= 64 (negative slice length),
    // and a pure modular rotation would make copy 64 an EXACT twin of
    // copy 0. The per-copy sign mask must keep within-copy geometry
    // while decorrelating the wrapped copy.
    val dir = java.nio.file.Files.createTempDirectory("graft-gs65").toString
    GenScale.generate(spark, src, dir, 66) // includes c = 64 and 65
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n0 = s("embeddings").count()
    assert(e.count() == 66 * n0, "embeddings must generate for every copy")
    def vec(id: Long): Seq[Float] =
      e.filter(col("vec_id") === id).select("embedding")
        .collect().head.getSeq[Float](0)
    // c = 64 wraps to rotation 0: without the mask it would equal copy
    // 0's vector exactly; with it, signs differ on ~half the dims.
    val base = vec(3L)
    val wrapped = vec(3L + 64L * GenScale.CopyOffset)
    assert(base != wrapped, "wrapped copy must not be an exact twin")
    assert(base.zip(wrapped).forall { case (a, b) =>
      math.abs(a) == math.abs(b) },
      "mask must only flip signs (orthogonal, norm-preserving)")
    // Within-copy dot products still bit-preserved in the wrapped copy.
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val orig = dot(vec(3L), vec(17L))
    val w = dot(vec(3L + 64L * GenScale.CopyOffset),
      vec(17L + 64L * GenScale.CopyOffset))
    assert(math.abs(orig - w) < 1e-9, s"$orig vs $w")
  }
}
