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
}
