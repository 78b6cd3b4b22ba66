package graft.etl

import graft.SparkSpec

/** J1/J2 — lookup remap overwrite semantics: hit overwrites, miss and
  * null pass through, duplicate lookup keys must not fan out the fact. */
class LookupRemapSpec extends SparkSpec {

  import spark.implicits._

  test("hit overwrites, miss keeps original, null stays null") {
    val facts = Seq(Some("a"), Some("x"), None).toDF("v")
    val lkp = Seq(("a", "A")).toDF("source_name", "target_name")
    val out = LookupRemap.remap(facts, lkp, "v")
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("A"), Some("x"), None))
  }

  test("duplicate source_name rows in the lookup do not fan out facts") {
    val facts = Seq("a", "a", "b").toDF("v")
    val lkp = Seq(("a", "A1"), ("a", "A2")).toDF("source_name", "target_name")
    assert(LookupRemap.remap(facts, lkp, "v").count() == 3)
  }

  test("remapAll applies the same dim to several columns (J2)") {
    val facts = Seq(("a", "b")).toDF("x", "y")
    val lkp = Seq(("a", "A"), ("b", "B")).toDF("source_name", "target_name")
    val out = LookupRemap.remapAll(facts, lkp, Seq("x", "y")).collect().head
    assert((out.getString(0), out.getString(1)) == ("A", "B"))
  }

  test("null target_name does not overwrite (reference CASE semantics)") {
    val facts = Seq("a").toDF("v")
    val lkp = Seq(("a", null.asInstanceOf[String])).toDF("source_name", "target_name")
    assert(LookupRemap.remap(facts, lkp, "v").collect().head.getString(0) == "a")
  }
}
