package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** E1-E16 — cleaning-combinator invariants; the generative cases use a
  * fixed-seed sample so failures reproduce (no scalatest+scalacheck
  * bridge artifact is available offline). */
class CleaningSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  import spark.implicits._

  private val lo = LocalDate.of(1980, 1, 1)
  private val today = LocalDate.of(2026, 8, 12)
  private val sentinel = LocalDate.of(1900, 1, 1)

  test("clampDate: output is always in-range or the sentinel") {
    val ds = Seq.fill(200)(
      LocalDate.ofEpochDay(rnd.between(-40000L, 40000L)).toString)
    val out = ds.toDF("d")
      .select(Cleaning.clampDate(lo, today, sentinel)(col("d").cast("date"))
        .as("c"))
      .collect().map(_.getDate(0).toLocalDate)
    assert(out.forall(d =>
      d == sentinel || (!d.isBefore(lo) && !d.isAfter(today))))
  }

  test("clampDate and clampNum are idempotent (sentinel is a fixed point)") {
    // The sentinel either lies in-range or re-clamps to itself, so a
    // double application can never move a value a single one didn't —
    // the property that makes re-running a load cycle over already
    // cleaned rows safe.
    val ds = Seq.fill(300)(
      LocalDate.ofEpochDay(rnd.between(-40000L, 40000L)).toString)
    val once = Cleaning.clampDate(lo, today, sentinel)(col("d").cast("date"))
    val twice = Cleaning.clampDate(lo, today, sentinel)(once)
    assert(ds.toDF("d").select(once.as("a"), twice.as("b"))
      .filter(!(col("a") <=> col("b"))).count() == 0)

    val ns = Seq.fill(300)((rnd.nextDouble() - 0.5) * 400).map(_.toString)
    val n1 = Cleaning.clampNum(0, 120)(col("n"))
    val n2 = Cleaning.clampNum(0, 120)(n1)
    assert(ns.toDF("n").select(n1.as("a"), n2.as("b"))
      .filter(!(col("a") <=> col("b"))).count() == 0)
  }

  test("emptyToNull and sentinelToNull are idempotent") {
    val vs = Seq("", "x", null, "N/A", " ")
    val e1 = Cleaning.emptyToNull(col("v"))
    val e2 = Cleaning.emptyToNull(e1)
    val s1 = Cleaning.sentinelToNull("N/A")(col("v"))
    val s2 = Cleaning.sentinelToNull("N/A")(s1)
    val bad = vs.toDF("v")
      .select(e1.as("a"), e2.as("b"), s1.as("c"), s2.as("d"))
      .filter(!(col("a") <=> col("b")) || !(col("c") <=> col("d")))
    assert(bad.count() == 0)
  }

  test("clampDate boundaries are inclusive; outside goes to sentinel") {
    val rows = Seq("1980-01-01", "2026-08-12", "1979-12-31", "2026-08-13",
      "1900-01-01", null)
    val out = rows.toDF("d")
      .select(Cleaning.clampDate(lo, today, sentinel)(col("d").cast("date")).as("c"))
      .collect().map(r => Option(r.getDate(0)).map(_.toString).orNull)
    assert(out.toSeq == Seq("1980-01-01", "2026-08-12", "1900-01-01",
      "1900-01-01", "1900-01-01", null))
  }

  test("nullOutsideDate nulls instead of sentineling") {
    val out = Seq("1979-12-31", "1990-05-05").toDF("d")
      .select(Cleaning.nullOutsideDate(lo, today)(col("d").cast("date")).as("c"))
      .collect().map(r => Option(r.getDate(0)).map(_.toString))
    assert(out.toSeq == Seq(None, Some("1990-05-05")))
  }

  test("clampNum: in-range kept, out-of-range -> 999, non-numeric -> null") {
    val xs = Seq.fill(200)(rnd.between(-500d, 500d))
    val out = xs.map(_.toString).toDF("v")
      .select(Cleaning.clampNum(0d, 200d)(col("v")).as("c"))
      .collect().map(_.getDouble(0))
    assert(out.forall(v => v == 999d || (v >= 0d && v <= 200d)))
    val weird = Seq("abc", "", "12.5", "-1", "201").toDF("v")
      .select(Cleaning.clampNum(0d, 200d)(col("v")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(weird.toSeq == Seq(None, None, Some(12.5), Some(999d), Some(999d)))
  }

  test("canonicalize: first matching value-set wins, misses pass through") {
    val m = Seq(
      Seq("a", "b") -> "AB",
      Seq("b", "c") -> "BC") // 'b' must hit the FIRST set
    val out = Seq("a", "b", "c", "z", null).toDF("v")
      .select(Cleaning.canonicalize(m)(col("v")).as("c"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("AB", "AB", "BC", "z", null))
  }

  test("emptyToNull + fillNull compose (E6 + E12)") {
    val out = Seq("", "x", null).toDF("v")
      .select(Cleaning.fillNull("(missing)")(Cleaning.emptyToNull(col("v"))).as("c"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("(missing)", "x", "(missing)"))
  }

  test("parseDualFormat: ISO, dd/MM/yyyy, and garbage (E16)") {
    val out = Seq("2024-03-04 10:11:12", "04/03/2024 10:11:12", "junk")
      .toDF("v")
      .select(date_format(Cleaning.parseDualFormat()(col("v")),
        "yyyy-MM-dd HH:mm:ss").as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(
      Some("2024-03-04 10:11:12"), Some("2024-03-04 10:11:12"), None))
  }

  test("regexDateRepair: format chosen by regex guard, else null (E10)") {
    val rules = Seq(
      "^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$" -> "yyyy-MM-dd HH:mm:ss",
      "^\\d{2}/\\d{2}/\\d{4}$" -> "dd/MM/yyyy")
    val out = Seq("2024-03-04 10:11:12", "04/03/2024", "03-04-2024", null)
      .toDF("v")
      .select(date_format(Cleaning.regexDateRepair(rules)(col("v")),
        "yyyy-MM-dd").as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("2024-03-04"), Some("2024-03-04"), None, None))
  }

  test("repair combinators survive an ANSI session (Spark 4 default)") {
    // Spark 4 ships spark.sql.ansi.enabled=true; a user adopting the
    // library on a stock session must still get garbage -> null
    // repair, not SparkNumberFormatException/DateTimeException.
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val out = Seq("garbage", "12", "7.5", "2020-13-45")
        .toDF("v")
        .select(
          Cleaning.clampNum(0, 10)(col("v")).as("n"),
          Cleaning.parseDualFormat()(col("v")).as("t"),
          Cleaning.regexDateRepair(
            Seq(("^\\d{4}-\\d{2}-\\d{2}$", "yyyy-MM-dd")))(col("v")).as("r"))
        .collect()
      assert(out(0).isNullAt(0) && out(0).isNullAt(1) && out(0).isNullAt(2))
      assert(out(1).getDouble(0) == 999d) // 12 outside [0,10] -> sentinel
      assert(out(2).getDouble(0) == 7.5)
      // regex-passing but unparseable (month 13) repairs to null.
      assert(out(3).isNullAt(1) && out(3).isNullAt(2))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("recode maps exact values only (E7/E8)") {
    val out = Seq("M", "F", "Male", null).toDF("v")
      .select(Cleaning.recode(Map("M" -> "Male", "F" -> "Female"))(col("v")).as("c"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("Male", "Female", "Male", null))
  }
}
