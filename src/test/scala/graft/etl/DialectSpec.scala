package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The T-SQL -> Spark dialect translation table, pinned as a tested
  * artifact (round-11 verdict task 4). The reference ships raw T-SQL
  * to SQL Server (`LoadHistoricalARTOutcomes.sql:75,192,209,213-219`,
  * `CleanTestKits.sql:1-50`, `DatabaseUtils.java:61`); this library
  * re-expresses each construct in Spark SQL. The sandbox has no SQL
  * Server to differential-test against (declared in COVERAGE.md), so
  * every row below is pinned against HAND-COMPUTED T-SQL truth values
  * from the published semantics of each T-SQL function:
  *
  * | T-SQL (reference)                          | Spark (this library)                      | Where |
  * |--------------------------------------------|-------------------------------------------|-------|
  * | `convert(nvarchar(64), hashbytes('SHA2_256', cast(x as varchar)), 2)` | `upper(sha2(cast(x as string), 256))` | `etl/PiiHash.sha256Upper` |
  * | `convert(datetime, x, 103)` (dd/MM/yyyy)   | `try_to_timestamp(x, 'dd/MM/yyyy HH:mm:ss')` fallback | `etl/Cleaning.parseDualFormat` |
  * | `datediff(yy, a, b)` (year-BOUNDARY count) | `year(b) - year(a)`                       | `cohort/ArtOutcomes` age-at-enrollment |
  * | `datediff(mm, a, b)` (month-boundary count)| `(year(b)-year(a))*12 + (month(b)-month(a))` | `queries/CohortQueries` month spine |
  * | `datediff(dd, a, b)` (argument order!)     | `datediff(b, a)` — Spark is (end, start)  | `cohort/ArtOutcomes` outcome rules |
  * | `eomonth(d)`                               | `last_day(d)`                             | `cohort/ArtOutcomes` as-of spine |
  *
  * The `datediff` rows are the treacherous ones: T-SQL `datediff`
  * counts datepart BOUNDARY CROSSINGS (`datediff(yy, Dec 31, Jan 1)`
  * = 1), not elapsed intervals — a `months_between`/`floor(days/365)`
  * translation would be subtly wrong on every boundary-straddling
  * pair, which for age-at-enrollment means every patient born late in
  * the year.
  */
class DialectSpec extends SparkSpec {

  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).head().getAs[T]("v")

  test("hashbytes('SHA2_256') + convert(,2): upper-hex SHA-256 of the string form") {
    // T-SQL truth: hashbytes returns VARBINARY; convert(nvarchar, ., 2)
    // renders hex WITHOUT 0x in UPPERCASE. Pin against JDK SHA-256 of
    // the same bytes, upper-hexed by hand.
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def truth(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02X".format(_)).mkString
    for (s <- Seq("12345", "PAT-0001", "", "Núñez")) {
      assert(one[String](PiiHash.sha256Upper(lit(s))) == truth(s),
        s"sha256Upper('$s')")
    }
    // The reference hashes the STRING form of non-string keys
    // (`cast(PatientPK as varchar)`): an int key must hash like its
    // decimal rendering, never its binary encoding.
    assert(one[String](PiiHash.sha256Upper(lit(42))) == truth("42"))
  }

  test("convert(datetime, x, 103): style 103 is dd/MM/yyyy — day FIRST") {
    val parse = Cleaning.parseDualFormat()(_: org.apache.spark.sql.Column)
    def ts(s: String) =
      Option(one[java.sql.Timestamp](date_format(parse(lit(s)),
        "yyyy-MM-dd HH:mm:ss").cast("timestamp"))).map(_.toString).orNull
    // T-SQL truth: convert(datetime, '05/04/2021', 103) = April 5
    // (day-first), NOT May 4 (US style 101). The repo's fallback
    // format must preserve that.
    assert(ts("05/04/2021 00:00:00") == "2021-04-05 00:00:00.0")
    assert(ts("25/12/2019 13:45:10") == "2019-12-25 13:45:10.0")
    // ISO primary format wins when it parses (the dual-format contract).
    assert(ts("2021-04-05 00:00:00") == "2021-04-05 00:00:00.0")
    // Month 13 in day-first position: try_convert semantics -> NULL
    // (the job-level behavior the reference relies on for bad rows).
    assert(ts("25/13/2019 00:00:00") == null)
  }

  test("datediff(yy): year-boundary crossings, not elapsed years") {
    def yy(a: String, b: String): Long =
      one[Long]((year(lit(b).cast("date")) - year(lit(a).cast("date"))).cast("long"))
    // T-SQL truth: datediff counts boundary crossings.
    assert(yy("1999-12-31", "2000-01-01") == 1L) // one day apart, 1 "year"
    assert(yy("2000-01-01", "2000-12-31") == 0L) // 365 days apart, 0 "years"
    assert(yy("1980-06-15", "2020-06-14") == 40L) // age-at-enrollment shape
    assert(yy("2020-06-14", "1980-06-15") == -40L) // sign follows b - a
  }

  test("datediff(mm): month-boundary crossings") {
    def mm(a: String, b: String): Long = {
      val (da, db) = (lit(a).cast("date"), lit(b).cast("date"))
      one[Long](((year(db) - year(da)) * 12 + (month(db) - month(da))).cast("long"))
    }
    assert(mm("2019-12-31", "2020-01-01") == 1L)
    assert(mm("2020-01-01", "2020-01-31") == 0L)
    assert(mm("2019-01-15", "2020-03-01") == 14L)
  }

  test("datediff(dd, a, b) = Spark datediff(b, a) — argument order reverses") {
    def dd(a: String, b: String): Long =
      one[Long](datediff(lit(b).cast("date"), lit(a).cast("date")).cast("long"))
    assert(dd("2020-01-01", "2020-01-31") == 30L)
    assert(dd("2020-01-31", "2020-01-01") == -30L)
    // Leap day crossing (the cohort's 30-day outcome windows straddle it).
    assert(dd("2020-02-28", "2020-03-01") == 2L)
    assert(dd("2021-02-28", "2021-03-01") == 1L)
  }

  test("eomonth = last_day, including leap February and idempotence at month end") {
    def eom(s: String): String =
      one[java.sql.Date](last_day(lit(s).cast("date"))).toString
    assert(eom("2020-02-10") == "2020-02-29") // leap
    assert(eom("2021-02-10") == "2021-02-28")
    assert(eom("2020-12-31") == "2020-12-31") // already at month end
    assert(eom("2021-04-01") == "2021-04-30")
  }
}
