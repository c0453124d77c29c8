package graft

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** T11 pubdate sniffing vs the reference PubDateParser semantics
  * (PubDateParser.java:19-27,53-82,125-138,186-188). */
class PubDateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-pubdate")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def yearOf(s: String): Option[Int] = {
    val r = TextOps.pubDateYear(Seq((0L, s)).toDF("doc_id", "ds"), "ds")
      .collect().head
    if (r.isNullAt(1)) None else Some(r.getInt(1))
  }

  test("ISO-8601 date, datetime, and zoned datetime") {
    assert(yearOf("2014-03-01") === Some(2014))
    assert(yearOf("2014-03-01T08:30:15") === Some(2014))
    assert(yearOf("2014-03-01T08:30:15+02:00") === Some(2014))
  }

  test("RFC-1123") {
    assert(yearOf("Tue, 03 Jun 2008 11:05:30 GMT") === Some(2008))
  }

  test("multi-year substring takes the (min+max)/2 guess") {
    assert(yearOf("(c) 1997-2014 x") === Some((1997 + 2014) / 2))
  }

  test("single valid year substring is taken as-is; invalid ones ignored") {
    assert(yearOf("est 2003 x") === Some(2003))
    // 1850 invalid, 2003 valid -> single-year branch despite two \d{4} runs
    assert(yearOf("1850 to 2003") === Some(2003))
  }

  test("no valid year, junk, and length-gate rejections") {
    assert(yearOf("year 1850 and 1875") === None)
    assert(yearOf("undated") === None)
    assert(yearOf("published way back in the year 2001, revised") === None) // len ≥ 32
    assert(yearOf("03") === None)                                           // len < 4
  }

  test("ISO-parsed out-of-range year fails final validation") {
    assert(yearOf("1993-05-10") === None)
    assert(yearOf("2093-05-10") === None)
  }

  test("non-overlapping 4-digit scan mirrors Matcher.find/end stepping") {
    // "20140301": runs 2014 then 0301 (invalid) -> single valid year
    assert(yearOf("20140301") === Some(2014))
  }
}
