package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract smoke: entry() must return >0 rows on sf0.001. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flagship entry returns hits on sf0.001") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(df.columns.contains("score") && df.columns.contains("docId"))
    // ranks are 1..n ascending and scores non-increasing
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("every declared oracle SQL has a matching query entry") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }
}
