package graft

import graft.pipeline.Snapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 invariants (SURVEY §5.3): exactly one open row per present
  * key, non-overlapping contiguous validity intervals, hard-delete
  * closes, and the nullable-compare-column regression (a key whose
  * tracked value is legitimately NULL and unchanged must keep exactly
  * one open row).
  */
class SnapshotSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val t1 = "2024-01-01 00:00:00"
  private val t2 = "2024-02-01 00:00:00"
  private val t3 = "2024-03-01 00:00:00"

  private def step(prev: Option[DataFrame], rows: Seq[(Long, String)],
                   asOf: String): DataFrame =
    Snapshot.scd2(prev, rows.toDF("id", "v"), Seq("id"), Seq("v"), asOf)

  private def openRows(df: DataFrame) = df.filter(col("valid_to").isNull)

  test("one open row per present key; changed keys close and reopen") {
    val s1 = step(None, Seq((1L, "a"), (2L, "b")), t1)
    val s2 = step(Some(s1), Seq((1L, "a"), (2L, "B2")), t2)
    assert(s2.count() == 3) // key 1 open, key 2 closed + reopened
    val open = openRows(s2).orderBy("id").as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])].collect()
    assert(open.map(r => (r._1, r._2)).toSeq == Seq((1L, "a"), (2L, "B2")))
    val closed = s2.filter(col("valid_to").isNotNull).head()
    assert(closed.getAs[Long]("id") == 2L)
    assert(closed.getAs[java.sql.Timestamp]("valid_to").toString.startsWith("2024-02-01"))
  }

  test("intervals are contiguous and non-overlapping across 3 steps") {
    val s1 = step(None, Seq((1L, "a")), t1)
    val s2 = step(Some(s1), Seq((1L, "b")), t2)
    val s3 = step(Some(s2), Seq((1L, "c")), t3)
    val hist = s3.orderBy("valid_from")
      .select("v", "valid_from", "valid_to")
      .as[(String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect()
    assert(hist.map(_._1).toSeq == Seq("a", "b", "c"))
    // each version closes exactly when the next opens
    assert(hist(0)._3.contains(hist(1)._2))
    assert(hist(1)._3.contains(hist(2)._2))
    assert(hist(2)._3.isEmpty)
    assert(openRows(s3).count() == 1)
  }

  test("hard delete closes the row and leaves no open version") {
    val s1 = step(None, Seq((1L, "a"), (2L, "b")), t1)
    val s2 = step(Some(s1), Seq((1L, "a")), t2) // key 2 vanished
    assert(openRows(s2).count() == 1)
    val gone = s2.filter(col("id") === 2L).head()
    assert(gone.getAs[java.sql.Timestamp]("valid_to") != null)
  }

  test("unchanged NULL tracked value keeps exactly one open row") {
    val s1 = Snapshot.scd2(None,
      Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "v"),
      Seq("id"), Seq("v"), t1)
    val s2 = Snapshot.scd2(Some(s1),
      Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "v"),
      Seq("id"), Seq("v"), t2)
    // regression: the old first-compare-col null check duplicated key 1
    assert(s2.count() == 2)
    assert(openRows(s2).filter(col("id") === 1L).count() == 1)
  }

  test("NULL → value transition versions correctly") {
    val s1 = Snapshot.scd2(None,
      Seq((1L, Option.empty[String])).toDF("id", "v"),
      Seq("id"), Seq("v"), t1)
    val s2 = Snapshot.scd2(Some(s1),
      Seq((1L, Some("now-set"))).toDF("id", "v"),
      Seq("id"), Seq("v"), t2)
    assert(s2.count() == 2)
    assert(openRows(s2).head.getAs[String]("v") == "now-set")
  }
}
