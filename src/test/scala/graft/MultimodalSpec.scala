package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** mm_decode_stub verification (SURVEY §5.3): the mapPartitions decode
  * seam preserves ids, produces the stub's deterministic metadata, and
  * survives null payloads; sampleFrames emits the documented row count.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("decodeMeta roundtrips ids and matches the stub's arithmetic") {
    val df = Seq((1L, "abcd"), (2L, "abcdefgh"), (3L, ""))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast(BinaryType))
    val out = Multimodal.decodeMeta(df, "doc_id", "payload",
      Multimodal.StubDecoder)
      .select("doc_id", "meta.width", "meta.height", "meta.n_bytes", "meta.format")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Long, String)].collect()
    val expect = Seq("abcd", "abcdefgh", "").zipWithIndex.map { case (s, i) =>
      val m = Multimodal.StubDecoder.decode(s.getBytes("UTF-8"))
      (i + 1L, m.width, m.height, m.nBytes, m.format)
    }
    assert(out.toSeq == expect)
  }

  test("decodeMeta tolerates null payloads") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("xy")))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast(BinaryType))
    val out = Multimodal.decodeMeta(df, "doc_id", "payload",
      Multimodal.StubDecoder).orderBy("doc_id").collect()
    assert(out(0).getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Long]("n_bytes") == 0L)
  }

  test("sampleFrames emits floor(len/N)+1 rows per doc") {
    val df = Seq((1L, "a" * 250), (2L, "b" * 99))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast(BinaryType))
    val counts = Multimodal.sampleFrames(df, "doc_id", "payload", 100)
      .groupBy("doc_id").count().orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(counts == Seq((1L, 3L), (2L, 1L))) // 250/100→idx 0..2, 99/100→idx 0
  }

  test("transformBinary + StubHalve keeps every second byte; " +
      "null and odd-length payloads behave") {
    val df = Seq((1L, "abcdef"), (2L, "abcde"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast(BinaryType))
    val out = Multimodal.transformBinary(df, "doc_id", "payload",
      Multimodal.StubHalve)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1)))
    assert(out.toSeq == Seq(1L -> "ace", 2L -> "ace", 3L -> "x", 4L -> ""))
  }

  test("byteHistogramFeatures: exact counts of byte % dims, " +
      "CSV-serialized; totals equal n_bytes") {
    val df = Seq((1L, "aab"), (2L, ""))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast(BinaryType))
    val rows = Multimodal.byteHistogramFeatures(df, "doc_id", "payload", 4)
      .orderBy("doc_id").collect()
    // 'a' = 97 → 97 % 4 = 1; 'b' = 98 → 2
    assert(rows(0).getLong(1) == 3L)
    assert(rows(0).getString(2) == "0,2,1,0")
    assert(rows(1).getLong(1) == 0L && rows(1).getString(2) == "0,0,0,0")
    val sums = rows.map(r =>
      r.getString(2).split(",").map(_.toLong).sum == r.getLong(1))
    assert(sums.forall(identity))
  }
}
