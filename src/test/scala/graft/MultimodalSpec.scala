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

  test("packShards: multi-volume layout — (file_seq, offset) is the " +
      "exact position of each payload's first byte in the stream") {
    // one writer so the layout is a single sequence; 10-byte volumes
    val df = (1L to 6L).map(i => (i, "x" * (i.toInt * 3)))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast(BinaryType))
    val rows = Multimodal.packShards(df, "doc_id", "payload",
      writers = 1, maxBytes = 10L).orderBy("doc_id").collect()
    // lens 3,6,9,12,15,18; stream starts 0,3,9,18,30,45 →
    // volume floor(start/10) and offset start%10 (a payload straddling
    // a boundary continues into the next volume; volumes 2 holds only
    // payload-4's tail, so no payload STARTS in it)
    assert(rows.map(_.getLong(3)).toSeq == Seq(0L, 0L, 0L, 1L, 3L, 4L))
    assert(rows.map(_.getLong(4)).toSeq == Seq(0L, 3L, 9L, 8L, 0L, 5L))
    // invariant: file_seq * maxBytes + offset == running byte start
    val starts = rows.map(_.getLong(2)).scanLeft(0L)(_ + _)
    rows.zip(starts).foreach { case (r, start) =>
      assert(r.getLong(3) * 10 + r.getLong(4) == start)
      assert(r.getLong(4) >= 0 && r.getLong(4) < 10)
    }
  }

  test("REAL image decode (javax.imageio): synthesized PNGs round-trip " +
      "to exact width/height/pixel-sum, a JPEG decodes through the " +
      "same path, and garbage bytes fail loudly") {
    val ids = Seq(0L, 1L, 17L, 250L, 251L, 1000L)
    val df = ids.toDF("doc_id")
    val png = Multimodal.synthCheckerboardPng(df, "doc_id")
    // payloads are REAL PNGs (magic bytes), not header fakes
    png.collect().foreach { r =>
      val b = r.getAs[Array[Byte]](1)
      assert(b.take(4).toSeq == Seq[Byte](0x89.toByte, 0x50, 0x4E, 0x47),
        s"doc ${r.getLong(0)}: not a PNG payload")
    }
    val got = Multimodal.decodeImage(png, "doc_id", "png")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Long, String)].collect().toSeq
    val want = ids.sorted.map { k =>
      val w = (8 + k % 16).toInt
      val h = (8 + 3 * k % 16).toInt
      val v = k % 251
      val nEven = (w * h + (w % 2) * (h % 2)) / 2
      (k, w, h, nEven * v + (w.toLong * h - nEven) * (255 - v), "png")
    }
    assert(got == want, s"decoded metadata wrong:\n$got\nvs\n$want")
    // a JPEG decodes through the same seam (format reported)
    val img = new java.awt.image.BufferedImage(
      5, 3, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 3).foreach(y => (0 until 5).foreach(x =>
      img.getRaster.setSample(x, y, 0, 128)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val jdf = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
    val jr = Multimodal.decodeImage(jdf, "doc_id", "payload")
      .as[(Long, Int, Int, Long, String)].head()
    assert(jr._2 == 5 && jr._3 == 3 && jr._5.contains("jpeg"),
      s"jpeg decode wrong: $jr")
    // undecodable payloads are a loud failure, never silent nulls
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.decodeImage(bad, "doc_id", "payload").collect())
    assert(e.getMessage.contains("undecodable") ||
      Option(e.getCause).exists(_.getMessage.contains("undecodable")),
      e.getMessage.take(300))
  }

  test("packShards: writer routing is stable and the full corpus is " +
      "covered exactly once") {
    val df = (0L until 40L).map(i => (i, "y" * 5)).toDF("doc_id", "text")
      .withColumn("payload", col("text").cast(BinaryType))
    val rows = Multimodal.packShards(df, "doc_id", "payload",
      writers = 4, maxBytes = 12L).collect()
    assert(rows.length == 40)
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) % 4))
    // within a writer, the first three 5-byte payloads start at stream
    // bytes 0, 5, 10 — the third straddles the 12-byte volume boundary
    val w0 = rows.filter(_.getLong(1) == 0L).sortBy(_.getLong(0))
    assert(w0.map(r => (r.getLong(3), r.getLong(4))).take(3).toSeq ==
      Seq((0L, 0L), (0L, 5L), (0L, 10L)))
  }
}
