package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star, BASELINE.json): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction per partition.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): `Decoder` is the pluggable seam; `StubDecoder` is a
  * deterministic fake so the Spark-side plumbing — schema, batch
  * iteration, partition-local decoder reuse — is real and tested.
  * This is the Scala analogue of a Pandas `mapInPandas` decode stage:
  * `mapPartitions` gives the same batch shape (one decoder instance
  * per partition, streamed rows, no per-row init cost), which is what
  * matters at 100 TB — decode parallelism scales with partitions and
  * never funnels through the driver.
  */
object Multimodal {

  /** Media metadata produced by a decoder. */
  case class MediaMeta(width: Int, height: Int, nBytes: Long, format: String)

  /** Pluggable per-partition decoder. Real implementations would wrap
    * an image/audio codec; they are instantiated once per partition.
    */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
  }

  /** Deterministic fake: derives metadata purely from the bytes. */
  object StubDecoder extends Decoder {
    override def decode(payload: Array[Byte]): MediaMeta = {
      val n = if (payload == null) 0 else payload.length
      MediaMeta(width = n % 640, height = (n * 7) % 480, nBytes = n.toLong,
        format = if (n % 2 == 0) "png" else "jpeg")
    }
  }

  private val metaType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("format", StringType)))

  /** Decode a binary column into a metadata struct, one decoder per
    * partition (mapPartitions — the batch seam).
    */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String,
                 decoder: Decoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("meta", metaType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // decoder referenced once per partition — real codecs would
      // allocate native buffers here, amortized over the partition
      val d = decoder
      rows.map { r =>
        val m = d.decode(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), Row(m.width, m.height, m.nBytes, m.format))
      }
    }
  }

  /** Synthesize a deterministic grayscale CHECKERBOARD PNG per row —
    * the fixture half of the REAL decode path: for id `k`,
    * `w = 8 + k % 16`, `h = 8 + (3k) % 16`, `v = k % 251`, and
    * `pixel(x,y) = v` when `x + y` is even else `255 - v`. Every
    * quantity is closed-form from `k`, so an oracle can replay
    * width/height/pixel-sum WITHOUT decoding: the even-cell count is
    * `(w*h + (w%2)*(h%2)) / 2`, giving
    * `px_sum = nEven*v + (w*h - nEven)*(255 - v)`.
    * Encoding runs per partition (javax.imageio is JDK-built-in) —
    * this is the synthetic stand-in for a real corpus's stored
    * payloads, at the same mapPartitions seam.
    */
  def synthCheckerboardPng(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("png", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val k = r.getLong(idIdx)
        val w = (8 + k % 16).toInt
        val h = (8 + (3 * k) % 16).toInt
        val v = (k % 251).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0,
              if ((x + y) % 2 == 0) v else 255 - v)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, "png", out),
          "JDK PNG writer unavailable")
        Row(k, out.toByteArray)
      }
    }
  }

  /** REAL image decode (javax.imageio — PNG/JPEG/GIF/BMP ship with
    * the JDK, no new deps): binary column → (id, width, height,
    * px_sum, format), where `px_sum` totals band 0 of the decoded
    * raster — a deterministic pixel-level proof the bytes actually
    * decoded, not just header sniffing. One ImageIO round per row,
    * per partition (the mapInPandas-equivalent batch seam): decode
    * parallelism scales with partitions, nothing funnels through the
    * driver. Undecodable payloads fail loudly — a curation pipeline
    * dropping them does so explicitly upstream, never silently here.
    */
  def decodeImage(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("px_sum", LongType),
      StructField("format", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"undecodable image payload " +
          s"(id ${r.get(idIdx)}, ${if (bytes == null) -1 else bytes.length} bytes)")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
          val img = reader.read(0)
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          Row(r.get(idIdx), w, h, sum, fmt)
        } finally { reader.dispose(); iis.close() }
      }
    }
  }

  /** Deterministic frame-sampling plan for a (stub) video column:
    * emits one row per sampled frame index — the explode-side shape of
    * a frame-extraction pipeline.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   everyNBytes: Int): DataFrame =
    df.select(col(idCol),
      length(col(binCol)).as("n_bytes"),
      explode(sequence(lit(0),
        floor(length(col(binCol)) / everyNBytes).cast(IntegerType)))
        .as("frame_idx"))

  /** Pluggable binary→binary transform — the resize/transcode seam.
    * One instance per partition, like [[Decoder]].
    */
  trait BinaryTransform extends Serializable {
    def apply(payload: Array[Byte]): Array[Byte]
  }

  /** Deterministic stand-in for a 2× downscale: keeps every second
    * byte (a real implementation wraps an image scaler; the byte
    * arithmetic here is chosen so the oracle can replay it).
    */
  object StubHalve extends BinaryTransform {
    override def apply(payload: Array[Byte]): Array[Byte] = {
      if (payload == null) return Array.emptyByteArray
      val out = new Array[Byte]((payload.length + 1) / 2)
      var i = 0
      while (i < out.length) { out(i) = payload(2 * i); i += 1 }
      out
    }
  }

  /** Apply a binary transform per partition — the mapPartitions
    * resize stage: (id, payload) → (id, payload_out). Decode
    * parallelism scales with partitions; nothing shuffles.
    */
  def transformBinary(df: DataFrame, idCol: String, binCol: String,
                      t: BinaryTransform): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("payload_out", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val tr = t // one transform instance per partition
      rows.map(r => Row(r.get(idIdx), tr(r.getAs[Array[Byte]](binIdx))))
    }
  }

  /** Per-payload byte-histogram features — the feature-extraction
    * seam feeding the embedding/ANN path: `dims` exact integer
    * counts of `byte % dims`, emitted as a CSV string (array-typed
    * result columns are hostile to cross-engine compares; exact
    * integers serialize identically everywhere). A real extractor
    * would run a vision/audio model per partition batch — the
    * mapPartitions shape is identical.
    */
  def byteHistogramFeatures(df: DataFrame, idCol: String,
                            binCol: String, dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 256, s"dims must be in [1,256]: $dims")
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("n_bytes", LongType),
      StructField("feat_csv", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](binIdx)
        val hist = new Array[Long](dims)
        var i = 0
        val n = if (p == null) 0 else p.length
        while (i < n) { hist((p(i) & 0xff) % dims) += 1; i += 1 }
        Row(r.get(idIdx), n.toLong, hist.mkString(","))
      }
    }
  }

  /** Shard packing for binary payloads: route each payload to one of
    * `writers` writer shards, then lay the shard's payloads out as one
    * contiguous byte stream cut into fixed `maxBytes` volumes — each
    * row gets (writer, file_seq, offset): the VOLUME its first byte
    * falls in and the position within that volume. This is the
    * multi-volume layout (`tar --multi-volume` / fixed-size chunked
    * object uploads): volume sizes are exact, and a payload whose
    * window straddles a boundary CONTINUES into the next volume —
    * consumers read `byte_len` bytes from (file_seq, offset) across
    * volume boundaries. (A never-split WebDataset-style writer instead
    * closes each tar early at a member boundary — that layout's file
    * assignment is an inherently sequential per-writer fold, not a
    * prefix sum; this operator trades it for the window-computable,
    * engine-replayable volume layout.)
    *
    * 100 TB shape: routing is map-only (`pmod` on the stable id — a
    * doc never migrates across re-runs); the ONLY shuffle is the
    * per-writer window, and its partition size is corpus/writers —
    * pick `writers` ≫ executor count and no single task sees more
    * than a shard. Never a global sort.
    */
  def packShards(df: DataFrame, idCol: String, binCol: String,
                 writers: Int, maxBytes: Long): DataFrame = {
    require(writers > 0 && maxBytes > 0, "writers and maxBytes positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("writer").orderBy(idCol)
    df.select(col(idCol), length(col(binCol)).cast(LongType).as("byte_len"),
        pmod(col(idCol), lit(writers)).cast(LongType).as("writer"))
      .withColumn("cum", sum(col("byte_len")).over(w))
      .select(col(idCol), col("writer"), col("byte_len"),
        floor((col("cum") - col("byte_len")) / lit(maxBytes).cast(DoubleType))
          .cast(LongType).as("file_seq"),
        (col("cum") - col("byte_len") -
          floor((col("cum") - col("byte_len")) / lit(maxBytes).cast(DoubleType))
            .cast(LongType) * maxBytes).as("offset"))
  }
}
