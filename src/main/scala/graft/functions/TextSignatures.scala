package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass signature kernels shared by interpreted eval and
  * generated code. Replacing the DataFrame-level formulations
  * (shingle explode → distinct → groupBy(min) ×k, and token explode →
  * 64 conditional sums) with one projection expression removes a full
  * shuffle of exploded rows and millions of substring allocations per
  * partition — the difference between a multi-stage job and a
  * map-only pass at 100 TB.
  *
  * Hash family: FNV-1a over the window/token chars, avalanched with
  * the Murmur3 fmix64 finalizer (public-domain constants), seed-mixed
  * per permutation. min() is idempotent under duplicates, so shingle
  * de-duplication is unnecessary by construction.
  */
object TextSignatureKernels {

  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** k MinHash values over `shingleLen`-char sliding windows. */
  def minHashSignature(text: UTF8String, k: Int, shingleLen: Int,
                       seeds: Array[Long]): ArrayData = {
    val s = text.toString
    val mins = Array.fill(k)(Long.MaxValue)
    val nWindows = math.max(s.length - shingleLen + 1, 1)
    var i = 0
    while (i < nWindows) {
      var h = FnvOffset
      var j = i
      val end = math.min(i + shingleLen, s.length)
      while (j < end) { h = (h ^ s.charAt(j).toLong) * FnvPrime; j += 1 }
      var t = 0
      while (t < k) {
        val v = fmix64(h ^ seeds(t))
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit frequency-weighted SimHash over lowercase [a-z0-9] token
    * runs (same tokenization as `TextAnalysis.tokens`).
    */
  def simHash(text: UTF8String): Long = {
    val s = text.toString
    val counters = new Array[Int](64)
    var i = 0
    var h = FnvOffset
    var inTok = false
    def flush(): Unit = if (inTok) {
      val v = fmix64(h)
      var b = 0
      while (b < 64) {
        if (((v >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      h = FnvOffset; inTok = false
    }
    while (i < s.length) {
      val c = Character.toLowerCase(s.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        h = (h ^ c.toLong) * FnvPrime; inTok = true
      } else flush()
      i += 1
    }
    flush()
    var sig = 0L
    var b = 0
    while (b < 64) { if (counters(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** DSIR hashed-feature buckets (Xie et al. 2023): for a token
    * array, the bucket of every unigram then every adjacent bigram
    * (joined by one space), where bucket = first 4 md5 bytes as an
    * unsigned int, mod `k` — EXACTLY
    * `conv(substring(md5(f),1,8),16,10) % k`, without materializing
    * the 32-char hex string and parsing it back per feature.
    */
  def dsirBuckets(tk: ArrayData, k: Int): ArrayData = {
    val n = tk.numElements()
    val nBi = if (n >= 2) n - 1 else 0
    val out = new Array[Long](n + nBi)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(bytes: Array[Byte]): Long = {
      val d = md.digest(bytes) // digest() resets for the next call
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      v % k
    }
    var i = 0
    while (i < n) {
      out(i) = bucket(tk.getUTF8String(i).getBytes)
      i += 1
    }
    i = 0
    while (i < nBi) {
      val a = tk.getUTF8String(i).getBytes
      val b = tk.getUTF8String(i + 1).getBytes
      val buf = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, buf, 0, a.length)
      buf(a.length) = ' '
      System.arraycopy(b, 0, buf, a.length + 1, b.length)
      out(n + i) = bucket(buf)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-doc character-trigram histogram in ONE pass: (gram, count)
    * structs sorted by gram. Equivalent to exploding every sliding
    * 3-char window and counting per (doc, gram) — without the
    * occurrence-grained explode and its corpus-sized hash-agg
    * shuffle. Callers normalize first ([a-z0-9 ] ASCII), so Java char
    * windows ≡ SQL substr's code-point windows.
    */
  def trigramCounts(text: UTF8String): ArrayData = {
    val s = text.toString
    if (s.length < 3) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.TreeMap[String, Long]()
    var i = 0
    while (i + 3 <= s.length) {
      val g = s.substring(i, i + 3)
      val prev = m.get(g)
      m.put(g, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val out = new Array[Any](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_minhash_sig(text, k, shingleLen)` → array<long>. */
case class MinHashSig(child: Expression, k: Int, shingleLen: Int)
    extends UnaryExpression {
  require(k > 0 && shingleLen > 0)

  // deterministic per-permutation seeds (fixed constants → re-runs
  // and retries produce identical signatures)
  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => TextSignatureKernels.fmix64(0x9e3779b97f4a7c15L * (i + 1)))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    TextSignatureKernels.minHashSignature(
      input.asInstanceOf[UTF8String], k, shingleLen, seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextSignatureKernels.minHashSignature($c, $k, $shingleLen, $seedsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `graft_simhash(text)` → long. */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    TextSignatureKernels.simHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextSignatureKernels.simHash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** `graft_trigram_counts(text)` → array<struct<g:string,n:long>>. */
case class TrigramCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n", LongType,
        nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_trigram_counts"

  override def nullSafeEval(input: Any): Any =
    TextSignatureKernels.trigramCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextSignatureKernels.trigramCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): TrigramCounts =
    copy(child = newChild)
}

/** `graft_dsir_buckets(tokens, k)` → array<long>. */
case class DsirBuckets(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"k must be positive: $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dsir_buckets"

  override def nullSafeEval(input: Any): Any =
    TextSignatureKernels.dsirBuckets(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextSignatureKernels.dsirBuckets($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

/** Registration + Column wrappers (same pattern as GraftFunctions). */
object TextSignatures {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => sys.error(s"$what must be an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig",
      args => MinHashSig(args.head, intLit(args(1), "k"),
        intLit(args(2), "shingleLen")),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", args => SimHashSig(args.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_trigram_counts", args => TrigramCounts(args.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dsir_buckets",
      args => DsirBuckets(args.head, intLit(args(1), "k")), "scala_udf")
  }

  def minHashSig(text: Column, k: Int, shingleLen: Int): Column =
    call_function("graft_minhash_sig", text,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(shingleLen))

  def simHash(text: Column): Column = call_function("graft_simhash", text)

  def trigramCounts(text: Column): Column =
    call_function("graft_trigram_counts", text)

  def dsirBuckets(tokens: Column, k: Int): Column =
    call_function("graft_dsir_buckets", tokens,
      org.apache.spark.sql.functions.lit(k))
}
