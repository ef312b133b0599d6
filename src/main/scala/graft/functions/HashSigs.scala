package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass signature kernels for the dedup operators, as native
  * Catalyst expressions with `doGenCode`.
  *
  * Why expressions and not column combinators: the lambda higher-order
  * functions (`transform`/`aggregate`/`filter`) are CodegenFallback in
  * Spark — every array element costs an interpreted lambda dispatch
  * with boxing. A minhash signature touches each shingle 17 times
  * (hash + 16 permutations); at ~300 shingles/doc that is ~5k boxed
  * evaluations per row, and the first narrow formulation of these
  * operators measured ~3x SLOWER than the explode+groupBy plan it
  * replaced despite shuffling nothing. These expressions keep the
  * shuffle-free plan shape and do the whole per-document computation
  * in one tight JVM loop per row: codegen emits a single static call,
  * so the surrounding projection stays inside whole-stage codegen.
  *
  * Hash parity: every hash here replicates the engine-wide portable
  * family EXACTLY — `md5h60(s)` = first 15 hex digits of md5 as a
  * 60-bit big-endian integer (== `conv(substring(md5(s),1,15),16,10)`
  * == DuckDB `('0x'||substr(md5(s),1,15))::BIGINT`) — so the DuckDB
  * oracles and the SQL-function parity tests stay value-exact.
  * Tokenization replicates `split(text, ' ')` with Java limit -1
  * (trailing empty tokens kept), and the char k-grams replicate
  * `substr` code-point semantics via the same `UTF8String` method
  * Spark's own Substring uses.
  */
object HashSigs {
  import graft.ops.DedupOps.{NumHashes, P30, PMOD}

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) big-endian: the value of the first 15
    * hex digits of the digest. */
  private def md5h60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val digest = md.get()
    digest.update(bytes, off, len)
    val d = digest.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  private def md5h60(s: String): Long = {
    val b = s.getBytes("UTF-8")
    md5h60(b, 0, b.length)
  }

  /** Distinct word n-grams of `split(text, " ")` (limit -1), joined
    * with single spaces, in FIRST-OCCURRENCE order — the exact
    * shingle unit of TextOps.ngrams. The single n-gram builder behind
    * both [[shingleArray]] (order-sensitive: parity tests compare
    * element-wise against the HOF formulation) and [[minhash]] (order
    * irrelevant to a min). */
  private def distinctShingles(text: UTF8String, n: Int): java.util.LinkedHashSet[String] = {
    val t = text.toString.split(" ", -1)
    val set = new java.util.LinkedHashSet[String]()
    if (t.length >= n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= t.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(t(i + k))
          k += 1
        }
        set.add(sb.toString)
        i += 1
      }
    }
    set
  }

  /** Distinct shingles in first-occurrence order, as an array value —
    * exactly `array_distinct(transform(...))` over the sequential
    * n-gram positions, i.e. TextOps.ngrams. */
  def shingleArray(text: UTF8String, n: Int): ArrayData = {
    val set = distinctShingles(text, n)
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** All 16 minhash values over the doc's distinct shingles; empty
    * array when the doc has no shingle (< n tokens). */
  def minhash(text: UTF8String, n: Int): ArrayData = {
    val shingles = distinctShingles(text, n)
    if (shingles.isEmpty) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val x = md5h60(it.next()) % P30
      var i = 0
      while (i < NumHashes) {
        val v = (x * (2 * i + 1) + (97 + 31 * i)) % PMOD
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** 32-bit simhash over distinct non-empty words: bit k is set iff
    * strictly more word hashes have bit k set than unset. Returns -1
    * for a doc with no non-empty word (callers filter those out; the
    * grouped formulation produced no row). -1 is outside the 32-bit
    * signature range, so it cannot collide with a real signature. */
  def simhash(text: UTF8String): Long = {
    val t = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](32)
    var nWords = 0
    var i = 0
    while (i < t.length) {
      val w = t(i)
      if (w.nonEmpty && seen.add(w)) {
        val h = md5h60(w)
        var k = 0
        while (k < 32) { counts(k) += ((h >>> k) & 1L).toInt; k += 1 }
        nWords += 1
      }
      i += 1
    }
    if (nWords == 0) return -1L
    var sig = 0L
    var k = 0
    while (k < 32) {
      if (2 * counts(k) > nWords) sig |= (1L << k)
      k += 1
    }
    sig
  }

  /** Distinct winnowing fingerprints: md5h60 of every char k-gram
    * (code-point `substr` semantics, exactly Spark's), then the min of
    * every sliding window of `win` k-gram hashes. Empty array when the
    * text is shorter than k + win - 1 chars. */
  def winnow(text: UTF8String, k: Int, win: Int): ArrayData = {
    val nGrams = text.numChars() - (k - 1)
    if (nGrams < win)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val h = new Array[Long](nGrams)
    if (text.numBytes() == text.numChars()) {
      // ASCII fast path: bytes == chars, hash slices in place
      val bytes = text.getBytes
      var pos = 0
      while (pos < nGrams) { h(pos) = md5h60(bytes, pos, k); pos += 1 }
    } else {
      var pos = 0
      while (pos < nGrams) {
        val b = text.substringSQL(pos + 1, k).getBytes
        h(pos) = md5h60(b, 0, b.length)
        pos += 1
      }
    }
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    var s = 0
    while (s <= nGrams - win) {
      var m = h(s)
      var j = 1
      while (j < win) { if (h(s + j) < m) m = h(s + j); j += 1 }
      set.add(m)
      s += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Analysis-time string-argument check shared by the signature
  * kernels: a wrong-typed SQL argument (`minhash_sigs(doc_id)`) fails
  * at analysis with a clear message instead of a Janino compile error
  * + per-row ClassCastException in the interpreted fallback. */
trait StringKernelInput { self: UnaryExpression =>
  def kernelName: String
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      // an untyped NULL literal (`minhash_sigs(NULL)`) keeps the
      // null-in/null-out behavior nullSafeEval already implements —
      // rejecting NullType here would fail analysis on a query that
      // evaluated fine before the check existed
      case NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$kernelName expects a string argument, got ${other.simpleString}")
    }
}

/** mh0..mh15 as array<long>; empty array when the doc has no shingle. */
case class MinhashSigs(child: Expression, n: Int = 3)
    extends UnaryExpression with StringKernelInput {
  override def kernelName: String = "minhash_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashSigs.minhash(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashSigs.minhash($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

/** 32-bit simhash as long; -1 when the doc has no non-empty word. */
case class SimhashSig(child: Expression)
    extends UnaryExpression with StringKernelInput {
  override def kernelName: String = "simhash_sig"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashSigs.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashSigs.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

/** Distinct word n-gram shingles as array<string>, first-occurrence
  * order — value-identical to the HOF `TextOps.ngrams` (parity test in
  * OpsSpec). Null text stays null (callers explode or size() it, where
  * null and the HOF's empty array behave identically). */
case class NgramShingles(child: Expression, n: Int = 3)
    extends UnaryExpression with StringKernelInput {
  override def kernelName: String = "ngram_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashSigs.shingleArray(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashSigs.shingleArray($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)
}

/** Distinct winnowing fingerprints as array<long>. */
case class WinnowFps(child: Expression, k: Int = 8, win: Int = 4)
    extends UnaryExpression with StringKernelInput {
  override def kernelName: String = "winnow_fps"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashSigs.winnow(input.asInstanceOf[UTF8String], k, win)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashSigs.winnow($c, $k, $win)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object SigFunctions {
  private def intArg(e: Expression): Int = {
    require(e.foldable && e.dataType == IntegerType,
      s"expected a literal INT argument, got $e: ${e.dataType.simpleString}")
    e.eval().asInstanceOf[Int]
  }

  /** Register the signature kernels for SQL/selectExpr use in this
    * session (same temp-function surface as `spans`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_sigs", {
      case Seq(c)    => MinhashSigs(c)
      case Seq(c, n) => MinhashSigs(c, intArg(n))
      case exprs => throw new IllegalArgumentException(
        s"minhash_sigs(text[, n]) takes 1-2 arguments, got ${exprs.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("simhash_sig", {
      case Seq(c) => SimhashSig(c)
      case exprs => throw new IllegalArgumentException(
        s"simhash_sig(text) takes 1 argument, got ${exprs.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("ngram_shingles", {
      case Seq(c)    => NgramShingles(c)
      case Seq(c, n) => NgramShingles(c, intArg(n))
      case exprs => throw new IllegalArgumentException(
        s"ngram_shingles(text[, n]) takes 1-2 arguments, got ${exprs.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fps", {
      case Seq(c)          => WinnowFps(c)
      case Seq(c, k, w)    => WinnowFps(c, intArg(k), intArg(w))
      case exprs => throw new IllegalArgumentException(
        s"winnow_fps(text[, k, win]) takes 1 or 3 arguments, got ${exprs.length}")
    }, "scala_udf")
  }
}
