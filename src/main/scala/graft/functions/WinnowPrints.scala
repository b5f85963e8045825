package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed substring fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting") — the
  * suffix-granularity repeat detector: fingerprint every L-char gram at
  * EVERY offset, then keep only each W-window's minimum. The winnowing
  * guarantee: any substring shared between two documents with length
  * ≥ L + W − 1 yields at least one shared selected fingerprint — at ANY
  * alignment, the repeat class t25's fixed stride-W windows can straddle
  * (VERDICT r15 missing-capability #3; Lee et al. 2022 use a suffix
  * array for the same detection — winnowing is the bounded-state
  * streaming formulation of it).
  *
  * Returns the doc's DISTINCT selected fingerprints, sorted (16-hex-char
  * md5 prefixes — the value a SQL twin `substr(md5(substring(text,p,L)),
  * 1,16)` + sliding `min() OVER (ROWS W−1 FOLLOWING)` reproduces
  * exactly, which is what keeps t38 value-oracled). A doc shorter than
  * L + W − 1 has no complete window and returns an EMPTY array —
  * mirroring the SQL twin, which has no valid window start there.
  *
  * 100 TB shape: ONE narrow pass per document — the n-row stride-1 gram
  * explosion and the per-doc WindowExec sliding min both stay INSIDE
  * this expression (O(W) deque state, no buffering), and only the ~2n/W
  * selected prints leave the scan stage. Gram slicing is codepoint-based
  * (`UTF8String.substring`, the unit Spark's and DuckDB's `substring`
  * share); hashing is md5 over the gram's UTF-8 bytes on both sides. */
case class WinnowPrints(child: Expression, gramLen: Int, window: Int)
    extends UnaryExpression {
  require(gramLen >= 1 && window >= 1,
    s"winnow_prints needs gramLen >= 1 and window >= 1, got $gramLen/$window")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_prints requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = WinnowPrints.name

  override protected def withNewChildInternal(newChild: Expression): WinnowPrints =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    WinnowPrints.compute(input.asInstanceOf[UTF8String], gramLen, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.WinnowPrints.compute($input, $gramLen, $window);")
}

object WinnowPrints {
  val name = "winnow_prints"

  private val hexDigits = "0123456789abcdef".toCharArray

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 16 hex chars (8 bytes) of md5 — matches
    * `substr(md5(gram), 1, 16)` in Spark SQL and DuckDB alike. */
  private def fp16(bytes: Array[Byte]): String = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = hexDigits((h(i) >> 4) & 0xF)
      out(2 * i + 1) = hexDigits(h(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  def compute(s: UTF8String, gramLen: Int, window: Int): ArrayData = {
    val n = s.numChars()
    if (n < gramLen + window - 1) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - gramLen + 1
    val fps = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      fps(i) = fp16(s.substring(i, i + gramLen).getBytes)
      i += 1
    }
    // sliding minimum with a monotone index deque: O(nGrams) total.
    // Selection by VALUE (the window's min string), so hash ties — both
    // occurrences selected in SQL's min() — lose nothing: the same
    // value lands in the distinct set either way.
    val selected = new java.util.TreeSet[String]()
    val deque = new java.util.ArrayDeque[Int]()
    var p = 0
    while (p < nGrams) {
      while (!deque.isEmpty && fps(deque.peekLast()).compareTo(fps(p)) >= 0)
        deque.pollLast()
      deque.addLast(p)
      if (deque.peekFirst() <= p - window) deque.pollFirst()
      if (p >= window - 1) selected.add(fps(deque.peekFirst()))
      p += 1
    }
    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Strict-arity SQL builder at fixed (L, W) — the t38 geometry. */
  def builder(gramLen: Int, window: Int): Seq[Expression] => Expression = {
    case Seq(a) => WinnowPrints(a, gramLen, window)
    case args => throw new IllegalArgumentException(
      s"$name(text) takes exactly 1 argument, got ${args.length}")
  }

  def register(spark: SparkSession, gramLen: Int, window: Int): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[WinnowPrints].getName, name),
      builder(gramLen, window))
}
