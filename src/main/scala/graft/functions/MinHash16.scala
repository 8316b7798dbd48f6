package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-lane MinHash signature of a shingle set — the engine's hottest text
  * kernel (every MinHash-LSH query evaluates it per document).
  *
  * Semantics are EXACTLY the higher-order-function composition it replaces
  * (graft.ops.DedupQueries round-2 spelling, mirrored by the DuckDB oracle):
  * lane p is the minimum, over the shingle set, of the p-th non-overlapping
  * 8-hex-char window of `sha256('0:'+x) ++ sha256('1:'+x)` (two 64-hex-char
  * lowercase digests = 16 windows; fixed-width lowercase hex compares
  * lexicographically exactly as its numeric value, so the minima are string
  * minima). Verified bit-identical to the composition in PropertySpec.
  *
  * Why a custom Expression: the HOF spelling costs, per document,
  * 16 interpreted `transform` closures × n_shingles interpreted `substr`
  * allocations on top of materializing a 128-char concat per shingle —
  * CodegenFallback all the way down. This kernel makes ONE pass over the
  * shingles, two digests each, and keeps 16 running 8-byte minima; the
  * per-row work happens in compiled Java behind a static call, keeping the
  * surrounding projection inside WholeStageCodegen.
  *
  * Null handling mirrors the composition: null input → null; null elements
  * are skipped; an empty (or all-null) array yields 16 null lanes (what
  * `array_min(transform([], …))` produced). Callers filter `size(sh) > 0`.
  * Registered as `graft_minhash` via [[graft.GraftExtensions]]. */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    MinHash16.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, sh => s"graft.functions.MinHash16.compute($sh)")

  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)
}

object MinHash16 {

  private val hexDigits = "0123456789abcdef".getBytes

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  /** Lowercase-hex digest of `prefix ++ shingle` as ASCII bytes. */
  private def hexDigest(md: MessageDigest, prefix: Byte, x: Array[Byte]): Array[Byte] = {
    md.reset()
    md.update(prefix)
    md.update(':'.toByte)
    md.update(x)
    val d = md.digest()
    val out = new Array[Byte](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    out
  }

  /** True iff window `w` of `cand` is byte-lexicographically smaller than
    * `cur` (ASCII hex, fixed width 8 — identical to UTF8String compare). */
  private def lessAt(cand: Array[Byte], off: Int, cur: Array[Byte]): Boolean = {
    var i = 0
    while (i < 8) {
      val c = (cand(off + i) & 0xff) - (cur(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    false
  }

  /** One pass over the shingle array: 2 digests per shingle, 16 running
    * minima. Called from both interpreted eval and generated code. */
  def compute(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    val mins = new Array[Array[Byte]](16)
    val md = digestLocal.get()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val x = sh.getUTF8String(i).getBytes
        val d0 = hexDigest(md, '0'.toByte, x)
        val d1 = hexDigest(md, '1'.toByte, x)
        var p = 0
        while (p < 16) {
          val (src, off) = if (p < 8) (d0, p * 8) else (d1, (p - 8) * 8)
          if (mins(p) == null || lessAt(src, off, mins(p))) {
            val w = new Array[Byte](8)
            System.arraycopy(src, off, w, 0, 8)
            mins(p) = w
          }
          p += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](16)
    var p = 0
    while (p < 16) {
      out(p) = if (mins(p) == null) null else UTF8String.fromBytes(mins(p))
      p += 1
    }
    new GenericArrayData(out)
  }
}
