package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (FastCDC/gear-hash style) of a payload into
  * variable-size chunks, returning each chunk's MD5 hex — the real
  * block-level dedup primitive [[graft.ops.MultimodalQueries.chunkCensus]]'s
  * fixed-width variant approximates.
  *
  * Why content-defined: fixed-width chunking breaks on INSERTION — one added
  * byte shifts every downstream boundary, so two payloads differing by a
  * prefix share no chunks. Gear hashing cuts where a rolling hash of the
  * local byte context hits a mask, so boundaries re-synchronize within ~one
  * chunk of an edit and the shared tail hashes identically
  * (shift-invariance, property-tested in CdcChunksSpec).
  *
  * Algorithm (one pass, O(bytes)): rolling `h = (h << 1) + gear(byte)` over
  * the UTF-8 bytes; cut after a byte when the chunk has ≥ [[CdcChunks.MinChunk]]
  * bytes and `(h & mask) == 0` (avg chunk ≈ min + 2^[[CdcChunks.MaskBits]]),
  * or at [[CdcChunks.MaxChunk]] (pathological-content bound). The 256-entry
  * gear table derives from md5("gear:i") — deterministic and reproducible
  * from the spec alone, no magic constants.
  *
  * Why a native Expression: the rolling recurrence is inherently sequential
  * per payload — inexpressible in codegen'd SQL functions short of a
  * CodegenFallback HOF fold per byte — while this kernel is one compiled
  * pass behind a static call, keeping the surrounding projection inside
  * WholeStageCodegen. No SQL oracle for the same reason (the one class of
  * operator where DuckDB replay is not reasonably expressible); correctness
  * is held by a driver-side reimplementation + the shift-invariance
  * property in CdcChunksSpec. Registered as `graft_cdc_chunks`. */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CdcChunks.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** Byte LENGTH of each content-defined chunk of the payload (same cut rule
  * as [[CdcChunks]], without hashing) — the observability face of the
  * kernel: lengths feed the structural CLAIMS the oracle can assert
  * (coverage: lengths sum to the payload's byte count; bounds: every chunk
  * ≤ MaxChunk, every non-tail chunk ≥ MinChunk) without replaying the
  * sequential gear recurrence in SQL. Registered as
  * `graft_cdc_chunk_lens`. */
case class CdcChunkLens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunk_lens"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.computeLens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CdcChunks.computeLens($s)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkLens =
    copy(child = newChild)
}

object CdcChunks {

  /** Chunks never cut before this many bytes (also skips hashing the first
    * bytes of each chunk in classic FastCDC; kept hashing-simple here). */
  val MinChunk = 16
  /** Hard upper bound — content with no mask hits still terminates. Note
    * MaxChunk cuts are POSITIONAL, not content-defined, so they do not
    * resynchronize across an edit; content whose gear stream never hits the
    * mask (possible on tiny-alphabet/repetitive payloads) degrades to
    * fixed-width behavior for that stretch. FastCDC's normalized chunking
    * (a looser mask past the target size) shrinks that tail — the constant
    * here keeps the reference kernel minimal and the behavior explicit
    * (CdcChunksSpec measures the aggregate resync rate). */
  val MaxChunk = 256
  /** Cut probability 2^-MaskBits per eligible byte → avg ≈ MinChunk + 64. */
  val MaskBits = 6

  private val mask: Long = (1L << MaskBits) - 1

  /** Deterministic gear table: first 8 bytes of md5("gear:i"), big-endian. */
  val gear: Array[Long] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(256) { i =>
      md.reset()
      val d = md.digest(s"gear:$i".getBytes("UTF-8"))
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h
    }
  }

  private val hexDigits = "0123456789abcdef".getBytes

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5Hex(md: MessageDigest, bytes: Array[Byte], from: Int, until: Int): UTF8String = {
    md.reset()
    md.update(bytes, from, until - from)
    val d = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Cut points over `bytes` by the gear-hash rule: returns exclusive chunk
    * ends. Shared by eval and the spec's independent walker. */
  def cutPoints(bytes: Array[Byte]): Seq[Int] = {
    val cuts = Seq.newBuilder[Int]
    var start = 0
    var h = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= MinChunk && (h & mask) == 0L) || len == MaxChunk) {
        cuts += i + 1
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) cuts += n
    cuts.result()
  }

  /** One pass: gear-roll, cut, md5 each chunk. Empty input → empty array. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val md = md5Local.get()
    var start = 0
    var h = 0L
    var i = 0
    val n = bytes.length
    val out = Seq.newBuilder[Any]
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= MinChunk && (h & mask) == 0L) || len == MaxChunk) {
        out += md5Hex(md, bytes, start, i + 1)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) out += md5Hex(md, bytes, start, n)
    new GenericArrayData(out.result().toArray)
  }

  /** Chunk byte lengths by the same cut rule ([[CdcChunkLens]]). */
  def computeLens(s: UTF8String): ArrayData = {
    val cuts = cutPoints(s.getBytes)
    val out = new Array[Any](cuts.length)
    var prev = 0
    var i = 0
    cuts.foreach { c => out(i) = c - prev; prev = c; i += 1 }
    new GenericArrayData(out)
  }
}
