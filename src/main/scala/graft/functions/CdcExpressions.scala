package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) kernel — the Rabin-style splitter a
  * dedup storage layer runs over blob bytes. A boundary falls AFTER
  * byte i when the rolling hash of the trailing 8-byte window is
  * ≡ 0 (mod 64), so boundaries depend only on local content: inserting
  * or deleting bytes re-aligns chunk edges within one window instead of
  * shifting every fixed-size block downstream (the fixed-block
  * failure CDC exists to fix). Expected chunk length is the 64-byte
  * mask width; this is the PURE contract — no min/max chunk clamps —
  * because the clamped variant makes each boundary depend on the
  * previous one, which would be sequential state the declarative DuckDB
  * replay (per-position window hash + prefix-sum chunk ids) cannot
  * express. All arithmetic is mod 2³¹−1 integer math, identical on both
  * engines.
  *
  * Each chunk packs into ONE long: `hash · 2²⁰ + len` (hash < 2³¹,
  * len < 2²⁰ — document payloads are far under 1 MiB; the pack keeps
  * the per-chunk descriptor a primitive-array element instead of a
  * struct, so the expression output stays an `array<bigint>` both
  * engines order and hash identically).
  *
  * Static object for the same reason as [[MinHashKernel]]: the codegen
  * expression calls it from generated code, and specs/models call it
  * JVM-side.
  */
object CdcKernel {
  private val P = 2147483647L
  private val W = 8
  private val MASK = 64L
  /** 31^(W−1) mod P — the outgoing byte's weight in the rolling hash. */
  private val POW = {
    var p = 1L
    for (_ <- 1 until W) p = (p * 31L) % P
    p
  }

  def chunks(s: UTF8String): ArrayData =
    ArrayData.toArrayData(chunkArray(s.getBytes))

  /** Packed (hash·2²⁰ + len) descriptors, in blob order. */
  def chunkArray(b: Array[Byte]): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var start = 0
    var ch = 0L // chunk-content hash accumulator
    var w = 0L  // rolling window hash
    var i = 0
    while (i < b.length) {
      val x = (b(i) & 0xff).toLong
      ch = (ch * 31L + x) % P
      w =
        if (i < W) (w * 31L + x) % P
        else {
          val outByte = (b(i - W) & 0xff).toLong
          // + P·256 keeps the subtraction non-negative before the mod
          (((w + P * 256L - outByte * POW) % P) * 31L + x) % P
        }
      if (i >= W - 1 && w % MASK == 0L) {
        out += ch * 1048576L + (i - start + 1).toLong
        start = i + 1
        ch = 0L
      }
      i += 1
    }
    if (start < b.length) out += ch * 1048576L + (b.length - start).toLong
    out.toArray
  }

  /** The CLAMPED variant real chunk stores ship (min/max chunk bounds
    * kill the 1-byte and unbounded tails) — kept SPEC-ONLY, never
    * registered: once a boundary is suppressed inside `minLen` of the
    * previous cut or forced at `maxLen`, every later boundary depends
    * on the previous one. That sequential state is exactly what the
    * per-position declarative oracle (window hash + prefix-sum) cannot
    * express, so the registered contract stays the pure splitter and
    * this twin documents the trade and its measured edge behavior.
    */
  def chunkArrayClamped(b: Array[Byte], minLen: Int, maxLen: Int): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var start = 0
    var ch = 0L
    var w = 0L
    var i = 0
    while (i < b.length) {
      val x = (b(i) & 0xff).toLong
      ch = (ch * 31L + x) % P
      w =
        if (i < W) (w * 31L + x) % P
        else {
          val outByte = (b(i - W) & 0xff).toLong
          (((w + P * 256L - outByte * POW) % P) * 31L + x) % P
        }
      val len = i - start + 1
      val contentCut = i >= W - 1 && w % MASK == 0L && len >= minLen
      if (contentCut || len >= maxLen) {
        out += ch * 1048576L + len.toLong
        start = i + 1
        ch = 0L
      }
      i += 1
    }
    if (start < b.length) out += ch * 1048576L + (b.length - start).toLong
    out.toArray
  }
}

/** `cdc_chunks(text)`: the per-blob CDC chunk descriptors as one
  * codegen'd expression — a single static kernel call per row keeps
  * the O(bytes) splitter inside whole-stage codegen (the declarative
  * formulation would explode one row per byte and window over it; the
  * DuckDB oracle replays exactly that, which is the point: tight
  * kernel and declarative replay must agree bit-for-bit).
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a string column, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcKernel.chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcKernel.chunks($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
