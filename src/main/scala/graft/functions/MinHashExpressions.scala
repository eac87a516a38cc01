package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The canonical MinHash signature kernel: whitespace-normalize, word
  * trigrams, polyHash shingle ids, 32 permutation lane minima
  * ((aⱼ·h+bⱼ) mod 2³¹−1 — IDENTICAL coefficients to the batch LSH
  * lanes in graft.operators.Dedup), folded into one mod-P long. Docs
  * too short to shingle fall back to the normalized-text hash.
  *
  * Lives as a static object so BOTH callers share one definition: the
  * codegen'd [[StringMinHashSig]] expression calls it from generated
  * code (objects compile to a class with static forwarders, so janino
  * resolves `graft.functions.MinHashKernel.signature(...)` directly),
  * and Dedup.minhashSignature delegates for JVM-side use (streaming
  * spec models, tests).
  */
object MinHashKernel {
  private val P = 2147483647L
  private val K = 32

  private def aCoef(i: Int): Long = (1103515245L * (i + 1)) % P
  private def bCoef(i: Int): Long = (12345L * (i + 1) + 987654321L) % P

  /** Char-code polynomial fold mod P (== byte fold on the ASCII
    * corpora this engine targets; the DuckDB oracles replay it over
    * ascii codes). */
  def polyHash(t: String): Long = {
    var h = 0L
    var i = 0
    while (i < t.length) { h = (h * 31L + t.charAt(i).toLong) % P; i += 1 }
    h
  }

  def signature(s: UTF8String): Long = signature(s.toString)

  def signature(text: String): Long = {
    val norm = text.trim.replaceAll(" +", " ")
    val ws = norm.split(" ", -1)
    if (ws.length < 3) return polyHash(norm)
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i + 2 < ws.length) {
      val h = polyHash(ws(i) + " " + ws(i + 1) + " " + ws(i + 2))
      var j = 0
      while (j < K) {
        val v = (h * aCoef(j) + bCoef(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < K) { sig = (sig * 31L + mins(j)) % P; j += 1 }
    sig
  }
}

/** `minhash_sig(text)`: the full per-row MinHash signature as ONE
  * codegen'd expression. The generated code makes a single static
  * kernel call per row — no typed-encoder round trip, no interpreted
  * lambda — so signature computation composes into whole-stage codegen
  * wherever a near-exact-dup key is needed (batch columns, streaming
  * dropDuplicatesWithinWatermark keys).
  */
case class StringMinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a string column, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
