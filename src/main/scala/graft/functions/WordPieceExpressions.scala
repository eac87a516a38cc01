package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The WordPiece greedy longest-match kernel — the per-word matcher
  * behind `graft.operators.TextOps.tokenizeWordpiece`, hoisted from a
  * typed mapPartitions loop into a static kernel that codegen'd
  * expressions call directly (the [[MinHashKernel]] pattern), so the
  * segmentation composes into whole-stage codegen instead of fencing
  * the stage behind an encoder round-trip.
  *
  * The piece vocabulary is MODEL STATE: it arrives as one
  * ''-joined foldable string literal (bounded — alphabet +
  * merge-table entries) and is parsed ONCE per distinct vocab into a
  * hash set via a small memo, so the per-row cost is the match loop
  * alone. At 100 TB this is exactly how production tokenizers ship
  * vocabs to workers: constant model state embedded with the plan,
  * zero per-row setup.
  */
object WordPieceKernel {
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    String, (java.util.HashSet[String], Int)]()

  private def model(vocab: UTF8String): (java.util.HashSet[String], Int) = {
    val key = vocab.toString
    var m = memo.get(key)
    if (m == null) {
      val set = new java.util.HashSet[String]()
      var maxLen = 1
      key.split("", -1).foreach { p =>
        if (p.nonEmpty) { set.add(p); if (p.length > maxLen) maxLen = p.length }
      }
      m = (set, maxLen)
      memo.putIfAbsent(key, m)
    }
    m
  }

  /** Greedy longest-match segmentation: at each position take the
    * longest vocab piece matching the remaining prefix; unmatched
    * positions fall back to one character (counted by [[fallbacks]]).
    * Pieces join with single spaces — the segment-table convention.
    */
  def segment(word: UTF8String, vocab: UTF8String): UTF8String = {
    val (set, maxLen) = model(vocab)
    val w = word.toString
    val sb = new java.lang.StringBuilder
    var pos = 0
    while (pos < w.length) {
      var l = math.min(maxLen, w.length - pos)
      var found: String = null
      while (l >= 1 && found == null) {
        val cand = w.substring(pos, pos + l)
        if (set.contains(cand)) found = cand
        l -= 1
      }
      if (found == null) found = w.substring(pos, pos + 1)
      if (sb.length > 0) sb.append(' ')
      sb.append(found)
      pos += found.length
    }
    UTF8String.fromString(sb.toString)
  }

  /** The fallback ledger: how many positions had NO vocab piece (the
    * honest column proving the full-alphabet closure). Same loop as
    * [[segment]] so the two columns can never disagree. */
  def fallbacks(word: UTF8String, vocab: UTF8String): Long = {
    val (set, maxLen) = model(vocab)
    val w = word.toString
    var pos = 0
    var nf = 0L
    while (pos < w.length) {
      var l = math.min(maxLen, w.length - pos)
      var found: String = null
      while (l >= 1 && found == null) {
        val cand = w.substring(pos, pos + l)
        if (set.contains(cand)) found = cand
        l -= 1
      }
      if (found == null) { found = w.substring(pos, pos + 1); nf += 1L }
      pos += found.length
    }
    nf
  }
}

private[functions] trait WordPieceLike { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName vocab must be a constant")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string word, string vocab), got ($l, $r)")
    }
}

/** `wordpiece_seg(word, vocab)`: the greedy longest-match segmentation
  * as ONE codegen'd expression — a single static kernel call per row.
  */
case class WordPieceSeg(left: Expression, right: Expression)
  extends BinaryExpression with WordPieceLike {

  override def dataType: DataType = StringType
  override def prettyName: String = "wordpiece_seg"

  override protected def nullSafeEval(w: Any, v: Any): Any =
    WordPieceKernel.segment(w.asInstanceOf[UTF8String], v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, v) =>
      s"graft.functions.WordPieceKernel.segment($w, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `wordpiece_fallback(word, vocab)`: the unmatched-position count —
  * the segmentation's honesty ledger, from the same kernel loop. */
case class WordPieceFallback(left: Expression, right: Expression)
  extends BinaryExpression with WordPieceLike {

  override def dataType: DataType = LongType
  override def prettyName: String = "wordpiece_fallback"

  override protected def nullSafeEval(w: Any, v: Any): Any =
    WordPieceKernel.fallbacks(w.asInstanceOf[UTF8String], v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, v) =>
      s"graft.functions.WordPieceKernel.fallbacks($w, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
