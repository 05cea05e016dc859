package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's 60-bit md5 SimHash
  * fingerprint in ONE row-local pass over its text.
  *
  * Semantically identical to the composable formulation — explode
  * `split(text, ' ')`, hash each token to the first 15 hex chars of its
  * md5 (60 bits, `conv(substring(md5(tok), 1, 15), 16, 10)`), and run the
  * per-bit majority vote in [[Dedup.SimHashAggregator]] — but without the
  * row multiplication: at sf100 that composition pushes ~250 M token rows
  * through an explode and a hash aggregate (the same plumbing measured at
  * 31.7 s of the 33 s incremental serve for MinHash in round 16, vs a few
  * seconds of actual digest arithmetic). This expression walks the
  * document bytes once, md5-ing each token in place with a thread-local
  * digest, and emits one LONG per document — no token rows, no aggregate
  * shuffle.
  *
  * Bit-parity contract (spec-pinned in DedupSimilaritySpec):
  *  - Tokenization matches `split(text, " ")` with Spark's default
  *    limit -1 EXACTLY, including the empty tokens produced by leading /
  *    consecutive / trailing spaces and the single empty token of an
  *    empty string. Token boundaries are byte-level 0x20 scans — safe for
  *    any UTF-8 text, since 0x20 never occurs inside a multi-byte
  *    sequence.
  *  - The per-token value is the big-endian 60-bit integer of the first
  *    15 md5 hex chars (7 full digest bytes + the high nibble of byte 7),
  *    exactly `conv(substring(md5(tok), 1, 15), 16, 10)`.
  *  - The vote is the strict majority `2·ones(b) > n` over bits 0..59 —
  *    [[Dedup.SimHashAggregator.finish]]'s tie-to-zero. (The aggregator
  *    votes over 64 bits, but a 60-bit value never sets bits 60..63, so
  *    the fingerprints agree bit-for-bit.)
  *
  * Reference semantics: a keyed content-fingerprint map, cf.
  * essentialsstreams transformations (reference maps/aggregations over
  * keyed streams); the SimHash construction itself is the standard
  * Charikar/Manku near-duplicate fingerprint re-expressed as a compiled
  * Spark expression.
  */
case class SimHash60(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.SimHash60.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by eval and codegen. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val len = bytes.length
    val digest = md5.get()
    val ones = new Array[Int](60)
    var n = 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == 0x20) {
        digest.update(bytes, start, i - start)
        val d = digest.digest() // resets for the next token
        // big-endian 60-bit value of the first 15 hex chars: 7 full
        // bytes + the high nibble of byte 7
        var v = 0L
        var k = 0
        while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
        v = (v << 4) | ((d(7) >> 4) & 0xfL)
        var b = 0
        while (b < 60) { ones(b) += ((v >>> b) & 1L).toInt; b += 1 }
        n += 1
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) { if (2L * ones(b) > n) fp |= 1L << b; b += 1 }
    fp
  }
}
