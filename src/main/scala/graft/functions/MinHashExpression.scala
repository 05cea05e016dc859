package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's whole MinHash
  * signature in ONE row-local pass over its text.
  *
  * The composable formulation — explode stride-sampled shingles, md5 each,
  * min-aggregate 8 digest slices per document — is semantically what this
  * computes, but it pays for the row multiplication: at sf100 the
  * signature build pushes ~250 M shingle rows through an explode and a
  * hash aggregate, and that plumbing (not the md5 arithmetic) was measured
  * as 31.7 s of the 33 s `dedup_incremental_staged` serve (round 16; the
  * round-14 `VectorSignBands` lesson one operator over). This expression
  * walks the text once per row, reuses a thread-local MessageDigest,
  * tracks the per-slot minima as packed 32-bit nibble values (the
  * lowercase-hex alphabet is order-isomorphic to the nibble value, so
  * unsigned integer min == string min over hex slices), and emits the
  * final 8-hex-char strings only once per document — no shingle rows, no
  * shuffle, no per-shingle allocations beyond the digest's own 16 bytes.
  *
  * Bit-parity contract (oracle + store compatibility): identical output
  * to `min(substring(md5(shingle), (j-1)*dstride+1, 8))` over
  * `substring(text, i, width)` at char positions i = 1, 1+stride, … ≤
  * numChars−width+1 — the [[TextAnalysis.shingles]] ×
  * [[Dedup.minhashSignatures]] composition and the DuckDB oracle's CTE.
  * Shingle slicing is CHARACTER-based exactly like SQL `substring`
  * (byte offsets per char are walked once), and md5 runs over the
  * shingle's UTF-8 bytes exactly like `md5(cast(shingle AS BINARY))`.
  * Returns null for texts shorter than `width` (the composition drops
  * those docs via its length filter; callers filter identically).
  */
case class MinHashSlices(child: Expression, numHashes: Int, width: Int,
                         stride: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numHashes >= 1 && numHashes <= 25 && width >= 1 && stride >= 1,
    "minhash_slices: need 1 <= numHashes <= 25 (8-hex slices of one md5), width/stride >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_slices"

  override def nullSafeEval(input: Any): Any =
    MinHashSlices.compute(input.asInstanceOf[UTF8String], numHashes, width, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("mhs")
    nullSafeCodeGen(ctx, ev, v =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData $resultTerm =
         |  graft.functions.MinHashSlices.compute($v, $numHashes, $width, $stride);
         |if ($resultTerm == null) { ${ev.isNull} = true; } else { ${ev.value} = $resultTerm; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSlices {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hex = "0123456789abcdef".toCharArray

  /** Shared by eval and codegen. Returns null when the text has fewer
    * than `width` characters (no shingle — the composition's filter).
    */
  def compute(text: UTF8String, numHashes: Int, width: Int,
              stride: Int): ArrayData = {
    val bytes = text.getBytes
    // byte offset of each character start (+ end sentinel): SQL substring
    // is character-indexed, md5 runs over UTF-8 bytes — walk once
    val numChars = text.numChars()
    if (numChars < width) return null
    val offs = new Array[Int](numChars + 1)
    var c = 0
    var b = 0
    while (c < numChars) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(numChars) = bytes.length
    val dstride = if (numHashes == 1) 0 else math.max(1, (32 - 8) / (numHashes - 1))
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val digest = md5.get()
    var p = 0
    val last = numChars - width
    while (p <= last) {
      digest.update(bytes, offs(p), offs(p + width) - offs(p))
      val d = digest.digest() // resets for the next shingle
      var j = 0
      while (j < numHashes) {
        // slice = 8 hex nibbles of the digest starting at nibble j*dstride,
        // packed big-endian into a long in [0, 2^32): unsigned int min ==
        // lexicographic min over the lowercase-hex rendering
        var v = 0L
        var k = j * dstride
        val end = k + 8
        while (k < end) {
          val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
          v = (v << 4) | nib
          k += 1
        }
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      p += stride
    }
    val out = new Array[AnyRef](numHashes)
    var j = 0
    while (j < numHashes) {
      val chars = new Array[Byte](8)
      var k = 0
      while (k < 8) {
        chars(k) = hex(((mins(j) >> ((7 - k) * 4)) & 0xf).toInt).toByte
        k += 1
      }
      out(j) = UTF8String.fromBytes(chars)
      j += 1
    }
    new GenericArrayData(out)
  }
}
