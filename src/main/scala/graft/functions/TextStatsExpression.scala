package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the document-quality counters in
  * ONE row-local pass over the text — the fused form of the stacked
  * built-in pipeline `size(split(text,' '))` × `filter(split(...), isin
  * markers)` × `length(regexp_replace(text, "[^a-z0-9 ]", ""))` that
  * [[TextAnalysis.qualityScore]] previously composed. The composition is
  * semantically identical but materializes the token array up to three
  * times per row and runs a full-text regex replace whose only consumer
  * is a length — measured 178.3 s at sf100 for what one byte-walk does
  * (the `MinHashSlices`/`VectorSignBands`/quantize-fix discipline, fifth
  * application).
  *
  * Bit-parity contract (oracle compatibility), per field:
  *  - `n_chars`   = `length(text)` — code points, `UTF8String.numChars`.
  *  - `n_tokens`  = `size(split(text, " "))` with Spark's default
  *    limit −1, which keeps leading/adjacent/trailing empty tokens:
  *    exactly (#0x20 bytes) + 1. A 0x20 byte can never be part of a
  *    multi-byte UTF-8 sequence, so the byte count is the char count.
  *  - `n_stops`   = `size(filter(split(text, " "), t -> t isin markers))`
  *    — tokens byte-equal to one of the ASCII marker strings.
  *  - `n_nonalnum` = `length(text) − length(regexp_replace(text,
  *    "[^a-z0-9 ]", ""))` — code points outside [a-z0-9 ]; every
  *    multi-byte code point counts once (Java regex classes are
  *    code-point-aware, and so is the walk here).
  * Ratios stay in the caller as the same Column arithmetic as before.
  */
case class TextStats(child: Expression, markers: Seq[String])
    extends UnaryExpression {
  require(markers.nonEmpty && markers.forall(_.forall(_ < 128)),
    "text_stats: markers must be non-empty ASCII strings")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stops", LongType, nullable = false),
    StructField("n_nonalnum", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "text_stats"

  @transient private lazy val markerBytes: Array[Array[Byte]] =
    markers.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], markerBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mk = ctx.addReferenceObj("textStatsMarkers", markerBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextStats.compute($v, $mk);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  /** Shared by eval and codegen. One pass over the UTF-8 bytes. */
  def compute(text: UTF8String, markers: Array[Array[Byte]]): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    var nTokens = 1L
    var nStops = 0L
    var nonAlnum = 0L
    var tokStart = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == ' ') { // single-byte; token boundary
        if (isMarker(bytes, tokStart, i, markers)) nStops += 1
        nTokens += 1
        tokStart = i + 1
        i += 1
      } else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        i += 1
      } else if (b >= 0) { // other single-byte ASCII: outside [a-z0-9 ]
        nonAlnum += 1
        i += 1
      } else { // multi-byte code point: one nonalnum, skip its bytes
        nonAlnum += 1
        i += UTF8String.numBytesForFirstByte(b)
      }
    }
    if (isMarker(bytes, tokStart, n, markers)) nStops += 1
    new GenericInternalRow(
      Array[Any](text.numChars().toLong, nTokens, nStops, nonAlnum))
  }

  private def isMarker(bytes: Array[Byte], from: Int, until: Int,
                       markers: Array[Array[Byte]]): Boolean = {
    val len = until - from
    var m = 0
    while (m < markers.length) {
      val mk = markers(m)
      if (mk.length == len) {
        var j = 0
        while (j < len && bytes(from + j) == mk(j)) j += 1
        if (j == len) return true
      }
      m += 1
    }
    false
  }
}

/** Native Catalyst expression computing [[TextAnalysis.docRepetition]]'s
  * per-document counters in ONE row-local pass: token count, distinct
  * token count, and the maximum multiplicity of any ADJACENT-token
  * bigram. The composition exploded every bigram into corpus-wide rows
  * through TWO per-doc hash aggregates and a join back to the corpus —
  * 110.3 s at sf100 (plus the same cost again inside quality_filter,
  * which embeds this op) for what is per-document-local work.
  *
  * Bit-parity contract:
  *  - `n_words` = `size(split(text, " "))` (limit −1, empties kept).
  *  - `n_distinct` = `size(array_distinct(split(text, " ")))` — distinct
  *    token STRINGS, the empty token included like any other.
  *  - `top_bigram` = max count over `concat(w[i], ' ', w[i+1])` groups,
  *    0 when fewer than 2 tokens (callers map that to the composition's
  *    null-left-join → `coalesce(…, 0.0)`). Because tokens come from
  *    single-space splitting, the concat of two ADJACENT tokens is
  *    byte-identical to the contiguous text range from the first token's
  *    start to the second's end — so bigram keys here are zero-copy
  *    views over the input bytes, and two bigrams are concat-equal
  *    exactly when those ranges are byte-equal.
  * Ratios (distinct_ratio, top_bigram_frac) stay in the caller as the
  * same Column arithmetic as before.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  /** Shared by eval and codegen. One pass over the UTF-8 bytes; token
    * and bigram keys are zero-copy UTF8String views over them.
    */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    // token boundaries: spans between 0x20 bytes (never part of a
    // multi-byte sequence), empties kept — split(text, " ", -1) semantics
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var tokStart = 0
    var i = 0
    while (i < n) {
      if (bytes(i) == ' ') { starts.add(tokStart); ends.add(i); tokStart = i + 1 }
      i += 1
    }
    starts.add(tokStart); ends.add(n)
    val nWords = starts.size
    val distinct = new java.util.HashSet[UTF8String](nWords * 2)
    i = 0
    while (i < nWords) {
      distinct.add(UTF8String.fromBytes(bytes, starts.get(i), ends.get(i) - starts.get(i)))
      i += 1
    }
    var topBigram = 0L
    if (nWords >= 2) {
      val counts = new java.util.HashMap[UTF8String, Int](nWords * 2)
      i = 0
      while (i < nWords - 1) {
        // adjacent bigram == the contiguous range [start(i), end(i+1))
        val key = UTF8String.fromBytes(bytes, starts.get(i), ends.get(i + 1) - starts.get(i))
        val c = counts.merge(key, 1, (a, b) => a + b)
        if (c > topBigram) topBigram = c.toLong
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](nWords.toLong, distinct.size.toLong, topBigram))
  }
}

/** Native Catalyst expression for the canonical dedup text normal form —
  * the fused version of [[TextAnalysis.normalize]]'s built-in chain
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
  * " +", " "))`: two full-text regex passes (plus their output
  * allocations) collapse into one lowercase call and one byte-walk.
  * Measured 176.4 s at sf100 for `text_normalize`, and the same chain
  * sits inside `dedup_keep_best` / `dup_ratio_by_source` (~165 s each),
  * so the fusion pays three times.
  *
  * Bit-parity contract: lowercase is the IDENTICAL call Spark's `lower`
  * makes (`UTF8String.toLowerCase` — full Unicode, not per-char), then
  * every code point outside [a-z0-9] (spaces included) becomes a
  * pending separator, emitted as ONE space only between kept runs —
  * which is exactly char→space followed by space-run collapse and
  * end-trim. Per-BYTE classification is safe post-lowercase: bytes of a
  * multi-byte sequence are all ≥ 0x80, so each maps to "separator", and
  * the run collapse makes per-byte vs per-code-point indistinguishable.
  * Output is pure ASCII [a-z0-9 ].
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NormalizeText.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  /** Shared by eval and codegen. */
  def compute(text: UTF8String): UTF8String = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var o = 0
    var pending = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pending && o > 0) { out(o) = ' '; o += 1 }
        out(o) = b
        o += 1
        pending = false
      } else {
        pending = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }
}
