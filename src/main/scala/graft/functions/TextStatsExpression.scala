package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
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

/** Shared token-boundary walk for the map-grain expressions below:
  * computes `split(text, " ", -1)` boundaries (empties KEPT — Spark's
  * default split limit) over the raw UTF-8 bytes. A 0x20 byte can never
  * be part of a multi-byte sequence, so byte scanning is code-point
  * safe; `starts(i)/ends(i)` delimit token i, and — because the
  * separator is exactly one space — the concat of adjacent tokens
  * `w(i) + " " + ... + " " + w(j)` is byte-identical to the contiguous
  * range `[starts(i), ends(j))` (the [[RepetitionStats]] zero-copy
  * argument, shared by every consumer here).
  */
private[functions] object TokenBounds {
  /** Returns (starts, ends, nWords); arrays may be longer than nWords. */
  def compute(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val n = bytes.length
    var nWords = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords)
    val ends = new Array[Int](nWords)
    var w = 0
    var tokStart = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { starts(w) = tokStart; ends(w) = i; w += 1; tokStart = i + 1 }
      i += 1
    }
    starts(w) = tokStart; ends(w) = n
    (starts, ends, nWords)
  }

  /** Drains a LinkedHashMap[key -> count] into an
    * `array<struct<string,long>>`, cloning each key so no emitted
    * UTF8String aliases the (possibly buffer-backed) input bytes.
    */
  def drain(counts: java.util.LinkedHashMap[UTF8String, Int]): ArrayData = {
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey.clone(), e.getValue.toLong))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `bigram_counts(text)` → `array<struct<bigram:string, cnt:long>>`: the
  * document's adjacent-token bigram multiset, PRE-AGGREGATED to map
  * grain in one row-local pass — null when the document has fewer than
  * 2 tokens (the composition's `size(w) >= 2` filter). Replaces
  * [[TextAnalysis.bigramLogprob]]'s occurrence-grain bigram explode: the
  * frequency join-backs then probe |distinct (doc, bigram)| rows instead
  * of every occurrence, and the per-doc sums weight by `cnt` (73.9 s at
  * sf100 for the exploded form — VERDICT r19 item 1).
  *
  * Bit-parity contract: tokens are `split(text, " ", -1)` (empties
  * kept); bigram i = `concat(w(i), ' ', w(i+1))`, which over a
  * single-space separator is byte-identical to the contiguous text
  * range `[starts(i), ends(i+1))` — zero-copy views during counting,
  * cloned on emit. Σ cnt = n−1 (the occurrence count), so weighted
  * downstream aggregates reproduce the exploded form's integers
  * exactly.
  */
case class BigramCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bigram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bigram_counts"

  override def nullSafeEval(input: Any): Any =
    BigramCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("bgc")
    nullSafeCodeGen(ctx, ev, v =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.BigramCounts.compute($v);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramCounts {
  /** Shared by eval and codegen. Null when fewer than 2 tokens. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends, nWords) = TokenBounds.compute(bytes)
    if (nWords < 2) return null
    val counts = new java.util.LinkedHashMap[UTF8String, Int](nWords * 2)
    var i = 0
    while (i < nWords - 1) {
      val key = UTF8String.fromBytes(bytes, starts(i), ends(i + 1) - starts(i))
      counts.merge(key, 1, (a, b) => a + b)
      i += 1
    }
    TokenBounds.drain(counts)
  }
}

/** `token_counts(text)` → `array<struct<tok:string, cnt:long>>`: the
  * document's token multiset at map grain, one row-local pass — the
  * unigram sibling of [[BigramCounts]] for the occurrence-grain
  * frequency join-backs in [[TextAnalysis.tokenSurprisal]] (and the
  * (doc, term) tf aggregations). Tokens are `split(text, " ", -1)`
  * (empties kept, like the consumers' explode); every document has at
  * least one token, so the array is never empty. Σ cnt = token count.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_counts"

  override def nullSafeEval(input: Any): Any =
    TokenCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TokenCounts.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCounts {
  /** Shared by eval and codegen. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends, nWords) = TokenBounds.compute(bytes)
    val counts = new java.util.LinkedHashMap[UTF8String, Int](nWords * 2)
    var i = 0
    while (i < nWords) {
      val key = UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i))
      counts.merge(key, 1, (a, b) => a + b)
      i += 1
    }
    TokenBounds.drain(counts)
  }
}

/** `bpe_pair_counts(text)` → `array<struct<pair:string, cnt:long>>`: the
  * document's adjacent CHARACTER-pair multiset over its whitespace
  * tokens, at map grain in one row-local pass — null when no token has
  * ≥ 2 characters. Replaces [[TextAnalysis.bpeMergePairs]]'s double
  * explode (one row per token, then one row per character pair — the
  * full corpus character volume through two Generates; 63.2 s at sf100,
  * VERDICT r19 item 2): the downstream global pair aggregate is
  * alphabet²-bounded either way, so only these generated rows were the
  * cost.
  *
  * Bit-parity contract: tokens are `split(text, " ", -1)`; within a
  * token, pair i = `substring(tok, i, 2)` for i in 1..len−1 — CODE
  * POINTS, stepped via `numBytesForFirstByte` — so each pair is the
  * contiguous byte range spanning code points i and i+1 (zero-copy
  * views during counting, cloned on emit). Tokens with < 2 code points
  * contribute nothing, exactly the composition's `length(tok) >= 2`
  * filter.
  */
case class BpePairCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pair", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_pair_counts"

  override def nullSafeEval(input: Any): Any =
    BpePairCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("bpc")
    nullSafeCodeGen(ctx, ev, v =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.BpePairCounts.compute($v);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpePairCounts {
  /** Shared by eval and codegen. Null when the document has no pair. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    var counts: java.util.LinkedHashMap[UTF8String, Int] = null
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        // token [tokStart, i): walk code points, counting adjacent pairs
        var p = tokStart
        var prevStart = -1
        while (p < i) {
          val next = p + UTF8String.numBytesForFirstByte(bytes(p))
          if (prevStart >= 0) {
            val key = UTF8String.fromBytes(bytes, prevStart, next - prevStart)
            if (counts == null) counts = new java.util.LinkedHashMap[UTF8String, Int]()
            counts.merge(key, 1, (a, b) => a + b)
          }
          prevStart = p
          p = next
        }
        tokStart = i + 1
      }
      i += 1
    }
    if (counts == null) null else TokenBounds.drain(counts)
  }
}

/** `span_tiles(text, k)` → `array<struct<span:string, ntok:int>>`: the
  * document tiled into consecutive k-token spans in ONE row-local pass —
  * element i is span_idx i (callers posexplode). Replaces
  * [[Curation.spanDedup]]'s posexplode-over-sequence shape, where every
  * generated row carried the document's FULL token array so a per-row
  * `slice` could run above the Generate (the r18 quantize-fix
  * heavy-expression-above-Generate shape in array-copy form; 53.4 s at
  * sf100, VERDICT r19 item 3).
  *
  * Bit-parity contract: tokens are `split(text, " ", -1)` (empties
  * kept; n ≥ 1 even for empty text). Span starts are
  * `sequence(0, greatest(n−1, 0), k)` → floor((n−1)/k)+1 spans; span i =
  * `array_join(slice(toks, i·k+1, k), " ")`, byte-identical to the
  * contiguous range from token i·k's start to token min(i·k+k, n)−1's
  * end (single-space separator); `ntok` = `size(slice(...))` =
  * min(k, n − i·k), INT like `size`. Span bytes are copied on emit
  * (they tile the text, so the copy is ≤ one text's worth per doc —
  * versus the composition's n-spans × full-token-array carry).
  */
case class SpanTiles(child: Expression, spanTokens: Int) extends UnaryExpression {
  require(spanTokens >= 1, "span_tiles: spanTokens >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("span", StringType, nullable = false),
    StructField("ntok", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "span_tiles"

  override def nullSafeEval(input: Any): Any =
    SpanTiles.compute(input.asInstanceOf[UTF8String], spanTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SpanTiles.compute($v, $spanTokens);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanTiles {
  /** Shared by eval and codegen. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends, nWords) = TokenBounds.compute(bytes)
    val nSpans = (nWords - 1) / k + 1
    val out = new Array[Any](nSpans)
    var j = 0
    while (j < nSpans) {
      val startTok = j * k
      val endTok = math.min(startTok + k, nWords) - 1
      val from = starts(startTok)
      val until = ends(endTok)
      val span = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until))
      out(j) = new GenericInternalRow(Array[Any](span, endTok - startTok + 1))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `tokenize_counts(text)` → `struct<ws_tokens:long, re_tokens:long>`:
  * [[TextAnalysis.tokenCount]]'s two counters in ONE row-local byte
  * walk. The composition ran a full split PLUS a full
  * `regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')` — the regex engine
  * dominating the 40.7 s sf100 entry for what is a three-way run-length
  * scan.
  *
  * Bit-parity contract:
  *  - `ws_tokens` = `size(split(text, " "))` (limit −1, empties kept) =
  *    (#0x20 bytes) + 1 — the [[TextStats]] argument.
  *  - `re_tokens` = `regexp_count(text, "[a-z]+|[0-9]+|[^a-z0-9 ]")`.
  *    Java's NFA scans left to right taking the FIRST alternative that
  *    matches at the cursor, and the greedy `+` consumes the maximal
  *    run (no continuation forces backtracking): a maximal [a-z] run is
  *    one match, a maximal [0-9] run is one match, any other single
  *    CODE POINT (multi-byte included — negated classes match per code
  *    point) is one match, spaces match nothing. The walk mirrors that
  *    exactly: runs via byte classes (multi-byte lead/continuation
  *    bytes are all ≥ 0x80, never in [a-z0-9 ]), code-point stepping
  *    via `numBytesForFirstByte` for the single-char alternative.
  */
case class TokenizeCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("re_tokens", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "tokenize_counts"

  override def nullSafeEval(input: Any): Any =
    TokenizeCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TokenizeCounts.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenizeCounts {
  /** Shared by eval and codegen. One pass over the UTF-8 bytes. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    var wsTokens = 1L
    var reTokens = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == ' ') { wsTokens += 1; i += 1 }
      else if (b >= 'a' && b <= 'z') {
        reTokens += 1
        i += 1
        while (i < n && bytes(i) >= 'a' && bytes(i) <= 'z') i += 1
      } else if (b >= '0' && b <= '9') {
        reTokens += 1
        i += 1
        while (i < n && bytes(i) >= '0' && bytes(i) <= '9') i += 1
      } else { // any other single code point (ASCII or multi-byte)
        reTokens += 1
        i += (if (b >= 0) 1 else UTF8String.numBytesForFirstByte(b))
      }
    }
    new GenericInternalRow(Array[Any](wsTokens, reTokens))
  }
}

/** `lang_marker_counts(text, sets)` → `array<long>`: per-language
  * stopword-marker hit counts over whitespace tokens, ALL languages in
  * ONE row-local pass — the fused form of [[TextAnalysis.langId]]'s five
  * `size(filter(split(text, " "), t -> t isin markers))` columns, each
  * of which re-split and re-scanned the text (21.4 s at sf100 for five
  * walks of per-document work).
  *
  * Bit-parity contract: element i =
  * `size(filter(split(text, " ", -1), t -> t isin sets(i)))` — token
  * boundaries are the [[TokenBounds]] byte walk, membership is
  * byte-equality against the ASCII marker strings (the [[TextStats]]
  * `isMarker` argument), one counter per set.
  */
case class LangMarkerCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {
  require(sets.nonEmpty && sets.forall(s => s.nonEmpty && s.forall(_.forall(_ < 128))),
    "lang_marker_counts: marker sets must be non-empty ASCII strings")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lang_marker_counts"

  @transient private lazy val setBytes: Array[Array[Array[Byte]]] =
    sets.map(_.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    LangMarkerCounts.compute(input.asInstanceOf[UTF8String], setBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mk = ctx.addReferenceObj("langMarkerSets", setBytes, "byte[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LangMarkerCounts.compute($v, $mk);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangMarkerCounts {
  /** Shared by eval and codegen. One pass over the UTF-8 bytes. */
  def compute(text: UTF8String, sets: Array[Array[Array[Byte]]]): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val counts = new Array[Long](sets.length)
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        var s = 0
        while (s < sets.length) {
          if (isIn(bytes, tokStart, i, sets(s))) counts(s) += 1
          s += 1
        }
        tokStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  private def isIn(bytes: Array[Byte], from: Int, until: Int,
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

/** `pii_scrub_stats(text)` → `struct<n_email:long, n_num:long,
  * n_dict:long, scrubbed:string>`: [[TextAnalysis.piiScrub]]'s three
  * `regexp_count` columns (on the ORIGINAL text) plus the CHAINED
  * three-pass `regexp_replace` scrub, fused into byte walks with no
  * regex engine and no UTF8String↔String round trips — six full-text
  * Java-regex passes (each converting to java.lang.String and back)
  * become five allocation-light byte scans (45.5 s at sf100 for the
  * composition; VERDICT r20 item 2).
  *
  * Bit-parity contract, per pattern (all ASCII constructs, so byte-level
  * classification is exact — bytes of a multi-byte code point are all
  * ≥ 0x80 and can neither be in `[a-z0-9.]`/`[0-9]`/`\w` nor start a
  * literal match):
  *  - email `[a-z0-9.]+@[a-z0-9.]+`: Java's leftmost-first scan with
  *    greedy `+` admits NO backtracking here — at a candidate start the
  *    left run is maximal and every shorter split puts a class byte
  *    where `@` must sit — so a match is exactly (maximal class run)
  *    `@` (maximal class run), starting at the first class byte at/after
  *    the cursor whose run is immediately followed by `@` + class byte;
  *    the cursor resumes past the match. `scanEmail` mirrors that walk.
  *  - digit runs `[0-9]{6,}`: greedy ⇒ one match per MAXIMAL digit run
  *    of length ≥ 6, consuming the whole run.
  *  - dictionary `\b(customer|order|supplier|part)\b`: Java's `\b` word
  *    test is `'_' || Character.isLetterOrDigit(codePoint)` — UNICODE
  *    letters/digits suppress the boundary even without
  *    UNICODE_CHARACTER_CLASS (unlike `\w`, which stays ASCII; the
  *    parity test's `part日本` case pins this). The four literals have
  *    distinct first bytes, so at most one alternative can match at a
  *    position and alternation order is unobservable.
  *  - chaining: counts are all computed on the ORIGINAL text (matching
  *    the composition's `regexp_count(col(textCol), …)`); the replaces
  *    chain — digit-run replacement runs on the email-scrubbed string,
  *    dictionary replacement on the result — because replacements can
  *    CREATE boundaries (`customer123456` → `customer<NUM>` exposes a
  *    `\b` after `customer` that the original lacked).
  * The caller keeps `md5(scrubbed)` as the same Column it always was.
  */
case class PiiScrubStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_email", LongType, nullable = false),
    StructField("n_num", LongType, nullable = false),
    StructField("n_dict", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "pii_scrub_stats"

  override def nullSafeEval(input: Any): Any =
    PiiScrubStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PiiScrubStats.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiScrubStats {
  private val EMAIL = "<EMAIL>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val NUM = "<NUM>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val ENT = "<ENT>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val DICT: Array[Array[Byte]] = Array("customer", "order", "supplier", "part")
    .map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Growable flat (start, end) span list — match positions per pass. */
  private final class Spans {
    var a = new Array[Int](16)
    var n = 0
    def add(s: Int, e: Int): Unit = {
      if (n + 2 > a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = s; a(n + 1) = e; n += 2
    }
    def count: Int = n / 2
  }

  @inline private def isCls(b: Byte): Boolean = // [a-z0-9.]
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '.'
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  // Java \b's word test is '_' or Character.isLetterOrDigit per CODE
  // POINT — Pattern's Bound node uses isLetterOrDigit even WITHOUT
  // UNICODE_CHARACTER_CLASS (unlike \w, which stays ASCII), so 'é' or
  // '日' adjacent to a literal SUPPRESSES the boundary. ASCII stays on
  // the byte fast path; multi-byte neighbours decode one code point.
  @inline private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)
  private def decodeCp(b: Array[Byte], p: Int): Int = {
    val b0 = b(p) & 0xff
    if (b0 < 0x80) b0
    else if (b0 < 0xe0) ((b0 & 0x1f) << 6) | (b(p + 1) & 0x3f)
    else if (b0 < 0xf0) ((b0 & 0xf) << 12) | ((b(p + 1) & 0x3f) << 6) | (b(p + 2) & 0x3f)
    else ((b0 & 0x7) << 18) | ((b(p + 1) & 0x3f) << 12) |
      ((b(p + 2) & 0x3f) << 6) | (b(p + 3) & 0x3f)
  }
  /** Is the code point ENDING at byte `p` (exclusive) a \b word char? */
  private def isWordBefore(b: Array[Byte], p: Int): Boolean = {
    var s = p - 1
    while (s > 0 && (b(s) & 0xc0) == 0x80) s -= 1
    isWordCp(decodeCp(b, s))
  }
  /** Is the code point STARTING at byte `p` a \b word char? */
  private def isWordAt(b: Array[Byte], p: Int): Boolean =
    isWordCp(decodeCp(b, p))

  /** Leftmost-first `[a-z0-9.]+@[a-z0-9.]+` matches (scaladoc argument). */
  private def scanEmail(b: Array[Byte]): Spans = {
    val out = new Spans
    val n = b.length
    var i = 0
    while (i < n) {
      if (isCls(b(i))) {
        var re = i
        while (re < n && isCls(b(re))) re += 1
        if (re < n && b(re) == '@' && re + 1 < n && isCls(b(re + 1))) {
          var r2 = re + 1
          while (r2 < n && isCls(b(r2))) r2 += 1
          out.add(i, r2)
          i = r2
        } else i = re + 1 // every start inside the run fails the same way
      } else i += 1
    }
    out
  }

  /** Maximal digit runs of length ≥ 6 (`[0-9]{6,}`, greedy). */
  private def scanNum(b: Array[Byte]): Spans = {
    val out = new Spans
    val n = b.length
    var i = 0
    while (i < n) {
      if (isDigit(b(i))) {
        var j = i
        while (j < n && isDigit(b(j))) j += 1
        if (j - i >= 6) out.add(i, j)
        i = j
      } else i += 1
    }
    out
  }

  /** `\b(customer|order|supplier|part)\b` matches (ASCII `\b`). */
  private def scanDict(b: Array[Byte]): Spans = {
    val out = new Spans
    val n = b.length
    var i = 0
    while (i < n) {
      var matched = false
      if (i == 0 || !isWordBefore(b, i)) {
        var m = 0
        while (!matched && m < DICT.length) {
          val lit = DICT(m)
          val len = lit.length
          if (i + len <= n) {
            var j = 0
            while (j < len && b(i + j) == lit(j)) j += 1
            if (j == len && (i + len == n || !isWordAt(b, i + len))) {
              out.add(i, i + len)
              i += len
              matched = true
            }
          }
          m += 1
        }
      }
      if (!matched) i += 1
    }
    out
  }

  /** Replace each span with `repl`, exact-size output. */
  private def replaceSpans(b: Array[Byte], sp: Spans, repl: Array[Byte]): Array[Byte] = {
    if (sp.n == 0) return b
    var matchedBytes = 0
    var k = 0
    while (k < sp.n) { matchedBytes += sp.a(k + 1) - sp.a(k); k += 2 }
    val out = new Array[Byte](b.length - matchedBytes + sp.count * repl.length)
    var o = 0
    var prev = 0
    k = 0
    while (k < sp.n) {
      val s = sp.a(k); val e = sp.a(k + 1)
      System.arraycopy(b, prev, out, o, s - prev); o += s - prev
      System.arraycopy(repl, 0, out, o, repl.length); o += repl.length
      prev = e
      k += 2
    }
    System.arraycopy(b, prev, out, o, b.length - prev)
    out
  }

  /** Shared by eval and codegen. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val emails = scanEmail(bytes)
    val nEmail = emails.count.toLong
    val nNum = scanNum(bytes).count.toLong   // counts are on the ORIGINAL
    val nDict = scanDict(bytes).count.toLong
    val s1 = replaceSpans(bytes, emails, EMAIL)
    val s2 = replaceSpans(s1, scanNum(s1), NUM)
    val s3 = replaceSpans(s2, scanDict(s2), ENT)
    // no-match passes return their input array unchanged; `bytes` may
    // alias a reused row buffer (text.getBytes is zero-copy when the
    // string spans its whole backing array), so clone in that case
    val scrubbed = if (s3 eq bytes) text.clone() else UTF8String.fromBytes(s3)
    new GenericInternalRow(Array[Any](nEmail, nNum, nDict, scrubbed))
  }
}

/** `json_fast_long(json, field)` → the BIGINT value of `field` when the
  * input provably matches the strict flat grammar
  * `{ ws* "field" ws* : ws* -?(0|[1-9][0-9]{0,17}) ws* }` (ws = the four
  * JSON whitespace bytes), null OTHERWISE — including for inputs Jackson
  * would parse fine. This is a FAST PATH, not a parser: callers keep the
  * original `from_json` as the `otherwise(...)` branch of a `when`, so
  * any deviation (extra fields, string values, floats, leading zeros,
  * nulls, exotic whitespace, malformed text) falls through to Spark's
  * Jackson semantics untouched. For inputs the grammar DOES accept,
  * `from_json(s, 'field BIGINT').field` returns exactly this integer
  * (a well-formed single-field object with an in-range integral value —
  * no PERMISSIVE-mode corner exists), so the composition is
  * bit-identical on every input. ≤ 18 digits keeps the value far inside
  * the long range; Jackson rejects leading zeros, so the grammar does
  * too. Measured (r21 probe, sf100): json_props is 94% Jackson parse
  * (3.9 s scan / 77.6 s parse-only / 82.6 s full) over a corpus whose
  * props are 100 distinct `{"k": N}` strings — all fast-path hits.
  */
case class JsonFastLong(child: Expression, field: String) extends UnaryExpression {
  require(field.nonEmpty && field.forall(c => c < 128 && c != '"' && c != '\\'),
    "json_fast_long: field must be a non-empty ASCII name without quotes/backslashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "json_fast_long"

  @transient private lazy val fieldBytes: Array[Byte] =
    field.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  override def nullSafeEval(input: Any): Any =
    JsonFastLong.compute(input.asInstanceOf[UTF8String], fieldBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fb = ctx.addReferenceObj("jsonFastField", fieldBytes, "byte[]")
    val res = ctx.freshName("jfl")
    nullSafeCodeGen(ctx, ev, v =>
      s"""Long $res = graft.functions.JsonFastLong.compute($v, $fb);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonFastLong {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  /** Shared by eval and codegen. Null = "not in the fast grammar". */
  def compute(s: UTF8String, field: Array[Byte]): java.lang.Long = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    @inline def skipWs(): Unit = { while (i < n && isWs(b(i))) i += 1 }
    if (n < field.length + 6) return null // {"f":0}
    if (b(i) != '{') return null
    i += 1
    skipWs()
    if (i >= n || b(i) != '"') return null
    i += 1
    var f = 0
    while (f < field.length) {
      if (i >= n || b(i) != field(f)) return null
      i += 1; f += 1
    }
    if (i >= n || b(i) != '"') return null
    i += 1
    skipWs()
    if (i >= n || b(i) != ':') return null
    i += 1
    skipWs()
    var neg = false
    if (i < n && b(i) == '-') { neg = true; i += 1 }
    if (i >= n || b(i) < '0' || b(i) > '9') return null
    var v = 0L
    var digits = 0
    if (b(i) == '0') { i += 1; digits = 1 } // single 0: JSON forbids leading zeros
    else {
      while (i < n && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0')
        digits += 1
        if (digits > 18) return null
        i += 1
      }
    }
    skipWs()
    if (i >= n || b(i) != '}') return null
    i += 1
    if (i != n) return null
    java.lang.Long.valueOf(if (neg) -v else v)
  }
}
