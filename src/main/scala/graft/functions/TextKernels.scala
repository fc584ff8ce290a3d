package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization.
  *
  * Spark ships no normalization builtin, and a Scala UDF would drop
  * the containing projection out of whole-stage codegen and pay
  * SerDe per row — on a 100-TB corpus the normalizer runs inside the
  * ingest/dedup inner loop, so like [[VectorKernels]] it is a
  * `doGenCode` expression: the generated code calls one static
  * method on the raw `UTF8String`. A pure-ASCII value (the vast
  * majority of English web text) is proven NFC by a byte scan and
  * returned as-is — no String decode, no allocation.
  */
object TextKernels {

  /** Unicode NFC (canonical decomposition + canonical composition) of
    * a string column. Null in, null out. */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c.cast("string"))))

  /** Hashing-trick document embedding over a token array: each token
    * md5-hashes to a 60-bit value `hv`; `hv % dims` picks the bucket,
    * bit 59 of `hv` picks the sign (+1/−1 — the signed hashing trick,
    * Weinberger 2009, which keeps collisions zero-mean), and the
    * signed counts accumulate into a `dims`-length `array<float>`.
    * Composes with [[graft.ops.Similarity.l2Normalize]] and then the
    * whole ANN / SemDeDup machinery — an embedding column with no
    * model in the loop.
    *
    * md5 (not xxhash64) so the vector is engine-portable: the 60-bit
    * value is exactly DuckDB's `CAST('0x' || substr(md5(t),1,15) AS
    * UBIGINT)` — the same replayable-hash convention as the SimHash
    * oracle. Per-row cost is O(tokens + dims) with zero shuffle; a
    * HOF spelling would be O(tokens × dims) per row and fall out of
    * codegen. */
  def featureHash(tokens: Column, dims: Int): Column =
    Bridge.column(FeatureHashEmbed(
      Bridge.expression(tokens.cast("array<string>")), dims))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 as a non-negative long — the engine-portable
    * token hash of the SimHash oracle, fused into ONE kernel call.
    * Bit-identical to `conv(substring(md5(t), 1, 15), 16, 10)
    * .cast("long")`, which the simhash paths previously evaluated as
    * an interpreted four-expression chain per TOKEN (md5 → 32-char hex
    * string, substring copy, conv base-parse, cast): the 10x-corpus
    * simhash probe spent most of its CPU and allocation there
    * (guide §1.2 per-task work; the md5→long arithmetic is the same
    * one [[featureHashEmbed]] already uses). */
  def md5Prefix60(c: Column): Column =
    Bridge.column(Md5Prefix60(Bridge.expression(c.cast("string"))))

  /** Runtime for [[Md5Prefix60]] (also the codegen target). */
  def md5Prefix60Of(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val dg = md.digest(s.getBytes)
    var top = 0L
    var j = 0
    while (j < 8) { top = (top << 8) | (dg(j) & 0xffL); j += 1 }
    top >>> 4
  }

  /** Runtime for [[FeatureHashEmbed]] (also the codegen target). Null
    * tokens are skipped; an all-null or empty array yields the zero
    * vector. */
  def featureHashEmbed(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
      dims: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val acc = new Array[Float](dims)
    val md = md5Local.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val dg = md.digest(tokens.getUTF8String(i).getBytes)
        // first 15 hex digits of the digest = first 8 bytes big-endian,
        // dropped low nibble — a non-negative 60-bit long
        var top = 0L
        var j = 0
        while (j < 8) { top = (top << 8) | (dg(j) & 0xffL); j += 1 }
        val hv = top >>> 4
        val b = (hv % dims).toInt
        acc(b) += (if (((hv >>> 59) & 1L) == 1L) 1f else -1f)
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(acc)
  }

  /** Shannon entropy (nats) of a string's character distribution —
    * the classic gibberish/low-entropy-spam quality signal: natural
    * prose sits ~2.8-3.2, "aaaa…" near 0, random base64 near ln(64).
    * One codegen kernel pass per row (count codepoints, then
    * H = ln n − Σ c·ln c / n summed in SORTED codepoint order so the
    * float result is engine-replayable — DuckDB reproduces it with
    * list lambdas over the sorted distinct characters). Empty or
    * null text → null. */
  def charEntropy(c: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(c.cast("string"))))

  /** Runtime for [[CharEntropy]] (also the codegen target). */
  def charEntropyOf(s: UTF8String): Any = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return null
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, _ + _)
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next().toDouble; acc += c * math.log(c) }
    math.log(n.toDouble) - acc / n
  }

  /** Visible-text extraction from an HTML string column — the
    * WET step between a crawl archive ([[graft.sources.Warc]]) and
    * the text pipeline (langId → quality → dedup). Like [[nfc]], a
    * `doGenCode` expression calling one static method, so a
    * 100-TB extract stays inside whole-stage codegen. Null in,
    * null out. Semantics (deterministic, oracle-replayable):
    * `script`/`style` bodies skip by HTML5 raw-text rules (their
    * content may contain `<`), `head`/`noscript`/`template`/`svg`
    * subtrees suppress, comments and declarations drop, block-level
    * tags become line breaks and inline tags disappear, the named
    * core entities + numeric character references decode, and
    * whitespace normalizes to single-spaced trimmed lines. */
  def htmlText(c: Column): Column =
    Bridge.column(HtmlExtract(Bridge.expression(c.cast("string"))))

  /** Charset-aware text decode for crawl payloads: real archives are
    * not all UTF-8 — the HTTP `Content-Type` header names the page's
    * encoding per row. A BOM wins (UTF-8/16LE/16BE, stripped), then
    * the header's `charset=` token (quoted or bare, any case), then
    * UTF-8; unknown/unsupported names fall back to UTF-8, and
    * malformed byte sequences decode with replacement characters
    * instead of throwing — a 100-TB ingest must never die on one
    * mojibake page. Null payload → null; a null content-type is
    * coalesced to '' by the wrapper (header absence is normal, it
    * must not null out the text). */
  def decodeText(payload: Column, contentType: Column): Column =
    Bridge.column(CharsetDecode(
      Bridge.expression(payload.cast("binary")),
      Bridge.expression(coalesce(contentType, lit("")).cast("string"))))

  private val CharsetRe =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*\"?'?([\\w.:+-]+)")

  /** Runtime for [[CharsetDecode]] (also the codegen target). */
  def charsetDecode(bytes: Array[Byte], ctype: UTF8String): UTF8String = {
    import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
    def decode(cs: Charset, from: Int): UTF8String = {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPLACE)
        .onUnmappableCharacter(CodingErrorAction.REPLACE)
      UTF8String.fromString(
        dec.decode(java.nio.ByteBuffer.wrap(bytes, from, bytes.length - from))
          .toString)
    }
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return decode(StandardCharsets.UTF_8, 3)
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return decode(StandardCharsets.UTF_16LE, 2)
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return decode(StandardCharsets.UTF_16BE, 2)
    val m = CharsetRe.matcher(ctype.toString)
    val cs =
      if (m.find()) {
        try Charset.forName(m.group(1))
        catch { case _: Exception => StandardCharsets.UTF_8 }
      } else StandardCharsets.UTF_8
    decode(cs, 0)
  }

  private val BlockTags = java.util.Set.of(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "tr", "td", "th", "table", "thead", "tbody", "tfoot", "caption",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "aside",
    "header", "footer", "nav", "main", "blockquote", "pre", "form",
    "fieldset", "figure", "figcaption", "address", "title", "body", "html")
  private val SuppressTags =
    java.util.Set.of("head", "noscript", "template", "svg", "iframe")
  private val RawTextTags = java.util.Set.of("script", "style")

  private def indexOfIgnoreCase(h: String, needle: String, from: Int): Int = {
    var i = math.max(0, from)
    val last = h.length - needle.length
    while (i <= last) {
      if (h.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Runtime for [[HtmlExtract]] (also the codegen target). */
  def htmlExtractText(u: UTF8String): UTF8String = {
    val h = u.toString
    val n = h.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    var suppress = 0
    while (i < n) {
      val c = h.charAt(i)
      if (c == '<') {
        if (h.regionMatches(i + 1, "!--", 0, 3)) {
          val e = h.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (h.regionMatches(i + 1, "![CDATA[", 0, 8)) {
          // XHTML/SVG CDATA: the block may contain '>', only ]]> ends
          // it; its content is not rendered text
          val e = h.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (h.charAt(i + 1) == '!' || h.charAt(i + 1) == '?')) {
          val e = h.indexOf('>', i + 1) // <!DOCTYPE ...>, <?xml ...>
          i = if (e < 0) n else e + 1
        } else {
          var j = i + 1
          val closing = j < n && h.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          while (j < n && (h.charAt(j).isLetterOrDigit || h.charAt(j) == '-')) j += 1
          if (j == ns) { // stray '<' (e.g. "a < b" prose)
            if (suppress == 0) out.append('<')
            i += 1
          } else {
            val name = h.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
            // to tag end, honoring '>' inside quoted attribute values
            var k = j
            var q = 0.toChar
            while (k < n && (q != 0.toChar || h.charAt(k) != '>')) {
              val ck = h.charAt(k)
              if (q == 0.toChar && (ck == '"' || ck == '\'')) q = ck
              else if (ck == q) q = 0.toChar
              k += 1
            }
            val selfClose = k > j && h.charAt(k - 1) == '/' && q == 0.toChar
            val tagEnd = if (k < n) k + 1 else n
            if (!closing && RawTextTags.contains(name)) {
              // HTML5 raw text: body may contain '<'; only the literal
              // close tag ends it
              val e = indexOfIgnoreCase(h, "</" + name, tagEnd)
              if (e < 0) i = n
              else { val gt = h.indexOf('>', e); i = if (gt < 0) n else gt + 1 }
            } else if (SuppressTags.contains(name)) {
              if (closing) { if (suppress > 0) suppress -= 1 }
              else if (!selfClose) suppress += 1
              i = tagEnd
            } else {
              if (suppress == 0 && BlockTags.contains(name)) out.append('\n')
              i = tagEnd
            }
          }
        }
      } else if (suppress > 0) {
        i += 1
      } else if (c == '&') {
        val sc = h.indexOf(';', i + 1)
        var rep: String = null
        if (sc > i && sc <= i + 10) {
          val ent = h.substring(i + 1, sc)
          rep = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.length > 1 && e.charAt(0) == '#' =>
              try {
                val cp =
                  if (e.charAt(1) == 'x' || e.charAt(1) == 'X')
                    Integer.parseInt(e.substring(2), 16)
                  else Integer.parseInt(e.substring(1))
                if (cp > 0 && Character.isValidCodePoint(cp))
                  new String(Character.toChars(cp))
                else null
              } catch { case _: NumberFormatException => null }
            case _ => null // unknown entity: keep the literal '&...'
          }
        }
        if (rep != null) { out.append(rep); i = sc + 1 }
        else { out.append('&'); i += 1 }
      } else {
        out.append(c)
        i += 1
      }
    }
    // whitespace discipline: runs containing a line break -> '\n',
    // other runs -> one space; lines arrive trimmed, empties dropped
    val res = new java.lang.StringBuilder(out.length)
    var p = 0
    val m = out.length
    var pendingNl = false
    var pendingSp = false
    while (p < m) {
      val ch = out.charAt(p)
      if (ch == '\n') { pendingNl = true; pendingSp = false }
      else if (ch == ' ' || ch == '\t' || ch == '\r' || ch == '\f' ||
          ch == '\u00A0') { if (!pendingNl) pendingSp = true }
      else {
        if (pendingNl) { if (res.length > 0) res.append('\n') }
        else if (pendingSp && res.length > 0) res.append(' ')
        pendingNl = false; pendingSp = false
        res.append(ch)
      }
      p += 1
    }
    UTF8String.fromString(res.toString)
  }

  /** Runtime for [[NfcNormalize]] (also the codegen target — scalac
    * emits a static forwarder for it on the `TextKernels` class).
    * Fast paths: pure-ASCII bytes are NFC by definition; an
    * already-normalized string returns the input reference. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val nb = s.numBytes()
    var i = 0
    while (i < nb) {
      if ((s.getByte(i) & 0x80) != 0) {
        val str = s.toString
        return if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
        else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}

/** Signed feature-hashing embedding of an `array<string>` token
  * column; see [[TextKernels.featureHash]]. `dims` is a plan constant
  * baked into the generated loop. */
case class FeatureHashEmbed(child: Expression, dims: Int)
    extends UnaryExpression {
  require(dims > 0, s"featureHash dims must be positive, got $dims")
  // input type is guaranteed array<string> by the TextKernels wrapper
  // (explicit cast); direct construction must honor that
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "feature_hash"

  override def nullSafeEval(v: Any): Any =
    TextKernels.featureHashEmbed(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], dims)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.featureHashEmbed($c, $dims)")

  override protected def withNewChildInternal(newChild: Expression): FeatureHashEmbed =
    copy(child = newChild)
}

/** md5 60-bit prefix as long; see [[TextKernels.md5Prefix60]]. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  // input type is guaranteed string by the TextKernels.md5Prefix60
  // wrapper (explicit cast); direct construction must honor that
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(v: Any): Any =
    TextKernels.md5Prefix60Of(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.md5Prefix60Of($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

/** Character-distribution entropy; see [[TextKernels.charEntropy]]. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  // input type is guaranteed string by the TextKernels.charEntropy
  // wrapper (explicit cast); direct construction must honor that
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true // empty string -> null
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(v: Any): Any =
    TextKernels.charEntropyOf(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""Object r = graft.functions.TextKernels.charEntropyOf($c);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) r).doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** Charset-aware payload decode; see [[TextKernels.decodeText]]. */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression {
  // types guaranteed (binary, string) by the decodeText wrapper's
  // casts; direct construction must honor that
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "decode_text"

  override def nullSafeEval(p: Any, ct: Any): Any =
    TextKernels.charsetDecode(p.asInstanceOf[Array[Byte]],
      ct.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, ct) => s"graft.functions.TextKernels.charsetDecode($p, $ct)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CharsetDecode =
    copy(left = newLeft, right = newRight)
}

/** Visible-text extraction from HTML; see [[TextKernels.htmlText]]. */
case class HtmlExtract(child: Expression) extends UnaryExpression {
  // input type is guaranteed string by the TextKernels.htmlText
  // wrapper (explicit cast); direct construction must honor that
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_text"

  override def nullSafeEval(v: Any): Any =
    TextKernels.htmlExtractText(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.htmlExtractText($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  // input type is guaranteed string by the TextKernels.nfc wrapper
  // (explicit cast); direct construction must honor that
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc"

  override def nullSafeEval(v: Any): Any =
    TextKernels.nfcNormalize(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
