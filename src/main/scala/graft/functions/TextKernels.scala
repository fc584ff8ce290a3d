package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
