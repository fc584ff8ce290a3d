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
