package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** First 8 bytes of md5(string) as a big-endian signed long.
  *
  * Bit-compatible with parsing the first 16 hex characters of `md5(s)`: hex char `j`
  * is nibble `(result >>> (60 − 4·j)) & 15`. SimHash needs those nibbles per token —
  * the string route (md5 hex string + 16 `substring`/`instr` probes) allocates ~17
  * UTF8Strings per row on a corpus-wide explode; this is one digest and shifts.
  * Portable: any engine reproduces it from its own md5 (the DuckDB oracle keeps the
  * hex-string form and hashes match exactly).
  */
case class Md5PrefixLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Md5PrefixLong.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Md5PrefixLong.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5PrefixLong {
  // MessageDigest is not thread-safe and allocation is the expensive part — one
  // instance per executor thread, reset implicitly by digest()
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String): Long = {
    val bytes = digests.get().digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (bytes(i) & 0xffL); i += 1 }
    acc
  }
}
