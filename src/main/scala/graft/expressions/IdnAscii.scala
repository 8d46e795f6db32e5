package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fold a hostname to its IDNA ACE (`xn--`) form — RFC 3490 ToASCII per
  * label via `java.net.IDN` — so `münchen.de` and `xn--mnchen-3ya.de`
  * become ONE dedup/PSL key instead of two spellings of one site (the
  * gap a URL-keyed dedup hits on any international crawl).
  *
  * Execution shape: a native `UnaryExpression` whose codegen emits one
  * static call (the companion's `toAscii` static forwarder), so it
  * stays inside whole-stage codegen — no UDF, no boxing. The dominant
  * cost vanishes on the dominant input: an all-ASCII host (the web's
  * overwhelming majority) is detected by the UTF8String byte/char count
  * in place and returned UNTOUCHED — zero allocation, no `String`
  * round-trip; only genuinely international hosts pay the JDK fold.
  *
  * Contract: input should already be lowercased (the
  * [[graft.pipeline.UrlOps.canonicalHost]] pipeline position); the fold
  * itself lowercases its ACE output (Nameprep does) and a trailing
  * `:port` survives because port labels are ASCII and ASCII labels pass
  * through `IDN.toASCII` verbatim. A host the JDK cannot fold (overlong
  * label, bidi violation) is returned AS IS: keeping the raw spelling
  * makes the key at worst non-collapsed, never wrongly collapsed. */
case class IdnAscii(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"idn_ascii argument must be string, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(h: Any): Any =
    IdnAscii.toAscii(h.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.IdnAscii.toAscii($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : IdnAscii = copy(child = newChild)
  override def prettyName: String = "idn_ascii"
}

object IdnAscii {
  /** Static kernel (called from generated code): ASCII fast path in
    * place, JDK IDNA fold otherwise, raw spelling kept on fold failure. */
  def toAscii(host: UTF8String): UTF8String = {
    // all-ASCII iff UTF-8 byte count == code-point count
    if (host.numBytes() == host.numChars()) return host
    val s = host.toString
    try UTF8String.fromString(
      java.net.IDN.toASCII(s).toLowerCase(java.util.Locale.ROOT))
    catch { case _: IllegalArgumentException => host }
  }
}
