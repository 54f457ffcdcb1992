package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint in one pass: md5 of every `w`-char sliding
  * window, keep the `k` smallest DISTINCT hex digests, joined with '|'.
  *
  * Semantics exactly match the composable form
  * array_join(slice(array_sort(array_distinct(transform(..., md5))), 1, k), "|")
  * and its DuckDB oracle — but one per-row eval with a reused
  * MessageDigest replaces ~len(text) interpreted lambda evaluations.
  */
case class WinnowFingerprint(child: Expression, w: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val md = java.security.MessageDigest.getInstance("MD5")
    // windows: positions 1..max(len-w+1, 1) (substring caps at the end,
    // matching substr semantics on short docs)
    val nWin = math.max(text.length - (w - 1), 1)
    val top = new java.util.TreeSet[String]()
    var i = 0
    while (i < nWin) {
      val end = math.min(i + w, text.length)
      md.reset()
      val bytes = text.substring(i, end).getBytes("UTF-8")
      val dig = md.digest(bytes)
      val sb = new java.lang.StringBuilder(32)
      var b = 0
      while (b < dig.length) {
        sb.append(hexDigits((dig(b) >> 4) & 0xf))
        sb.append(hexDigits(dig(b) & 0xf))
        b += 1
      }
      top.add(sb.toString)
      if (top.size > k) top.pollLast()
      i += 1
    }
    val out = new java.lang.StringBuilder(33 * k)
    val it = top.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) out.append('|')
      out.append(it.next()); first = false
    }
    UTF8String.fromString(out.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpression {
  def winnowFingerprint(text: Column, w: Int, k: Int): Column =
    Bridge.column(WinnowFingerprint(Bridge.expression(text), w, k))
}
