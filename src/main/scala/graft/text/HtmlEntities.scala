package graft.text

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Numeric character-reference decode (`&#8212;` / `&#x2014;`) as ONE
  * fully-codegen expression (the [[UnicodeNorm]] `defineCodeGen`
  * discipline — whole-stage codegen keeps [[WebText.htmlText]]'s scalar
  * chain lambda-free, where a `transform` HOF would drop the whole
  * projection to interpreted evaluation; PlanShapeSpec pins that).
  *
  * Semantics are EXACTLY the tokenize-transform-join the DuckDB oracle
  * replays (WebQueries.duckExtract): a reference decodes iff it has
  * 1-7 decimal or 1-6 hex digits, a closing ';', and a codepoint in
  * 1..U+10FFFF excluding surrogates; anything else passes through
  * byte-for-byte. One scan, no allocation when no `&#` occurs.
  */
case class DecodeNumEntities(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    HtmlEntities.decodeNumeric(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.HtmlEntities.decodeNumeric($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlEntities {

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Static decode target for both eval and generated code. */
  def decodeNumeric(s0: UTF8String): UTF8String = {
    val s = s0.toString
    if (!s.contains("&#")) return s0
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var decoded = false
      if (c == '&' && i + 1 < s.length && s.charAt(i + 1) == '#') {
        var j = i + 2
        val hex = j < s.length && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val start = j
        val maxDigits = if (hex) 6 else 7
        var cp = 0
        var run = true
        while (run && j < s.length && j - start < maxDigits) {
          val d = if (hex) hexVal(s.charAt(j))
            else if (s.charAt(j) >= '0' && s.charAt(j) <= '9') s.charAt(j) - '0'
            else -1
          if (d < 0) run = false
          else { cp = cp * (if (hex) 16 else 10) + d; j += 1 }
        }
        // over-long digit strings fail here too: the next char after
        // maxDigits digits is a digit, not ';' — pass through, exactly
        // like the bounded token pattern
        if (j > start && j < s.length && s.charAt(j) == ';' &&
            cp >= 1 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) {
          sb.appendCodePoint(cp)
          i = j + 1
          decoded = true
        }
      }
      if (!decoded) { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}
