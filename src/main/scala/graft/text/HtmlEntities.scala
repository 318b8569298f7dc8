package graft.text

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decode — numeric (`&#8212;` / `&#x2014;`)
  * AND the named six (amp/lt/gt/quot/apos/nbsp) — as ONE fully-codegen
  * single-pass expression (the [[UnicodeNorm]] `defineCodeGen`
  * discipline — whole-stage codegen keeps [[WebText.htmlText]]'s scalar
  * chain lambda-free, where a `transform` HOF would drop the whole
  * projection to interpreted evaluation; PlanShapeSpec pins that).
  *
  * SINGLE PASS is the correctness property, not an optimization: each
  * reference decodes exactly once and decoded output is never
  * rescanned, so neither escape direction can double-decode —
  * `&amp;#65;` yields literal `&#65;` AND `&#38;lt;` yields literal
  * `&lt;`, exactly as a real HTML parser renders them. (The previous
  * numeric-then-named two-pass got the first right and the second
  * wrong.) Semantics are EXACTLY the tokenize-transform-join the
  * DuckDB oracle replays (WebQueries.duckExtract): a numeric reference
  * decodes iff it has 1-7 decimal or 1-6 hex digits, a closing ';',
  * and a codepoint in 1..U+10FFFF excluding surrogates; a named
  * reference iff it is one of the six verbatim; anything else passes
  * through byte-for-byte. One scan, no allocation when no `&` occurs.
  */
case class DecodeHtmlEntities(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    HtmlEntities.decodeAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.HtmlEntities.decodeAll($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlEntities {

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  // the named set, verbatim token -> replacement (same table the
  // DuckDB oracle spells out in its CASE arms)
  private val Named: Array[(String, Char)] = Array(
    "&lt;" -> '<', "&gt;" -> '>', "&quot;" -> '"',
    "&apos;" -> '\'', "&nbsp;" -> ' ', "&amp;" -> '&')

  /** Static decode target for both eval and generated code. */
  def decodeAll(s0: UTF8String): UTF8String = {
    val s = s0.toString
    if (s.indexOf('&') < 0) return s0
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var decoded = false
      if (c == '&' && i + 1 < s.length) {
        if (s.charAt(i + 1) == '#') {
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
        } else {
          var k = 0
          while (!decoded && k < Named.length) {
            val (tok, rep) = Named(k)
            if (s.startsWith(tok, i)) {
              sb.append(rep)
              i += tok.length
              decoded = true
            }
            k += 1
          }
        }
      }
      if (!decoded) { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}
