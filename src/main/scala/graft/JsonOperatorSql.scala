package graft

/**
 * Opt-in translator for the PostgreSQL JSON operators in SQL text:
 * `j -> 'k'`, `j ->> 'k'`, `j ? 'k'` → `json_get(j,'k')`,
 * `json_as_text(j,'k')`, `json_contains(j,'k')` — so SQL written against
 * the reference (reference src/rewrite.rs:105-144) can run verbatim:
 * `spark.sql(JsonOperatorSql.rewrite(sql))`.
 *
 * Deliberately CONSERVATIVE rather than a parser replacement (SURVEY §7.2:
 * Spark 4 reserves bare `?` for parameter markers and blind text rewriting
 * is unsound): only `column op literal` shapes are rewritten, where
 * column is a (possibly dotted or backquoted) identifier and literal is a
 * single-quoted string or an integer. Chains left-fold:
 * `a->'b'->>'c'` → `json_as_text(json_get(a,'b'),'c')`. Operators inside
 * string literals, and `?` in any other position (a parameter marker),
 * are left untouched. Anything the rewriter does not understand is left
 * exactly as written — Spark's parser then reports it.
 */
object JsonOperatorSql {

  private val ops = Seq("->>" -> "json_as_text", "->" -> "json_get", "?" -> "json_contains")

  def rewrite(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        val (lit, next) = consumeString(sql, i, '\'')
        out.append(lit); i = next
      } else if (c == '"') {
        val (lit, next) = consumeString(sql, i, '"')
        out.append(lit); i = next
      } else if (c == '`') {
        val (lit, next) = consumeString(sql, i, '`')
        out.append(lit); i = next
      } else if (isIdentStart(c)) {
        // candidate LHS: identifier chain (dots allowed), maybe backquoted parts
        val startId = i
        while (i < n && isIdentPart(sql.charAt(i))) i += 1
        var expr = sql.substring(startId, i)
        // fold any following `op literal` sequences
        var progressed = true
        while (progressed) {
          progressed = false
          val save = i
          val ws = consumeWs(sql, i)
          matchOp(sql, ws) match {
            case Some((opText, fn)) =>
              val afterOp = consumeWs(sql, ws + opText.length)
              consumeLiteral(sql, afterOp) match {
                case Some((lit, next)) =>
                  expr = s"$fn($expr, $lit)"
                  i = next
                  progressed = true
                case None => i = save
              }
            case None => i = save
          }
        }
        out.append(expr)
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }

  private def isIdentStart(c: Char) = c.isLetter || c == '_'
  private def isIdentPart(c: Char) = c.isLetterOrDigit || c == '_' || c == '.'

  private def consumeWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }

  /** From an opening quote char: the raw text through the closing quote
    * (doubled quotes are escapes). */
  private def consumeString(s: String, from: Int, q: Char): (String, Int) = {
    var i = from + 1
    while (i < s.length) {
      if (s.charAt(i) == q) {
        if (i + 1 < s.length && s.charAt(i + 1) == q) i += 2
        else return (s.substring(from, i + 1), i + 1)
      } else i += 1
    }
    (s.substring(from), s.length)
  }

  private def matchOp(s: String, at: Int): Option[(String, String)] =
    ops.find { case (op, _) => s.startsWith(op, at) }

  /** A path literal: single-quoted string or integer. */
  private def consumeLiteral(s: String, at: Int): Option[(String, Int)] = {
    if (at >= s.length) None
    else if (s.charAt(at) == '\'') {
      val (lit, next) = consumeString(s, at, '\'')
      Some((lit, next))
    } else if (s.charAt(at).isDigit) {
      var i = at
      while (i < s.length && s.charAt(i).isDigit) i += 1
      Some((s.substring(at, i), i))
    } else None
  }
}
