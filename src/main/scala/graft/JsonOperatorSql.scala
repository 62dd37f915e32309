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
 * is unsound): only `lhs op (literal | identifier)` shapes are rewritten,
 * where lhs is a (possibly dotted or backquoted) identifier, a string
 * literal, a parenthesized group (`(j->'a')->>'b'`), or a function call
 * (`f(x) -> 'k'`) — the reference plans any expression LHS
 * (src/rewrite.rs:105-144). The FIRST operator on a bare column requires
 * a single-quoted string path — `x -> 0` is never touched, because that
 * shape is also a Spark lambda (`transform(arr, x -> 0)`); integer
 * indices are allowed from the second chain step on (`j->'a'->0` works;
 * for a leading index write `json_get(j, 0)`). A parenthesized group
 * that is a valid Spark lambda parameter list — `(a, b)` with two or
 * more bare identifiers, as a direct builtin-HOF argument — never
 * folds; the single-identifier form `(x) -> body` is a Spark syntax
 * error (its grammar's paren lambda alternative requires two+ params),
 * so `(x) -> 'k'` folds as the operator, matching the reference.
 *
 * A COLUMN RHS (`j -> key_col`, any chain step — the reference plans any
 * expression RHS, src/rewrite.rs:117-130, column-path matrix
 * tests/main.rs:2178-2259) is rewritten for the ARROW operators EXCEPT
 * where the LHS sits where a Spark single-parameter lambda could: as the
 * token directly after the `(` or a `,` of a call to one of Spark's
 * builtin higher-order functions (lambdas are only legal as direct HOF
 * arguments, and only builtins take them, so every other position is
 * unambiguous). In that one position — `transform(arr, x -> y)` — string
 * paths still rewrite, column paths pass through (write
 * `json_get(x, y)`; DivergenceSpec pins this). A call RHS
 * (`j -> upper(k)`) and a parenthesized-group RHS (`j -> (expr)`) fold
 * too, their text recursively rewritten (so nested arrows and HOF
 * lambdas inside stay correct); `?` never takes any of these (a bare
 * `?` is a parameter marker that legitimately precedes identifiers —
 * `SELECT ? AS p` — so a column-RHS contains must be written
 * `json_contains(j, key_col)`).
 *
 * Chains left-fold: `a->'b'->>'c'` → `json_as_text(json_get(a,'b'),'c')`.
 * String literals, quoted identifiers, `--` and `/* */` comments, and `?`
 * in any other position (a parameter marker) are left untouched. A whole
 * `case … end` is an expression LHS (`case … end -> 'k'` folds), but a
 * BARE KEYWORD on its own never folds as LHS or RHS (`j -> case …` needs
 * parens: `j -> (case … end)`) — a column legally NAMED by a keyword
 * (`filter`, `left`, …) must be backquoted to participate, which also
 * makes the query robust under plain Spark. Anything the rewriter does
 * not understand passes through verbatim — Spark's parser then reports
 * it.
 */
object JsonOperatorSql {

  private val ops = Seq("->>" -> "json_as_text", "->" -> "json_get", "?" -> "json_contains")

  /** Spark's builtin higher-order functions — the only call sites where a
    * bare `x -> body` lambda is legal SQL (HigherOrderFunction
    * expressions; user functions cannot take lambdas). Inside these
    * argument lists an identifier RHS stays untouched. */
  private val HofNames = Set(
    "transform", "filter", "exists", "forall", "aggregate", "reduce",
    "zip_with", "map_zip_with", "map_filter", "transform_keys",
    "transform_values", "array_sort")

  /** SQL keywords. An identifier in this set never folds operators as a
    * bare LHS (`… end -> 'k'` passes through rather than emitting
    * `json_get(end, …)`), and — unless it is also in [[CallableKeywords]]
    * — a paren directly after it is plain grouping (`select (...)`,
    * `where (...)`, `when (...)`), so a close-paren fold reaches back
    * only to the '(' itself, not to the keyword. Genuinely functional
    * non-keywords (cast, if, …) are deliberately NOT here: `cast(x as
    * t)` must fold as a whole call. */
  private val SqlKeywords = Set(
    "select", "from", "where", "and", "or", "not", "in", "on", "when",
    "then", "else", "end", "case", "join", "left", "right", "full",
    "inner", "outer", "cross", "semi", "anti", "union", "intersect",
    "except", "all", "distinct", "group", "by", "having", "order",
    "limit", "offset", "as", "is", "null", "between", "like", "rlike",
    "ilike", "escape", "over", "partition", "rows", "range", "values",
    "with", "any", "some", "using", "lateral", "interval", "exists",
    "filter", "window", "qualify")

  /** Keywords that also name real Spark functions — `left(s, 4)`,
    * `right(s, 4)`, `any(b)`, `some(b)`, `exists(arr, pred)`,
    * `filter(arr, pred)`, `range(10)`. A paren directly after one of
    * these is a CALL (fold includes the callee), never plain grouping —
    * treating it as grouping would glue the fold output onto the
    * keyword (`leftjson_get(…)`). `filter` is disambiguated from the
    * aggregate FILTER clause by peeking for `(where …` content. */
  private val CallableKeywords =
    Set("left", "right", "any", "some", "exists", "filter", "range")

  def rewrite(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = sql.length
    // lambda-position tracking: prevSig is the last significant (non-ws,
    // non-comment) char appended; lastIdent the last raw identifier (""
    // when the last token was anything else); parens records, for each
    // open paren, whether it is a call to a builtin HOF — the only
    // context where a lambda parameter can follow `(` or `,`
    var prevSig: Char = ' '
    var lastIdent: String = ""
    // start position in `out` of the last appended atom (identifier,
    // quoted name, string literal, or closed paren group) — the LHS a
    // call or close-paren fold reaches back to; -1 when the last token
    // was an operator/punctuation
    var lastExprStart: Int = -1
    // true right after a clause keyword (`over`, clause `filter`) that
    // CONTINUES the preceding expression: lastExprStart still points at
    // the start of the windowed expression, so `expr over (…) ->> 'k'`
    // and `expr over w ->> 'k'` fold onto the whole thing
    var clauseCont = false
    val parens = scala.collection.mutable.Stack.empty[Par]
    // `out` positions of open CASE keywords: END closes the innermost,
    // making the whole `case … end` an operator LHS
    val caseStarts = scala.collection.mutable.Stack.empty[Int]
    // shared close-of-group fold: extract the expression that started at
    // exprStart, fold trailing operators onto it, and drop CASE trackers
    // made stale by the rewrite (a CASE left open inside the group is
    // malformed input). The space guard keeps a grouping fold directly
    // after a keyword (`when(j->'a')`) from gluing onto the keyword;
    // call folds carry their callee inside expr, so it never fires there.
    def closeFold(exprStart: Int): Unit = {
      while (caseStarts.nonEmpty && caseStarts.top >= exprStart)
        caseStarts.pop()
      val expr = out.substring(exprStart)
      out.setLength(exprStart)
      if (expr.startsWith("(") && out.nonEmpty &&
        isIdentPart(out.charAt(out.length - 1))) out.append(' ')
      i = foldOps(sql, i, expr, out, allowIdentRhs = true)
      prevSig = out.charAt(out.length - 1)
    }
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '-' && sql.startsWith("--", i)) {
        val end = sql.indexOf('\n', i)
        val stop = if (end < 0) n else end + 1
        out.append(sql.substring(i, stop)); i = stop
      } else if (c == '/' && sql.startsWith("/*", i)) {
        val end = sql.indexOf("*/", i + 2)
        val stop = if (end < 0) n else end + 2
        out.append(sql.substring(i, stop)); i = stop
      } else {
        // a single-parameter lambda (`x -> body`) can only start directly
        // after the `(` or a `,` of a builtin-HOF call — only there is
        // an identifier RHS ambiguous with a lambda body
        val lambdaPossible = (prevSig == '(' || prevSig == ',') &&
          parens.nonEmpty && parens.top.isHof
        if (c == '\'' || c == '"') {
          // a string literal is a valid operator LHS in the reference's SQL
          // (`'{"a": "b"}'->>'a'` — reference tests/main.rs:1533); foldOps
          // appends it verbatim when no operator follows. Double quotes
          // are a string literal in default Spark and an identifier under
          // ANSI doubleQuotedIdentifiers — operators fold after either
          // reading, so one branch serves both quote characters
          val (lit, next) = consumeString(sql, i, c)
          val before = out.length
          i = foldOps(sql, next, lit, out, allowIdentRhs = !lambdaPossible)
          prevSig = out.charAt(out.length - 1); lastIdent = ""
          lastExprStart = before; clauseCont = false
        } else if (c == '`') {
          val (lit, next) = consumeString(sql, i, '`')
          val before = out.length
          if ((prevSig == '.' || prevSig == ':' || clauseCont) &&
            lastExprStart >= 0) {
            // a backquoted member field, cast type, or named window
            // continues the preceding expression (same as the bare-ident
            // branch below) — fold operators onto the whole thing
            val start0 = lastExprStart
            val prefix = out.substring(start0)
            out.setLength(start0)
            i = foldOps(sql, next, prefix + lit, out, allowIdentRhs = true)
            prevSig = out.charAt(out.length - 1)
            lastIdent = ""; lastExprStart = start0; clauseCont = false
          } else {
            i = foldOps(sql, next, lit, out, allowIdentRhs = !lambdaPossible)
            prevSig = out.charAt(out.length - 1)
            // a backquoted HOF name (`transform`(arr, x -> y)) is still a
            // HOF call — track the unquoted name so its lambda stays safe
            lastIdent =
              if (out.length - before == lit.length && lit.length >= 2 &&
                lit.charAt(lit.length - 1) == '`') lit.substring(1, lit.length - 1)
              else ""
            lastExprStart = before; clauseCont = false
          }
        } else if (isIdentStart(c)) {
          val startId = i
          while (i < n && isIdentPart(sql.charAt(i))) i += 1
          val ident = sql.substring(startId, i)
          val lower = ident.toLowerCase
          val before = out.length
          if ((lower == "over" || lower == "filter") && prevSig == ')' &&
            lastExprStart >= 0) {
            // window OVER / aggregate FILTER clause after a call: the
            // clause CONTINUES that expression — keep its start so the
            // whole `expr over (…)` / `expr filter (where …)` is the
            // LHS for any operator that follows the clause
            out.append(ident); i = startId + ident.length
            prevSig = out.charAt(out.length - 1); lastIdent = ident
            clauseCont = true
          } else if ((prevSig == '.' || prevSig == ':' || clauseCont) &&
            lastExprStart >= 0) {
            // member access on a computed expression (`f(x).field`), a
            // `::type` cast, or a named window (`expr over w`): fold
            // operators onto the WHOLE expression, not the trailing
            // identifier — `(j->'a')::int ->> 'b'` wraps the cast like
            // Postgres's tighter-binding `::`
            val start0 = lastExprStart
            val prefix = out.substring(start0)
            out.setLength(start0)
            // a ::-continued complex type name absorbs its `<…>` type
            // parameters (`j::array<int> -> 'a'` folds whole); only
            // array/map/struct take them, and none is a complete type
            // bare, so a following `<` is never a comparison here
            var identEnd = i
            var full = ident
            if (prevSig == ':' &&
              (lower == "array" || lower == "map" || lower == "struct")) {
              val p = consumeWs(sql, i)
              if (p < n && sql.charAt(p) == '<')
                consumeBalanced(sql, p, '<', '>').foreach { case (_, end) =>
                  full = ident + sql.substring(i, end); identEnd = end
                }
            }
            i = foldOps(sql, identEnd, prefix + full, out, allowIdentRhs = true)
            prevSig = out.charAt(out.length - 1)
            lastIdent = ""; lastExprStart = start0; clauseCont = false
          } else if (lower == "case") {
            caseStarts.push(before)
            out.append(ident); i = startId + ident.length
            prevSig = out.charAt(out.length - 1); lastIdent = ident
            lastExprStart = before; clauseCont = false
          } else if (lower == "end" && caseStarts.nonEmpty &&
            (parens.isEmpty || caseStarts.top > parens.top.openPos)) {
            // END closes the innermost CASE: the whole `case … end` is
            // an expression — operators after it fold onto it whole.
            // The CASE must have opened INSIDE the innermost still-open
            // group: an `end` matching a CASE from outside the group
            // (`f(case … )` nesting gone wrong, or an end-named column)
            // must not fold across the open frame — the fold would
            // rewrite out below the frame's exprStart and the eventual
            // `)` fold would slice stale positions
            val start0 = caseStarts.pop()
            val prefix = out.substring(start0)
            out.setLength(start0)
            i = foldOps(sql, startId + ident.length, prefix + ident, out,
              allowIdentRhs = true)
            prevSig = out.charAt(out.length - 1)
            lastIdent = ""; lastExprStart = start0; clauseCont = false
          } else if (SqlKeywords.contains(lower)) {
            // other keywords never fold as a bare LHS (a stray `end ->
            // 'k'` would emit json_get(end, …)); callable ones may still
            // head a call — the '(' branch reaches back via lastExprStart
            out.append(ident); i = startId + ident.length
            prevSig = out.charAt(out.length - 1); lastIdent = ident
            lastExprStart = before; clauseCont = false
          } else {
            i = foldOps(sql, i, ident, out, allowIdentRhs = !lambdaPossible)
            prevSig = out.charAt(out.length - 1)
            // only an identifier appended verbatim can name a following call
            lastIdent = if (out.length - before == ident.length) ident else ""
            lastExprStart = before; clauseCont = false
          }
        } else if (c == '(') {
          val callee = lastIdent.substring(lastIdent.lastIndexOf('.') + 1).toLowerCase
          val afterIdent = isIdentPart(prevSig) || prevSig == '`'
          // `exists (select …)` is the SQL subquery predicate, not the
          // exists(arr, pred) HOF — no lambda can live in its body, so
          // arrows right after a `,` in the subquery select list fold
          val isHof = afterIdent && HofNames.contains(callee) &&
            !(callee == "exists" && peekWord(sql, i + 1, "select"))
          // where the expression this paren belongs to STARTS: the whole
          // windowed/filtered expression for a clause group, the callee
          // for a call (`f(x)` folds as a whole), the previous group for
          // a chained call, the '(' itself for plain grouping — and a
          // non-callable keyword before '(' is grouping (`select (...)`)
          val exprStart =
            if (afterIdent && callee == "over")
              (if (clauseCont) lastExprStart else -1)
            else if (afterIdent && callee == "filter" && peekWord(sql, i + 1, "where"))
              (if (clauseCont) lastExprStart else -1)
            else if (afterIdent && SqlKeywords.contains(callee) &&
              !CallableKeywords.contains(callee)) out.length
            else if ((afterIdent || prevSig == ')') && lastExprStart >= 0)
              lastExprStart
            else out.length
          parens.push(Par(isHof, exprStart, lambdaPossible, openPos = out.length))
          out.append(c); i += 1
          prevSig = c; lastIdent = ""; lastExprStart = -1; clauseCont = false
        } else if (c == '[') {
          // subscript access continues the preceding expression —
          // `m['k'] -> 'a'` / `arr[0] ->> 'x'` fold as a whole; a `[`
          // with no expression before it (array literal syntax error
          // territory) gets no fold
          val exprStart =
            if ((isIdentPart(prevSig) || prevSig == '`' || prevSig == '"' ||
              prevSig == ')' || prevSig == ']') && lastExprStart >= 0)
              lastExprStart
            else -1
          parens.push(Par(isHof = false, exprStart, lambdaSpot = false,
            openPos = out.length, bracket = true))
          out.append(c); i += 1
          prevSig = c; lastIdent = ""; lastExprStart = -1; clauseCont = false
        } else if (c == ']') {
          val par =
            if (parens.nonEmpty && parens.top.bracket) parens.pop()
            else Par(isHof = false, -1, lambdaSpot = false,
              openPos = out.length, bracket = true)
          out.append(c); i += 1
          prevSig = ']'; lastIdent = ""; clauseCont = false
          if (par.exprStart >= 0) closeFold(par.exprStart)
          lastExprStart = par.exprStart
        } else if (c == ')') {
          // a bracket frame on top means mismatched nesting — don't pop
          // it, and don't fold anything for this stray paren
          val par =
            if (parens.nonEmpty && !parens.top.bracket) parens.pop()
            else Par(isHof = false, -1, lambdaSpot = true, openPos = out.length)
          out.append(c); i += 1
          prevSig = ')'; lastIdent = ""; clauseCont = false
          // operators can bind onto a parenthesized or call LHS —
          // `(j->'a')->>'b'`, `f(x) -> 'k'` — like the reference plans
          // any-expression LHS (rewrite.rs:105-144). Suppressed only when
          // the group is a parenthesized lambda PARAMETER LIST: opened
          // where a HOF argument starts AND containing ≥2 bare
          // identifiers (`(a, b) -> body`). Spark's grammar rejects the
          // single-identifier form `(x) -> body` (the paren alternative
          // of its lambda rule requires two+ params), so `(x) -> 'k'`
          // has only the operator reading and folds.
          val isLambdaParams = par.lambdaSpot && par.exprStart >= 0 &&
            LambdaParamList.matches(out.substring(par.exprStart + 1, out.length - 1))
          if (!isLambdaParams && par.exprStart >= 0) closeFold(par.exprStart)
          lastExprStart = par.exprStart
        } else {
          out.append(c); i += 1
          if (!c.isWhitespace) {
            prevSig = c; lastIdent = ""; clauseCont = false
            // member access ('.') and casts ('::') continue the
            // preceding expression — keep its start so `f(x).field ->
            // 'k'` and `(j->'a')::int ->> 'b'` fold as a whole
            if (c != '.' && c != ':') lastExprStart = -1
          }
        }
      }
    }
    out.toString
  }

  /** One open paren or bracket's context: HOF call (lambda args legal
    * inside), the `out` position its whole expression starts at, whether
    * the group itself opened where a lambda parameter list could, the
    * `out` position of the opening char itself (the CASE tracker uses it
    * to tell inside-group CASEs from outside ones), and whether it is a
    * `[` subscript rather than a paren. */
  private final case class Par(isHof: Boolean, exprStart: Int,
      lambdaSpot: Boolean, openPos: Int = Int.MaxValue,
      bracket: Boolean = false)

  /** A comma-separated list of TWO OR MORE bare (or backquoted)
    * identifiers — the only parenthesized shape Spark's lambda rule
    * accepts as a parameter list. A lambda param list contains no
    * operators, so matching against the already-rewritten group content
    * is sound. */
  private val LambdaParamList =
    """\s*(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`)\s*(?:,\s*(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`)\s*)+""".r

  /** Fold `op (literal | identifier)` sequences onto an LHS expression;
    * returns the new scan position and appends the (possibly rewritten)
    * expression. `allowIdentRhs` is false exactly where the LHS could be
    * a lambda parameter (chain steps past the first are always safe — a
    * folded call is no longer a bare parameter). */
  private def foldOps(sql: String, from: Int, lhs: String, out: StringBuilder,
      allowIdentRhs: Boolean): Int = {
    var i = from
    var expr = lhs
    var steps = 0
    var progressed = true
    while (progressed) {
      progressed = false
      val save = i
      val ws = consumeWsComments(sql, i)
      matchOp(sql, ws) match {
        case Some((opText, fn)) =>
          val afterOp = consumeWsComments(sql, ws + opText.length)
          // first step: string paths only (`x -> 0` is a Spark lambda)
          consumeLiteral(sql, afterOp, allowInt = steps > 0) match {
            case Some((lit, next)) =>
              expr = s"$fn($expr, $lit)"
              i = next
              steps += 1
              progressed = true
            case None =>
              // expression RHS (identifier / call / paren group) for the
              // arrow ops only: a bare `?` is a parameter marker and
              // legitimately precedes identifiers in parameterized SQL
              // (`SELECT ? AS p`, `LIMIT ? OFFSET ?`) — use
              // json_contains(j, key_col) for a column-RHS contains
              consumeExprRhs(sql, afterOp,
                allowed = opText != "?" && (allowIdentRhs || steps > 0)) match {
                case Some((rhs, next)) =>
                  expr = s"$fn($expr, $rhs)"
                  i = next
                  steps += 1
                  progressed = true
                case None => i = save
              }
          }
        case None => i = save
      }
    }
    out.append(expr)
    i
  }

  /** An expression RHS — the reference plans any expression
    * (rewrite.rs:117-130). Three shapes, in decreasing specificity:
    * a function CALL `upper(k)` (identifier + balanced arg list, the
    * whole fragment recursively rewritten so HOF-lambda detection and
    * nested arrows inside the args stay correct), a parenthesized
    * GROUP `(k || 'x')` (recursively rewritten), or a bare plain/dotted
    * or backquoted identifier. */
  private def consumeExprRhs(
      s: String, at: Int, allowed: Boolean): Option[(String, Int)] = {
    if (!allowed || at >= s.length) return None
    if (s.charAt(at) == '(')
      // postfix continuations bind to the group exactly as they do to a
      // bare identifier below — `j -> (k)::int` is json_get(j, (k)::int),
      // not json_get(j, (k))::int
      return consumeBalanced(s, at).map { case (grp, next) =>
        val postEnd = consumePostfix(s, next)
        if (postEnd > next) (rewrite(grp + s.substring(next, postEnd)), postEnd)
        else (rewrite(grp), next)
      }
    val (rhs, next) =
      if (s.charAt(at) == '`') consumeString(s, at, '`')
      else if (isIdentStart(s.charAt(at))) {
        var i = at
        while (i < s.length && isIdentPart(s.charAt(i))) i += 1
        (s.substring(at, i), i)
      } else return None
    if (rhs.isEmpty) None
    else {
      val after = consumeWs(s, next)
      // a bare KEYWORD is never a column RHS — consuming it would
      // strand the rest of its construct (`j -> case when … end` must
      // pass through whole, not become json_get(j, case) when …);
      // keyword-named FUNCTIONS (left(…), …) stay callable below
      if (SqlKeywords.contains(rhs.toLowerCase) &&
        !(after < s.length && s.charAt(after) == '(')) return None
      if (after < s.length && s.charAt(after) == '(')
        consumeBalanced(s, after).flatMap { case (grp, n) =>
          // postfix continuations on the call result (`j -> f(x)[0]`,
          // `j -> f(x).field`, `j -> f(x)::string`) bind tighter than
          // the arrows and belong to the RHS
          val postEnd = consumePostfix(s, n)
          if (postEnd > n) Some((rewrite(rhs + grp + s.substring(n, postEnd)), postEnd))
          else {
            // a window clause attached to the call belongs to the RHS —
            // without this, `j -> min(x) over (…)` would strand the OVER
            // on the generated json_get call. An `over` that is NOT
            // followed by a parseable spec or window name (`… over from
            // t`) bails the whole fold: passthrough beats restructuring
            val (win, end) = windowClause(s, n)
            if (win.isEmpty && peekWord(s, n, "over")) None
            else Some((rewrite(rhs + grp + win), end))
          }
        }
      else {
        // postfix continuations on a bare identifier (`j -> m['k']`,
        // `j -> k::int`) are part of the RHS — without this they would
        // mis-bind onto the generated call's RESULT, silently changing
        // semantics
        val postEnd = consumePostfix(s, next)
        if (postEnd > next) Some((rewrite(s.substring(at, postEnd)), postEnd))
        else Some((rhs, next))
      }
    }
  }

  /** A trailing `over (window spec)` or `over window_name` starting at
    * `from` — returned verbatim (with leading whitespace) together with
    * the end position; ("", from) when none. */
  private def windowClause(s: String, from: Int): (String, Int) = {
    if (!peekWord(s, from, "over")) return ("", from)
    val overAt = consumeWs(s, from)
    val afterOver = consumeWs(s, overAt + 4)
    if (afterOver < s.length && s.charAt(afterOver) == '(')
      consumeBalanced(s, afterOver) match {
        case Some((_, end)) => (s.substring(from, end), end)
        case None => ("", from)
      }
    else if (afterOver < s.length && isIdentStart(s.charAt(afterOver))) {
      var i = afterOver
      while (i < s.length && isIdentPart(s.charAt(i))) i += 1
      // a KEYWORD after `over` is the next clause (`… over from t`),
      // not a window name — swallowing it would destroy the statement
      val name = s.substring(afterOver, i)
      if (SqlKeywords.contains(name.toLowerCase)) ("", from)
      else (s.substring(from, i), i)
    } else ("", from)
  }

  /** From an opening `(` or `[`: the balanced group through its matching
    * close char, skipping string literals, quoted identifiers, and
    * comments. None when the text is unbalanced — the caller then leaves
    * the input untouched. */
  private def consumeBalanced(s: String, at: Int, open: Char = '(',
      close: Char = ')'): Option[(String, Int)] = {
    var i = at
    var depth = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"' || c == '`') i = consumeString(s, i, c)._2
      else if (c == '-' && s.startsWith("--", i)) {
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && s.startsWith("/*", i)) {
        val e = s.indexOf("*/", i + 2)
        i = if (e < 0) s.length else e + 2
      } else {
        if (c == open) depth += 1
        else if (c == close) {
          depth -= 1
          if (depth == 0) return Some((s.substring(at, i + 1), i + 1))
        }
        i += 1
      }
    }
    None
  }

  /** Zero or more trailing postfix continuations starting at `from` —
    * `[subscript]` groups, `::type` casts (parameterized types
    * included), and `.member` accesses — returning the end position
    * after the last one. All three bind tighter than the arrows, so an
    * RHS must absorb them before the fold continues: `j -> m['k']` is
    * json_get(j, m['k']), `j -> k::int` is json_get(j, k::int),
    * `j -> f(x).field` is json_get(j, f(x).field). */
  private def consumePostfix(s: String, from: Int): Int = {
    var i = from
    var scanning = true
    while (scanning) {
      val at = consumeWs(s, i)
      if (at < s.length && s.charAt(at) == '[')
        consumeBalanced(s, at, '[', ']') match {
          case Some((_, end)) => i = end
          case None => scanning = false
        }
      else if (s.startsWith("::", at)) {
        val t = consumeWs(s, at + 2)
        if (t < s.length && isIdentStart(s.charAt(t))) {
          var e = t
          while (e < s.length && isIdentPart(s.charAt(e))) e += 1
          val name = s.substring(t, e).toLowerCase
          val p = consumeWs(s, e)
          if (p < s.length && s.charAt(p) == '(')
            i = consumeBalanced(s, p).map(_._2).getOrElse(e) // decimal(10,2)
          else if (p < s.length && s.charAt(p) == '<' &&
            (name == "array" || name == "map" || name == "struct"))
            // angle-parameterized complex types (`::array<int>`,
            // `::map<string, array<int>>`); only these three names take
            // `<…>`, so a comparison like `k::int < 5` is never absorbed
            i = consumeBalanced(s, p, '<', '>').map(_._2).getOrElse(e)
          else i = e
        } else scanning = false
      } else if (at < s.length && s.charAt(at) == '.' &&
        at + 1 < s.length && s.charAt(at + 1) == '`') {
        i = consumeString(s, at + 1, '`')._2
      } else if (at < s.length && s.charAt(at) == '.' &&
        at + 1 < s.length && isIdentStart(s.charAt(at + 1))) {
        var e = at + 1
        while (e < s.length && isIdentPart(s.charAt(e))) e += 1
        i = e
      } else scanning = false
    }
    i
  }

  private def isIdentStart(c: Char) = c.isLetter || c == '_'
  private def isIdentPart(c: Char) = c.isLetterOrDigit || c == '_' || c == '.'

  /** Whether the next word (after whitespace) at `from` is `word`,
    * case-insensitively and at a word boundary. */
  private def peekWord(s: String, from: Int, word: String): Boolean = {
    val at = consumeWs(s, from)
    s.regionMatches(true, at, word, 0, word.length) &&
    (at + word.length >= s.length || !isIdentPart(s.charAt(at + word.length)))
  }

  private def consumeWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }

  /** Whitespace AND `--`/`/* */` comments — used only in the
    * operator-fold gaps (LHS↔op, op↔RHS, between chain steps), where a
    * comment is inert filler; a successful fold drops it from the
    * rebuilt expression. Everywhere else comments are copied through
    * verbatim by the main loop. An unterminated comment runs to end of
    * input (same convention as the main loop), where no operator can
    * follow anyway. `-->` lexes as a line comment, matching Spark. */
  private def consumeWsComments(s: String, from: Int): Int = {
    var i = consumeWs(s, from)
    var more = true
    while (more) {
      more = false
      if (s.startsWith("--", i)) {
        val end = s.indexOf('\n', i)
        if (end < 0) return s.length
        i = consumeWs(s, end + 1); more = true
      } else if (s.startsWith("/*", i)) {
        val end = s.indexOf("*/", i + 2)
        if (end < 0) return s.length
        i = consumeWs(s, end + 2); more = true
      }
    }
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

  /** A path literal: single-quoted string, an integer when allowed, or a
    * parenthesised text-cast of a string literal — the reference plans
    * `j ->> ('foo'::text)` identically to `j ->> 'foo'` (tests/main.rs
    * test_arrow_cast_key_text); the cast is identity on a string literal
    * so it is dropped. */
  private def consumeLiteral(s: String, at: Int, allowInt: Boolean): Option[(String, Int)] = {
    if (at >= s.length) None
    else if (s.charAt(at) == '\'') {
      val (lit, next) = consumeString(s, at, '\'')
      Some((lit, next))
    } else if (allowInt && s.charAt(at).isDigit) {
      var i = at
      while (i < s.length && s.charAt(i).isDigit) i += 1
      Some((s.substring(at, i), i))
    } else if (s.charAt(at) == '(') {
      val i0 = consumeWs(s, at + 1)
      if (i0 < s.length && s.charAt(i0) == '\'') {
        val (lit, afterLit) = consumeString(s, i0, '\'')
        var i = consumeWs(s, afterLit)
        // optional `::text`-family cast (identity on a string literal)
        if (s.startsWith("::", i)) {
          val t0 = consumeWs(s, i + 2)
          var t = t0
          while (t < s.length && (s.charAt(t).isLetterOrDigit || s.charAt(t) == '_')) t += 1
          val typ = s.substring(t0, t).toLowerCase
          if (!Set("text", "varchar", "string", "char").contains(typ)) return None
          i = consumeWs(s, t)
        }
        if (i < s.length && s.charAt(i) == ')') Some((lit, i + 1)) else None
      } else None
    } else None
  }
}
