package graft.functions

/**
 * Streaming JSON path navigator — the engine's equivalent of the reference's
 * `jiter_json_find` (reference: src/common.rs:525-557). Scans the raw JSON
 * text of a string column lazily: object keys are linearly scanned (first
 * match wins, reference src/common.rs:531-539), array elements are skipped
 * up to the requested index, and nothing after the found value is validated
 * (lazy semantics). Any structural error before/at the target yields
 * `Missing` — never an exception (reference src/common.rs:304,409 maps all
 * `GetError`s to NULL).
 *
 * Values are extracted together with their verbatim raw text slice so that
 * `json_get_json` / `json_as_text` / the union's array/object members can
 * return the original notation unchanged (e.g. `4.2e-1` stays `4.2e-1`,
 * reference src/json_get.rs:131-143).
 */
object JsonNav {

  /** Path element. Mirrors reference `JsonPath` (src/common.rs:84-103):
   *  string key, non-negative index, or None (never matches — produced by
   *  negative indices, SQL NULL path args, unsupported types). */
  sealed trait PathElem
  final case class Key(k: String) extends PathElem
  final case class Index(i: Long) extends PathElem
  case object NoMatch extends PathElem

  // Result kinds; 0-6 align with the reference union type ids
  // (src/common_union.rs:176-182). -1 = missing/invalid.
  final val KMissing = -1
  final val KNull    = 0
  final val KBool    = 1
  final val KLong    = 2
  final val KDouble  = 3
  final val KStr     = 4
  final val KArray   = 5
  final val KObject  = 6

  /** Parsed value at a path. `raw` is the verbatim slice of the input text
   *  (for strings: still quoted/escaped); `strV` is the unescaped string
   *  value (KStr only). */
  final class Value(
      val kind: Int,
      val boolV: Boolean,
      val longV: Long,
      val doubleV: Double,
      val strV: String,
      val raw: String)

  val Missing = new Value(KMissing, false, 0L, 0.0, null, null)
  private val JNull = new Value(KNull, false, 0L, 0.0, null, "null")
  private val JTrue = new Value(KBool, true, 0L, 0.0, null, "true")
  private val JFalse = new Value(KBool, false, 0L, 0.0, null, "false")

  /** Navigate `path` inside `json` and parse the value found there. */
  def find(json: String, path: Array[PathElem]): Value = {
    if (json == null) return Missing
    val sc = new Scanner(json)
    if (!sc.navigate(path)) Missing else sc.readValue()
  }

  /** Raw-JSON element slices of the array at `path`, or null if the value
   *  there is not an array (reference src/json_get_array.rs:119-144). */
  def elements(json: String, path: Array[PathElem]): Array[String] = {
    if (json == null) return null
    val sc = new Scanner(json)
    if (!sc.navigate(path)) return null
    sc.readArrayElements()
  }

  /** Keys of the object at `path` in document order, or null
   *  (reference src/json_object_keys.rs:122-141). */
  def objectKeys(json: String, path: Array[PathElem]): Array[String] = {
    if (json == null) return null
    val sc = new Scanner(json)
    if (!sc.navigate(path)) return null
    sc.readObjectKeys()
  }

  /** Array element count / object key count at `path`; -1 → SQL NULL
   *  (scalars, strings, missing: reference src/json_length.rs:99-128). */
  def length(json: String, path: Array[PathElem]): Long = {
    if (json == null) return -1L
    val sc = new Scanner(json)
    if (!sc.navigate(path)) return -1L
    sc.countAt()
  }

  /** True iff `path` resolves to any value — including a JSON null
   *  (reference src/json_contains.rs:103-106: `find(...).is_some()`). */
  def contains(json: String, path: Array[PathElem]): Boolean = {
    if (json == null) return false
    val sc = new Scanner(json)
    sc.navigate(path) && sc.peekIsValueStart()
  }

  /** JSON-quote + escape a string per RFC 8259 (matches serde_json's
   *  escaping, used by json_union_to_text's string arm:
   *  reference src/json_union_to_text.rs:98-104). */
  def quote(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < ' ') sb.append(f"\\u${c.toInt}%04x") else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  /** Serialize a double the way Rust's `Display` does for the common cases:
   *  integral finite values print without a fractional part ("1", not
   *  "1.0"). Mirrors json_union_to_text's float arm. */
  def formatDouble(d: Double): String = {
    if (d.isWhole && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString
  }

  /** One pass over a JSON string. Not thread-safe; one instance per call. */
  private final class Scanner(s: String) {
    private val n = s.length
    private var pos = 0
    private var failed = false

    private def skipWs(): Unit = {
      while (pos < n) {
        val c = s.charAt(pos)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else return
      }
    }

    def peekIsValueStart(): Boolean = {
      if (failed || pos >= n) return false
      val c = s.charAt(pos)
      c == '{' || c == '[' || c == '"' || c == 't' || c == 'f' || c == 'n' ||
        c == '-' || (c >= '0' && c <= '9')
    }

    /** Position the scanner at the start of the value addressed by `path`.
     *  Key(k) is only valid on objects, Index(i) only on arrays — anything
     *  else is Missing (reference src/common.rs:541-556). */
    def navigate(path: Array[PathElem]): Boolean = {
      skipWs()
      var i = 0
      while (i < path.length) {
        if (failed || pos >= n) return false
        val ok = path(i) match {
          case Key(k)   => s.charAt(pos) == '{' && seekKey(k)
          case Index(j) => s.charAt(pos) == '[' && seekIndex(j)
          case NoMatch  => false
        }
        if (!ok || failed) return false
        i += 1
      }
      !failed && pos < n
    }

    /** pos at '{': scan keys linearly; first match wins. Leaves pos at the
     *  matched key's value start. */
    private def seekKey(k: String): Boolean = {
      pos += 1
      skipWs()
      if (pos < n && s.charAt(pos) == '}') return false
      while (true) {
        if (pos >= n || s.charAt(pos) != '"') { failed = true; return false }
        val key = readString()
        if (failed) return false
        skipWs()
        if (pos >= n || s.charAt(pos) != ':') { failed = true; return false }
        pos += 1
        skipWs()
        if (key == k) return true
        skipValue()
        if (failed) return false
        skipWs()
        if (pos >= n) { failed = true; return false }
        s.charAt(pos) match {
          case ',' => pos += 1; skipWs()
          case '}' => return false
          case _   => failed = true; return false
        }
      }
      false
    }

    /** pos at '[': skip `idx` elements; leaves pos at element idx's start. */
    private def seekIndex(idx: Long): Boolean = {
      if (idx < 0) return false
      pos += 1
      skipWs()
      if (pos < n && s.charAt(pos) == ']') return false
      var i = 0L
      while (i < idx) {
        skipValue()
        if (failed) return false
        skipWs()
        if (pos >= n) { failed = true; return false }
        s.charAt(pos) match {
          case ',' => pos += 1; skipWs()
          case ']' => return false
          case _   => failed = true; return false
        }
        i += 1
      }
      pos < n
    }

    /** Unescape the string starting at pos (must be '"'). Fast path:
     *  substring when no escapes. */
    private def readString(): String = {
      pos += 1
      val start = pos
      while (pos < n) {
        val c = s.charAt(pos)
        if (c == '"') { val r = s.substring(start, pos); pos += 1; return r }
        else if (c == '\\' || c < ' ') return readStringSlow(start)
        else pos += 1
      }
      failed = true
      null
    }

    private def readStringSlow(start: Int): String = {
      val sb = new java.lang.StringBuilder(16)
      sb.append(s, start, pos)
      while (pos < n) {
        val c = s.charAt(pos)
        if (c == '"') { pos += 1; return sb.toString }
        else if (c == '\\') {
          pos += 1
          if (pos >= n) { failed = true; return null }
          (s.charAt(pos): @annotation.switch) match {
            case '"'  => sb.append('"'); pos += 1
            case '\\' => sb.append('\\'); pos += 1
            case '/'  => sb.append('/'); pos += 1
            case 'b'  => sb.append('\b'); pos += 1
            case 'f'  => sb.append('\f'); pos += 1
            case 'n'  => sb.append('\n'); pos += 1
            case 'r'  => sb.append('\r'); pos += 1
            case 't'  => sb.append('\t'); pos += 1
            case 'u'  =>
              pos += 1
              if (pos + 4 > n) { failed = true; return null }
              try {
                sb.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
              } catch { case _: NumberFormatException => failed = true; return null }
              pos += 4
            case _ => failed = true; return null
          }
        } else if (c < ' ') { failed = true; return null }
        else { sb.append(c); pos += 1 }
      }
      failed = true
      null
    }

    /** Skip past one value without materializing it. Strings and bracket
     *  nesting are respected; skipped scalars are not fully validated
     *  (lazy, like jiter's skip). */
    private def skipValue(): Unit = {
      if (pos >= n) { failed = true; return }
      val c = s.charAt(pos)
      if (c == '"') skipString()
      else if (c == '{' || c == '[') {
        var depth = 0
        while (pos < n) {
          val ch = s.charAt(pos)
          if (ch == '"') skipString()
          else {
            if (ch == '{' || ch == '[') depth += 1
            else if (ch == '}' || ch == ']') depth -= 1
            pos += 1
          }
          if (depth == 0) return
          if (failed) return
        }
        failed = true
      } else {
        // scalar: run to a structural boundary
        while (pos < n) {
          val ch = s.charAt(pos)
          if (ch == ',' || ch == '}' || ch == ']' || ch == ' ' || ch == '\t' ||
              ch == '\n' || ch == '\r') return
          pos += 1
        }
      }
    }

    private def skipString(): Unit = {
      pos += 1
      while (pos < n) {
        val c = s.charAt(pos)
        if (c == '\\') pos += 2
        else if (c == '"') { pos += 1; return }
        else pos += 1
      }
      failed = true
    }

    /** After a literal/number: the next char must terminate the value. */
    private def validEnd(): Boolean = {
      if (pos >= n) return true
      val c = s.charAt(pos)
      c == ',' || c == '}' || c == ']' || c == ' ' || c == '\t' ||
        c == '\n' || c == '\r'
    }

    /** Parse the value at pos into a typed result with its raw slice. */
    def readValue(): Value = {
      if (failed || pos >= n) return Missing
      val start = pos
      s.charAt(pos) match {
        case '"' =>
          val v = readString()
          if (failed) Missing
          else new Value(KStr, false, 0L, 0.0, v, s.substring(start, pos))
        case '{' =>
          skipValue()
          if (failed) Missing
          else new Value(KObject, false, 0L, 0.0, null, s.substring(start, pos))
        case '[' =>
          skipValue()
          if (failed) Missing
          else new Value(KArray, false, 0L, 0.0, null, s.substring(start, pos))
        case 't' =>
          if (s.startsWith("true", pos)) { pos += 4; if (validEnd()) JTrue else Missing }
          else Missing
        case 'f' =>
          if (s.startsWith("false", pos)) { pos += 5; if (validEnd()) JFalse else Missing }
          else Missing
        case 'n' =>
          if (s.startsWith("null", pos)) { pos += 4; if (validEnd()) JNull else Missing }
          else Missing
        case c if c == '-' || (c >= '0' && c <= '9') => readNumber(start)
        case _ => Missing
      }
    }

    /** Strict-ish JSON number: no leading zeros, digits required around
     *  '.', and after 'e'. Ints that overflow Long fall back to double
     *  (the reference panics on BigInt, src/json_get.rs:147 — we degrade
     *  gracefully instead). */
    private def readNumber(start: Int): Value = {
      var isFloat = false
      if (s.charAt(pos) == '-') pos += 1
      if (pos >= n || !isDigit(s.charAt(pos))) return Missing
      if (s.charAt(pos) == '0' && pos + 1 < n && isDigit(s.charAt(pos + 1))) return Missing
      while (pos < n && isDigit(s.charAt(pos))) pos += 1
      if (pos < n && s.charAt(pos) == '.') {
        isFloat = true
        pos += 1
        if (pos >= n || !isDigit(s.charAt(pos))) return Missing
        while (pos < n && isDigit(s.charAt(pos))) pos += 1
      }
      if (pos < n && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
        isFloat = true
        pos += 1
        if (pos < n && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) pos += 1
        if (pos >= n || !isDigit(s.charAt(pos))) return Missing
        while (pos < n && isDigit(s.charAt(pos))) pos += 1
      }
      if (!validEnd()) return Missing
      val raw = s.substring(start, pos)
      if (!isFloat) {
        try new Value(KLong, false, java.lang.Long.parseLong(raw), 0.0, null, raw)
        catch {
          case _: NumberFormatException =>
            new Value(KDouble, false, 0L, java.lang.Double.parseDouble(raw), null, raw)
        }
      } else {
        new Value(KDouble, false, 0L, java.lang.Double.parseDouble(raw), null, raw)
      }
    }

    private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

    /** pos at a value start: if '[', slice each element verbatim. */
    def readArrayElements(): Array[String] = {
      if (failed || pos >= n || s.charAt(pos) != '[') return null
      pos += 1
      skipWs()
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      if (pos < n && s.charAt(pos) == ']') return out.toArray
      while (pos < n) {
        val start = pos
        skipValue()
        if (failed) return null
        out += s.substring(start, pos)
        skipWs()
        if (pos >= n) return null
        s.charAt(pos) match {
          case ',' => pos += 1; skipWs()
          case ']' => return out.toArray
          case _   => return null
        }
      }
      null
    }

    /** pos at a value start: if '{', collect keys in document order. */
    def readObjectKeys(): Array[String] = {
      if (failed || pos >= n || s.charAt(pos) != '{') return null
      pos += 1
      skipWs()
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      if (pos < n && s.charAt(pos) == '}') return out.toArray
      while (pos < n) {
        if (s.charAt(pos) != '"') return null
        val key = readString()
        if (failed) return null
        out += key
        skipWs()
        if (pos >= n || s.charAt(pos) != ':') return null
        pos += 1
        skipWs()
        skipValue()
        if (failed) return null
        skipWs()
        if (pos >= n) return null
        s.charAt(pos) match {
          case ',' => pos += 1; skipWs()
          case '}' => return out.toArray
          case _   => return null
        }
      }
      null
    }

    /** pos at a value start: array element count, object key count, else -1. */
    def countAt(): Long = {
      if (failed || pos >= n) return -1L
      s.charAt(pos) match {
        case '[' =>
          val els = readArrayElements()
          if (els == null) -1L else els.length.toLong
        case '{' =>
          val ks = readObjectKeys()
          if (ks == null) -1L else ks.length.toLong
        case _ => -1L
      }
    }
  }
}
