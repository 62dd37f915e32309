package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/**
 * Streaming JSON path navigator — the engine's equivalent of the reference's
 * `jiter_json_find` (reference: src/common.rs:525-557). Operates directly on
 * the column's UTF-8 bytes (no UTF-16 decode of the document — Spark strings
 * are UTF8String): object keys are linearly scanned (first match wins,
 * reference src/common.rs:531-539) comparing raw byte ranges, array elements
 * are skipped up to the requested index, and nothing after the found value
 * is validated (lazy semantics). Any structural error before/at the target
 * yields `Missing` — never an exception (reference src/common.rs:304,409
 * maps all `GetError`s to NULL).
 *
 * Values are extracted together with their verbatim raw byte slice so that
 * `json_get_json` / `json_as_text` / the union's array/object members can
 * return the original notation unchanged (e.g. `4.2e-1` stays `4.2e-1`,
 * reference src/json_get.rs:131-143) — a zero-decode `UTF8String.fromBytes`
 * view. All JSON structural bytes are ASCII; UTF-8 continuation bytes only
 * occur inside strings, where the scanner only matches '"' and '\\', so
 * byte-level scanning is exact.
 */
object JsonNav {

  /** Path element. Mirrors reference `JsonPath` (src/common.rs:84-103):
   *  string key, non-negative index, or NoMatch (never matches — produced
   *  by negative indices, SQL NULL path args, unsupported types). */
  sealed trait PathElem
  final case class Key(k: String) extends PathElem {
    val bytes: Array[Byte] = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
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

  /** Parsed value at a path. `rawU` is the verbatim byte slice of the input
   *  (for strings: still quoted/escaped); `strU` is the unescaped string
   *  value (KStr only). */
  final class Value(
      val kind: Int,
      val boolV: Boolean,
      val longV: Long,
      val doubleV: Double,
      val strU: UTF8String,
      val rawU: UTF8String) {
    def strV: String = if (strU == null) null else strU.toString
    def raw: String = if (rawU == null) null else rawU.toString
  }

  val Missing = new Value(KMissing, false, 0L, 0.0, null, null)
  private val RawNull = UTF8String.fromString("null")
  private val RawTrue = UTF8String.fromString("true")
  private val RawFalse = UTF8String.fromString("false")
  private val JNull = new Value(KNull, false, 0L, 0.0, null, RawNull)
  private val JTrue = new Value(KBool, true, 0L, 0.0, null, RawTrue)
  private val JFalse = new Value(KBool, false, 0L, 0.0, null, RawFalse)

  /** Navigate `path` inside `json` and parse the value found there. */
  def find(json: UTF8String, path: Array[PathElem]): Value = {
    if (json == null) return Missing
    val sc = new Scanner(json.getBytes)
    if (!sc.navigate(path)) Missing else sc.readValue()
  }

  /** Raw-JSON element slices of the array at `path`, or null if the value
   *  there is not an array (reference src/json_get_array.rs:119-144). */
  def elements(json: UTF8String, path: Array[PathElem]): Array[UTF8String] = {
    if (json == null) return null
    val sc = new Scanner(json.getBytes)
    if (!sc.navigate(path)) return null
    sc.readArrayElements()
  }

  /** Keys of the object at `path` in document order, or null
   *  (reference src/json_object_keys.rs:122-141). */
  def objectKeys(json: UTF8String, path: Array[PathElem]): Array[UTF8String] = {
    if (json == null) return null
    val sc = new Scanner(json.getBytes)
    if (!sc.navigate(path)) return null
    sc.readObjectKeys()
  }

  /** Array element count / object key count at `path`; -1 → SQL NULL
   *  (scalars, strings, missing: reference src/json_length.rs:99-128). */
  def length(json: UTF8String, path: Array[PathElem]): Long = {
    if (json == null) return -1L
    val sc = new Scanner(json.getBytes)
    if (!sc.navigate(path)) return -1L
    sc.countAt()
  }

  /** True iff `path` resolves to any value — including a JSON null
   *  (reference src/json_contains.rs:103-106: `find(...).is_some()`). */
  def contains(json: UTF8String, path: Array[PathElem]): Boolean = {
    if (json == null) return false
    val sc = new Scanner(json.getBytes)
    sc.navigate(path) && sc.peekIsValueStart()
  }

  // String-input conveniences (tests, chained-union path).
  def find(json: String, path: Array[PathElem]): Value =
    find(if (json == null) null else UTF8String.fromString(json), path)
  def elements(json: String, path: Array[PathElem]): Array[UTF8String] =
    elements(if (json == null) null else UTF8String.fromString(json), path)
  def objectKeys(json: String, path: Array[PathElem]): Array[UTF8String] =
    objectKeys(if (json == null) null else UTF8String.fromString(json), path)
  def length(json: String, path: Array[PathElem]): Long =
    length(if (json == null) null else UTF8String.fromString(json), path)
  def contains(json: String, path: Array[PathElem]): Boolean =
    contains(if (json == null) null else UTF8String.fromString(json), path)

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
   *  "1.0"), infinities as "inf"/"-inf" (reference {float=inf} displays,
   *  tests/main.rs test_json_from_scalar_float_infinity). Mirrors
   *  json_union_to_text's float arm. */
  def formatDouble(d: Double): String = {
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "inf"
    else if (d == Double.NegativeInfinity) "-inf"
    else if (d == 0.0) { if (1.0 / d < 0) "-0" else "0" }
    else if (d.isWhole) {
      // Rust's Display never uses an exponent: integral f64 print all their
      // digits at any magnitude (1e15 → "1000000000000000"). new
      // BigDecimal(d) is the exact binary value, so this is lossless.
      new java.math.BigDecimal(d).toBigInteger.toString
    } else {
      val s = d.toString
      if (s.indexOf('E') < 0) s
      else {
        // expand Java's scientific notation positionally (Rust prints
        // 1e-7 as "0.0000001"), keeping Java's shortest-digits mantissa
        new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
      }
    }
  }

  /** One pass over a JSON document's UTF-8 bytes. Not thread-safe; one
   *  instance per call. */
  private final class Scanner(bytes: Array[Byte]) {
    private val n = bytes.length
    private var pos = 0
    private var failed = false

    // ASCII byte constants
    private final val QUOTE = '"'.toByte
    private final val BACKSLASH = '\\'.toByte

    private def skipWs(): Unit = {
      while (pos < n) {
        val b = bytes(pos)
        if (b == ' ' || b == '\t' || b == '\n' || b == '\r') pos += 1
        else return
      }
    }

    def peekIsValueStart(): Boolean = {
      if (failed || pos >= n) return false
      val b = bytes(pos)
      b == '{' || b == '[' || b == QUOTE || b == 't' || b == 'f' || b == 'n' ||
        b == '-' || (b >= '0' && b <= '9')
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
          case k: Key   => bytes(pos) == '{' && seekKey(k)
          case Index(j) => bytes(pos) == '[' && seekIndex(j)
          case NoMatch  => false
        }
        if (!ok || failed) return false
        i += 1
      }
      !failed && pos < n
    }

    /** pos at '{': scan keys linearly; first match wins. Leaves pos at the
     *  matched key's value start. */
    private def seekKey(k: Key): Boolean = {
      pos += 1
      skipWs()
      if (pos < n && bytes(pos) == '}') return false
      while (true) {
        if (pos >= n || bytes(pos) != QUOTE) { failed = true; return false }
        val m = matchKey(k)
        if (failed) return false
        skipWs()
        if (pos >= n || bytes(pos) != ':') { failed = true; return false }
        pos += 1
        skipWs()
        if (m) return true
        skipValue()
        if (failed) return false
        skipWs()
        if (pos >= n) { failed = true; return false }
        bytes(pos) match {
          case ',' => pos += 1; skipWs()
          case '}' => return false
          case _   => failed = true; return false
        }
      }
      false
    }

    /** pos at '"': advance past the key; true iff it equals k. Clean keys
     *  (no escapes) compare as raw byte ranges — zero allocation; keys
     *  with escapes stream-compare their DECODED UTF-8 bytes against the
     *  key, also allocation-free (matchKeyEscaped). */
    private def matchKey(k: Key): Boolean = {
      pos += 1
      val start = pos
      while (pos < n) {
        val b = bytes(pos)
        if (b == QUOTE) {
          val len = pos - start
          pos += 1
          return len == k.bytes.length && regionEquals(start, k.bytes)
        } else if (b == BACKSLASH) {
          return matchKeyEscaped(start, k)
        } else if ((b & 0xff) < 0x20) { failed = true; return false }
        else pos += 1
      }
      failed = true
      false
    }

    /** Escape-bearing key: decode and compare INCREMENTALLY against the
     *  target key's UTF-8 bytes — no StringBuilder/String allocation.
     *  Validation is identical to readStringSlowFrom (invalid escapes and
     *  lone surrogates fail the whole document, even mid-mismatch — the
     *  reference's parser validates every key it scans past). `start` is
     *  the first content byte; pos sits at the first backslash. Equal
     *  decoded strings ⟺ equal UTF-8 byte sequences (escapes decode to
     *  valid scalars only, so the encoding is injective). */
    private def matchKeyEscaped(start: Int, k: Key): Boolean = {
      val kb = k.bytes
      var ki = 0
      var ok = true
      // clean prefix scanned so far
      val prefixLen = pos - start
      if (prefixLen > kb.length) ok = false
      else {
        var i = 0
        while (ok && i < prefixLen) {
          if (bytes(start + i) != kb(i)) ok = false
          i += 1
        }
        if (ok) ki = prefixLen
      }
      // consume one decoded byte of the document key
      def take(b: Int): Unit = {
        if (ok && ki < kb.length && (kb(ki) & 0xff) == b) ki += 1 else ok = false
      }
      // UTF-8-encode a code point into take()
      def takeCp(cp: Int): Unit = {
        if (cp < 0x80) take(cp)
        else if (cp < 0x800) {
          take(0xc0 | (cp >> 6)); take(0x80 | (cp & 0x3f))
        } else if (cp < 0x10000) {
          take(0xe0 | (cp >> 12)); take(0x80 | ((cp >> 6) & 0x3f)); take(0x80 | (cp & 0x3f))
        } else {
          take(0xf0 | (cp >> 18)); take(0x80 | ((cp >> 12) & 0x3f))
          take(0x80 | ((cp >> 6) & 0x3f)); take(0x80 | (cp & 0x3f))
        }
      }
      def hex4(at: Int): Int = {
        var cp = 0
        var i = 0
        while (i < 4) {
          val d = Character.digit(bytes(at + i), 16)
          if (d < 0) return -1
          cp = (cp << 4) | d
          i += 1
        }
        cp
      }
      while (pos < n) {
        val b = bytes(pos)
        if (b == QUOTE) { pos += 1; return ok && ki == kb.length }
        else if (b == BACKSLASH) {
          pos += 1
          if (pos >= n) { failed = true; return false }
          (bytes(pos): @annotation.switch) match {
            case '"'  => take('"'); pos += 1
            case '\\' => take('\\'); pos += 1
            case '/'  => take('/'); pos += 1
            case 'b'  => take('\b'); pos += 1
            case 'f'  => take('\f'); pos += 1
            case 'n'  => take('\n'); pos += 1
            case 'r'  => take('\r'); pos += 1
            case 't'  => take('\t'); pos += 1
            case 'u'  =>
              pos += 1
              if (pos + 4 > n) { failed = true; return false }
              val cp = hex4(pos)
              if (cp < 0) { failed = true; return false }
              pos += 4
              if (cp >= 0xD800 && cp <= 0xDBFF) {
                // high surrogate: a low-surrogate escape MUST follow
                if (pos + 6 > n || bytes(pos) != BACKSLASH || bytes(pos + 1) != 'u') {
                  failed = true; return false
                }
                val lo = hex4(pos + 2)
                if (lo < 0 || lo < 0xDC00 || lo > 0xDFFF) { failed = true; return false }
                pos += 6
                takeCp(0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00))
              } else if (cp >= 0xDC00 && cp <= 0xDFFF) {
                failed = true; return false
              } else takeCp(cp)
            case _ => failed = true; return false
          }
        } else if ((b & 0xff) < 0x20) { failed = true; return false }
        else {
          take(b & 0xff)
          pos += 1
        }
      }
      failed = true
      false
    }

    private def regionEquals(start: Int, target: Array[Byte]): Boolean = {
      var i = 0
      while (i < target.length) {
        if (bytes(start + i) != target(i)) return false
        i += 1
      }
      true
    }

    /** pos at '[': skip `idx` elements; leaves pos at element idx's start. */
    private def seekIndex(idx: Long): Boolean = {
      if (idx < 0) return false
      pos += 1
      skipWs()
      if (pos < n && bytes(pos) == ']') return false
      var i = 0L
      while (i < idx) {
        skipValue()
        if (failed) return false
        skipWs()
        if (pos >= n) { failed = true; return false }
        bytes(pos) match {
          case ',' => pos += 1; skipWs()
          case ']' => return false
          case _   => failed = true; return false
        }
        i += 1
      }
      pos < n
    }

    /** Unescape the string starting at pos (must be '"'). Fast path: a
     *  zero-decode byte-slice view when no escapes are present. */
    private def readStringU(): UTF8String = {
      pos += 1
      val start = pos
      while (pos < n) {
        val b = bytes(pos)
        if (b == QUOTE) {
          val r = UTF8String.fromBytes(bytes, start, pos - start)
          pos += 1
          return r
        } else if (b == BACKSLASH) return readStringSlowFrom(start)
        else if ((b & 0xff) < 0x20) { failed = true; return null }
        else pos += 1
      }
      failed = true
      null
    }

    /** Escape-bearing string: decode into UTF-16 then back (rare path).
     *  `start` is the first content byte; pos sits at the first backslash. */
    private def readStringSlowFrom(start: Int): UTF8String = {
      val sb = new java.lang.StringBuilder(16)
      sb.append(new String(bytes, start, pos - start,
        java.nio.charset.StandardCharsets.UTF_8))
      while (pos < n) {
        val b = bytes(pos)
        if (b == QUOTE) { pos += 1; return UTF8String.fromString(sb.toString) }
        else if (b == BACKSLASH) {
          pos += 1
          if (pos >= n) { failed = true; return null }
          (bytes(pos): @annotation.switch) match {
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
              var cp = 0
              var i = 0
              while (i < 4) {
                val d = Character.digit(bytes(pos + i), 16)
                if (d < 0) { failed = true; return null }
                cp = (cp << 4) | d
                i += 1
              }
              pos += 4
              if (cp >= 0xD800 && cp <= 0xDBFF) {
                // high surrogate: a \uDC00-\uDFFF escape MUST follow —
                // jiter/serde reject lone surrogates, so the reference
                // returns NULL for the whole document (parity)
                if (pos + 6 > n || bytes(pos) != BACKSLASH || bytes(pos + 1) != 'u') {
                  failed = true; return null
                }
                var lo = 0
                var j = 0
                while (j < 4) {
                  val d = Character.digit(bytes(pos + 2 + j), 16)
                  if (d < 0) { failed = true; return null }
                  lo = (lo << 4) | d
                  j += 1
                }
                if (lo < 0xDC00 || lo > 0xDFFF) { failed = true; return null }
                sb.append(cp.toChar)
                sb.append(lo.toChar)
                pos += 6
              } else if (cp >= 0xDC00 && cp <= 0xDFFF) {
                // lone low surrogate — reject, matching the reference
                failed = true; return null
              } else {
                sb.append(cp.toChar)
              }
            case _ => failed = true; return null
          }
        } else if ((b & 0xff) < 0x20) { failed = true; return null }
        else {
          // copy a clean run (may contain multi-byte UTF-8)
          val runStart = pos
          while (pos < n && bytes(pos) != QUOTE && bytes(pos) != BACKSLASH &&
            (bytes(pos) & 0xff) >= 0x20) pos += 1
          sb.append(new String(bytes, runStart, pos - runStart,
            java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      failed = true
      null
    }

    /** Skip past one value without materializing it. Strings and bracket
     *  nesting are respected; skipped scalars are not fully validated
     *  (lazy, like jiter's skip). */
    private def skipValue(): Unit = {
      if (pos >= n) { failed = true; return }
      val b = bytes(pos)
      if (b == QUOTE) skipString()
      else if (b == '{' || b == '[') {
        var depth = 0
        while (pos < n) {
          val c = bytes(pos)
          if (c == QUOTE) skipString()
          else {
            if (c == '{' || c == '[') depth += 1
            else if (c == '}' || c == ']') depth -= 1
            pos += 1
          }
          if (depth == 0) return
          if (failed) return
        }
        failed = true
      } else {
        // scalar: run to a structural boundary
        while (pos < n) {
          val c = bytes(pos)
          if (c == ',' || c == '}' || c == ']' || c == ' ' || c == '\t' ||
              c == '\n' || c == '\r') return
          pos += 1
        }
      }
    }

    private def skipString(): Unit = {
      pos += 1
      while (pos < n) {
        val b = bytes(pos)
        if (b == BACKSLASH) pos += 2
        else if (b == QUOTE) { pos += 1; return }
        else pos += 1
      }
      failed = true
    }

    /** After a literal/number: the next byte must terminate the value. */
    private def validEnd(): Boolean = {
      if (pos >= n) return true
      val b = bytes(pos)
      b == ',' || b == '}' || b == ']' || b == ' ' || b == '\t' ||
        b == '\n' || b == '\r'
    }

    private def raw(start: Int): UTF8String =
      UTF8String.fromBytes(bytes, start, pos - start)

    private def literalAt(start: Int, lit: String): Boolean = {
      if (start + lit.length > n) return false
      var i = 0
      while (i < lit.length) {
        if (bytes(start + i) != lit.charAt(i).toByte) return false
        i += 1
      }
      true
    }

    /** Parse the value at pos into a typed result with its raw slice. */
    def readValue(): Value = {
      if (failed || pos >= n) return Missing
      val start = pos
      bytes(pos) match {
        case QUOTE =>
          val v = readStringU()
          if (failed) Missing
          else new Value(KStr, false, 0L, 0.0, v, raw(start))
        case '{' =>
          skipValue()
          if (failed) Missing
          else new Value(KObject, false, 0L, 0.0, null, raw(start))
        case '[' =>
          skipValue()
          if (failed) Missing
          else new Value(KArray, false, 0L, 0.0, null, raw(start))
        case 't' =>
          if (literalAt(pos, "true")) { pos += 4; if (validEnd()) JTrue else Missing }
          else Missing
        case 'f' =>
          if (literalAt(pos, "false")) { pos += 5; if (validEnd()) JFalse else Missing }
          else Missing
        case 'n' =>
          if (literalAt(pos, "null")) { pos += 4; if (validEnd()) JNull else Missing }
          else Missing
        case b if b == '-' || (b >= '0' && b <= '9') => readNumber(start)
        case _ => Missing
      }
    }

    /** Strict-ish JSON number: no leading zeros, digits required around
     *  '.', and after 'e'. Ints that overflow Long fall back to double
     *  (the reference panics on BigInt, src/json_get.rs:147 — we degrade
     *  gracefully instead). Longs parse straight off the bytes. */
    private def readNumber(start: Int): Value = {
      var isFloat = false
      var neg = false
      if (bytes(pos) == '-') { neg = true; pos += 1 }
      if (pos >= n || !isDigit(bytes(pos))) return Missing
      if (bytes(pos) == '0' && pos + 1 < n && isDigit(bytes(pos + 1))) return Missing
      val digitsStart = pos
      var acc = 0L
      while (pos < n && isDigit(bytes(pos))) {
        acc = acc * 10 + (bytes(pos) - '0')
        pos += 1
      }
      val intDigits = pos - digitsStart
      if (pos < n && bytes(pos) == '.') {
        isFloat = true
        pos += 1
        if (pos >= n || !isDigit(bytes(pos))) return Missing
        while (pos < n && isDigit(bytes(pos))) pos += 1
      }
      if (pos < n && (bytes(pos) == 'e' || bytes(pos) == 'E')) {
        isFloat = true
        pos += 1
        if (pos < n && (bytes(pos) == '+' || bytes(pos) == '-')) pos += 1
        if (pos >= n || !isDigit(bytes(pos))) return Missing
        while (pos < n && isDigit(bytes(pos))) pos += 1
      }
      if (!validEnd()) return Missing
      val text = raw(start)
      if (!isFloat) {
        if (intDigits <= 18) {
          // fits a Long for sure — parsed during the scan
          new Value(KLong, false, if (neg) -acc else acc, 0.0, null, text)
        } else {
          val s = text.toString
          try new Value(KLong, false, java.lang.Long.parseLong(s), 0.0, null, text)
          catch {
            case _: NumberFormatException =>
              new Value(KDouble, false, 0L, java.lang.Double.parseDouble(s), null, text)
          }
        }
      } else {
        new Value(KDouble, false, 0L,
          java.lang.Double.parseDouble(text.toString), null, text)
      }
    }

    private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

    /** pos at a value start: if '[', slice each element verbatim. */
    def readArrayElements(): Array[UTF8String] = {
      if (failed || pos >= n || bytes(pos) != '[') return null
      pos += 1
      skipWs()
      val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      if (pos < n && bytes(pos) == ']') return out.toArray
      while (pos < n) {
        val start = pos
        skipValue()
        if (failed) return null
        out += raw(start)
        skipWs()
        if (pos >= n) return null
        bytes(pos) match {
          case ',' => pos += 1; skipWs()
          case ']' => return out.toArray
          case _   => return null
        }
      }
      null
    }

    /** pos at a value start: if '{', collect keys in document order. */
    def readObjectKeys(): Array[UTF8String] = {
      if (failed || pos >= n || bytes(pos) != '{') return null
      pos += 1
      skipWs()
      val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      if (pos < n && bytes(pos) == '}') return out.toArray
      while (pos < n) {
        if (bytes(pos) != QUOTE) return null
        val key = readStringU()
        if (failed) return null
        out += key
        skipWs()
        if (pos >= n || bytes(pos) != ':') return null
        pos += 1
        skipWs()
        skipValue()
        if (failed) return null
        skipWs()
        if (pos >= n) return null
        bytes(pos) match {
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
      bytes(pos) match {
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
