package graft

import graft.functions.JsonNav
import graft.functions.JsonNav._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests of the navigation core (no Spark session — pure kernel).
  * Mirrors the reference's jiter_json_find semantics
  * (reference src/common.rs:525-557). */
class JsonNavSpec extends AnyFunSuite {

  private def p(elems: Any*): Array[PathElem] = elems.map {
    case s: String => Key(s)
    case i: Int    => Index(i.toLong)
    case e: PathElem => e
  }.toArray

  test("lazy navigation ignores garbage after the found value") {
    val v = JsonNav.find("""{"a": 1} trailing garbage""", p("a"))
    assert(v.kind == KLong && v.longV == 1L)
  }

  test("incomplete documents resolve paths that lie before the break") {
    // jiter-style: find succeeds if the value START is reachable
    assert(JsonNav.contains("[1,2,3", p(2)))
    assert(!JsonNav.contains("[1,2", p(2)))
    assert(JsonNav.find("""{"a": {"b"}""", p("x")).kind == KMissing)
  }

  test("strings containing brackets and escaped quotes are skipped intact") {
    val json = """{"a": "}{][", "b": "x\"y", "c": 7}"""
    assert(JsonNav.find(json, p("c")).longV == 7L)
    assert(JsonNav.find(json, p("b")).strV == "x\"y")
  }

  test("empty-string key and unicode keys") {
    assert(JsonNav.find("""{"": 1}""", p("")).longV == 1L)
    assert(JsonNav.find("""{"ключ": "значение"}""", p("ключ")).strV == "значение")
  }

  test("escape-bearing keys stream-match without allocation (all escape forms)") {
    // simple escapes
    assert(JsonNav.find("{\"a\\nb\": 1}", p("a\nb")).longV == 1L)
    assert(JsonNav.find("{\"a\\tb\": 2}", p("a\tb")).longV == 2L)
    assert(JsonNav.find("{\"q\\\"x\": 3}", p("q\"x")).longV == 3L)
    assert(JsonNav.find("{\"s\\\\t\": 4}", p("s\\t")).longV == 4L)
    assert(JsonNav.find("{\"a\\/b\": 5}", p("a/b")).longV == 5L)
    // \u escapes at every UTF-8 width: 1-byte, 2-byte, 3-byte, 4-byte pair
    assert(JsonNav.find("{\"\\u0041x\": 6}", p("Ax")).longV == 6L)
    assert(JsonNav.find("{\"caf\\u00e9\": 7}", p("café")).longV == 7L)
    assert(JsonNav.find("{\"\\u4e2d\": 8}", p("中")).longV == 8L)
    assert(JsonNav.find("{\"\\ud83d\\ude00\": 9}", p("\ud83d\ude00")).longV == 9L)
    // escaped key mismatch must still skip correctly to later keys
    assert(JsonNav.find("{\"a\\nb\": 1, \"c\": 10}", p("c")).longV == 10L)
    assert(JsonNav.find("{\"a\\u0041verylongkey\": 1, \"c\": 11}", p("c")).longV == 11L)
    // prefix relationships are not equality
    assert(JsonNav.find("{\"ab\\n\": 1}", p("ab")).kind == KMissing)
    assert(JsonNav.find("{\"a\\n\": 1}", p("a\nb")).kind == KMissing)
    // invalid escape / lone surrogate in a SCANNED key fails the document
    // even when looking for a different key (reference parser validates
    // everything it reads past)
    assert(JsonNav.find("{\"a\\qb\": 1, \"c\": 2}", p("c")).kind == KMissing)
    assert(JsonNav.find("{\"a\\ud800x\": 1, \"c\": 2}", p("c")).kind == KMissing)
  }

  test("surrogate-pair unicode escapes decode") {
    val v = JsonNav.find("\"\\ud83d\\ude00\"", p())
    assert(v.kind == KStr && v.strV == "😀")
  }

  test("number forms") {
    assert(JsonNav.find("-0", p()).kind == KLong)
    assert(JsonNav.find("-0", p()).longV == 0L)
    assert(JsonNav.find("9223372036854775807", p()).longV == Long.MaxValue)
    // i64 overflow degrades to double (reference panics — deliberate divergence)
    assert(JsonNav.find("9223372036854775808", p()).kind == KDouble)
    assert(JsonNav.find("1e3", p()).kind == KDouble)
    assert(JsonNav.find("1e3", p()).doubleV == 1000.0)
    assert(JsonNav.find("0.5", p()).doubleV == 0.5)
    assert(JsonNav.find("01", p()).kind == KMissing) // leading zero
    assert(JsonNav.find("1.", p()).kind == KMissing)
    assert(JsonNav.find(".5", p()).kind == KMissing)
    assert(JsonNav.find("1e", p()).kind == KMissing)
    assert(JsonNav.find("trueX", p()).kind == KMissing)
  }

  test("mixed key/index paths") {
    val json = """{"a": [{"b": [10, 20]}, {"b": [30]}]}"""
    assert(JsonNav.find(json, p("a", 1, "b", 0)).longV == 30L)
    assert(JsonNav.find(json, p("a", 0, "b", 1)).longV == 20L)
    assert(JsonNav.find(json, p("a", 2)).kind == KMissing)
    assert(JsonNav.find(json, p("a", 0, "c")).kind == KMissing)
    assert(JsonNav.find(json, p(JsonNav.NoMatch)).kind == KMissing)
  }

  test("raw slices preserve interior text verbatim") {
    val json = """{"a": [ 1 ,  {"x": "\n"} ], "b": 4.2E+1}"""
    assert(JsonNav.find(json, p("a")).raw == """[ 1 ,  {"x": "\n"} ]""")
    assert(JsonNav.find(json, p("b")).raw == "4.2E+1")
    val els = JsonNav.elements(json, p("a"))
    assert(els.map(_.toString).toSeq == Seq("1", """{"x": "\n"}"""))
  }

  test("length and keys on edge shapes") {
    assert(JsonNav.length("{}", p()) == 0L)
    assert(JsonNav.length("[]", p()) == 0L)
    assert(JsonNav.length("\"str\"", p()) == -1L)
    assert(JsonNav.objectKeys("""{"snake_case": 1, "camelCase": 2}""", p())
      .map(_.toString).toSeq == Seq("snake_case", "camelCase"))
    assert(JsonNav.objectKeys("[1]", p()) == null)
  }

  test("whitespace tolerance everywhere") {
    assert(JsonNav.find("   {  \"a\"  :   [ 1 , 2 ]  }  ", p("a", 1)).longV == 2L)
    assert(JsonNav.contains("\t\n {\"k\": null} ", p("k")))
  }

  test("json quoting round trip") {
    assert(JsonNav.quote("a\"b\\c\nde") == "\"a\\\"b\\\\c\\nd\\u0001e\"")
  }

  test("rust-style double formatting") {
    assert(JsonNav.formatDouble(1.0) == "1")
    assert(JsonNav.formatDouble(-2.0) == "-2")
    assert(JsonNav.formatDouble(1.5) == "1.5")
    assert(JsonNav.formatDouble(0.42) == "0.42")
    // Rust Display never uses an exponent — large integral and tiny
    // fractional values print positionally
    assert(JsonNav.formatDouble(1e15) == "1000000000000000")
    assert(JsonNav.formatDouble(1e16) == "10000000000000000")
    assert(JsonNav.formatDouble(1.23e18) == "1230000000000000000")
    assert(JsonNav.formatDouble(123456789.5) == "123456789.5")
    assert(JsonNav.formatDouble(1e-7) == "0.0000001")
    assert(JsonNav.formatDouble(-0.0) == "-0")
    assert(JsonNav.formatDouble(0.0) == "0")
  }

  test("pathological inputs never throw: deep nesting, huge docs, broken escapes") {
    // 100k-deep nesting — the scanner must be iterative, not recursive
    val deep = "[" * 100000 + "1" + "]" * 100000
    assert(JsonNav.find(deep, p(0, 0, 0)).kind == KArray) // 3 levels in: still an array
    val fullPath: Array[PathElem] = Array.fill(100000)(Index(0L))
    assert(JsonNav.find(deep, fullPath).longV == 1L) // all the way down
    assert(JsonNav.contains(deep, p(0)))
    assert(JsonNav.length(deep, p()) == 1L)

    // 10 MB flat document, target at the end
    val big = "{" + (0 until 100000).map(i => s""" "k$i": $i""").mkString(",") + "}"
    assert(JsonNav.find(big, p("k99999")).longV == 99999L)
    assert(JsonNav.length(big, p()) == 100000L)

    // broken escapes / lone surrogates / truncations → Missing, no throw
    assert(JsonNav.find("\"abc\\", p()).kind == KMissing)        // ends in backslash
    assert(JsonNav.find("\"\\u12", p()).kind == KMissing)          // truncated \u
    // lone/mispaired surrogates are rejected (reference jiter/serde parity:
    // the whole document reads as NULL)
    assert(JsonNav.find("\"\\ud800\"", p()).kind == KMissing)      // lone high surrogate
    assert(JsonNav.find("\"\\udc00\"", p()).kind == KMissing)      // lone low surrogate
    assert(JsonNav.find("\"\\ud800\\u0041\"", p()).kind == KMissing) // high + non-low
    assert(JsonNav.find("\"\\ud83d\\ude00\"", p()).strV == "\ud83d\ude00") // valid pair decodes
    assert(JsonNav.find("\"\\q\"", p()).kind == KMissing)         // invalid escape char
    assert(JsonNav.find("{\"a\"", p("a")).kind == KMissing)       // key then EOF
    assert(JsonNav.find("[,]", p(0)).kind == KMissing)
    assert(JsonNav.find("\u0000", p()).kind == KMissing)          // NUL byte doc
  }
}
