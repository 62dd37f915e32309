package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.functions.JsonNav
import graft.functions.JsonNav._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/**
 * Deterministic fuzz: generate random JSON documents (fixed seed), render
 * them with random whitespace, and cross-check every JsonNav behavior
 * against Jackson's DOM (the independent oracle already on Spark's
 * classpath). Covers the combinatorial space the example-based specs
 * can't: deep nesting, unicode, escapes, numbers at boundaries.
 */
class JsonFuzzSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  sealed trait J
  case object JNull extends J
  case class JB(b: Boolean) extends J
  case class JI(l: Long) extends J
  case class JD(d: Double) extends J
  case class JS(s: String) extends J
  case class JA(els: Vector[J]) extends J
  case class JO(fields: Vector[(String, J)]) extends J

  private def genString(r: Random): String = {
    val len = r.nextInt(8)
    (0 until len).map { _ =>
      r.nextInt(6) match {
        case 0 => ('a' + r.nextInt(26)).toChar.toString
        case 1 => r.nextInt(10).toString
        case 2 => Seq("\"", "\\", "/", "\n", "\t").apply(r.nextInt(5))
        case 3 => Seq("é", "ß", "中", "🙂").apply(r.nextInt(4))
        case 4 => " "
        case _ => ('A' + r.nextInt(26)).toChar.toString
      }
    }.mkString
  }

  private def gen(r: Random, depth: Int): J = {
    val pick = if (depth <= 0) r.nextInt(5) else r.nextInt(7)
    pick match {
      case 0 => JNull
      case 1 => JB(r.nextBoolean())
      case 2 => JI(r.nextInt(5) match {
        case 0 => Long.MaxValue
        case 1 => Long.MinValue + 1
        case 2 => 0L
        case _ => r.nextLong() % 100000
      })
      case 3 => JD((r.nextDouble() - 0.5) * math.pow(10, r.nextInt(12) - 3))
      case 4 => JS(genString(r))
      case 5 => JA(Vector.fill(r.nextInt(4))(gen(r, depth - 1)))
      case _ =>
        // distinct keys: duplicate-key semantics are covered separately
        val keys = Vector.fill(r.nextInt(4))(genString(r)).distinct
        JO(keys.map(k => k -> gen(r, depth - 1)))
    }
  }

  private def ws(r: Random): String =
    Seq("", "", "", " ", "  ", "\n", "\t").apply(r.nextInt(7))

  private def render(j: J, r: Random): String = j match {
    case JNull  => "null"
    case JB(b)  => b.toString
    case JI(l)  => l.toString
    case JD(d)  => if (d == d.floor && math.abs(d) < 1e15) s"${d.toLong}.0" else d.toString
    case JS(s)  => JsonNav.quote(s)
    case JA(es) => es.map(e => ws(r) + render(e, r) + ws(r)).mkString("[", ",", "]")
    case JO(fs) => fs.map { case (k, v) =>
        ws(r) + JsonNav.quote(k) + ws(r) + ":" + ws(r) + render(v, r) + ws(r)
      }.mkString("{", ",", "}")
  }

  /** Random path into (possibly beyond) the document. */
  private def genPath(r: Random, j: J, depth: Int): List[PathElem] = {
    if (depth <= 0 || r.nextInt(4) == 0) Nil
    else j match {
      case JO(fs) if fs.nonEmpty =>
        if (r.nextInt(5) == 0) List(Key(genString(r))) // likely-missing key
        else {
          val (k, v) = fs(r.nextInt(fs.length))
          Key(k) :: genPath(r, v, depth - 1)
        }
      case JA(es) if es.nonEmpty =>
        if (r.nextInt(5) == 0) List(Index(es.length + r.nextInt(3)))
        else {
          val i = r.nextInt(es.length)
          Index(i.toLong) :: genPath(r, es(i), depth - 1)
        }
      case _ => if (r.nextInt(3) == 0) List(Key("nope")) else Nil
    }
  }

  private def navigate(node: JsonNode, path: List[PathElem]): Option[JsonNode] =
    path match {
      case Nil => Some(node)
      case Key(k) :: rest =>
        if (node.isObject && node.has(k)) navigate(node.get(k), rest) else None
      case Index(i) :: rest =>
        if (node.isArray && i < node.size()) navigate(node.get(i.toInt), rest) else None
      case NoMatch :: _ => None
    }

  test("30k random documents agree with Jackson (3 seeds)") {
    for (seed <- Seq(20260812L, 424242L, 987654321L);
         r = new Random(seed);
         iter <- 0 until 10000) {
      val doc = gen(r, 4)
      val text = render(doc, r)
      val path = genPath(r, doc, 3).toArray
      val expected = navigate(mapper.readTree(text), path.toList)
      val got = JsonNav.find(text, path)
      val ctx = s"iter=$iter text=<$text> path=${path.mkString("/")}"

      expected match {
        case None =>
          assert(got.kind == KMissing, s"expected Missing: $ctx got kind ${got.kind}")
          assert(!JsonNav.contains(text, path), ctx)
        case Some(n) =>
          assert(JsonNav.contains(text, path), ctx)
          if (n.isNull) assert(got.kind == KNull, ctx)
          else if (n.isBoolean) {
            assert(got.kind == KBool && got.boolV == n.booleanValue(), ctx)
          } else if (n.isTextual) {
            assert(got.kind == KStr && got.strV == n.textValue(), ctx)
          } else if (n.isIntegralNumber) {
            assert(got.kind == KLong && got.longV == n.longValue(), ctx)
          } else if (n.isFloatingPointNumber) {
            assert(got.kind == KDouble && got.doubleV == n.doubleValue(), ctx)
          } else if (n.isArray) {
            assert(got.kind == KArray, ctx)
            // raw slice must reparse to the identical subtree
            assert(mapper.readTree(got.raw) == n, ctx)
            assert(JsonNav.length(text, path) == n.size().toLong, ctx)
            val els = JsonNav.elements(text, path)
            assert(els.length == n.size(), ctx)
          } else if (n.isObject) {
            assert(got.kind == KObject, ctx)
            assert(mapper.readTree(got.raw) == n, ctx)
            assert(JsonNav.length(text, path) == n.size().toLong, ctx)
            val ks = JsonNav.objectKeys(text, path)
            val expectedKeys = {
              val it = n.fieldNames()
              val b = Vector.newBuilder[String]
              while (it.hasNext) b += it.next()
              b.result()
            }
            assert(ks.map(_.toString).toVector == expectedKeys, ctx)
          }
      }
    }
  }

  test("2k random documents through Spark execution match direct kernel calls") {
    // exercises the generated-code path (doGenCode) end-to-end: results of
    // the compiled expressions over a DataFrame must equal direct JsonNav
    // calls for the same documents
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import graft.JsonFunctions._

    val r = new Random(77L)
    val docs = (0 until 2000).map { _ =>
      val d = gen(r, 3)
      render(d, r)
    }
    val df = docs.toDF("j").repartition(4)
    val rows = df.select(
      col("j"),
      json_get_str(col("j"), lit("a")).as("s"),
      json_get_int(col("j"), lit("a")).as("i"),
      json_length(col("j")).as("len"),
      json_contains(col("j"), lit("a")).as("c"),
      json_get_json(col("j"), lit("a")).as("raw")).collect()
    rows.foreach { row =>
      val doc = row.getString(0)
      val path = Array[PathElem](Key("a"))
      val v = JsonNav.find(doc, path)
      val expS = if (v.kind == KStr) v.strV else null
      assert(Option(row.get(1)).orNull == expS, s"str mismatch on <$doc>")
      val expI: Any = v.kind match {
        case KLong => v.longV
        case KStr => try { java.lang.Long.parseLong(v.strV) } catch { case _: Exception => null }
        case _ => null
      }
      assert(Option(row.get(2)).orNull == expI, s"int mismatch on <$doc>")
      val expLen = JsonNav.length(doc, Array.empty[PathElem])
      assert(Option(row.get(3)).map(_.asInstanceOf[Long]).getOrElse(-1L) == expLen,
        s"len mismatch on <$doc>")
      assert(row.getBoolean(4) == JsonNav.contains(doc, path), s"contains mismatch on <$doc>")
      val expRaw = if (v.kind == KMissing) null else v.raw
      assert(Option(row.get(5)).orNull == expRaw, s"raw mismatch on <$doc>")
    }
  }

  test("duplicate keys: first match always wins (src/common.rs:531-539)") {
    val r = new Random(31337L)
    for (_ <- 0 until 500) {
      val k = genString(r)
      val v1 = gen(r, 1)
      val v2 = gen(r, 1)
      val filler = genString(r)
      val doc = s"{${JsonNav.quote(k)}: ${render(v1, r)}, " +
        s"${JsonNav.quote(filler)}: 1, ${JsonNav.quote(k)}: ${render(v2, r)}}"
      val got = JsonNav.find(doc, Array[PathElem](Key(k)))
      val direct = JsonNav.find(s"{${JsonNav.quote(k)}: ${renderPlain(v1)}}",
        Array[PathElem](Key(k)))
      assert(got.kind == direct.kind, s"dup-key kind mismatch on <$doc>")
      got.kind match {
        case KLong   => assert(got.longV == direct.longV, s"<$doc>")
        case KDouble => assert(got.doubleV == direct.doubleV, s"<$doc>")
        case KStr    => assert(got.strV == direct.strV, s"<$doc>")
        case KBool   => assert(got.boolV == direct.boolV, s"<$doc>")
        case _       => ()
      }
    }
  }

  private def renderPlain(j: J): String = j match {
    case JNull  => "null"
    case JB(b)  => b.toString
    case JI(l)  => l.toString
    case JD(d)  => if (d == d.floor && math.abs(d) < 1e15) s"${d.toLong}.0" else d.toString
    case JS(s)  => JsonNav.quote(s)
    case JA(es) => es.map(renderPlain).mkString("[", ",", "]")
    case JO(fs) => fs.map { case (k, v) => JsonNav.quote(k) + ":" + renderPlain(v) }
      .mkString("{", ",", "}")
  }

  test("fused union-text kernel ≡ json_union_to_text ∘ json_get (10k fuzz)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    val r = new Random(7777L)
    var nonNull = 0
    for (_ <- 0 until 10000) {
      val doc = gen(r, 3)
      val text = render(doc, r)
      val path = genPath(r, doc, 2).toArray
      // unfused semantics: union struct then flatten
      val unfused = {
        val u = graft.functions.JsonUnionType.fromValue(JsonNav.find(text, path))
        if (u == null) null
        else graft.functions.JsonUnionType.toJsonText(u.asInstanceOf[InternalRow])
      }
      // fused kernel on the same doc + path (as literal children)
      val pathLits: Seq[Literal] = path.toSeq.map {
        case Key(k)   => Literal(k)
        case Index(i) => Literal(i)
        case NoMatch  => Literal(-1L)
      }
      val fused = graft.functions.JsonGetUnionText(Literal(text) +: pathLits).eval(null)
      assert(Option(fused).map(_.toString) == Option(unfused),
        s"<$text> ${path.mkString("/")}")
      if (fused != null) nonNull += 1
    }
    assert(nonNull > 3000, s"only $nonNull non-null results exercised")
  }

  test("union round-trip: to_text(json_get(doc,path)) reparses to the same subtree") {
    val r = new Random(5150L)
    var checked = 0
    for (_ <- 0 until 5000) {
      val doc = gen(r, 3)
      val text = render(doc, r)
      val path = genPath(r, doc, 2).toArray
      val v = JsonNav.find(text, path)
      if (v.kind != KMissing && v.kind != KNull) {
        val row = graft.functions.JsonUnionType.fromValue(v)
          .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val roundTrip = graft.functions.JsonUnionType.toJsonText(row)
        val reparsed = mapper.readTree(roundTrip)
        val original = navigate(mapper.readTree(text), path.toList).get
        // doubles reformat (Rust style) — compare numerically there
        if (original.isFloatingPointNumber) {
          assert(math.abs(reparsed.doubleValue() - original.doubleValue()) <=
            math.ulp(original.doubleValue()), s"<$text> ${path.mkString("/")}")
        } else {
          assert(reparsed == original, s"<$text> ${path.mkString("/")} -> $roundTrip")
        }
        checked += 1
      }
    }
    assert(checked > 2000, s"only $checked values exercised")
  }
}
