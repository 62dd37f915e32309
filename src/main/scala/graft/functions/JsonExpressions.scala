package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expressions for the 13 JSON scalar functions of the reference
 * library (reference: src/lib.rs:69-96 registers the same surface). Each is
 * a native `Expression` rather than a Scala UDF so Catalyst sees correct
 * nullability, folds literal arguments, and avoids Row boxing
 * (SURVEY.md §7.1).
 *
 * Common semantics (reference src/common.rs):
 *  - 1st arg: JSON text column (or a json_get union-struct — chained calls);
 *    remaining args: path of string keys / int indices.
 *  - any parse error, missing key, index out of bounds, negative index, or
 *    type mismatch → NULL (json_contains → false), never an error.
 */
abstract class JsonPathExpression extends Expression {

  protected def jsonChild: Expression = children.head
  protected def pathChildren: Seq[Expression] = children.tail

  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty) {
      return TypeCheckResult.TypeCheckFailure(s"$prettyName requires at least one argument")
    }
    jsonChild.dataType match {
      case _: StringType | NullType => ()
      case st: StructType if JsonUnionType.isUnionType(st) => ()
      case other =>
        return TypeCheckResult.TypeCheckFailure(
          s"$prettyName first argument must be a JSON string or json union, got ${other.sql}")
    }
    pathChildren.zipWithIndex.foreach { case (p, i) =>
      p.dataType match {
        case _: StringType | NullType => ()
        case ByteType | ShortType | IntegerType | LongType => ()
        case other =>
          return TypeCheckResult.TypeCheckFailure(
            s"$prettyName path argument ${i + 2} must be a string or integer, got ${other.sql}")
      }
    }
    TypeCheckResult.TypeCheckSuccess
  }

  // Literal paths are the overwhelmingly common case: resolve them once.
  @transient private lazy val staticPath: Array[JsonNav.PathElem] =
    if (pathChildren.forall(_.foldable)) buildPath(pathChildren.map(_.eval(null)))
    else null

  protected def buildPath(vals: Seq[Any]): Array[JsonNav.PathElem] =
    vals.map {
      case s: UTF8String => JsonNav.Key(s.toString)
      case l: Long       => if (l < 0) JsonNav.NoMatch else JsonNav.Index(l)
      case i: Int        => if (i < 0) JsonNav.NoMatch else JsonNav.Index(i.toLong)
      case s: Short      => if (s < 0) JsonNav.NoMatch else JsonNav.Index(s.toLong)
      case b: Byte       => if (b < 0) JsonNav.NoMatch else JsonNav.Index(b.toLong)
      case _             => JsonNav.NoMatch // null or unsupported → never matches
    }.toArray

  override def eval(input: InternalRow): Any = {
    val j = jsonChild.eval(input)
    val path =
      if (staticPath != null) staticPath
      else buildPath(pathChildren.map(_.eval(input)))
    compute(toJsonUtf8(j), path)
  }

  private def toJsonUtf8(j: Any): UTF8String = j match {
    case null           => null
    case s: UTF8String  => s // no decode: the scanner reads the UTF-8 bytes
    case r: InternalRow => // chained json_get
      val t = JsonUnionType.toJsonText(r)
      if (t == null) null else UTF8String.fromString(t)
    case other          => UTF8String.fromString(other.toString)
  }

  /** Entry point for generated code: boxed json child value + boxed path
    * values (null when the path is all-literal and precomputed). */
  def computeFromCodegen(json: Object, pathVals: Array[Object]): Any = {
    val path =
      if (pathVals == null) staticPath
      else buildPath(scala.collection.immutable.ArraySeq.unsafeWrapArray(pathVals))
    compute(toJsonUtf8(json), path)
  }

  /** Children are evaluated with their own generated code (pipelines stay
    * inside WholeStageCodegen — no InternalRow materialization, unlike
    * CodegenFallback); only the navigation kernel itself is a virtual call
    * on the bound expression reference. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftJsonExpr", this,
      classOf[JsonPathExpression].getName)
    val jsonEv = jsonChild.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val boxedType = CodeGenerator.boxedType(dataType)
    val res = ctx.freshName("graftRes")
    val jsonVal = ctx.freshName("graftJson")

    val (pathSetup, pathArg) =
      if (pathChildren.forall(_.foldable)) {
        ("", "null")
      } else {
        val arr = ctx.freshName("graftPath")
        val evs = pathChildren.map(_.genCode(ctx))
        val fill = evs.zipWithIndex.map { case (e, i) =>
          s"""${e.code}
             |$arr[$i] = ${e.isNull} ? null : (Object) ${e.value};""".stripMargin
        }.mkString("\n")
        (s"Object[] $arr = new Object[${pathChildren.size}];\n$fill", arr)
      }

    val unbox = dataType match {
      case LongType    => s"(($boxedType) $res).longValue()"
      case DoubleType  => s"(($boxedType) $res).doubleValue()"
      case BooleanType => s"(($boxedType) $res).booleanValue()"
      case _           => s"($javaType) $res"
    }

    ev.copy(code = code"""
      ${jsonEv.code}
      Object $jsonVal = ${jsonEv.isNull} ? null : (Object) ${jsonEv.value};
      $pathSetup
      Object $res = $ref.computeFromCodegen($jsonVal, $pathArg);
      boolean ${ev.isNull} = ($res == null);
      $javaType ${ev.value} = ${ev.isNull}
        ? ${CodeGenerator.defaultValue(dataType)} : $unbox;""")
  }

  protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any
}

/** `json_get(json, *path) → json union struct`. Reference src/json_get.rs:16-151. */
case class JsonGet(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = JsonUnionType.sparkType
  override def prettyName: String = "json_get"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any =
    JsonUnionType.fromValue(JsonNav.find(json, path))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** `json_get_str`: only JSON strings succeed. Reference src/json_get_str.rs:72-81. */
case class JsonGetStr(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_get_str"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any = {
    val v = JsonNav.find(json, path)
    if (v.kind == JsonNav.KStr) v.strU else null
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** `json_get_int`: JSON int, or a JSON string parsed as i64 ("123"→123,
 *  "1.5"→NULL). Floats/bools → NULL. Reference src/json_get_int.rs:99-122. */
case class JsonGetInt(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "json_get_int"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any = {
    val v = JsonNav.find(json, path)
    v.kind match {
      case JsonNav.KLong => v.longV
      case JsonNav.KStr =>
        try java.lang.Long.parseLong(v.strU.toString)
        catch { case _: NumberFormatException => null }
      case _ => null
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** `json_get_float`: JSON float or int (coerced), or a JSON string parsed as
 *  f64. Reference src/json_get_float.rs:99-123. */
case class JsonGetFloat(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "json_get_float"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any = {
    val v = JsonNav.find(json, path)
    v.kind match {
      case JsonNav.KDouble => v.doubleV
      case JsonNav.KLong   => v.longV.toDouble
      case JsonNav.KStr    => JsonGetFloat.parseF64(v.strU.toString)
      case _               => null
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

object JsonGetFloat {
  /** Rust `str::parse::<f64>` look-alike: no surrounding whitespace, no
   *  Java-isms like trailing 'f'/'d' suffixes or leading zeros-with-x;
   *  accepts inf/infinity/nan case-insensitively like Rust. */
  private[functions] def parseF64(s: String): Any = {
    if (s == null || s.isEmpty) return null
    val body = if (s.charAt(0) == '+' || s.charAt(0) == '-') s.substring(1) else s
    val lower = body.toLowerCase(java.util.Locale.ROOT)
    if (lower == "inf" || lower == "infinity") {
      return if (s.charAt(0) == '-') Double.NegativeInfinity else Double.PositiveInfinity
    }
    if (lower == "nan") return Double.NaN
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      val ok = (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' ||
        c == '+' || c == '-'
      if (!ok) return null
      i += 1
    }
    try java.lang.Double.parseDouble(s)
    catch { case _: NumberFormatException => null }
  }
}

/** `json_get_bool`: JSON bool, or a JSON string equal to exactly
 *  "true"/"false". Reference src/json_get_bool.rs:72-85. */
case class JsonGetBool(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "json_get_bool"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any = {
    val v = JsonNav.find(json, path)
    v.kind match {
      case JsonNav.KBool => v.boolV
      case JsonNav.KStr =>
        if (v.strV == "true") true
        else if (v.strV == "false") false else null
      case _ => null
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** `json_get_json`: verbatim raw JSON text of the value at path — original
 *  spacing and notation preserved; a present JSON null returns the text
 *  "null". Reference src/json_get_json.rs:84-94. */
case class JsonGetJson(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_get_json"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any = {
    val v = JsonNav.find(json, path)
    if (v.kind == JsonNav.KMissing) null else v.rawU
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** `json_get_array`: raw-JSON element slices of the array at path; NULL for
 *  non-arrays. Reference src/json_get_array.rs:119-144. */
case class JsonGetArray(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "json_get_array"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any = {
    val els = JsonNav.elements(json, path)
    if (els == null) null
    else new GenericArrayData(els.map(e => e: Any))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** `json_as_text` (Postgres `->>`): strings unescaped, JSON null → SQL NULL,
 *  any other value → its raw JSON text. Reference src/json_as_text.rs:98-117. */
case class JsonAsText(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_as_text"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any = {
    val v = JsonNav.find(json, path)
    v.kind match {
      case JsonNav.KMissing | JsonNav.KNull => null
      case JsonNav.KStr                     => v.strU
      case _                                => v.rawU
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** Fused `json_union_to_text(json_get(json, *path))`: navigates and
 *  canonicalizes in ONE pass without materializing the union struct,
 *  inside WholeStageCodegen like every other JsonPathExpression
 *  (the unfused pair also runs codegen'd now, but still builds and
 *  re-reads the intermediate union struct). Produced by the
 *  JsonUnionTextFusion optimizer rule, never user-facing. Formatting
 *  matches JsonUnionType.toJsonText exactly: strings re-quoted + escaped,
 *  ints/floats canonical (Rust-Display doubles), array/object raw slices,
 *  JSON null → SQL NULL. */
case class JsonGetUnionText(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_get_union_text"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any = {
    val v = JsonNav.find(json, path)
    v.kind match {
      case JsonNav.KMissing | JsonNav.KNull => null
      case JsonNav.KBool   => UTF8String.fromString(if (v.boolV) "true" else "false")
      case JsonNav.KLong   => UTF8String.fromString(v.longV.toString)
      case JsonNav.KDouble => UTF8String.fromString(JsonNav.formatDouble(v.doubleV))
      case JsonNav.KStr    => UTF8String.fromString(JsonNav.quote(v.strV))
      case _               => v.rawU // array / object: raw slice passthrough
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** `json_contains` (Postgres `?`): true iff the path resolves — including to
 *  a JSON null value; false (never NULL) otherwise, even for SQL NULL /
 *  invalid JSON input. Reference src/json_contains.rs:43-49,103-106. */
case class JsonContains(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "json_contains"
  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length < 2) {
      TypeCheckResult.TypeCheckFailure("json_contains requires at least 2 arguments")
    } else super.checkInputDataTypes()
  }
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any =
    JsonNav.contains(json, path)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** `json_length` / `json_len`: array element count or object key count;
 *  scalars/strings/missing → NULL. Reference src/json_length.rs:99-128. */
case class JsonLength(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "json_length"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any = {
    val l = JsonNav.length(json, path)
    if (l < 0) null else l
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** `json_object_keys` / `json_keys`: keys of the object at path in document
 *  order; non-objects → NULL. Reference src/json_object_keys.rs:122-141. */
case class JsonObjectKeys(children: Seq[Expression]) extends JsonPathExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "json_object_keys"
  override protected def compute(json: UTF8String, path: Array[JsonNav.PathElem]): Any = {
    val ks = JsonNav.objectKeys(json, path)
    if (ks == null) null
    else new GenericArrayData(ks.map(k => k: Any))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/** `json_from_scalar` / `scalar_to_json`: wrap a typed SQL scalar into the
 *  json union struct. Reference src/json_from_scalar.rs:91-221.
 *  Null-intolerant (null scalar → SQL NULL union, collapsed), so the
 *  KernelCodegen bridge keeps the surrounding pipeline inside
 *  WholeStageCodegen instead of the old CodegenFallback row
 *  materialization. */
case class JsonFromScalar(child: Expression) extends UnaryExpression
    with graft.operators.KernelCodegen {
  override def dataType: DataType = JsonUnionType.sparkType
  override def nullable: Boolean = true
  override def prettyName: String = "json_from_scalar"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case NullType | BooleanType | ByteType | ShortType | IntegerType |
        LongType | FloatType | DoubleType | _: DecimalType | _: StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"json_from_scalar does not support type ${other.sql}")
  }

  override protected def kernelEval(args: Array[Any]): Any = {
    val v = args(0)
    child.dataType match {
      case BooleanType =>
        JsonUnionType.fromValue(
          new JsonNav.Value(JsonNav.KBool, v.asInstanceOf[Boolean], 0L, 0.0, null, null))
      case ByteType =>
        longUnion(v.asInstanceOf[Byte].toLong)
      case ShortType =>
        longUnion(v.asInstanceOf[Short].toLong)
      case IntegerType =>
        longUnion(v.asInstanceOf[Int].toLong)
      case LongType =>
        longUnion(v.asInstanceOf[Long])
      case FloatType =>
        doubleUnion(v.asInstanceOf[Float].toDouble)
      case DoubleType =>
        doubleUnion(v.asInstanceOf[Double])
      case _: DecimalType =>
        // SQL numeric literals like 1.5 arrive as decimals under ANSI; the
        // reference's float arm covers them (src/json_from_scalar.rs:45-69)
        doubleUnion(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
      case _: StringType =>
        JsonUnionType.fromValue(
          new JsonNav.Value(JsonNav.KStr, false, 0L, 0.0, v.asInstanceOf[UTF8String], null))
      case _ => null
    }
  }
  private def longUnion(l: Long): Any =
    JsonUnionType.fromValue(new JsonNav.Value(JsonNav.KLong, false, l, 0.0, null, null))
  private def doubleUnion(d: Double): Any =
    JsonUnionType.fromValue(new JsonNav.Value(JsonNav.KDouble, false, 0L, d, null, null))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `json_union_display`: the reference's union display form (`{str=abc}`,
 *  `{int=5}`, `{null=}` — tests/main.rs:77-91), for golden-output parity.
 *  NULL-tolerant (a missing value still has a display form), so it can't
 *  reuse the null-intolerant KernelCodegen bridge — the custom doGenCode
 *  below passes the boxed value-or-null straight through. */
case class JsonUnionDisplay(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "json_union_display"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if JsonUnionType.isUnionType(st) => TypeCheckResult.TypeCheckSuccess
    case NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"json_union_display expects a json union struct, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any =
    displayBoxed(child.eval(input).asInstanceOf[Object])

  /** Bridge for generated code (boxed, null-tolerant). */
  def displayBoxed(v: Object): UTF8String =
    UTF8String.fromString(
      JsonUnionType.displayForm(if (v == null) null else v.asInstanceOf[InternalRow]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDisplay", this, classOf[JsonUnionDisplay].getName)
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} =
          $ref.displayBoxed(${c.isNull} ? null : (Object) ${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `json_union_to_text`: flatten a json union struct to canonical JSON text
 *  (strings re-quoted + escaped, array/object raw passthrough, JSON null →
 *  SQL NULL). Exists because Parquet can't store unions.
 *  Reference src/json_union_to_text.rs:82-118.
 *  Null-intolerant (NULL union → NULL), so the KernelCodegen bridge
 *  applies — the hot composed form json_union_to_text(json_get(...)) is
 *  additionally fused by JsonUnionTextFusion into one kernel call. */
case class JsonUnionToText(child: Expression) extends UnaryExpression
    with graft.operators.KernelCodegen {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_union_to_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if JsonUnionType.isUnionType(st) => TypeCheckResult.TypeCheckSuccess
    case NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"json_union_to_text expects a json union struct, got ${other.sql}")
  }

  override protected def kernelEval(args: Array[Any]): Any = {
    val s = JsonUnionType.toJsonText(args(0).asInstanceOf[InternalRow])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
