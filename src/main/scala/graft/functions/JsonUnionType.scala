package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Spark stand-in for the reference's `JsonUnion` Arrow sparse union
 * (reference: src/common_union.rs:77-128). Spark has no union type, so the
 * value is a tagged struct: `type_id` selects which member field is set,
 * ids matching the reference (src/common_union.rs:176-182):
 * 0=null 1=bool 2=int 3=float 4=str 5=array 6=object.
 *
 * Per SURVEY.md §1.4 both "key missing" and "JSON null at path" collapse to
 * a SQL NULL struct — every observable SQL behavior (`IS NULL`, casts,
 * chained calls) is identical to the reference's union-with-null-member.
 */
object JsonUnionType {
  val TypeIdNull: Byte = 0
  val TypeIdBool: Byte = 1
  val TypeIdInt: Byte = 2
  val TypeIdFloat: Byte = 3
  val TypeIdStr: Byte = 4
  val TypeIdArray: Byte = 5
  val TypeIdObject: Byte = 6

  val sparkType: StructType = StructType(Seq(
    StructField("type_id", ByteType, nullable = false),
    StructField("bool", BooleanType, nullable = true),
    StructField("int", LongType, nullable = true),
    StructField("float", DoubleType, nullable = true),
    StructField("str", StringType, nullable = true),
    StructField("array", StringType, nullable = true),
    StructField("object", StringType, nullable = true)))

  def isUnionType(dt: DataType): Boolean = dt match {
    case st: StructType =>
      st.length == 7 && st.fieldNames.sameElements(sparkType.fieldNames)
    case _ => false
  }

  /** Build the struct row from a navigation result; null for Missing AND
   *  for JSON null (collapsed, see above). */
  def fromValue(v: JsonNav.Value): Any = {
    import JsonNav._
    v.kind match {
      case KBool =>
        row(TypeIdBool, 1, v.boolV)
      case KLong =>
        row(TypeIdInt, 2, v.longV)
      case KDouble =>
        row(TypeIdFloat, 3, v.doubleV)
      case KStr =>
        row(TypeIdStr, 4, v.strU)
      case KArray =>
        row(TypeIdArray, 5, v.rawU)
      case KObject =>
        row(TypeIdObject, 6, v.rawU)
      case _ => null // KMissing, KNull
    }
  }

  private def row(typeId: Byte, slot: Int, value: Any): InternalRow = {
    val arr = new Array[Any](7)
    arr(0) = typeId
    arr(slot) = value
    new GenericInternalRow(arr)
  }

  /** Reference-style display form of a union value: `{str=abc}`, `{int=5}`,
    * `{null=}` … (the format the reference's golden tests print, e.g.
    * tests/main.rs:77-91). SQL NULL renders as `{null=}` to match the
    * non-dict display of both missing and JSON-null. */
  def displayForm(r: InternalRow): String = {
    if (r == null) return "{null=}"
    r.getByte(0) match {
      case TypeIdNull   => "{null=}"
      case TypeIdBool   => s"{bool=${r.getBoolean(1)}}"
      case TypeIdInt    => s"{int=${r.getLong(2)}}"
      case TypeIdFloat  => s"{float=${JsonNav.formatDouble(r.getDouble(3))}}"
      case TypeIdStr    => s"{str=${r.getUTF8String(4)}}"
      case TypeIdArray  => s"{array=${r.getUTF8String(5)}}"
      case TypeIdObject => s"{object=${r.getUTF8String(6)}}"
      case _            => "{null=}"
    }
  }

  /** Flatten a union struct back to JSON text (the canonical form used both
   *  by `json_union_to_text` — reference src/json_union_to_text.rs:82-118 —
   *  and when a union value is fed back into a path function as its JSON
   *  input). Strings are JSON-quoted + escaped; array/object members pass
   *  their raw text through; a JSON-null member yields SQL NULL. */
  def toJsonText(r: InternalRow): String = {
    if (r == null) return null
    r.getByte(0) match {
      case TypeIdNull   => null
      case TypeIdBool   => if (r.getBoolean(1)) "true" else "false"
      case TypeIdInt    => r.getLong(2).toString
      case TypeIdFloat  => JsonNav.formatDouble(r.getDouble(3))
      case TypeIdStr    => JsonNav.quote(r.getUTF8String(4).toString)
      case TypeIdArray  => r.getUTF8String(5).toString
      case TypeIdObject => r.getUTF8String(6).toString
      case _            => null
    }
  }
}
