package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/**
 * Codegen bridge for the native kernels: children are evaluated with their
 * own generated code (so the surrounding scan→filter→project pipeline
 * stays inside one WholeStageCodegen span — unlike CodegenFallback, which
 * forces an InternalRow materialization and interprets the child tree);
 * only the kernel itself is a bound-reference call. All kernels here are
 * null-intolerant: any NULL argument → NULL result.
 */
trait KernelCodegen extends Expression {

  /** Kernel body; args are the children's values, all non-null. */
  protected def kernelEval(args: Array[Any]): Any

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val args = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      args(i) = v
      i += 1
    }
    kernelEval(args)
  }

  /** Bridge for generated code (boxed). */
  def kernelEvalBoxed(args: Array[Object]): Any =
    kernelEval(args.asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftKernel", this, classOf[KernelCodegen].getName)
    val evs = children.map(_.genCode(ctx))
    val javaType = CodeGenerator.javaType(dataType)
    val boxedType = CodeGenerator.boxedType(dataType)
    val arr = ctx.freshName("kernelArgs")
    val anyNull = ctx.freshName("kernelAnyNull")
    val res = ctx.freshName("kernelRes")

    val fill = evs.zipWithIndex.map { case (e, i) =>
      s"""${e.code}
         |if (${e.isNull}) $anyNull = true; else $arr[$i] = (Object) ${e.value};""".stripMargin
    }.mkString("\n")

    val unbox = dataType match {
      case LongType    => s"(($boxedType) $res).longValue()"
      case DoubleType  => s"(($boxedType) $res).doubleValue()"
      case BooleanType => s"(($boxedType) $res).booleanValue()"
      case IntegerType => s"(($boxedType) $res).intValue()"
      case _           => s"($javaType) $res"
    }

    ev.copy(code = code"""
      boolean $anyNull = false;
      Object[] $arr = new Object[${children.length}];
      $fill
      Object $res = $anyNull ? null : $ref.kernelEvalBoxed($arr);
      boolean ${ev.isNull} = ($res == null);
      $javaType ${ev.value} = ${ev.isNull}
        ? ${CodeGenerator.defaultValue(dataType)} : $unbox;""")
  }
}
