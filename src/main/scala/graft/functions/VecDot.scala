package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two float-array columns as a strict left-to-right
  * DOUBLE fold — bit-identical to the
  * `aggregate(zip_with(a, b, (x,y) => x·y), 0.0, +)` tree it replaces
  * (same element order, same IEEE-754 operations), and to the DuckDB
  * oracle's `list_sum(list_transform(...))`.
  *
  * Custom expression because higher-order array functions are
  * CodegenFallback: the HOF tree costs two closure dispatches per
  * element plus an intermediate zipped array allocation per row; this
  * is a single primitive loop. NULL semantics match the HOF tree: any
  * NULL element or length mismatch poisons the fold to NULL
  * (`zip_with` pads the shorter side with NULLs).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (aFloat, bFloat) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
