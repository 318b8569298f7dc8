package graft.ml

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** `vec_dot(a, b)` — dot product of two float/double vectors as a native
  * Catalyst Expression. Numerically IDENTICAL to the sequential
  * `aggregate(zip_with(...))` fold (left-to-right double additions starting
  * from 0.0, matching DuckDB's `list_reduce`), but executed as one tight
  * JVM loop over columnar ArrayData instead of interpreted per-element
  * lambdas — the difference between ~20µs and ~100ns per pair inside
  * quadratic candidate joins.
  */
case class VecDot(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elem(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  private lazy val elemTypes = children.map(
    _.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)

  override def eval(input: InternalRow): Any = {
    val av = children(0).eval(input)
    val bv = children(1).eval(input)
    if (av == null || bv == null) return null
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (ta, tb) = (elemTypes(0), elemTypes(1))
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += elem(a, i, ta) * elem(b, i, tb)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object VecOps {

  private val name = "vec_dot"

  /** Runtime registration (per session). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[VecDot].getName, name),
      (exprs: Seq[Expression]) => VecDot(exprs))

  def dot(a: Column, b: Column): Column = call_function(name, a, b)

  def norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(call_function(name, a, a))
}
