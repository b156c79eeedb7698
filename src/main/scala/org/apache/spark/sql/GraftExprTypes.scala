package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, IntegerType, LongType}

/** Bridge for declaring `inputTypes` from graft expressions: Spark 4's
  * `AbstractDataType` is `private[sql]`, so an expression living in
  * `graft.expr` cannot name the override's type — a trait defined inside
  * the sql package can (same pattern as [[GraftBridge]]).
  */
trait GraftIntArrayArrayArgs extends ImplicitCastInputTypes {
  self: Expression =>
  /** Both arguments: array&lt;int&gt;, implicit-cast where safe. */
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
}

/** Both arguments: array&lt;long&gt;, implicit-cast where safe (the
  * [[GraftIntArrayArrayArgs]] pattern for long-array kernels like
  * graft.expr.LongDot).
  */
trait GraftLongArrayArrayArgs extends ImplicitCastInputTypes {
  self: Expression =>
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
}
