package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge into Spark 4's `private[sql]` Column <-> Catalyst Expression
  * conversion, needed to expose graft's custom expressions as `Column`s.
  * Standard extension-library technique (the converter and node types are
  * public bytecode, package-private only at the Scala level).
  */
object Bridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  /** Resolve a Column back to its Catalyst expression (classic backend). */
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** The InternalRow RDD of a DataFrame (no per-row Row conversion —
    * primitive field access in tight per-partition loops). */
  def internalRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.queryExecution.toRdd
}
