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

  /** Eager localCheckpoint that HANDS BACK the checkpointed RDD.
    * `Dataset.localCheckpoint(true)` performs exactly these steps but keeps
    * the RDD internal, so the blocks can only be reclaimed after the frame
    * is GC'd AND ContextCleaner gets around to it — local-checkpoint blocks
    * must not be evicted (eviction would kill the truncated lineage), so
    * under repeated invocation they pile up until execution memory starves
    * (observed: q_pagerank's 100x probe OOM'd its third back-to-back run).
    * With the handle, an operator can unpersist its PREVIOUS invocation's
    * checkpoint deterministically. Same `private[sql]`-bytecode technique
    * as the Column bridge ([[internalCreateDataFrame]] is public bytecode). */
  def localCheckpointed(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame,
         org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
    // copy: toRdd's unsafe rows are buffer-reused per partition iterator
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    (spark.internalCreateDataFrame(rdd, df.schema), rdd)
  }
}
