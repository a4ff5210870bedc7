// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column constructors over Spark's internal bloom-filter expressions —
  * the exact pair `InjectRuntimeFilter` plants for runtime row-level
  * filtering (child wrapped in XxHash64 on both build and probe side),
  * exposed so an operator can build the filter on an arbitrary frame
  * boundary instead of waiting for the optimizer's heuristics.
  */
object BloomExprs {

  /** Aggregate: serialized bloom filter over xxhash64(key). */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(key))), expectedItems)
        .toAggregateExpression())

  /** Probe: might-contain test of xxhash64(key) against a bloom binary. */
  def mightContain(bloom: Column, key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom),
      new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
