package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** Bridge to Spark's `private[sql]` V2-Predicate → V1-Filter converter
  * (org.apache.spark.sql.internal.connector.PredicateUtils). Runtime
  * filters arrive at a DSv2 scan as V2 `Predicate`s; converting to the
  * V1 `Filter` algebra lets the graft-segment connector reuse one
  * zone-map pruning implementation for both static and runtime
  * pruning. Unconvertible predicates are dropped — pruning is
  * conservative by contract, so a dropped predicate only means less
  * skipping, never a wrong result. */
object FilterBridge {
  def toV1(predicates: Array[Predicate]): Array[Filter] = PredicateUtils.toV1(predicates)
}
