package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math as declarative higher-order Catalyst functions.
  * The hot path uses the codegen'd [[GraftExpressions.floatCosine]]
  * instead; these forms are the engine-independent reference the specs
  * cross-check that expression against.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — zip_with + aggregate stays inside codegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0d, lit(0.0d)).otherwise(dot(a, b) / denom)
  }
}
