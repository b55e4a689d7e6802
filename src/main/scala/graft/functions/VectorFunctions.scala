package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns with higher-order Catalyst
  * functions — no UDFs, no per-row JVM object churn beyond the array itself.
  * Used by similarity search and embedding dedup.
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

  /** Dot product against a constant plane (Scala-side weights become an
    * array literal — Catalyst constant-folds the whole rhs).
    */
  def dotConst(v: Column, weights: Array[Double]): Column =
    dot(v.cast("array<double>"), array(weights.map(lit).toSeq: _*))
}
