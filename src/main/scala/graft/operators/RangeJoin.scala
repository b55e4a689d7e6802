package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketed: Spark's native answer to a
  * non-equi `point BETWEEN lo AND hi` join is BroadcastNestedLoopJoin
  * (fine only while one side broadcasts) or a cartesian product (never
  * fine). This operator turns the range predicate into an EQUI-join both
  * sides can shuffle-partition on:
  *
  *   - each interval row explodes to the fixed-width buckets it overlaps
  *     (`sequence(floor(lo/w), floor(hi/w))`),
  *   - each point row maps to its single bucket,
  *   - equi-join on bucket, then the exact `BETWEEN` residual filter.
  *
  * Shuffle is keyed on bucket id: distributable, AQE-skew-splittable,
  * works big-to-big where BNLJ dies. Interval-side blowup = average
  * interval span / bucketWidth — pick bucketWidth near the median span
  * (blowup ≤ 2 for spans ≤ width). Every matched pair appears exactly
  * once: a (point, interval) pair co-occurs only in the point's bucket.
  */
object RangeJoin {

  /** @param points      point side
    * @param intervals   interval side with [loCol, hiCol] (inclusive ends)
    * @param pointCol    numeric point column
    * @param bucketWidth bucket width in the point/interval unit
    * @return points ⋈ intervals rows satisfying lo ≤ point ≤ hi
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointCol).cast("double") / bucketWidth).cast("long"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol).cast("double") / bucketWidth).cast("long"),
        floor(col(hiCol).cast("double") / bucketWidth).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
