package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private lazy val left = Seq(
    (1L, ts(100), "e1"), // before any right row for key 1
    (1L, ts(200), "e2"), // exactly AT a right row: inclusive match
    (1L, ts(250), "e3"), // between right rows: earlier one carries
    (1L, ts(900), "e4"), // after the last right row
    (2L, ts(500), "e5"), // key with a single right row
    (3L, ts(500), "e6")  // key absent from the right side entirely
  ).toDF("k", "t", "tag")

  private lazy val right = Seq(
    (1L, ts(200), 10L, 1.0),
    (1L, ts(300), 11L, 2.0),
    (2L, ts(400), 20L, 3.0)
  ).toDF("k", "rt", "rid", "price")

  private lazy val joined = AsofJoin
    .asof(left, right, Seq("k"), "t", "rt", Seq("rid", "price"))
    .collect()
    .map(r => r.getString(2) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
    .toMap

  test("each left row matches the latest right row at-or-before its time") {
    assert(joined("e2") === Some(10L), "equal timestamps must match (inclusive)")
    assert(joined("e3") === Some(10L), "carry the in-force version, not a later one")
    assert(joined("e4") === Some(11L), "latest version carries indefinitely")
    assert(joined("e5") === Some(20L))
  }

  test("unmatched left rows survive with null payload (left-outer)") {
    assert(joined("e1") === None, "no right row at-or-before → null")
    assert(joined("e6") === None, "key missing on the right → null")
    assert(joined.size === 6, "no left row lost or duplicated")
  }

  test("plan contains no join: one exchange keyed on the join key") {
    val out = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("rid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(600))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one exchange:\n${plan.take(800)}")
  }
}
