package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** Edit-distance similarity join: the deletion-neighborhood blocking must
  * be LOSSLESS (exact distance-≤k pair set, proven against a brute-force
  * cross join), and the plan must never contain a cartesian product.
  */
class FuzzyJoinSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // one cluster of single-edit variants of "martha", one distance-2
  // member, and unrelated strings
  private def names = Seq(
    (1L, "martha"),   // base
    (2L, "marhta"),   // two substitutions from base (dist 2)
    (3L, "marta"),    // one deletion from base (dist 1)
    (4L, "marthas"),  // one insertion (dist 1)
    (5L, "mertha"),   // one substitution (dist 1)
    (6L, "zebra"),    // unrelated
    (7L, "zebra")     // exact duplicate of 6 (dist 0)
  ).toDF("id", "name")

  private def bruteForce(maxDist: Int) = {
    val l = names.select($"id".as("id_a"), $"name".as("str_a"))
    val r = names.select($"id".as("id_b"), $"name".as("str_b"))
    l.crossJoin(r)
      .where($"id_a" < $"id_b" &&
        levenshtein($"str_a", $"str_b") <= maxDist)
      .select("id_a", "id_b")
  }

  private def pairs(maxDist: Int) =
    FuzzyJoin.editDistanceSelfJoin(names, "id", "name", maxDist)
      .select("id_a", "id_b")

  test("maxDist=1 equals the brute-force distance-1 pair set exactly") {
    val got = pairs(1)
    val want = bruteForce(1)
    assert(got.exceptAll(want).count() === 0L, "false positives")
    assert(want.exceptAll(got).count() === 0L, "missed pairs")
    val set = got.as[(Long, Long)].collect().toSet
    // planted expectations: substitution, deletion, insertion all found
    assert(set.contains((1L, 3L)) && set.contains((1L, 4L)) &&
      set.contains((1L, 5L)))
    // exact duplicates are distance 0 ≤ 1
    assert(set.contains((6L, 7L)))
    // the distance-2 pair must NOT appear at maxDist=1
    assert(!set.contains((1L, 2L)))
  }

  test("maxDist=2 equals the brute-force distance-2 pair set exactly") {
    val got = pairs(2)
    val want = bruteForce(2)
    assert(got.exceptAll(want).count() === 0L, "false positives")
    assert(want.exceptAll(got).count() === 0L, "missed pairs")
    assert(got.as[(Long, Long)].collect().toSet.contains((1L, 2L)),
      "the transposition pair (dist 2) must surface at maxDist=2")
  }

  test("dist column is the exact levenshtein distance") {
    val d = FuzzyJoin.editDistanceSelfJoin(names, "id", "name", 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().map { case (a, b, dd) => (a, b) -> dd }.toMap
    assert(d((1L, 3L)) === 1)
    assert(d((1L, 2L)) === 2)
    assert(d((6L, 7L)) === 0)
  }

  test("plan has no cartesian product and no UDF") {
    val plan = pairs(1).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(500))
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }

  test("b45 JaroWinklerExpr matches the textbook values and edge " +
       "contracts, in and out of codegen") {
    import graft.functions.GraftExpressions.jaroWinkler
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(jaroWinkler(col("a"), col("b"))).head.getDouble(0)
    // Winkler's published examples
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    // boost only above 0.7: a low-jaro pair stays pure jaro
    assert(jw("abcdef", "fedcba") <= 0.7)
    // identity / empty contracts
    assert(jw("same", "same") === 1.0)
    assert(jw("", "") === 1.0)
    assert(jw("a", "") === 0.0)
    // symmetric
    assert(jw("kitten", "sitting") === jw("sitting", "kitten"))
  }
}
