package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join splitting isn't available (static plans, non-shuffle-join
  * shapes) or when one key dominates so hard that even split shuffle
  * blocks straggle.
  *
  * The large side gets a per-row salt in [0, salts); the small side is
  * replicated `salts` times; the join key becomes (key, salt), so a hot
  * key's rows spread over `salts` reducers instead of one straggler. Row
  * multiplicity is exactly preserved: every large row matches precisely
  * the one replica carrying its salt value.
  *
  * The salt is `rand(seed)`-based, NOT a content hash: the join output is
  * salt-invariant (each row joins the same replica set whatever its salt),
  * so replay under a different partition layout stays correct — and unlike
  * a content hash, random salting spreads even bit-identical duplicate
  * rows of the hot key (exactly the rows a training-data pipeline has).
  * Contrast [[BalancedRepartition]], where the salt DOES determine output
  * file placement and therefore must be content-deterministic.
  *
  * Cost model: small side shuffles/broadcasts ×salts — cheap while
  * |small| · salts ≪ |large|, which is the skew regime by definition.
  */
object SkewJoin {

  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      salts: Int = 8, seed: Long = 42L): DataFrame = {
    require(salts > 0)
    require(large.columns.contains(key) && small.columns.contains(key),
      s"join key '$key' must exist on both sides")
    val saltedLarge = large.withColumn("__salt",
      (rand(seed) * salts).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
