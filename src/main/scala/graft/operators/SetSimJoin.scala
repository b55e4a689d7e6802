package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Jaccard set-similarity self-join via prefix filtering — the
  * PPJoin family (Xiao et al. 2008; Chaudhuri et al. 2006), completing
  * the similarity-join triad: C2's MinHash join is probabilistic, B25's
  * SymSpell join is edit-distance; this one is EXACT token-set Jaccard.
  *
  * Prefix-filter theorem: under any fixed total order of tokens, two sets
  * with |A∩B| ≥ α must share a token among the first |A|−α+1 (resp.
  * |B|−α+1) of their sorted tokens. J(A,B) ≥ θ implies |A∩B| ≥ ⌈θ·|A|⌉
  * and ≥ ⌈θ·|B|⌉, so blocking on each set's own prefix is LOSSLESS —
  * every qualifying pair collides on some prefix token, no recall loss to
  * verify away. Lexicographic order keeps the blocking stats-free (a
  * rare-token-first order would shrink candidate lists further, at the
  * cost of one corpus frequency pass — swap `array_sort` for a
  * frequency-rank sort if candidate skew ever warrants it).
  *
  * 100 TB shape: the only corpus-sized exchange carries (prefix-token,
  * id, size) triples — sets never shuffle for blocking; a size
  * cross-filter (J ≥ θ forces θ·|A| ≤ |B| ≤ |A|/θ) prunes candidates
  * before the DISTINCT, and only the surviving id pairs join the token
  * sets back for one exact array_intersect verify. Hot prefix tokens are
  * ordinary skewed join keys — AQE skew-split applies.
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with Jaccard(tokens(a), tokens(b)) ≥ theta,
    * over lowercased whitespace-token SETS of `strCol`.
    */
  def jaccardSelfJoin(df: DataFrame, idCol: String, strCol: String,
                      theta: Double): DataFrame = {
    require(theta > 0 && theta <= 1, s"theta in (0, 1], got $theta")
    val toks = array_sort(array_distinct(
      split(trim(lower(col(strCol))), "\\s+")))
    val base = df.select(col(idCol).as("id"), toks.as("t"))
      .where(size(col("t")) > 0 && !(size(col("t")) === 1 &&
        element_at(col("t"), 1) === ""))
      .withColumn("sz", size(col("t")))
      .withColumn("prefix", slice(col("t"), lit(1),
        col("sz") - ceil(col("sz") * lit(theta)).cast("int") + 1))
    val pa = base.select(col("id").as("id_a"), col("sz").as("sz_a"),
      explode(col("prefix")).as("tok"))
    val pb = base.select(col("id").as("id_b"), col("sz").as("sz_b"),
      explode(col("prefix")).as("tok"))
    // shuffle_hash — the r13 banded-join audit rule: both prefix-token
    // sides are corpus-scaled exploded frames
    val cand = pa.join(pb.hint("shuffle_hash"), Seq("tok"))
      .where(col("id_a") < col("id_b") &&
        col("sz_b") >= ceil(col("sz_a") * lit(theta)) &&
        col("sz_a") >= ceil(col("sz_b") * lit(theta)))
      .select("id_a", "id_b").distinct()
    val ta = base.select(col("id").as("id_a"), col("t").as("t_a"))
    val tb = base.select(col("id").as("id_b"), col("t").as("t_b"))
    cand.join(ta, Seq("id_a")).join(tb, Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("t_a"), col("t_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("t_a")) + size(col("t_b")) - col("inter")))
      .where(col("jaccard") >= theta)
      .select("id_a", "id_b", "jaccard")
  }
}
