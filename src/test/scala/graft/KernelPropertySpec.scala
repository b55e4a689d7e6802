package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.operators.Audio

/** Property-style locks for the pure expression kernels — seeded random
  * sweeps over the algebraic identities each kernel's correctness rests
  * on. Value specs pin outputs on known data; these pin the LAWS (a
  * Parseval identity, a symmetry, an order-invariance), which is what
  * catches a future "optimization" that keeps the spec corpus green but
  * breaks the algebra elsewhere. Deterministic seeds — no flake surface.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("whtPowers satisfies the exact Parseval identity on 500 random " +
    "frames: sum of sequency powers == N * frame energy, in integers") {
    val r = rng(42)
    (1 to 500).foreach { _ =>
      val n = 128
      val pcm = new Array[Byte](2 * n)
      var energy = 0L
      (0 until n).foreach { i =>
        val s = r.nextInt(65536) - 32768
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        energy += s.toLong * s
      }
      val p = Audio.whtPowers(pcm, n)
      assert(p.sum === n.toLong * energy, "Parseval must hold exactly")
    }
  }

  test("whtPowers of a pure Walsh tone is a single spectral line at its " +
    "own sequency, at exactly (N*A)^2") {
    val n = 128
    (0 until n by 7).foreach { t =>
      val amp = 123
      val pcm = new Array[Byte](2 * n)
      (0 until n).foreach { i =>
        val sgn = if (java.lang.Long.bitCount((t & i).toLong) % 2 == 0) 1
                  else -1
        val s = amp * sgn
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val p = Audio.whtPowers(pcm, n)
      (0 until n).foreach { j =>
        val expect = if (j == t) (n.toLong * amp) * (n.toLong * amp) else 0L
        assert(p(j) === expect, s"tone $t line $j")
      }
    }
  }

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr(Literal.create(a, StringType),
      Literal.create(b, StringType)).eval(null).asInstanceOf[Double]

  test("JaroWinkler: symmetric, bounded in [0,1], 1 on self, and equal " +
    "to an independent reference implementation on 300 random pairs") {
    def ref(s1: String, s2: String): Double = {
      if (s1 == s2) return 1.0
      if (s1.isEmpty || s2.isEmpty) return 0.0
      val window = math.max(math.max(s1.length, s2.length) / 2 - 1, 0)
      val m1 = new Array[Boolean](s1.length)
      val m2 = new Array[Boolean](s2.length)
      var matches = 0
      for (i <- s1.indices) {
        val lo = math.max(0, i - window)
        val hi = math.min(s2.length - 1, i + window)
        var j = lo
        var found = false
        while (j <= hi && !found) {
          if (!m2(j) && s1(i) == s2(j)) {
            m1(i) = true; m2(j) = true; matches += 1; found = true
          }
          j += 1
        }
      }
      if (matches == 0) return 0.0
      var t = 0
      var k = 0
      for (i <- s1.indices if m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      // integer transposition halving — the engine's (and DuckDB's)
      // convention, bit-locked in the B45 gate
      val jaro = (matches.toDouble / s1.length +
        matches.toDouble / s2.length +
        (matches - t / 2).toDouble / matches) / 3.0
      // Winkler's original boost threshold: the prefix bonus applies
      // only when the base Jaro already exceeds 0.7 (the engine is
      // bit-exact with DuckDB's convention — B45)
      if (jaro <= 0.7) jaro
      else {
        val prefix = s1.zip(s2).take(4)
          .takeWhile { case (x, y) => x == y }.size
        jaro + prefix * 0.1 * (1.0 - jaro)
      }
    }
    val r = rng(7)
    def word(): String =
      (0 until r.nextInt(12)).map(_ => ('a' + r.nextInt(6)).toChar).mkString
    (1 to 300).foreach { _ =>
      val (a, b) = (word(), word())
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0, s"'$a' '$b' out of range: $v")
      assert(v === jw(b, a), s"'$a' '$b' asymmetric")
      assert(v === ref(a, b), s"'$a' '$b': $v != ref ${ref(a, b)}")
    }
    assert(jw("martha", "martha") === 1.0)
    assert(jw("", "x") === 0.0)
  }

  private def simhash(tokens: Seq[String]): Long =
    SimHash64Expr(Literal.create(tokens, ArrayType(StringType)))
      .eval(null).asInstanceOf[Long]

  test("SimHash64 is token-ORDER-invariant (votes are a sum) but " +
    "content-sensitive, on 200 random token bags") {
    val r = rng(11)
    (1 to 200).foreach { _ =>
      val toks = (0 until 3 + r.nextInt(20))
        .map(_ => s"tok${r.nextInt(40)}")
      val h = simhash(toks)
      assert(simhash(r.shuffle(toks)) === h, "order must not matter")
      // flipping one token to a fresh value must move SOME bit almost
      // always; assert it moves for a guaranteed-fresh token (tiny bags
      // can tie votes — only assert when the bag has a clear majority)
      if (toks.size >= 5) {
        val changed = toks.updated(0, "completely-different-token-xyz")
        if (changed.toSet != toks.toSet) {
          // not a strict law (vote ties exist); sample-checked instead:
          // at least one of 3 fresh substitutions must change the hash
          val variants = Seq("fresh-a", "fresh-b", "fresh-c")
            .map(t => simhash(toks.updated(0, t)))
          assert(variants.exists(_ != h), s"no substitution moved $toks")
        }
      }
    }
  }

  test("SortedJaccard equals the direct set formula on 300 random " +
    "sorted-distinct long arrays") {
    val r = rng(23)
    (1 to 300).foreach { _ =>
      val a = (0 until r.nextInt(30)).map(_ => r.nextInt(50).toLong)
        .distinct.sorted
      val b = (0 until r.nextInt(30)).map(_ => r.nextInt(50).toLong)
        .distinct.sorted
      val got = SortedJaccardExpr(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType))).eval(null)
        .asInstanceOf[Double]
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      // engine convention (DuckDB-locked in the c4 gate): J(∅, ∅) = 0 —
      // an empty shingle set is "no evidence", never a perfect match
      val expect = if (union == 0) 0.0 else inter.toDouble / union
      assert(got === expect, s"$a vs $b")
    }
  }

  test("JlProject is exactly linear over the 1/1024 grid: " +
    "project(u + v) == project(u) + project(v) for exact-grid vectors") {
    val signs = GraftExpressions.jlSigns(16, 64)
    def proj(v: Array[Float]): Array[Long] =
      JlProjectExpr(Literal.create(v.toSeq, ArrayType(FloatType)), signs)
        .eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
    val r = rng(31)
    (1 to 100).foreach { _ =>
      // exact grid values n/1024 with |n| <= 4096: u, v, and u+v are all
      // exactly representable floats, so quantization is the identity
      // and the projection must be exactly additive
      val u = Array.fill(64)((r.nextInt(8193) - 4096).toFloat / 1024.0f)
      val v = Array.fill(64)((r.nextInt(8193) - 4096).toFloat / 1024.0f)
      val sum = u.zip(v).map { case (x, y) => x + y }
      val pu = proj(u)
      val pv = proj(v)
      val ps = proj(sum)
      (0 until 16).foreach { j =>
        assert(ps(j) === pu(j) + pv(j), s"component $j not additive")
      }
    }
  }

  test("the qmag quantizer (64 - nlz) is the exact bit length for " +
    "every power of interest") {
    val r = rng(47)
    (1 to 1000).foreach { _ =>
      val p = math.abs(r.nextLong()) % (1L << 44)
      if (p > 0) {
        val q = 64 - java.lang.Long.numberOfLeadingZeros(p)
        assert(q === java.lang.Long.toBinaryString(p).length,
          s"qmag($p)")
      }
    }
  }

  test("the pmod-adjusted IntegralDivide bucket formula is exact floor " +
    "division over the FULL long range — where the old double-division " +
    "form provably corrupts past 2^53 (the r8-advice fix's law)") {
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Pmod, Subtract}
    def bucketExpr(v: Long, w: Long): Long =
      IntegralDivide(
        Subtract(Literal(v), Pmod(Literal(v), Literal(w))),
        Literal(w)).eval().asInstanceOf[Long]
    val r = rng(4242)
    (1 to 500).foreach { _ =>
      val w = 1L + r.nextInt(1000000).toLong
      // mix small values with values far past 2^53
      val v = if (r.nextBoolean()) r.nextLong() % (1L << 40)
              else (1L << 53) + math.abs(r.nextLong() % (1L << 60))
      assert(bucketExpr(v, w) === Math.floorDiv(v, w),
        s"formula must floor-divide exactly for v=$v w=$w")
    }
    // the old form's failure is CONSTRUCTED, not sampled (a random hit
    // needs v within double-rounding error of a bucket boundary —
    // ~1e-4 per draw): v = (multiple of w) − 1 at 2^62 magnitude
    // rounds UP to the multiple in double, flipping the bucket
    var doubleFormDiverged = 0
    (1 to 50).foreach { _ =>
      val w = 1000L + r.nextInt(1000000).toLong
      val v = ((1L << 62) / w) * w - 1
      assert(bucketExpr(v, w) === Math.floorDiv(v, w))
      if (math.floor(v.toDouble / w).toLong != Math.floorDiv(v, w))
        doubleFormDiverged += 1
    }
    assert(doubleFormDiverged > 0,
      "the constructed boundary cases must expose the double form " +
        "— otherwise this test proves nothing about the fix")
  }

  test("funnel automaton ≡ Java-regex leftmost-non-overlapping scan on " +
       "500 seeded random sequences (matches, longest run, length)") {
    import graft.operators.SeqPattern
    val rnd = new scala.util.Random(42)
    val alphabet = "vcpes"
    val pat = java.util.regex.Pattern.compile("v+c*p")
    val runPat = java.util.regex.Pattern.compile("e+")
    (1 to 500).foreach { _ =>
      val s = Array.fill(rnd.nextInt(48) + 1)(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val m = pat.matcher(s)
      var expMatches = 0L
      while (m.find()) expMatches += 1
      val rm = runPat.matcher(s)
      var expRun = 0L
      while (rm.find()) expRun = math.max(expRun, rm.group().length.toLong)
      var st = SeqPattern.FoldState.zero
      s.foreach(ch => st = SeqPattern.advance(st, ch, 'v', 'c', 'p', 'e'))
      assert(st.matches === expMatches, s"matches on '$s'")
      assert(st.maxRun === expRun, s"run on '$s'")
      assert(st.seqLen === s.length.toLong, s"len on '$s'")
    }
  }
}
