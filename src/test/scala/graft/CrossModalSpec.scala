package graft

import org.scalatest.funsuite.AnyFunSuite

/** C118 contracts beyond the oracle replay: the two planted dup
  * DIRECTIONS actually exist and land on the right flags — a doc that
  * embeds another doc's re-encoded image is image-dup WITHOUT being
  * text-dup (their texts are unrelated), a re-crawled copy is text-dup,
  * and the composite verdict is consistent with the per-modality
  * booleans everywhere.
  */
class CrossModalSpec extends AnyFunSuite with SparkSpec {

  test("c118: planted directions exist (image-not-text AND " +
    "text-not-image); text flags are exactly the planted re-crawl " +
    "slice; embed-linked docs are image-dup; verdict ≡ booleans") {
    val out = SparkEntry.queries("c118_crossmodal_dup")(spark, sfDir())
      .collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    out.foreach { r =>
      val t = r.getBoolean(1)
      val i = r.getBoolean(2)
      val v = r.getString(3)
      assert(t || i, s"unflagged doc in the verdict output: $r")
      assert(v === (if (t && i) "both" else if (t) "text" else "image"),
        s"verdict inconsistent with booleans: $r")
      // a text flag can only come from the planted re-crawl relation
      if (t) assert(r.getLong(0) % 3 === 1,
        s"text_dup outside the planted slice: $r")
    }
    val docs = Tables(spark, sfDir(), "documents").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // every planted re-crawl copy is found (jaccard 1.0 — guaranteed)
    docs.filter(_ % 3 == 1).foreach { d =>
      assert(byId.contains(d) && byId(d).getBoolean(1),
        s"planted re-crawl doc $d missing its text_dup flag")
    }
    // every embed link flags BOTH ends image-dup: doc d (≡5 mod 10)
    // embeds doc (d−5)'s re-encode — identical pixels, hamming 0
    val embeds = docs.filter(d => d % 10 == 5 && docs(d - 5))
    assert(embeds.nonEmpty, "no embed links in this corpus slice")
    embeds.foreach { d =>
      assert(byId.contains(d) && byId(d).getBoolean(2),
        s"embedding doc $d must be image-dup")
      assert(byId.contains(d - 5) && byId(d - 5).getBoolean(2),
        s"embedded doc ${d - 5} must be image-dup")
    }
    // both planted directions survive into the composite verdict
    assert(out.exists(_.getString(3) == "image"),
      "need at least one image-dup-but-not-text doc")
    assert(out.exists(_.getString(3) == "text"),
      "need at least one text-dup-but-not-image doc")
  }

  test("c123: the audio-ONLY planted direction exists (a ≡1 mod 4 doc " +
    "embedding its predecessor's re-master is audio-dup with unrelated " +
    "text and images); verdict string ≡ the three booleans everywhere; " +
    "narration links flag both ends") {
    val out = SparkEntry.queries("c123_trimodal_dup")(spark, sfDir())
      .collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    out.foreach { r =>
      val t = r.getBoolean(1)
      val i = r.getBoolean(2)
      val a = r.getBoolean(3)
      assert(t || i || a, s"unflagged doc in the verdict output: $r")
      val expect = Seq(if (t) Some("text") else None,
        if (i) Some("image") else None,
        if (a) Some("audio") else None).flatten.mkString("+")
      assert(r.getString(4) === expect,
        s"verdict inconsistent with booleans: $r")
      if (t) assert(r.getLong(0) % 3 === 1,
        s"text_dup outside the planted slice: $r")
    }
    val docs = Tables(spark, sfDir(), "documents").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // every narration link flags BOTH ends audio-dup: doc d (≡1 mod 4,
    // d−1 ≡ 0 mod 28) embeds doc (d−1)'s gain-shifted re-master — the
    // chained-landmark matcher is amplitude-invariant, so the pair is
    // guaranteed
    val narr = docs.filter(d => d % 4 == 1 && (d - 1) % 28 == 0 &&
      docs(d - 1))
    assert(narr.nonEmpty, "no narration links in this corpus slice")
    narr.foreach { d =>
      assert(byId.contains(d) && byId(d).getBoolean(3),
        s"embedding doc $d must be audio-dup")
      assert(byId.contains(d - 1) && byId(d - 1).getBoolean(3),
        s"narrating doc ${d - 1} must be audio-dup")
    }
    // the audio-ONLY direction exists — the row no two-modality
    // verdict can express
    assert(out.exists(_.getString(4) == "audio"),
      "need at least one audio-dup-but-nothing-else doc")
  }
}
