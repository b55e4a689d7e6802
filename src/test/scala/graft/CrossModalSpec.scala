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
}
