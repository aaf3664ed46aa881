package graft.ops

import graft.functions.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed expectations for the round-3 curation operators:
  * Gopher-style repetition fractions and PII redaction. */
class TextCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetitionMetrics: hand-computed fractions and gates") {
    val docs = Seq(
      // 1: "a a a a b" — top token 4/5, top bigram "a a" 3/4 → degenerate
      (1L, "a a a a b"),
      // 2: 10 distinct tokens — top token 1/10, top bigram 1/9 → passes
      (2L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      // 3: single token — no bigrams; bigram gate must not veto
      (3L, "solo"),
      // 4: "x y x y x y" — top token 3/6 = .5, bigram "x y" 3/5 = .6
      (4L, "x y x y x y")
    ).toDF("doc_id", "text")
    val m = TextOps.repetitionMetrics(docs, "doc_id", "text",
      maxTopTokenFrac = 0.2, maxTopBigramFrac = 0.2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]), r.getInt(5))).toMap

    assert(m(1L) == ((5L, 0.8, Some(4L), Some(0.75), 0)))
    assert(m(2L) == ((10L, 0.1, Some(9L), Some(0.111111), 1)))
    assert(m(3L) == ((1L, 1.0, None, None, 0))) // top token frac 1.0 > cap
    assert(m(4L) == ((6L, 0.5, Some(5L), Some(0.6), 0)))
  }

  test("repetitionMetrics: single-token doc passes when the token gate allows") {
    val docs = Seq((1L, "solo")).toDF("doc_id", "text")
    val r = TextOps.repetitionMetrics(docs, "doc_id", "text",
      maxTopTokenFrac = 1.0, maxTopBigramFrac = 0.0).collect().head
    assert(r.getInt(5) == 1) // null bigram frac must not fail the gate
  }

  test("piiRedact: counts and redaction order") {
    val docs = Seq(
      (1L, "write to alice.smith@corp.example or call 555-0147 from 192.168.1.77 now"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io and c.d@e-f.org one ip 10.0.0.1")
    ).toDF("doc_id", "text")
    val got = TextOps.piiRedact(docs, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(got(1L) == ((1L, 1L, 1L,
      "write to <EMAIL> or call <PHONE> from <IP> now")))
    assert(got(2L) == ((0L, 0L, 0L, "no pii here at all")))
    assert(got(3L) == ((2L, 0L, 1L, "two mails <EMAIL> and <EMAIL> one ip <IP>")))
  }

  test("piiRedact: email is redacted before its digits can match other patterns") {
    val docs = Seq((1L, "mail 555-0123@digits.example end")).toDF("doc_id", "text")
    val r = TextOps.piiRedact(docs, "text").collect().head
    // the whole token is one email; the phone pattern must not fire afterwards
    assert(r.getString(5) == "mail <EMAIL> end")
    assert((r.getLong(2), r.getLong(3)) == ((1L, 0L)))
  }

  test("hashSample: keeps exactly the md5-bucket rows; independent salts differ") {
    val docs = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val rates = Map("src0" -> 0.0, "src1" -> 1.0)
    def expectedBucket(salt: String, id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 10000
    }
    val kept = TextOps.hashSample(docs, "doc_id", "source", rates,
      defaultRate = 0.3, salt = "s1")
      .select("doc_id").as[Long].collect().toSet
    val expected = (0L until 400L).filter { i =>
      val rate = i % 4 match { case 0 => 0.0; case 1 => 1.0; case _ => 0.3 }
      expectedBucket("s1", i) < rate * 10000
    }.toSet
    assert(kept == expected)
    assert((0L until 400L).filter(_ % 4 == 0).forall(!kept.contains(_))) // rate 0
    assert((0L until 400L).filter(_ % 4 == 1).forall(kept.contains(_)))  // rate 1
    val kept2 = TextOps.hashSample(docs, "doc_id", "source", rates,
      defaultRate = 0.3, salt = "s2").select("doc_id").as[Long].collect().toSet
    assert(kept2 != kept, "independent salts must draw different samples")
  }

  test("hashSample: samples are NESTED across rates (same salt)") {
    // bucket < rate·10000 is monotone in rate, so growing a dataset mix
    // from 10% to 30% only ADDS rows — the property that makes staged
    // data ablations comparable (the smaller mix is a subset of the larger)
    val docs = (0L until 500L).map(i => (i, "s")).toDF("doc_id", "source")
    def kept(rate: Double) =
      TextOps.hashSample(docs, "doc_id", "source", Map.empty, rate, salt = "mix")
        .select("doc_id").as[Long].collect().toSet
    val (k10, k30, k100) = (kept(0.1), kept(0.3), kept(1.0))
    assert(k10.subsetOf(k30) && k30.subsetOf(k100))
    assert(k100.size == 500)
    // rates land near their expectation (md5 buckets are uniform)
    assert(math.abs(k30.size - 150) < 50, s"${k30.size}")
  }

  test("contamination: trigram overlap vs a tiny benchmark, hand-checked") {
    val evalSet = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d x"),   // shares trigrams "a b c", "b c d" → 2
      (2L, "x a b c y"),   // shares only "a b c" → 1, below minShared
      (3L, "p q r s t")    // disjoint
    ).toDF("doc_id", "text")
    val got = TextOps.contamination(corpus, evalSet, "doc_id", "text",
      ngram = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("packSequences: contiguous budget packing per stream") {
    val docs = Seq(
      (1L, "en", Seq.fill(300)("t").mkString(" ")),
      (2L, "en", Seq.fill(300)("t").mkString(" ")), // cum_before 300 → pack 0
      (3L, "en", Seq.fill(10)("t").mkString(" ")),  // cum_before 600 → pack 1
      (4L, "de", Seq.fill(700)("t").mkString(" ")), // own stream, pack 0
      (5L, "de", "x")                               // cum_before 700 → pack 1
    ).toDF("doc_id", "lang", "text")
    val got = TextOps.packSequences(docs, "doc_id", "text", "lang", budget = 512L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> ((0L, 0L)), 2L -> ((300L, 0L)), 3L -> ((600L, 1L)),
      4L -> ((0L, 0L)), 5L -> ((700L, 1L))))
  }
}
