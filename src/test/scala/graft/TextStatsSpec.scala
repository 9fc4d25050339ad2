package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextStats

/** Behavioral pins for the corpus-curation text operators that the
  * SQL oracles exercise only at one parameterization: mixture
  * proportions actually land on the target weights, vocab/OOV
  * coverage separates in-vocab from out-of-vocab documents.
  */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 sources with unequal sizes: a=800, b=400, c=200, d=100
  private def mixCorpus = {
    val rows =
      (0 until 800).map(i => (i.toLong, "common words here", "a")) ++
      (0 until 400).map(i => (1000L + i, "common words here", "b")) ++
      (0 until 200).map(i => (2000L + i, "common words here", "c")) ++
      (0 until 100).map(i => (3000L + i, "common words here", "d"))
    rows.toDF("doc_id", "text", "source")
  }

  test("sampleMixture hits the target proportions; argmin source keeps everything") {
    // weights 1:1 over a (800 docs) and d (100 docs): T = min(800/1,
    // 100/1) = 100, so d keeps ALL 100 and a samples at 100/800
    val out = TextStats.sampleMixture(mixCorpus, Map("a" -> 1.0, "d" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("d", 0) === 100, "argmin source must keep every doc")
    // a's expected share is 100 ± md5-draw noise (binomial sd ~9.4)
    val aN = bySrc.getOrElse("a", 0)
    assert(aN > 60 && aN < 140, s"source a drew $aN, expected ~100")
    // unweighted sources are dropped entirely
    assert(!bySrc.contains("b") && !bySrc.contains("c"))
    // re-running reproduces the exact same sample (seedless md5 draw)
    val again = TextStats.sampleMixture(mixCorpus, Map("a" -> 1.0, "d" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.sorted.toSeq === out.sorted.toSeq)
  }

  test("sampleMixture skewed weights: proportions track w_s, never oversample") {
    // weights 3:1 over c (200) and d (100): T = min(200/3, 100/1) =
    // 66.67 → c at rate 200/200=1.0? no: 3*66.67/200 = 1.0 exactly,
    // d at 66.67/100 = 0.667
    val out = TextStats.sampleMixture(mixCorpus, Map("c" -> 3.0, "d" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("c", 0) === 200, "rate-1.0 source keeps every doc")
    val dN = bySrc.getOrElse("d", 0)
    assert(dN > 45 && dN < 90, s"source d drew $dN, expected ~67")
  }

  test("mixtureReport: targets sum to 1, achieved tracks the draw, argmin source err is measurement-true") {
    val out = TextStats.mixtureReport(mixCorpus, Map("a" -> 1.0, "d" -> 1.0))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet === Set("a", "d"), "only weighted sources report")
    assert(out("a")._3 === 500000L && out("d")._3 === 500000L,
      "equal weights -> equal targets")
    // d (argmin) keeps every doc; achieved is the exact drawn ratio
    val (aN, dN) = (out("a")._2, out("d")._2)
    assert(dN === 100L && out("d")._1 === 100L)
    assert(out("a")._1 === 800L)
    val total = (aN + dN).toDouble
    assert(out("a")._4 === math.floor(aN / total * 1e6).toLong)
    assert(out("d")._5 === out("d")._4 - 500000L, "err is the exact gap")
    // the draw lands near the target (binomial noise, ~3 sigma bound)
    assert(math.abs(out("a")._5) < 200000L, out("a").toString)
  }

  test("sampleWeighted: huge weights always win, sample is deterministic and size-n") {
    val docs = ((0 until 500).map(i => (i.toLong, 1L)) :+ ((999L, 1000000000L)))
      .toDF("doc_id", "w")
    val out = TextStats.sampleWeighted(docs, weightCol = "w", n = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.length === 20)
    assert(out.head._1 === 999L,
      s"the 1e9-weight doc's key ~0 must rank first: ${out.take(3).toSeq}")
    // keys ascend and the draw reproduces exactly (seedless)
    assert(out.map(_._2).toSeq === out.map(_._2).sorted.toSeq)
    val again = TextStats.sampleWeighted(docs, weightCol = "w", n = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(again.toSeq === out.toSeq)
    // temperature/proportionality direction: doubling every weight
    // halves every key but keeps the SAME selected set (scale-free)
    val scaled = TextStats.sampleWeighted(
      docs.withColumn("w", org.apache.spark.sql.functions.col("w") * 2),
      weightCol = "w", n = 20)
      .collect().map(_.getLong(0)).toSet
    assert(scaled === out.map(_._1).toSet, "E-S keys are scale-equivariant")
  }

  test("vocabCoverage: all-in-vocab docs score 0, alien docs score 1") {
    val docs = (
      (0 until 50).map(i => (i.toLong, "alpha beta gamma")) ++
      Seq((900L, "alpha beta zzz-rare"), (901L, "qq ww ee rr"))
    ).toDF("doc_id", "text")
    val out = TextStats.vocabCoverage(docs, vocabSize = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // vocab = {alpha, beta, gamma} (frequency 51, 51, 50 beat the
    // singletons); the 50 base docs are fully covered
    (0 until 50).foreach(i => assert(out(i.toLong) === ((3L, 0L, 0L))))
    assert(out(900L) === ((3L, 1L, 333333L)), "floor(1/3 x 1e6)")
    assert(out(901L) === ((4L, 4L, 1000000L)), "fully alien doc: OOV rate 1")
  }

  test("zipfFit: a perfect 1/rank corpus reads slope ≈ -1; ranks tie-break by term") {
    // freqs 60/r for r=1..6: exact Zipf, so ln(freq) = ln(60) - ln(rank)
    val words = Seq("wa" -> 60, "wb" -> 30, "wc" -> 20, "wd" -> 15,
      "we" -> 12, "wf" -> 10)
    val text = words.flatMap { case (w, k) => Seq.fill(k)(w) }.mkString(" ")
    val docs = Seq((1L, text, "en")).toDF("doc_id", "text", "lang")
    val out = TextStats.zipfFit(docs, minFreq = 1L).collect()
    assert(out.length === 1)
    val (n, slope) = (out(0).getLong(1), out(0).getLong(2))
    assert(n === 6L)
    assert(math.abs(slope + 1000000L) < 5000L,
      s"quantized-log OLS of exact Zipf must read ≈ -1.000000: $slope")
  }

  test("sampleMixture with only-absent sources yields an empty sample, not an error") {
    val out = TextStats.sampleMixture(mixCorpus, Map("nope" -> 1.0))
    assert(out.count() === 0L)
  }

  test("vocabCoverage with vocabSize beyond the vocabulary covers everything") {
    val docs = Seq((1L, "a b c"), (2L, "c d")).toDF("doc_id", "text")
    val out = TextStats.vocabCoverage(docs, vocabSize = 1000).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L), "no token can be OOV")
  }

  test("dsirWeights: target-resembling docs score above raw-only docs; identical docs tie exactly") {
    // guard the fixture's premise: the two probe tokens must land in
    // different hash buckets (md5-derived, stable — not a coin flip)
    def bucket(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(12, 15), 16) % 1024
    }
    assert(bucket("aa") !== bucket("zz"))
    val docs = Seq(
      (1L, "aa aa aa", "en", "s"), (2L, "aa aa aa", "en", "s"),
      (3L, "zz zz zz", "fr", "s"), (4L, "aa zz aa", "fr", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextStats.dsirWeights(docs, targetLang = "en",
      buckets = 1024).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.values.forall(_._1 == 3L), "n_tokens")
    assert(out(1L)._2 === out(2L)._2, "identical docs score identically")
    assert(out(1L)._2 > out(4L)._2, "pure-target beats mixed")
    assert(out(4L)._2 > out(3L)._2, "mixed beats never-in-target")
    assert(out(3L)._2 < 0L, "a bucket absent from target scores negative")
  }

  test("piiSpans/piiScrub: planted contacts extracted per class, redacted in class order, clean docs untouched") {
    val docs = Seq(
      (1L, "mail bob.smith@corp.example.org and alice@x.io now"),
      (2L, "server 192.168.0.1 ssn 123-45-6789 call 555-123-4567"),
      (3L, "clean text only"),
      // checksum classes: a Luhn-valid card, a Luhn-FAILING card, a
      // mod-97-valid IBAN, a mod-97-FAILING IBAN, an ipv6 address
      (4L, "card 4111-1111-1111-1111 or 4111-1111-1111-1112 done"),
      (5L, "acct GB82WEST12345698765432 alt GB82WEST12345698765431"),
      (6L, "via 2001:0db8:85a3:0000:0000:8a2e:0370:7334 net"))
      .toDF("doc_id", "text")
    val spans = TextStats.piiSpans(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(spans === Set(
      (1L, "email", 0L, "bob.smith@corp.example.org"),
      (1L, "email", 1L, "alice@x.io"),
      (2L, "ipv4", 0L, "192.168.0.1"),
      (2L, "ssn", 0L, "123-45-6789"),
      (2L, "phone", 0L, "555-123-4567"),
      // the invalid card/IBAN are shape candidates but FAIL their
      // checksum — dropped from the audit, leaving the idx gap
      (4L, "ccard", 0L, "4111-1111-1111-1111"),
      (5L, "iban", 0L, "GB82WEST12345698765432"),
      (6L, "ipv6", 0L, "2001:0db8:85a3:0000:0000:8a2e:0370:7334")),
      spans.toString)
    val scrub = TextStats.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getString(8)))).toMap
    assert(scrub(1L) === ((2L, 0L, 0L, 0L, 0L, 0L, 0L,
      "mail <EMAIL> and <EMAIL> now")), scrub(1L).toString)
    assert(scrub(2L) === ((0L, 1L, 1L, 1L, 0L, 0L, 0L,
      "server <IPV4> ssn <SSN> call <PHONE>")), scrub(2L).toString)
    assert(scrub(3L) === ((0L, 0L, 0L, 0L, 0L, 0L, 0L, "clean text only")),
      "a contact-free document passes through byte-identical")
    // the scrub is SHAPE-based: both cards/IBANs count and redact;
    // column order is (ipv6, iban, ccard) — iban redacts BEFORE
    // ccard so an account's digit tail can't be split mid-IBAN
    assert(scrub(4L) === ((0L, 0L, 0L, 0L, 0L, 0L, 2L,
      "card <CCARD> or <CCARD> done")), scrub(4L).toString)
    // each IBAN's 14-digit tail also shape-matches ccard on the
    // ORIGINAL text (counts are independent per class), but the
    // redaction sees whole <IBAN> placeholders
    assert(scrub(5L) === ((0L, 0L, 0L, 0L, 0L, 2L, 2L,
      "acct <IBAN> alt <IBAN>")), scrub(5L).toString)
    assert(scrub(6L) === ((0L, 0L, 0L, 0L, 1L, 0L, 0L,
      "via <IPV6> net")), scrub(6L).toString)
    // idx is the ORIGINAL occurrence index: an invalid-then-valid
    // card keeps the valid span at idx 1, leaving the visible gap
    val gap = TextStats.piiSpans(Seq(
      (7L, "card 4111-1111-1111-1112 then 4111-1111-1111-1111 ok"))
      .toDF("doc_id", "text")).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    assert(gap.toSeq === Seq(("ccard", 1L, "4111-1111-1111-1111")),
      gap.mkString(","))
  }

  test("mixture targets are scale-invariant in the weights: raw corpus sizes give the 4/2/1/1 proportions") {
    import spark.implicits._
    val docs = (
      (0 until 40).map(i => (i.toLong, "w", "a")) ++
      (0 until 10).map(i => (100L + i, "w", "d"))).toDF("doc_id", "text", "source")
    def targets(w: Map[String, Double]) =
      TextStats.mixtureReport(docs, w).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
    val small = targets(Map("a" -> 4.0, "d" -> 1.0))
    val huge = targets(Map("a" -> 4.0e9, "d" -> 1.0e9))
    assert(small === Map("a" -> 800000L, "d" -> 200000L), small.toString)
    assert(huge === small,
      s"weights are relative — magnitude must not matter: $huge")
    // a weight under 1e-6 of the total would silently vanish: reject
    val tiny = intercept[IllegalArgumentException] {
      TextStats.mixtureReport(docs, Map("a" -> 2e7, "d" -> 1.0)).collect()
    }
    assert(tiny.getMessage.contains("quantize to 0"), tiny.getMessage)
  }

  test("sourceQualityReport: duplicate-heavy source reads its dup rate; all-singleton vocab carries NULL slope") {
    // 'dup': three identical 60-token docs (two are near-dup losers;
    // every term has freq 3 and a constant ln-freq fits slope 0);
    // 'uniq': two disjoint-vocabulary docs (no pairs; every term is a
    // singleton, pruned by minFreq=2 -> no zipf row -> NULL columns)
    val dupText = (1 to 60).map(i => s"dup$i").mkString(" ")
    val docs = (
      (1 to 3).map(i => (i.toLong, dupText, "dup")) ++
      (1 to 2).map(i => (10L + i,
        (1 to 60).map(k => s"u${i}x$k").mkString(" "), "uniq"))
    ).toDF("doc_id", "text", "source")
    val out = graft.llm.Curate.sourceQualityReport(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), r.getLong(6), r.getLong(7))))
      .toMap
    // full-corpus dup columns: the two near-dup losers, exact rate
    assert(out("dup") === ((3L, 3L, 1000000L, Some(60L), Some(0L),
      2L, 666666L)), out("dup").toString)
    assert(out("uniq") === ((2L, 2L, 1000000L, None, None,
      0L, 0L)), out("uniq").toString)
  }

  test("boilerplateLines/Scrub: shared lines flagged at minDf, blanks never, rebuild keeps order") {
    import spark.implicits._
    // 3 docs share a header; docs 0/1 share a footer; bodies unique;
    // doc 0 carries a whitespace-only line; doc 2 is ALL boilerplate
    val docs = Seq(
      (0L, "HEADER\nbody zero\n  \nFOOTER"),
      (1L, "HEADER\nbody one\nFOOTER"),
      (2L, "HEADER")).toDF("doc_id", "text")
    val lines = TextStats.boilerplateLines(docs, minDf = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(lines((0L, 0L)) === (("HEADER", 3L, true)))
    assert(lines((0L, 1L)) === (("body zero", 1L, false)))
    // whitespace-only: df reports 0 and never flags
    assert(lines((0L, 2L)) === (("  ", 0L, false)))
    assert(lines((0L, 3L)) === (("FOOTER", 2L, true)))
    assert(lines((2L, 0L)) === (("HEADER", 3L, true)))
    val scrub = TextStats.boilerplateScrub(docs, minDf = 2L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(scrub(0L) === ((4L, 2L, "body zero\n  ")))
    assert(scrub(1L) === ((3L, 2L, "body one")))
    // everything removed → empty string, counts still reported
    assert(scrub(2L) === ((1L, 1L, "")))
  }

  test("boilerplateLines normalized: digit-masked footers and re-indented banners unify; exact keys miss them") {
    import spark.implicits._
    // "Page N" differs per doc (exact df 1); doc 0's banner is
    // re-indented (exact df 1 vs 2 for the others); bodies unique
    val docs = Seq(
      (0L, "Page 1 of 9\n(c)  Press\nbody aa"),
      (1L, "Page 2 of 9\n(c) Press\nbody bb"),
      (2L, "Page 3 of 9\n(c) Press\nbody cc")).toDF("doc_id", "text")
    val exact = TextStats.boilerplateLines(docs, minDf = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(4)).toMap
    assert(!exact((0L, 0L)) && !exact((1L, 0L)),
      "exact keys can't see the page footer family")
    assert(!exact((0L, 1L)) && exact((1L, 1L)),
      "exact keys miss the re-indented doc-0 banner")
    val norm = TextStats.boilerplateLines(docs, minDf = 2L,
      normalized = true).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getBoolean(4)))).toMap
    // original text is preserved in the output; only the KEY masks
    assert(norm((0L, 0L)) === (("Page 1 of 9", 3L, true)))
    assert(norm((0L, 1L)) === (("(c)  Press", 3L, true)))
    assert(norm((2L, 1L)) === (("(c) Press", 3L, true)))
    assert(norm((1L, 2L)) === (("body bb", 1L, false)))
    val scrub = TextStats.boilerplateScrub(docs, minDf = 2L,
      normalized = true).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(scrub(0L) === ((3L, 2L, "body aa")))
  }

  test("boilerplateIncremental: delta lines flag against seen∪delta df; only delta rows emit") {
    import spark.implicits._
    // seen corpus carries FOOT on two docs; the delta introduces BANR
    // twice (flags via its own repetition) and one FOOT (flags via
    // the standing seen df); bodies stay unique
    val seen = Seq(
      (0L, "FOOT\nold zero"), (1L, "FOOT\nold one")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "BANR\nnew ten\nFOOT"),
      (11L, "BANR\nnew eleven")).toDF("doc_id", "text")
    val out = TextStats.boilerplateIncremental(delta, seen).collect()
      .map(r => (r.getLong(0), r.getString(2)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.keySet.forall(_._1 >= 10L), "seen docs emit no rows")
    assert(out((10L, "BANR")) === ((2L, true)),
      "a banner introduced BY the delta flags on intra-delta df")
    assert(out((10L, "FOOT")) === ((3L, true)),
      "one new occurrence flags against the standing seen df")
    assert(out((10L, "new ten")) === ((1L, false)))
    assert(out((11L, "new eleven")) === ((1L, false)))
  }

  test("piiBySource: incidence and per-class totals roll up per source; clean source reads zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a@x.io and b@y.io", "s0"),
      (2L, "clean words only", "s0"),
      (3L, "call 555-123-4567", "s1"),
      (4L, "also clean", "s2")).toDF("doc_id", "text", "source")
    val out = TextStats.piiBySource(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5), r.getLong(10)))).toMap
    // tuple = (n_docs, docs_with_pii, n_email, n_phone, pii_rate_q6)
    assert(out("s0") === ((2L, 1L, 2L, 0L, 500000L)), out("s0").toString)
    assert(out("s1") === ((1L, 1L, 0L, 1L, 1000000L)), out("s1").toString)
    assert(out("s2") === ((1L, 0L, 0L, 0L, 0L)), out("s2").toString)
  }

  test("temperatureCurve: alpha=1 reproduces raw proportions with zero error; flattening upweights the smallest source") {
    val out = TextStats.temperatureCurve(mixCorpus, alphas = Seq(0.5, 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(out.size === 8, "2 alphas x 4 sources")
    // alpha = 1: every rate is 1 (T = min n/n = 1), the draw keeps the
    // whole corpus and achieved == target == n_s/N exactly -> err 0
    for (s <- Seq("a", "b", "c", "d")) {
      val (n, drawn, tgt, ach, err) = out((100L, s))
      assert(drawn === n, s"alpha=1 keeps all of $s")
      assert(err === 0L, s"alpha=1 err for $s: $tgt vs $ach")
    }
    assert(out((100L, "a"))._3 === 533333L) // 800/1500 floored x1e6
    assert(out((100L, "d"))._3 === 66666L)  // 100/1500
    // alpha = 0.5 flattens: the smallest source's target share RISES
    // and the largest source's falls; the argmin source still keeps
    // every doc (rate 1 at the argmin of n/w = n^(1-alpha))
    assert(out((50L, "d"))._3 > out((100L, "d"))._3)
    assert(out((50L, "a"))._3 < out((100L, "a"))._3)
    assert(out((50L, "d"))._2 === 100L, "smallest source keeps everything")
    // targets sum to ~1e6 within per-source flooring at both settings
    for (aq <- Seq(50L, 100L)) {
      val ts = Seq("a", "b", "c", "d").map(s => out((aq, s))._3).sum
      assert(ts > 1000000L - 8L && ts <= 1000000L, s"alpha=$aq: $ts")
    }
  }

  test("piiPrecisionBySource: Luhn/mod-97 verdicts roll up per source and class; clean sources have no row") {
    import spark.implicits._
    val docs = Seq(
      // one Luhn-valid and one Luhn-failing card
      (1L, "pay 4111-1111-1111-1111 or 4111-1111-1111-1112 today", "s0"),
      // one mod-97-valid and one failing IBAN; their 14-digit tails
      // ALSO shape-match ccard (classes count independently on the
      // original text) and both fail Luhn — the low-precision read
      // that tells a reviewer "order-id-like runs, not real cards"
      (2L, "acct GB82WEST12345698765432 ref", "s1"),
      (3L, "acct GB82WEST12345698765431 ref", "s1"),
      (4L, "clean text only", "s2")).toDF("doc_id", "text", "source")
    val out = TextStats.piiPrecisionBySource(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("s0", "ccard")) === ((2L, 1L, 500000L)), out.toString)
    assert(out(("s1", "iban")) === ((2L, 1L, 500000L)), out.toString)
    assert(out(("s1", "ccard")) === ((2L, 0L, 0L)), out.toString)
    assert(out.size === 3, "candidate-free (source, class) pairs have no row")
  }

  test("mixturePlan: under-capacity source caps rate at 1 and reads its repeat factor") {
    import spark.implicits._
    // a: 800 docs × 3 tokens = 2400; d: 100 × 3 = 300. Weights 1:1,
    // budget 1000 → share 0.5, target 500 each: a downsamples at
    // 500/2400, d must repeat at 500/300 (epochs > 1, rate capped)
    val plan = TextStats.mixturePlan(mixCorpus,
        Map("a" -> 1.0, "d" -> 1.0), budgetTokens = 1000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(plan.keySet === Set("a", "d"), "unweighted sources are absent")
    assert(plan("a") === ((800L, 2400L, 500000L, 500L,
      floorQ6(500.0 / 2400.0), floorQ6(500.0 / 2400.0))))
    assert(plan("d") === ((100L, 300L, 500000L, 500L,
      1000000L, floorQ6(500.0 / 300.0))))
  }

  test("mixtureReport: an absent planned source renormalizes targets over the present ones") {
    // plan a:1, d:1, zz:2 but zz has no corpus docs: the sampler's
    // rates make achieved proportions sum to 1 over the PRESENT
    // sources, so targets must renormalize the same way — otherwise
    // both present sources would read a phantom err while the draw is
    // exactly on the mix it was able to run
    val out = TextStats.mixtureReport(mixCorpus,
        Map("a" -> 1.0, "d" -> 1.0, "zz" -> 2.0))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(5)))).toMap
    assert(out.keySet === Set("a", "d"), "the absent source has no row")
    assert(out("a")._1 === 500000L && out("d")._1 === 500000L,
      "targets renormalize over the present planned sources")
    // the draw is the identical two-source draw -> identical errs
    val two = TextStats.mixtureReport(mixCorpus, Map("a" -> 1.0, "d" -> 1.0))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(out.view.mapValues(_._2).toMap === two)
  }

  test("mixturePlan: an absent planned source never strands budget — present sources absorb it all") {
    val plan = TextStats.mixturePlan(mixCorpus,
        Map("a" -> 1.0, "d" -> 1.0, "zz" -> 2.0), budgetTokens = 1000L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(plan.keySet === Set("a", "d"))
    assert(plan("a")._1 === 500000L && plan("d")._1 === 500000L,
      "shares renormalize over the present planned sources")
    assert(plan.values.map(_._2).sum === 1000L,
      "the full budget is allocated across the present sources")
  }

  test("mixturePlan: the flooring remainder lands on the largest-weight source — targets sum to the budget exactly") {
    // three equal-weight present sources, budget 1000: floors give
    // 333 each (999); the 1-token remainder goes to the wq-tie's
    // lexicographically first source ("a"), and its epochs read the
    // ADJUSTED 334 (a has 2400 tokens -> floor(334/2400 * 1e6))
    val plan = TextStats.mixturePlan(mixCorpus,
        Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), budgetTokens = 1000L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getLong(6)))).toMap
    assert(plan.keySet === Set("a", "b", "c"))
    assert(plan("a")._1 === 334L, s"remainder to 'a': $plan")
    assert(plan("b")._1 === 333L && plan("c")._1 === 333L, plan.toString)
    assert(plan.values.map(_._1).sum === 1000L,
      "targets sum to the budget EXACTLY")
    assert(plan("a")._2 === floorQ6(334.0 / 2400.0),
      "epochs read the adjusted allocation")
  }

  test("packEfficiency: hand-traced fills, oversize and straddle counts per stream") {
    import spark.implicits._
    // stream 0 (ids 0,2,4): 3,4,6 tokens → cums 3,7,13, bins 0,0,1;
    // doc 2 spans [3,7) and doc 4 spans [7,13) — both cross a 4-token
    // boundary; doc 4 is oversize. stream 1 (ids 1,3,5): 2,2,4 →
    // cums 2,4,8, bins 0,0,1; doc 5 spans [4,8) exactly — no straddle.
    val docs = Seq(
      (0L, "a b c"), (1L, "a b"), (2L, "a b c d"),
      (3L, "a b"), (4L, "a b c d e f"), (5L, "a b c d")
    ).toDF("doc_id", "text")
    val out = TextStats.packEfficiency(docs, contextLen = 4, streams = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out(0L) === ((3L, 13L, 2L, floorQ6(13.0 / 8.0), 1L, 2L)))
    assert(out(1L) === ((3L, 8L, 2L, 1000000L, 0L, 0L)))
  }

  private def floorQ6(x: Double): Long = math.floor(x * 1e6).toLong
}
