package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.expr
import graft.llm.Dedup

/** Pins the dedup operators on a corpus with planted near-duplicates:
  * exact Jaccard finds exactly the planted pairs, MinHash-LSH (the
  * scale path) reproduces the exact result, simhash separates
  * near-dups from unrelated docs. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic corpus: 20 base docs of 40 tokens with per-doc
  // disjoint vocabularies (zero cross-doc shingle overlap); docs
  // 100..104 are near-copies of docs 0..4 with one token changed
  private def baseText(d: Int) =
    (0 until 40).map(k => s"t${d}_$k").mkString(" ")
  /** [[corpus]] plus a planted 7-doc identical cluster (doc 7 + six
    * copies at ids 200+): its C(7,2) = 21 pairs all sit at jaccard
    * 1.0 (band 9), every one of its shingles has df = 7, and every
    * band bucket it occupies holds 7 docs — the biting-cap fixture
    * shared by the MinHash maxBucket and capped-Jaccard audit pins. */
  private def megaCorpus = {
    val mega = (0 until 6).map(i => (200L + i, baseText(7)))
    val bases = (0 until 20).map(d => (d.toLong, baseText(d)))
    val dups = (0 until 5).map { d =>
      val toks = baseText(d).split(" ").toVector.updated(20, "CHANGED")
      (100L + d, toks.mkString(" "))
    }
    (bases ++ dups ++ mega).toDF("doc_id", "text")
  }

  private def corpus = {
    val bases = (0 until 20).map(d => (d.toLong, baseText(d)))
    val dups = (0 until 5).map { d =>
      val toks = baseText(d).split(" ").toVector.updated(20, "CHANGED")
      (100L + d, toks.mkString(" "))
    }
    (bases ++ dups).toDF("doc_id", "text")
  }

  test("exact n-gram Jaccard finds exactly the planted pairs") {
    val pairs = Dedup.ngramJaccardPairs(corpus, n = 3, theta = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0 until 5).map(d => (d.toLong, 100L + d)).toSet)
  }

  test("MinHash-LSH pairs == exact pairs (scale path, verified candidates)") {
    val exact = Dedup.ngramJaccardPairs(corpus, n = 3, theta = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLshPairs(corpus, n = 3, numHashes = 128,
      bands = 32, theta = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === exact)
  }

  test("minhash maxBucket drops only over-cap identical groups — bounded fan-out") {
    // a mega-group: 20 byte-identical docs (disjoint vocabulary from
    // the base corpus) — every one of its band buckets holds all 20
    val mega = (0 until 20).map(i => (1000L + i, baseText(50)))
    val withMega = (corpus.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ++ mega)
      .toDF("doc_id", "text")
    val planted = (0 until 5).map(d => (d.toLong, 100L + d)).toSet
    val megaPairs = (for {
      i <- 0 until 20; j <- i + 1 until 20
    } yield (1000L + i, 1000L + j)).toSet
    val uncapped = Dedup.minhashLshPairs(withMega, theta = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped === planted ++ megaPairs)
    // cap 8 < 20: the identical group's buckets are ALL over cap in
    // every band, so its pairs drop; two-doc near-dup buckets survive
    val capped = Dedup.minhashLshPairs(withMega, theta = 0.5, maxBucket = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === planted)
  }

  test("hot-shingle df-cap bounds the candidate fan-out, keeps real pairs") {
    import org.apache.spark.sql.functions.{concat, lit}
    // plant one ubiquitous phrase in EVERY doc: without a df-cap the
    // inverted index fans out 25² candidate rows on that one shingle
    val hot = corpus.select($"doc_id",
      concat($"text", lit(" the end of doc")).as("text"))
    // at theta=0 every candidate pair is reported, so the pair count
    // exposes the fan-out directly: uncapped sees all 25*24/2 pairs
    // through the hot shingle, capped only the 5 real-overlap pairs
    val uncapped = Dedup.ngramJaccardPairs(hot, n = 3, theta = 0.0).count()
    assert(uncapped === 300L)
    val capped = Dedup.ngramJaccardPairs(hot, n = 3, theta = 0.0, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === (0 until 5).map(d => (d.toLong, 100L + d)).toSet)
    // real pairs also survive the cap at the usual threshold
    val atTheta = Dedup.ngramJaccardPairs(hot, n = 3, theta = 0.5, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atTheta === (0 until 5).map(d => (d.toLong, 100L + d)).toSet)
  }

  test("dup clusters: transitive pairs collapse to one keeper per component") {
    import spark.implicits._
    // components: {1,2,3,9} via a chain (1-2, 2-3, 3-9), {5,6}, and
    // 7-8 plus 8-4 merging into {4,7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L), (7L, 8L), (4L, 8L))
      .toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out === Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (9L, 1L, false),
      (5L, 5L, true), (6L, 5L, false),
      (4L, 4L, true), (7L, 4L, false), (8L, 4L, false)))
  }

  test("clusterRepresentatives: highest quality wins, ties break to lowest id, singletons absent") {
    import spark.implicits._
    // components: {1,2,3} and {5,6}; doc 4 never pairs → not emitted
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val docs = Seq((1L, 10L), (2L, 40L), (3L, 40L), (4L, 99L),
      (5L, 7L), (6L, 3L)).toDF("doc_id", "n_chars")
    val out = Dedup.clusterRepresentatives(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(out === Set(
      // 2 and 3 tie on quality 40 → lowest doc_id (2) is kept
      (1L, 1L, 10L, false), (2L, 1L, 40L, true), (3L, 1L, 40L, false),
      (5L, 5L, 7L, true), (6L, 5L, 3L, false)))
    // exactly one keeper per cluster
    val keepers = out.filter(_._4).groupBy(_._2).view.mapValues(_.size)
    assert(keepers.values.forall(_ == 1) && keepers.size == 2)
  }

  test("contamination flags exactly the docs sharing probe n-grams") {
    // probe = first four tokens of doc 0 → two 3-gram shingles; doc 0
    // and its near-copy 100 (token 20 changed) both contain them
    val hits = Dedup.contamination(corpus, Seq("t0_0 t0_1 t0_2 t0_3"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits.keySet === Set(0L, 100L))
    assert(hits(0L) === 2L && hits(100L) === 2L)
    // a probe with no corpus overlap flags nothing
    assert(Dedup.contamination(corpus, Seq("zz_1 zz_2 zz_3")).count() === 0L)
  }

  test("minhash LSH releases its shingle cache — storage does not grow across calls") {
    val q = SparkEntry.queries("dedup_minhash_lsh")
    def bigCached: Int = spark.sparkContext.getRDDStorageInfo
      .count(i => i.memSize + i.diskSize > (1L << 20))
    q(spark, "/root/testdata/sf0.01").count()
    q(spark, "/root/testdata/sf0.01").count()
    // the shingle frame (the one large persist in the pipeline) was
    // unpersisted before the entry returned; only the tiny checkpointed
    // pair sets may remain
    assert(bigCached === 0,
      spark.sparkContext.getRDDStorageInfo.map(i => (i.name, i.memSize, i.diskSize)).mkString("\n"))
  }

  test("repetition signals: loops score high, diverse text low, short docs zero") {
    import graft.llm.TextStats
    val docs = Seq(
      (1L, "spam spam spam spam spam spam", "en", "s", 29L), // one bigram repeated
      (2L, "the quick brown fox jumps over dog", "en", "s", 34L), // all distinct
      (3L, "one", "en", "s", 3L), // too short for any n-gram
      (4L, "a b c a b c a b c", "en", "s", 17L)) // repeating trigram loop
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextStats.repetition(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) === ((1000000L, 750000L))) // 5×"spam spam"; 4 trigrams 1 distinct
    assert(r(2L) === ((166666L, 0L))) // floor-q6, like every fixed-point entry
    assert(r(3L) === ((0L, 0L)))
    assert(r(4L)._2 > 500000L) // looped trigrams are mostly duplicates
  }

  test("exact groups: identical content collapses, hash is stable") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val g = Dedup.exactGroups(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(g === Set((1L, 2L), (3L, 1L)))
  }

  test("simhash: near-dup hamming distance < unrelated hamming distance") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hashes = Dedup.simhash(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val near = ham(hashes(0L), hashes(100L))
    val far = ham(hashes(0L), hashes(13L))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 15)
  }

  test("simhash banded pairs == exact Hamming scan — pigeonhole recall") {
    // sliding 21-token windows over a 23-word vocab: adjacent docs
    // share 20/21 tokens, so their simhashes sit within a few bits
    val docs = (0L until 40L)
      .map(i => (i, (0 to 20).map(j => s"w${(i + j) % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    val banded = Dedup.simhashPairs(docs, maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sig = Dedup.simhash(docs)
    val exact = sig.as("a")
      .join(sig.as("b"), org.apache.spark.sql.functions.expr("a.doc_id < b.doc_id"))
      .selectExpr("a.doc_id AS id_a", "b.doc_id AS id_b",
        "CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT) AS h")
      .where("h <= 3")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "test premise: sliding windows must give close sims")
    assert(banded === exact)
  }

  test("simhashRecallAudit: bands replay the truth-vs-candidate join exactly; misses decrement recall") {
    // corpus: planted near-copies (jaccard ~0.9, band 9) — replay the
    // audit's join in the test from the two public operator outputs
    // and require the banded table to match it row for row
    val truth = Dedup.ngramJaccardPairs(corpus, n = 3, theta = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val caught = Dedup.simhashPairs(corpus, maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test premise: planted pairs exist")
    val expected = truth
      .groupBy { case (_, j) => math.min(math.floor(j * 10).toLong, 9L) }
      .map { case (band, ps) =>
        val nTrue = ps.length.toLong
        val nHit = ps.count(p => caught(p._1)).toLong
        (band, nTrue, nHit, nHit * 1000000L / nTrue)
      }.toSet
    val audit = Dedup.simhashRecallAudit(corpus, n = 3, theta = 0.5,
      maxDist = 3, bands = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(audit === expected, s"audit=$audit expected=$expected")
    // every count is bounded by the truth side — a candidate pair
    // OUTSIDE the truth set must never inflate a band
    assert(audit.forall { case (_, t, c, r) => c <= t && r <= 1000000L })
  }

  test("simhashRecallAudit sampleMod == the unsampled audit over the md5-filtered subset") {
    // the scale path must be a pure input restriction — the audit of
    // the sampled slice, not a different statistic
    val mod = 2L
    val slice = corpus.where(expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
      % mod === 0)
    assert(slice.count() > 0 && slice.count() < corpus.count(),
      "test premise: the draw splits the corpus")
    val sampled = Dedup.simhashRecallAudit(corpus, n = 3, theta = 0.5,
      maxDist = 3, bands = 4, sampleMod = mod).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val direct = Dedup.simhashRecallAudit(slice, n = 3, theta = 0.5,
      maxDist = 3, bands = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sampled === direct, s"sampled=$sampled direct=$direct")
    // adaptive mode (the default) stays a FULL audit below the
    // target, and collapses to the explicit-mod audit above it
    val full = Dedup.simhashRecallAudit(corpus, n = 3, theta = 0.5,
      maxDist = 3, bands = 4, sampleMod = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val adaptive = Dedup.simhashRecallAudit(corpus, n = 3, theta = 0.5,
      maxDist = 3, bands = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(adaptive === full, "below sampleTarget the adaptive audit is the full audit")
    val adaptiveTight = Dedup.simhashRecallAudit(corpus, n = 3, theta = 0.5,
      maxDist = 3, bands = 4, sampleTarget = corpus.count() / mod).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(adaptiveTight === sampled,
      "above the target the adaptive mod equals the explicit one")
  }

  test("recall audit MinHash column: 1.0 uncapped; a biting maxBucket loses exactly the over-cap cluster's band") {
    // plant a 7-doc identical cluster (doc 7 + six copies): its C(7,2)
    // = 21 pairs all sit at jaccard 1.0 (band 9), and every band
    // bucket the cluster occupies holds 7 docs — over any cap < 7
    val c2 = megaCorpus
    def audit(cap: Long) = Dedup.simhashRecallAudit(c2, n = 3,
      theta = 0.5, maxDist = 3, bands = 4, mhMaxBucket = cap).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val un = audit(0L)
    val capped = audit(3L)
    // uncapped 128/32 banding recovers the whole truth set — the
    // dedup_minhash_lsh oracle's certified property, per band here
    assert(un.values.forall { case (t, _, _, mc, mr) =>
      mc === t && mr === 1000000L }, un.toString)
    // the cap loses exactly the over-cap cluster's 21 pairs (band 9:
    // the near-copy pairs live there too and keep their occupancy-2
    // buckets), leaving every other band untouched
    assert(capped(9L)._4 === un(9L)._1 - 21L, capped.toString)
    assert(capped(9L)._5 < 1000000L)
    assert(capped.forall { case (b, (_, _, _, mc, _)) => mc <= un(b)._4 },
      "capped recall can never exceed uncapped")
    // the SimHash columns are cap-independent: same candidates,
    // same truth
    assert(capped.view.mapValues(v => (v._1, v._2, v._3)).toMap ===
      un.view.mapValues(v => (v._1, v._2, v._3)).toMap)
  }

  test("bandCurve: nested refinements are pointwise supersets; planted mid-J pairs show the banding contrast; high-J catches everything") {
    // 30 planted pairs at J = 13/23 ≈ 0.565 — the near-θ decile where
    // banding choice matters (the dedup_band_curve_fixture corpus):
    // docs (2k, 2k+1) share a 15-token prefix, 13 of 18 shingles
    val midJ = (0 until 60).map { id =>
      val k = id / 2
      val shared = (0 until 15).map(j => s"s${k}x$j").mkString(" ")
      val unique = (0 until 5).map(j => s"u${id}y$j").mkString(" ")
      (id.toLong, s"$shared $unique")
    }.toDF("doc_id", "text")
    val rows = Dedup.bandCurve(midJ, n = 3, numHashes = 128,
      bandsList = Seq(16, 32, 64), theta = 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(6)))).toMap
    // every true pair sits in decile 5; truth is setting-independent
    assert(rows.keySet === Set(16L, 32L, 64L))
    assert(rows.values.forall(v => v._1 === 5L && v._2 === 30L),
      rows.toString)
    // 128 splits into CONTIGUOUS slices with rows halving, so band
    // sets are nested refinements: agreeing on an 8-row band implies
    // agreeing on both its 4-row halves — candidates and catches are
    // monotone nondecreasing in bands POINTWISE, not just on average
    assert(rows(16L)._3 <= rows(32L)._3 && rows(32L)._3 <= rows(64L)._3,
      rows.toString)
    assert(rows(16L)._4 <= rows(32L)._4 && rows(32L)._4 <= rows(64L)._4,
      rows.toString)
    // the measured contrast the formula caveat predicted: (16,8)
    // misses most near-θ pairs, (64,2) catches them all (measured
    // 6 / 29 / 30 — the values the Curate docstring cites)
    assert(rows(16L)._3 < rows(32L)._3, rows.toString)
    assert(rows(64L)._3 === 30L, rows.toString)
    // high-J consistency with the recall audit's certified-full
    // MinHash column: the identical-cluster corpus's 21 J=1.0 pairs
    // share EVERY minhash, so every banding catches all of band 9 —
    // certainty, not probability
    val hi = Dedup.bandCurve(megaCorpus, n = 3, numHashes = 128,
      bandsList = Seq(16, 32, 64), theta = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val band9 = hi.filter(_._2 === 9L)
    assert(band9.length === 3 && band9.forall(v => v._4 === v._3),
      hi.toString)
  }

  test("bucketCurve: caps keep bucket subsets (pointwise monotone); planted clusters separate the three occupancy regimes") {
    // 20-doc + 8-doc identical clusters + 15 occupancy-2 near-dup
    // pairs at J = 15/21 (the dedup_bucket_curve_fixture corpus)
    def cluster(from: Int, until: Int, tok: String) =
      (from until until).map(id =>
        (id.toLong, (0 until 20).map(j => s"$tok$j").mkString(" ")))
    val pairs = (100 until 130).map { id =>
      val k = (id - 100) / 2
      val shared = (0 until 17).map(j => s"p${k}x$j").mkString(" ")
      val unique = (0 until 3).map(j => s"q${id}y$j").mkString(" ")
      (id.toLong, s"$shared $unique")
    }
    val docs = (cluster(0, 20, "mega") ++ cluster(50, 58, "mid") ++ pairs)
      .toDF("doc_id", "text")
    val rows = Dedup.bucketCurve(docs, n = 3, numHashes = 128, bands = 32,
      caps = Seq(0L, 4L, 16L), theta = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> ((r.getLong(3),
        r.getLong(4), r.getLong(6)))).toMap
    // truth is cap-independent: 218 identical-cluster pairs at band
    // 9 (C(20,2) + C(8,2)), 15 planted pairs at band 7
    assert(rows((0L, 9L))._1 === 218L && rows((0L, 7L))._1 === 15L,
      rows.toString)
    // a smaller cap keeps a SUBSET of buckets — catches and
    // candidates monotone nondecreasing in cap, band by band
    for (b <- Seq(7L, 9L)) {
      assert(rows((4L, b))._2 <= rows((16L, b))._2 &&
        rows((16L, b))._2 <= rows((0L, b))._2, rows.toString)
      assert(rows((4L, b))._3 <= rows((16L, b))._3 &&
        rows((16L, b))._3 <= rows((0L, b))._3, rows.toString)
    }
    // the three regimes: uncapped catches everything; cap 16 loses
    // EXACTLY the 20-doc cluster's 190 pairs (the 8-doc cluster is
    // inside the cap); cap 4 loses both clusters; the occupancy-2
    // pair band rides through every cap
    assert(rows((0L, 9L))._2 === 218L, rows.toString)
    assert(rows((16L, 9L))._2 === 28L, rows.toString)
    assert(rows((4L, 9L))._2 === 0L, rows.toString)
    assert(Seq(0L, 4L, 16L).forall(c => rows((c, 7L))._2 === 15L),
      rows.toString)
  }

  test("recall audit capped-Jaccard column: the df cap loses exactly the hot cluster's band") {
    // the 7-doc identical cluster gives every one of its shingles
    // df = 7: a cap of 3 drops them ALL from the inverted index, so
    // its 21 band-9 pairs vanish from the capped path — while the
    // base/dup pairs ride their df<=2 shingles unharmed; at the
    // default cap 10 nothing on this corpus is hot and jc == truth
    val c2 = megaCorpus
    def audit(cap: Long) = Dedup.simhashRecallAudit(c2, n = 3,
      theta = 0.5, maxDist = 3, bands = 4, jcMaxDf = cap).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(6),
        r.getLong(7)))).toMap
    val free = audit(10L)
    assert(free.values.forall { case (t, jc, jr) =>
      jc === t && jr === 1000000L },
      s"a cap no shingle reaches must be free: $free")
    val biting = audit(3L)
    assert(biting(9L)._2 === free(9L)._1 - 21L, biting.toString)
    assert(biting(9L)._3 < 1000000L)
    assert(biting.forall { case (b, (_, jc, _)) => jc <= free(b)._2 },
      "capped recall can never exceed uncapped")
    // df is corpus-global and thins ~1/mod with the slice, so the
    // graded cap scales: a mod-3 audit at jcMaxDf=9 must equal the
    // direct audit of the slice at cap 9/3 = 3
    val mod = 3L
    val slice = megaCorpus.where(expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
      % mod === 0)
    val scaled = Dedup.simhashRecallAudit(megaCorpus, n = 3, theta = 0.5,
      maxDist = 3, bands = 4, sampleMod = mod, jcMaxDf = 9L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(6), r.getLong(7)))
      .toSet
    val direct = Dedup.simhashRecallAudit(slice, n = 3, theta = 0.5,
      maxDist = 3, bands = 4, jcMaxDf = 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(6), r.getLong(7)))
      .toSet
    assert(scaled === direct, s"scaled=$scaled direct=$direct")
  }

  test("semanticClusters: planted duplicates share a cell and cluster with recall 1.0") {
    // 600 vectors, 2 labels: forces the adaptive sign-prefix split
    // (l * 256 = 512 < 600 -> bits = 1); duplicates are identical
    // vectors, so they share label AND sign prefix by construction
    val rnd = new scala.util.Random(7)
    val base = Seq.tabulate(600) { i =>
      (i.toLong, i % 2, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }
    // plant: 1 := copy of 0, 3 := copy of 2 (cos = 1.0 exactly)
    val planted = base.map {
      case (1L, _, _) => (1L, base(0)._2, base(0)._3)
      case (3L, _, _) => (3L, base(2)._2, base(2)._3)
      case row => row
    }
    val emb = planted.toDF("vec_id", "label", "embedding")
    val out = Dedup.semanticClusters(emb, theta = 0.99)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq === Seq((0L, 0L, true), (1L, 0L, false),
      (2L, 2L, true), (3L, 2L, false)))
  }

  test("semanticRecallAudit: planted duplicates read band-9 recall 1.0; sampling replays the filtered subset exactly") {
    // same 600-vector corpus as the semanticClusters pin: identical
    // copies (cos = 1.0) always share a cell, so the top band's
    // recall is 1e6 by construction
    val rnd = new scala.util.Random(7)
    val base = Seq.tabulate(600) { i =>
      (i.toLong, i % 2, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }
    val planted = base.map {
      case (1L, _, _) => (1L, base(0)._2, base(0)._3)
      case (3L, _, _) => (3L, base(2)._2, base(2)._3)
      case row => row
    }
    val emb = planted.toDF("vec_id", "label", "embedding")
    val full = Dedup.semanticRecallAudit(emb, theta = 0.99, sampleMod = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(full(9L)._1 >= 2L, s"both planted pairs are truth rows: $full")
    assert(full(9L)._3 === 1000000L,
      s"identical copies always share a cell: $full")
    // adaptive/sampled run == the unsampled audit over the md5-kept
    // subset (the simhashRecallAudit sampling pin)
    val hv = "CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    val kept = emb.where(expr(s"$hv % 3 = 0"))
    val sampled = Dedup.semanticRecallAudit(emb, theta = 0.45, sampleMod = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val replay = Dedup.semanticRecallAudit(kept, theta = 0.45, sampleMod = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(sampled === replay, s"$sampled vs $replay")
  }

  test("incrementalFromIndex: identical delta doc estimates exactly 1e6; near-dups match through the index alone; disjoint docs silent") {
    // seen = bases 0..19 via their standing signature INDEX only;
    // delta = the 5 near-copies (J = 35/41 ≈ 0.854) + an identical
    // copy of doc 7 (every minhash component equal -> est exactly 1e6)
    val seen = corpus.where(expr("doc_id < 100"))
    val delta = corpus.where(expr("doc_id >= 100"))
      .unionAll(Seq((300L, baseText(7))).toDF("doc_id", "text"))
    val idx = Dedup.minhashIndex(seen)
    val out = Dedup.incrementalFromIndex(delta, idx, theta = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out((7L, 300L)) === 1000000L,
      s"identical copy agrees on every component: $out")
    for (d <- 0L until 5L)
      assert(out.contains((d, 100L + d)) &&
        out((d, 100L + d)) >= 600000L && out((d, 100L + d)) < 1000000L,
        s"near-dup $d: $out")
    assert(out.size === 6, s"disjoint-vocabulary docs never pair: $out")
  }

  test("semanticThetaCurve: counts pointwise non-increasing in theta; cross-label sim-1 pairs missed at every theta; top-theta row hand-traced") {
    // the entry fixture's 18 integer dim-4 vectors (2 labels, bits=0
    // -> cell = label): a 10-identical cluster (ids 0-9, label 0),
    // B=[3,1]/C=[3,-1] (sim 0.8), D=[2,1] duplicated across labels
    // (ids 12/13 — the cross-cluster blind spot), E=[1,1], F=[1,0]
    // (label-1 copy of the cluster vector), G/H orthogonal-ish
    val emb = spark.range(18).selectExpr("id AS vec_id",
      "CASE WHEN id <= 12 THEN 0L ELSE 1L END AS label",
      """CASE WHEN id <= 9 THEN array(1D, 0D, 0D, 0D)
        |     WHEN id = 10 THEN array(3D, 1D, 0D, 0D)
        |     WHEN id = 11 THEN array(3D, -1D, 0D, 0D)
        |     WHEN id IN (12, 13) THEN array(2D, 1D, 0D, 0D)
        |     WHEN id = 14 THEN array(1D, 1D, 0D, 0D)
        |     WHEN id = 15 THEN array(1D, 0D, 0D, 0D)
        |     WHEN id = 16 THEN array(1D, 0D, 1D, 0D)
        |     ELSE array(1D, 0D, 0D, 1D) END AS embedding""".stripMargin)
    val out = Dedup.semanticThetaCurve(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val qs = Seq(45L, 60L, 75L, 90L)
    assert(out.keySet === qs.toSet, out.toString)
    // raising theta filters the SAME sim column -> every count is
    // pointwise non-increasing
    for (Seq(lo, hi) <- qs.sliding(2)) {
      assert(out(lo)._1 >= out(hi)._1, s"n_pairs $lo->$hi: $out")
      assert(out(lo)._2 >= out(hi)._2, s"n_docs_dup $lo->$hi: $out")
      assert(out(lo)._3 >= out(hi)._3, s"n_true $lo->$hi: $out")
      assert(out(lo)._4 >= out(hi)._4, s"n_caught $lo->$hi: $out")
    }
    // cross-label sim-1.0 pairs (12,13) and (0-9,15) sit in truth at
    // every theta but can never share a cell
    for (q <- qs) assert(out(q)._5 < 1000000L, s"recall at $q: $out")
    // theta = 0.9 hand-trace: truth = 45 (cluster) + 10 (A-B at
    // 3/sqrt10) + 10 (A-C) + 10 (A-F cross-label 1.0) + B-D 0.9899 +
    // B-D' + B-F + C-F + D-D' 1.0 + D-E + D'-E = 82; within-cell =
    // 45 + 10 + 10 + B-D + D'-E = 67 -> recall 67e6 DIV 82
    assert(out(90L)._1 === 67L, s"n_pairs@90: $out")
    assert(out(90L)._2 === 15L, s"n_docs_dup@90: $out")
    assert(out(90L)._3 === 82L, s"n_true@90: $out")
    assert(out(90L)._4 === 67L, s"n_caught@90: $out")
    assert(out(90L)._5 === 817073L, s"recall@90: $out")
  }

  test("substring dup-spans: shared passages counted exactly, disjoint docs zero") {
    // corpus: docs 0..19 have disjoint vocabularies (zero shared
    // windows); 100..104 are near-copies of 0..4 with token 20
    // changed. With n=5, a 40-token doc has 36 windows and the
    // changed token kills exactly the 5 windows covering position 20.
    val byId = Dedup.dupSpans(corpus, n = 5).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    (0L until 5L).foreach { d =>
      assert(byId(d) == ((36L, 31L)), s"doc $d: ${byId(d)}")
      assert(byId(100L + d) == ((36L, 31L)), s"copy ${100 + d}: ${byId(100L + d)}")
    }
    (5L until 20L).foreach { d =>
      assert(byId(d) == ((36L, 0L)), s"unrelated doc $d: ${byId(d)}")
    }
  }

  test("incrementalMinhash: delta matches history only — never history×history or delta×delta") {
    // seen corpus: docs 0..19 (disjoint vocabularies); delta: 200/201
    // are near-copies of seen docs 0/1, and 210/211 are near-copies of
    // EACH OTHER but of nothing in history
    def nearCopy(d: Int, id: Long) = {
      val toks = baseText(d).split(" ").toVector.updated(20, s"CHANGED$id")
      (id, toks.mkString(" "))
    }
    val seen = (0 until 20).map(d => (d.toLong, baseText(d))).toDF("doc_id", "text")
    val delta = (Seq(nearCopy(0, 200L), nearCopy(1, 201L)) ++
      Seq((210L, baseText(50)), nearCopy(50, 211L))).toDF("doc_id", "text")
    val out = Dedup.incrementalMinhash(delta, seen).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactly the two history matches; the intra-delta near-dup pair
    // (210, 211) is NOT this operator's job (run the batch dedup on
    // the delta for that) and history never re-pairs with itself
    assert(out === Set((0L, 200L), (1L, 201L)), out.toString)
  }

  test("dupRateBySource: duplicated source reports its non-keeper fraction; clean source reports 0") {
    // "dupey": 4 docs where 101/102 duplicate 100 (one keeper, two
    // dups) and 103 is unique → 2/4 dup rate. "clean": disjoint docs.
    val rows = Seq(
      (100L, baseText(0), "dupey"), (101L, baseText(0), "dupey"),
      (102L, baseText(0), "dupey"), (103L, baseText(10), "dupey"),
      (200L, baseText(20), "clean"), (201L, baseText(21), "clean"))
    val out = Dedup.dupRateBySource(rows.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("dupey") === ((4L, 2L, 500000L)), out.toString)
    assert(out("clean") === ((2L, 0L, 0L)), out.toString)
  }

  test("sourceOverlap: a subset-scrape shows containment 1.0 at low jaccard") {
    // source big = docs 0..9's texts; source scrape = docs 0..1's
    // texts verbatim (a strict subset); source other = disjoint vocab
    val rows =
      (0 until 10).map(d => (d.toLong, baseText(d), "big")) ++
      (0 until 2).map(d => (100L + d, baseText(d), "scrape")) ++
      (0 until 3).map(d => (200L + d, baseText(50 + d), "other"))
    val docs = rows.toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // each 40-token doc has 38 distinct trigram shingles, vocabularies
    // disjoint across docs → big has 380, scrape 76, other 114
    val (inter, jac, cont) = out(("big", "scrape"))
    assert(inter === 76L, s"inter=$inter")
    assert(cont === 1.0, "subset scrape must have containment 1.0")
    assert(jac === math.rint(76.0 / 380 * 1e6) / 1e6, s"jac=$jac")
    // disjoint sources produce NO row (inner join on shared shingles)
    assert(!out.contains(("big", "other")) && !out.contains(("other", "scrape")))
  }
}
