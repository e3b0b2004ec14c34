package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.ColumnOps

/** Property-based contracts (SURVEY §5: hash/normalization/merge-idempotence
  * properties via scalacheck generators; fixed seed for reproducibility). */
class PropertySpec extends AnyFunSuite with Matchers {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(42L)).get

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  test("normalizeName is idempotent and strips the documented characters") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val once = ColumnOps.normalizeName(s)
      ColumnOps.normalizeName(once) shouldBe once
      once should not include " "
      once should not include "."
      once should not include "("
    }
  }

  test("sourceHash: stable, order-sensitive, null-vs-empty collision is contract") {
    val df = Seq(("a", "b"), ("b", "a")).toDF("x", "y")
    val h = df.select(ColumnOps.sourceHash(Seq("x", "y")).as("h"))
      .collect().map(_.getString(0))
    h(0) should not be h(1) // column ORDER is part of the hash

    // concat_ws skips nulls: (null,"ab") and ("ab",null) collide —
    // documented reference behavior, reproduced not fixed
    val n = Seq((Option.empty[String], Some("ab")), (Some("ab"), Option.empty[String]))
      .toDF("x", "y")
      .select(ColumnOps.sourceHash(Seq("x", "y")).as("h"))
      .collect().map(_.getString(0))
    n(0) shouldBe n(1)
  }

  test("merge is idempotent: re-merging the same slice only touches lastSeen") {
    import graft.tables.{ManagedTable, MergeInto}
    val t = ManagedTable(spark,
      java.nio.file.Files.createTempDirectory("graft-prop").toString + "/t")
    val data = Seq((1, "a"), (2, "b")).toDF("id", "v")
    t.overwriteAll(data)
    val m1 = MergeInto(t, data, "target.id = source.id")
      .whenMatchedUpdateAll(cond = Some("target.v != source.v"))
      .whenNotMatchedInsertAll()
      .execute()
    m1.count("m0") shouldBe 0 // nothing changed
    m1.count("nm1") shouldBe 0 // nothing new
    m1.count("unchanged") shouldBe 2
    t.read().count() shouldBe 2
  }

  test("salted join equals plain join") {
    val facts = Seq.tabulate(200)(i => (i % 3, s"f$i")).toDF("k", "fv")
    val dims = Seq((0, "x"), (1, "y"), (2, "z"), (7, "dead")).toDF("k", "dv")
    val plain = facts.join(dims, "k")
      .select("k", "fv", "dv").collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2))).sorted
    val salted = SkewOps.saltedJoin(facts, dims, "k", salts = 8)
      .select("k", "fv", "dv").collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2))).sorted
    salted shouldBe plain
  }

  test("salted distinct count equals plain distinct count") {
    val df = Seq.tabulate(500)(i => (i % 4, i % 37)).toDF("k", "v")
    val plain = df.groupBy("k").agg(countDistinct("v").as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedDistinctCount(df, col("k"), col("v"), salts = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    salted shouldBe plain
  }

  test("overwriteWhere ≡ (old where NOT pred) ∪ new, across random predicates") {
    import graft.tables.ManagedTable
    // deterministic pseudo-random rows + a predicate family: thresholds
    // over id, equality over the low-cardinality tag, and conjunctions —
    // for each, replaceWhere must land exactly (survivors ∪ replacement)
    val rows = samples(
      Gen.zip(Gen.choose(0, 999), Gen.oneOf("p", "q", "r")), 300)
      .zipWithIndex.map { case ((n, t), i) => (i, n, t) }
    val preds = Seq("n < 250", "tag = 'q'", "n >= 700 AND tag = 'p'",
      "n % 7 = 3", "false")
    preds.foreach { pred =>
      val t = ManagedTable(spark,
        java.nio.file.Files.createTempDirectory("graft-prop").toString + "/t")
      val df = rows.toDF("id", "n", "tag").repartition(4)
      t.overwriteAll(df)
      // an identity replacement (the matching rows themselves) always
      // satisfies the predicate, so the contract reduces to: the table
      // afterwards holds exactly survivors ∪ replacement
      val survivors = df.filter(s"NOT coalesce($pred, false)")
      val replacement = df.filter(pred)
      t.overwriteWhere(replacement, pred)
      val got = t.read().collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted
      val want = (survivors.collect() ++ replacement.collect())
        .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted
      got shouldBe want
    }
  }

  /** Random-corpus generator shared by the text-op properties: short
    * words over a tiny alphabet force heavy cross-document n-gram
    * overlap — the regime that stresses excision/novelty/BPE. */
  private def randomCorpus(nDocs: Int, seedOffset: Long): Seq[(Long, String)] = {
    val word = Gen.choose(1, 3)
      .flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val doc = Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    Gen.listOfN(nDocs, doc).apply(Gen.Parameters.default, Seed(7L + seedOffset))
      .get.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("dedupSubstrings invariants over random corpora: kept words are a " +
      "subsequence of the original, counts consistent, first doc intact") {
    val corpus = randomCorpus(60, 1)
    val df = corpus.toDF("doc_id", "text")
    val out = TextOps.dedupSubstrings(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    out.size shouldBe corpus.size // every doc returns, none dropped
    corpus.foreach { case (id, text) =>
      val (nWords, nDup, nRemoved, kept) = out(id)
      val orig = text.trim.split("\\s+").filter(_.nonEmpty)
      nWords shouldBe (if (text.trim.isEmpty) text.split("\\s+").length.toLong
        else orig.length.toLong)
      nRemoved should be <= nWords
      nRemoved should be >= 0L
      // erased spans cover every dup gram's k words, so dup grams can
      // never exceed removed positions × k nor the total gram count
      if (nDup > 0) nRemoved should be >= 3L // at least one k-span erased
      // kept_text is a subsequence of the original words (order kept)
      val keptWords = kept.split(" ").filter(_.nonEmpty)
      var i = 0
      keptWords.foreach { w =>
        var found = false
        while (!found && i < orig.length) {
          if (orig(i) == w) found = true
          i += 1
        }
        withClue(s"doc $id: '$w' out of order vs original:\n") {
          found shouldBe true }
      }
    }
    // the corpus-minimum (doc, pos) always survives: doc 0 intact
    val first = corpus.head._2
    if (first.trim.split("\\s+").count(_.nonEmpty) >= 3)
      out(0L)._4 shouldBe first.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
    SubstrateCache.release(spark)
  }

  test("noveltyScores invariants over random corpora: novelty in [0,1], " +
      "gram counts match word counts, duplicate docs score zero") {
    val base = randomCorpus(40, 2).filter(_._2.trim.split("\\s+").count(_.nonEmpty) >= 3)
    // append exact duplicates of the first three docs at higher ids
    val corpus = base ++ base.take(3).zipWithIndex.map { case ((_, t), j) =>
      (1000L + j, t) }
    val out = TextOps.noveltyScores(corpus.toDF("doc_id", "text"),
        "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    corpus.foreach { case (id, text) =>
      val (nGrams, nNovel, nov) = out(id)
      val w = text.trim.split("\\s+").count(_.nonEmpty)
      nGrams shouldBe math.max(0, w - 2).toLong
      nNovel should be <= nGrams
      nov.foreach { v => v should (be >= 0.0 and be <= 1.0) }
      if (nGrams == 0) nov shouldBe None
    }
    // an exact duplicate of an earlier doc has zero novel grams
    (0 until 3).foreach { j =>
      val (nGrams, nNovel, _) = out(1000L + j)
      if (nGrams > 0) nNovel shouldBe 0L
    }
    SubstrateCache.release(spark)
  }

  test("bpe incremental learner ≡ naive rescan across random histograms") {
    import graft.functions.BpeTokenizer
    val word = Gen.choose(1, 8)
      .flatMap(l => Gen.listOfN(l, Gen.oneOf('x', 'y', 'z', 'w')).map(_.mkString))
    (0 until 5).foreach { round =>
      val hist = Gen.listOfN(120, Gen.zip(word, Gen.choose(1L, 40L)))
        .apply(Gen.Parameters.default, Seed(100L + round)).get
        .groupBy(_._1).map { case (w, ws) =>
          (BpeTokenizer.initialSymbols(w), ws.map(_._2).sum) }.toArray
      val inc = TextOps.bpeLearnMerges(hist.map(h => (h._1.clone(), h._2)), 50)
      val naive = TextOps.bpeLearnMergesNaive(hist.map(h => (h._1.clone(), h._2)), 50)
      withClue(s"seed round $round:\n") { inc shouldBe naive }
    }
  }

  test("gopher line rules are exactly the stated integer inequalities " +
      "over random multi-line documents") {
    // small line alphabet forces duplicate lines; bullets/ellipses mixed in
    val line = Gen.frequency(
      (4, Gen.oneOf("alpha beta", "gamma", "delta epsilon zeta", "eta")),
      (2, Gen.oneOf("- item one", "• point", "* star")),
      (2, Gen.oneOf("trailing off...", "more…")),
      (1, Gen.oneOf("", "   ", "  padded  ")))
    val doc = Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, line).map(_.mkString("\n")))
    val corpus = Gen.listOfN(70, doc)
      .apply(Gen.Parameters.default, Seed(77L)).get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val out = TextOps.gopherLineRules(corpus.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6),
          (r.getBoolean(7), r.getBoolean(8), r.getBoolean(9),
           r.getBoolean(10), r.getBoolean(11))))).toMap
    corpus.foreach { case (id, text) =>
      val lines = text.split("\n", -1).map(_.trim).filter(_.nonEmpty).toSeq
      val n = lines.length.toLong
      val byLine = lines.groupBy(identity)
      val nDup = byLine.values.map(g => g.length - 1L).sum
      val dupChars = byLine.values.map(g => (g.length - 1L) * g.head.length).sum
      val chars = lines.map(_.length.toLong).sum
      val nBul = lines.count(l =>
        TextOps.GopherBulletPrefixes.exists(l.startsWith)).toLong
      val nEll = lines.count(l => l.endsWith("...") || l.endsWith("…")).toLong
      val (gn, gd, gdc, gc, gb, ge, flags) = out(id)
      withClue(s"doc $id (${text.replace('\n', '|')}):\n") {
        gn shouldBe n
        gd shouldBe nDup
        gdc shouldBe dupChars
        gc shouldBe chars
        gb shouldBe nBul
        ge shouldBe nEll
        flags._1 shouldBe (nDup * 10 <= 3 * n)
        flags._2 shouldBe (dupChars * 5 <= chars)
        flags._3 shouldBe (nBul * 10 <= 9 * n)
        flags._4 shouldBe (nEll * 10 <= 3 * n)
        flags._5 shouldBe (flags._1 && flags._2 && flags._3 && flags._4)
      }
    }
  }

  test("source overlap matrix identities over random corpora: bounds, " +
      "containment >= jaccard, mirror source has containment 1") {
    // three sources of random docs, plus a fourth that duplicates the
    // first verbatim — a perfect mirror MUST surface with containment 1
    val base = randomCorpus(90, 5)
    val rows = base.map { case (id, t) => (s"s${id % 3}", t) } ++
      base.filter(_._1 % 3 == 0).map { case (_, t) => ("mirror", t) }
    val out = TextOps.sourceOverlapMatrix(
        rows.toDF("source", "text"), "text", "source")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
         r.getDouble(5), r.getDouble(6)))).toMap
    out should not be empty
    out.foreach { case ((a, b), (ga, gb, nc, j, c)) =>
      withClue(s"pair ($a,$b):\n") {
        a should be < b                       // canonical ordering
        nc should be > 0L                     // only overlapping pairs emit
        nc should be <= math.min(ga, gb)      // common ⊆ either side
        j should (be > 0.0 and be <= 1.0)
        c should (be >= j and be <= 1.0)      // containment dominates jaccard
        j shouldBe nc.toDouble / (ga + gb - nc)
        c shouldBe nc.toDouble / math.min(ga, gb)
      }
    }
    // the verbatim mirror: identical distinct-gram set as source s0
    val ((ga, gb, nc, j, c)) = out(("mirror", "s0"))
    ga shouldBe nc
    gb should be >= nc
    c shouldBe 1.0
    if (ga == gb) j shouldBe 1.0
    SubstrateCache.release(spark)
  }

  test("gopher flags are exactly the stated integer inequalities over " +
      "random corpora") {
    val corpus = randomCorpus(80, 3) ++ Seq(
      (900L, ("the be to of " * 15).trim), (901L, ("x#y z... " * 30).trim),
      (902L, "tail… " * 20 + ("the be of and " * 13).trim))
    val out = TextOps.gopherQualityRules(corpus.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          (r.getBoolean(7), r.getBoolean(8), r.getBoolean(9), r.getBoolean(10),
           r.getBoolean(11), r.getBoolean(12), r.getBoolean(13))))).toMap
    def countSub(s: String, sub: String): Long = {
      var i = 0; var c = 0L
      while ({ i = s.indexOf(sub, i); i >= 0 }) { c += 1; i += sub.length }
      c
    }
    corpus.foreach { case (id, text) =>
      val ws = text.split("\\s+") // Spark's split keeps a leading "" too
      val n = ws.length.toLong
      val sumLen = ws.map(_.length.toLong).sum
      val nHash = countSub(text, "#")
      val nEll = countSub(text, "...") + countSub(text, "…")
      val nAlpha = ws.count(_.exists(_.isLetter)).toLong
      val nStops = ws.map(_.toLowerCase).distinct
        .count(TextOps.GopherRequiredStopwords.contains).toLong
      val (gn, gh, ge, ga, gst, flags) = out(id)
      withClue(s"doc $id ('$text'):\n") {
        gn shouldBe n
        gh shouldBe nHash
        ge shouldBe nEll
        ga shouldBe nAlpha
        gst shouldBe nStops
        flags._1 shouldBe (n >= 50 && n <= 100000)
        flags._2 shouldBe (sumLen >= 3 * n && sumLen <= 10 * n)
        flags._3 shouldBe (10 * nHash <= n)
        flags._4 shouldBe (10 * nEll <= n)
        flags._5 shouldBe (5 * nAlpha >= 4 * n)
        flags._6 shouldBe (nStops >= 2)
        flags._7 shouldBe (flags._1 && flags._2 && flags._3 && flags._4 &&
          flags._5 && flags._6)
      }
    }
  }

  /** Independent sha-256-prefix hash — the test-side restatement of
    * [[TextOps.portableHash]] (MessageDigest, not Spark). */
  private def sha32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
  }

  test("lm perplexity matches an independent scala reimplementation of " +
      "the add-one bigram model over random corpora; logs never positive") {
    val corpus = randomCorpus(60, 11)
    val (refC, rawC) = corpus.partition(_._1 % 2 == 0)
    val out = TextOps.lmPerplexityScores(
      rawC.toDF("doc_id", "text"), refC.toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out.keySet shouldBe rawC.map(_._1).toSet // every raw doc returned
    // reference model, independently: V, bigram and context counts
    def toks(t: String): Array[String] = t.split("\\s+")
    val refToks = refC.map(c => toks(c._2))
    val v = refToks.flatten.distinct.size.toLong
    val cb = refToks.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val cu = refToks.flatMap(ws => ws.dropRight(1))
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    rawC.foreach { case (id, text) =>
      val pairs = { val ws = toks(text); ws.zip(ws.drop(1)) }
      val want = pairs.map { case (w1, w2) =>
        math.round(1e6 * math.log(
          (cb.getOrElse((w1, w2), 0L) + 1.0) / (cu.getOrElse(w1, 0L) + v)))
      }.sum
      withClue(s"doc $id ('$text'):\n") {
        out(id)._1 shouldBe pairs.length.toLong
        out(id)._2 shouldBe want
        out(id)._2 should be <= 0L
      }
    }
    SubstrateCache.release(spark)
  }

  test("packMaterialize invariants over random corpora: exact independent " +
      "recomputation per (shard, bin), budget overflow < one document") {
    val corpus = randomCorpus(80, 13)
    val withIds = corpus.map { case (id, text) =>
      (id, text.split("\\s+").map(w => (sha32(w) % 32768L).toInt).toSeq)
    }
    val maxTokens = 16L
    val shards = 4
    val eos = -7
    val out = TextOps.packMaterialize(
      withIds.toDF("doc_id", "ids"), "doc_id", "ids",
      maxTokens, shards, eos)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getSeq[Int](4)))).toMap
    // independent reimplementation: shard by hash, order by (hash, id),
    // exclusive-prefix DIV cut, concat + EOS
    val docs = withIds.map { case (id, ids) => (id, ids, sha32(id.toString)) }
    val expected = docs.groupBy(_._3 % shards).flatMap { case (shard, ds) =>
      val ordered = ds.sortBy(d => (d._3, d._1))
      var cum = 0L
      val binned = ordered.map { d =>
        val b = cum / maxTokens; cum += d._2.size; (b, d)
      }
      binned.groupBy(_._1).map { case (bin, parts) =>
        val ids = parts.flatMap(p => p._2._2 :+ eos)
        (shard, bin) -> ((parts.size.toLong, ids.size.toLong, ids))
      }
    }
    out.keySet shouldBe expected.keySet
    expected.foreach { case (k, v) =>
      withClue(s"(shard, bin) $k:\n") { out(k) shouldBe v }
    }
    // budget: the ids of a bin minus its separators and minus its LAST
    // document's overflow always fit the budget (exclusive-prefix cut)
    expected.foreach { case (k @ (shard, bin), (nd, nt, _)) =>
      val parts = docs.filter(d => d._3 % shards == shard)
        .sortBy(d => (d._3, d._1))
      val lens = { var cum = 0L
        parts.flatMap { d =>
          val b = cum / maxTokens; cum += d._2.size
          if (b == bin) Some(d._2.size.toLong) else None } }
      (lens.sum - lens.last) should be < maxTokens
    }
  }

  test("classifier inference matches an independent scala reimplementation " +
      "of the hashed-feature sigmoid over random corpora; probs in [0, 1e6]") {
    val corpus = randomCorpus(50, 12)
    val b = TextOps.DsirBuckets
    val weights = spark.range(b.toLong).select(
      col("id").as("bucket"),
      (pmod(TextOps.portableHash(col("id").cast("string")),
        lit(2000001L)) - lit(1000000L)).as("w_micro"))
    val out = TextOps.classifierScores(
      corpus.toDF("doc_id", "text"), weights, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out.keySet shouldBe corpus.map(_._1).toSet
    def wOf(bkt: Long): Long = sha32(bkt.toString) % 2000001L - 1000000L
    corpus.foreach { case (id, text) =>
      val hs = text.split("\\s+").map(sha32)
      val buckets = hs.map(_ % b) ++ hs.zip(hs.drop(1)).map { case (h1, h2) =>
        (h1 * 1000003L + h2) % TextOps.ShingleMod % b }
      val n = buckets.length.toLong
      val s = buckets.map(wOf).sum
      val want = math.round(1e6 / (1.0 + math.exp(-((s.toDouble / 1e6) / n))))
      withClue(s"doc $id ('$text'):\n") {
        out(id)._1 shouldBe n
        out(id)._2 shouldBe want
        out(id)._2 should be >= 0L
        out(id)._2 should be <= 1000000L
      }
    }
    SubstrateCache.release(spark)
  }
}
