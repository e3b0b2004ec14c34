package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** GPT-2 byte-level BPE token counting ([[BpeTokenizer]] /
  * `graft_bpe_count`): pinned counts on tiny vocabularies, including
  * CHAINED merges (a rule consuming another rule's output — the part of
  * the algorithm the oracle's independent-rules vocab cannot reach). */
class BpeTokenizerSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  private def count(text: String, merges: String*): Int =
    BpeTokenizer.countTokens(text, BpeTokenizer.ranksFor(merges.mkString("\n")))

  test("no merges: every byte is a token (byte-level start symbols)") {
    count("the") shouldBe 3
    count(" the") shouldBe 4             // Ġ,t,h,e
    count("héllo") shouldBe 6            // é is two UTF-8 bytes
    count("a b") shouldBe 3
  }

  test("chained merges fuse through intermediate symbols in rank order") {
    // "t h" then "th e": the → th,e → the (one token)
    count("the", "t h", "th e") shouldBe 1
    // " thermos": Ġ,t,h,e,r,m,o,s → Ġ,th,e,r,m,o,s → Ġ,the,r,m,o,s
    count(" thermos", "t h", "th e") shouldBe 6
    count("the thermos", "t h", "th e") shouldBe 1 + 6
    // rank order decides between competing pairs: "h e" ranked ABOVE
    // "t h" merges he first, so th never forms
    count("the", "h e", "t h") shouldBe 2   // t,he
  }

  test("merges never cross pre-token boundaries (contractions, spaces)") {
    // "don't" → don | 't : the t of 't cannot merge with a following h
    count("don'thing", "t h") shouldBe 9
    // whitespace is its own pre-token; "n t" across "...n tea" stays 2
    count("n tea", "n t") shouldBe 5     // n | Ġtea → n,Ġ,t,e,a
    // inside one pre-token the same pair merges
    count("nt", "n t") shouldBe 1
  }

  test("greedy merge-all per round: every occurrence of the best pair " +
      "fuses before the next rank is considered") {
    count("ononon", "o n") shouldBe 3
    // "oin" → o,in (2); " onin" → Ġ,on,in (3)
    count("oin onin", "o n", "i n") shouldBe (2 + 3)
  }

  test("graft_bpe_encode: ids follow the merges-only vocabulary (bytes " +
      "0-255, merge i mints 256+i) and size(ids) == graft_bpe_count") {
    import spark.implicits._
    // "the" under chained merges fuses to the symbol merge line 1
    // ("th e") minted → id 257; " the" keeps the leading Ġ (byte 32)
    val ranks = BpeTokenizer.ranksFor("t h\nth e")
    BpeTokenizer.encodeTokens("the", ranks).toIntArray() shouldBe Array(257)
    BpeTokenizer.encodeTokens(" the", ranks).toIntArray() shouldBe
      Array(32, 257)
    // unmerged bytes are their raw byte values; boundaries hold
    BpeTokenizer.encodeTokens("don'thing", BpeTokenizer.ranksFor("t h"))
      .toIntArray() shouldBe
      ("don".map(_.toInt) ++ Seq(39, 116) ++ "hing".map(_.toInt)).toArray
    // expression under codegen: the size(ids) == count identity, and no
    // -1 sentinel under a well-formed table (multi-byte UTF-8 included)
    val df = Seq((1L, "the thermos"), (2L, "don'thing"), (3L, " the"),
      (4L, "héllo ü"), (5L, ""))
      .toDF("id", "text")
    val out = df.selectExpr("id",
      "graft_bpe_encode(text, 't h\nth e') AS ids",
      "graft_bpe_count(text, 't h\nth e') AS n")
      .collect()
    out.foreach { r =>
      r.getSeq[Int](1).size shouldBe r.getInt(2)
      r.getSeq[Int](1).foreach(_ should be >= 0)
    }
  }

  test("the graft_bpe_count expression matches the direct tokenizer " +
      "under codegen") {
    import spark.implicits._
    val df = Seq((1L, "the thermos"), (2L, "don'thing"), (3L, " the"))
      .toDF("id", "text")
    val out = df.selectExpr(
      "id", "graft_bpe_count(text, 't h\nth e') AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out(1L) shouldBe 7
    out(2L) shouldBe 9
    out(3L) shouldBe 2                   // " the" → Ġ,the
  }
}
