package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocab-driven byte-pair-encoding token counting — the BPE-accurate
  * upgrade over the regex approximation in `TextOps.tokenCounts`.
  *
  * [[BpeTokenizer]] implements the public GPT-2 byte-level BPE algorithm
  * with zero dependencies: the GPT-2 pre-tokenizer regex splits text into
  * pre-tokens, each pre-token's UTF-8 bytes map through the public
  * `bytes_to_unicode` table (space → `Ġ` etc.), and the merge loop
  * repeatedly fuses the adjacent symbol pair with the lowest rank in the
  * merges table until none applies — exactly the reference encoder, so a
  * real `merges.txt` (the published GPT-2 vocab format: one `a b` pair
  * per line, rank = line order) drives production-accurate counts, while
  * tests and oracles pin tiny hand-checkable merge sets.
  *
  * Token counting at corpus scale is a per-row scalar — implemented as a
  * native expression so it stays inside whole-stage codegen (the loop
  * runs in [[BpeTokenizer]], referenced from generated code; no Scala
  * UDF serialization, no interpreted HOF). Per-word results are memoized
  * per merge table (words repeat heavily in natural text — the same
  * cache the reference encoder keeps).
  */
case class BpeTokenCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string text, string merges), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal merges table (it compiles to a " +
          "rank map once per plan)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val ranks: BpeTokenizer.Ranks =
    BpeTokenizer.ranksFor(String.valueOf(right.eval()))

  override protected def nullSafeEval(t: Any, m: Any): Any =
    BpeTokenizer.countTokens(t.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val r = ctx.addReferenceObj("bpeRanks", ranks,
        classOf[BpeTokenizer.Ranks].getName)
      s"${ev.value} = graft.functions.BpeTokenizer.countTokens($t.toString(), $r);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Byte-level BPE ENCODING to token ids — the materialization step a
  * tokenize-and-pack pipeline runs after [[BpeTokenCount]] has done its
  * budget math. Ids follow the merges-only vocabulary construction
  * (the standard when no vocab.json artifact exists): the 256 byte-level
  * base symbols take ids 0–255 (byte order), merge line `i` mints id
  * `256 + i` for its fused symbol. A symbol no id covers (only possible
  * under a malformed merges table whose fused strings disagree with its
  * pairs) encodes as -1 rather than poisoning the task.
  *
  * Same codegen/memoization contract as [[BpeTokenCount]]; the two
  * expressions share one compiled [[BpeTokenizer.Ranks]] per merge
  * table, so running count-then-encode pays one rank map, one cache. */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string text, string merges), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal merges table (it compiles to a " +
          "rank map once per plan)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val ranks: BpeTokenizer.Ranks =
    BpeTokenizer.ranksFor(String.valueOf(right.eval()))

  override protected def nullSafeEval(t: Any, m: Any): Any =
    BpeTokenizer.encodeTokens(t.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val r = ctx.addReferenceObj("bpeRanks", ranks,
        classOf[BpeTokenizer.Ranks].getName)
      s"${ev.value} = graft.functions.BpeTokenizer.encodeTokens($t.toString(), $r);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeTokenizer {

  /** GPT-2 `bytes_to_unicode`: printable/latin bytes map to themselves,
    * the rest shift to 256+n — every byte becomes one printable char, so
    * merges operate on plain strings (public reference algorithm). */
  private val byteToChar: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  /** The GPT-2 pre-tokenizer: contractions, optionally-space-led letter /
    * digit / symbol runs, then whitespace. Merges never cross pre-token
    * boundaries. Exposed as a pattern string so vocabulary INDUCTION
    * ([[graft.ops.TextOps.bpeInduce]]) can build its word histogram with
    * Spark's codegen'd `regexp_extract_all` over the exact same
    * segmentation the encoder uses (both sides compile Java regex). */
  private[graft] val PreTokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  private val PreToken = java.util.regex.Pattern.compile(PreTokenPattern)

  /** Byte-level start symbols of a pre-token: one mapped char per UTF-8
    * byte — the sequence BPE merges begin from, shared by the encoder
    * ([[countTokens]]) and vocabulary induction. */
  private[graft] def initialSymbols(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val syms = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      syms(i) = String.valueOf(byteToChar(bytes(i) & 0xff)); i += 1
    }
    syms
  }

  /** A compiled merges table: `"a b"` pair → rank (line order), plus the
    * per-word memo the reference encoder keeps. */
  final class Ranks(spec: String) extends Serializable {
    val rank = new java.util.HashMap[String, Integer]
    /** Symbol → token id: byte-level base symbols are ids 0–255, merge
      * line i mints id 256+i for its fused string (the merges-only
      * vocabulary construction [[BpeEncode]] documents). */
    val idOf = new java.util.HashMap[String, Integer]
    (0 until 256).foreach { b =>
      idOf.put(String.valueOf(byteToChar(b)), b)
    }
    spec.split('\n').iterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex.foreach { case (l, i) =>
        rank.putIfAbsent(l, i)
        val sep = l.indexOf(' ')
        if (sep > 0)
          idOf.putIfAbsent(l.substring(0, sep) + l.substring(sep + 1), 256 + i)
      }
    @transient lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]
    @transient lazy val idsCache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]
  }

  private val ranksCache =
    new java.util.concurrent.ConcurrentHashMap[String, Ranks]

  def ranksFor(spec: String): Ranks =
    ranksCache.computeIfAbsent(spec, new Ranks(_))

  /** BPE token count of `text` under `ranks` — Σ over pre-tokens of the
    * symbol count after all applicable merges. */
  def countTokens(text: String, ranks: Ranks): Int = {
    var total = 0
    val m = PreToken.matcher(text)
    while (m.find()) total += countWord(m.group(), ranks)
    total
  }

  private def countWord(word: String, ranks: Ranks): Int = {
    val hit = ranks.cache.get(word)
    if (hit != null) return hit.intValue()
    val n = mergeWord(word, ranks).length
    if (ranks.cache.size < 200000) ranks.cache.put(word, n)
    n
  }

  /** BPE token ids of `text` under `ranks` — concatenated per-pre-token
    * encodings, per-word memoized like [[countTokens]]. */
  def encodeTokens(text: String, ranks: Ranks): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](text.length / 4 + 8)
    val m = PreToken.matcher(text)
    while (m.find()) {
      val w = m.group()
      var ids = ranks.idsCache.get(w)
      if (ids == null) {
        val syms = mergeWord(w, ranks)
        ids = new Array[Int](syms.length)
        var i = 0
        while (i < syms.length) {
          val id = ranks.idOf.get(syms(i))
          ids(i) = if (id == null) -1 else id.intValue()
          i += 1
        }
        if (ranks.idsCache.size < 200000) ranks.idsCache.put(w, ids)
      }
      out ++= ids
    }
    new GenericArrayData(out.toArray)
  }

  /** The greedy merge fixpoint on one pre-token's byte-level symbols —
    * shared by counting and encoding: fuse every occurrence of the
    * lowest-ranked adjacent pair (left-to-right, non-overlapping),
    * repeat until no pair is in the table (the reference encoder). */
  private def mergeWord(word: String, ranks: Ranks): Array[String] = {
    var syms = initialSymbols(word)
    var done = syms.length <= 1
    while (!done) {
      var best = Int.MaxValue
      var bi = 0
      while (bi < syms.length - 1) {
        val r = ranks.rank.get(syms(bi) + " " + syms(bi + 1))
        if (r != null && r < best) best = r
        bi += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              ranks.rank.get(syms(j) + " " + syms(j + 1)) != null &&
              ranks.rank.get(syms(j) + " " + syms(j + 1)).intValue() == best) {
            out += syms(j) + syms(j + 1); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        done = syms.length <= 1
      }
    }
    syms
  }
}
