package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** BPE on the classic Sennrich corpus {low:5, lower:2, newest:6, widest:3} —
  * merge sequence and the "lowest" → [low, est] encode are computed by hand.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("learnMerges reproduces the hand-computed merge sequence with ties broken lexicographically") {
    val merges = Bpe.learnMerges(corpus, 5)
    // round 1: es=9 ties st=9 -> (e,s) wins lexicographically
    // round 2: (es,t)=9; round 3: lo=7 ties ow=7 -> (l,o); round 4: (lo,w)=7
    // round 5: ew/ne/w-est all 6 -> (e,w) smallest
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("encodeWord greedily merges by rank: lowest -> [low, est]") {
    val ranks = Bpe.ranksOf(Bpe.learnMerges(corpus, 5))
    assert(Bpe.encodeWord("lowest", ranks) == Seq("low", "est"))
    assert(Bpe.encodeWord("newest", ranks) == Seq("n", "ew", "est"))
    assert(Bpe.encodeWord("low", ranks) == Seq("low"))
    assert(Bpe.encodeWord("xyz", ranks) == Seq("x", "y", "z")) // unknown chars stay chars
    assert(Bpe.encodeWord("", ranks) == Seq())
  }

  test("learnMerges stops early when nothing repeats (frequency-1 pairs are noise)") {
    assert(Bpe.learnMerges(Seq("ab" -> 1L), 10) == Seq())
    assert(Bpe.learnMerges(Seq("ab" -> 2L), 10) == Seq(("a", "b")))
    assert(Bpe.learnMerges(Seq("a" -> 5L), 10) == Seq())
  }

  test("encode splits by code point, never shearing surrogate pairs") {
    val ranks = Bpe.ranksOf(Seq())
    val emoji = new String(Character.toChars(0x1F600)) // astral-plane code point
    assert(Bpe.encodeWord(emoji + "a" + emoji, ranks) == Seq(emoji, "a", emoji))
    val viaDf = Seq(Tuple1(Seq(emoji + "a"))).toDF("w")
      .select(org.apache.spark.sql.graft.Bridge.column(
        BpeTokensWords(org.apache.spark.sql.graft.Bridge.toExpression(
          spark, col("w")), Seq())).alias("t"))
      .head.getString(0)
    assert(viaDf == s"$emoji a")
  }

  test("native BpeCountWords matches per-word encode over a DataFrame") {
    val merges = Bpe.learnMerges(corpus, 5)
    val d = Seq((1L, "lowest newest low"), (2L, "the widest"), (3L, "")).toDF("id", "text")
    val got = d.select(col("id"), TextAnalysis.bpeTokenCount(col("text"), merges).alias("n"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    // lowest=2 newest=3 low=1 -> 6; the=3 (t,h,e) widest=3 (w,id? no id merge -> w,i,d,est=4)
    val ranks = Bpe.ranksOf(merges)
    // local replica of Dedup.wordsArray normalization
    def count(s: String) = s.toLowerCase.replaceAll("[^a-z0-9一-鿿 ]", " ")
      .split("\\s+").filter(_.nonEmpty)
      .map(w => Bpe.encodeWord(w, ranks).length).sum
    assert(got == Seq(count("lowest newest low"), count("the widest"), count("")))
    assert(got.head == 6L)
  }

  test("native BpeTokensWords emits the greedy token sequence; concat restores the words") {
    val merges = Bpe.learnMerges(corpus, 5)
    val d = Seq((1L, "lowest newest"), (2L, ""), (3L, "widest low")).toDF("id", "text")
    val got = d.select(col("id"), TextAnalysis.bpeTokens(col("text"), merges).alias("t"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got.head == "low est n ew est") // lowest -> [low, est], newest -> [n, ew, est]
    assert(got(1) == "")
    // lossless: removing the token separators restores the normalized word stream
    assert(got(2).replace(" ", "") == "widestlow")
    // emit and count kernels agree
    val counts = d.select(TextAnalysis.bpeTokenCount(col("text"), merges))
      .orderBy().collect().map(_.getLong(0)).toSeq
    assert(got.map(t => if (t.isEmpty) 0 else t.split(" ").length.toLong) == counts)
  }

  test("learnMergesFromCorpus trains from a DataFrame word-count pass") {
    val d = Seq.fill(3)("newest newest widest low low low lower").toDF("text")
    val merges = Bpe.learnMergesFromCorpus(d, "text", 3)
    assert(merges.nonEmpty && merges.size <= 3)
    val ranks = Bpe.ranksOf(merges)
    assert(Bpe.encodeWord("newest", ranks).length < "newest".length,
      "training must compress corpus words")
  }
}
