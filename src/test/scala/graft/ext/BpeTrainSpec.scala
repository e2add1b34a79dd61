package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE training: the hand-derived merge trace on a planted corpus, the
 *  driver/distributed path equivalence, the training→inference round
 *  trip through both the id and string merge forms, overlapping-pair
 *  semantics, and the early-stop rules. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  // "hello" ×3, "world" ×2. Byte ids: h=104 e=101 l=108 o=111 w=119
  // r=114 d=100. Winner rule (count desc, left asc, right asc) gives:
  //  r0 (e,l)→256   r1 (h,el)→257   r2 (l,o)→258    r3 (hel,lo)→259
  //  r4 (l,d)→260   r5 (o,r)→261    r6 (w,or)→262   r7 (wor,ld)→263
  private val HandDerived = Seq(
    (101, 108), (104, 256), (108, 111), (257, 258),
    (108, 100), (111, 114), (119, 261), (262, 260))

  private def corpus = Seq("hello world hello", "hello world").toDF("text")

  test("train reproduces the hand-derived merge sequence") {
    assert(BpeTrain.train(corpus, "text", numMerges = 8) === HandDerived)
    // fewer rounds = the same list truncated (training is a prefix)
    assert(BpeTrain.train(corpus, "text", numMerges = 3) === HandDerived.take(3))
  }

  test("distributed path produces the identical merges list") {
    // driverMaxWordTypes = 0 forces the distributed loop; the winner
    // rule and rewrite kernel are shared, so the list must be identical
    assert(BpeTrain.train(corpus, "text", numMerges = 8,
      driverMaxWordTypes = 0L) === HandDerived)
  }

  test("learned merges round-trip through inference, id and string forms") {
    val merges = BpeTrain.train(corpus, "text", numMerges = 8)
    // full merges: each planted word compresses to its single piece
    val ids = corpus.select(functions.bpeEncodeIds(col("text"), merges).as("ids"))
      .as[Seq[Int]].collect().toSeq
    assert(ids === Seq(Seq(259, 263, 259), Seq(259, 263)))
    // string interchange form: render → compile reproduces the encoding
    val rendered = Bpe.renderMerges(merges)
    assert(rendered === Seq(
      "e" -> "l", "h" -> "el", "l" -> "o", "hel" -> "lo",
      "l" -> "d", "o" -> "r", "w" -> "or", "wor" -> "ld"))
    val viaStrings = corpus.select(functions.bpeEncode(col("text"), rendered).as("ids"))
      .as[Seq[Int]].collect().toSeq
    assert(viaStrings === ids)
    // a PARTIAL tokenizer still encodes everything (byte fallback):
    // after 3 merges "hello" → [hel=257, lo=258], "world" stays bytes
    val partial = corpus.limit(1)
      .select(functions.bpeEncodeIds(col("text"), merges.take(3)))
      .as[Seq[Int]].head()
    assert(partial === Seq(257, 258, 119, 111, 114, 108, 100, 257, 258))
  }

  test("overlapping pairs count per adjacency; merges apply left-to-right") {
    // "aaa" ×2: pair (a,a) counts BOTH adjacencies (4 total), but the
    // rewrite is non-overlapping left-to-right: aaa → [256, a]
    val df = Seq("aaa aaa").toDF("text")
    val merges = BpeTrain.train(df, "text", numMerges = 4)
    assert(merges === Seq((97, 97), (256, 97)))
    assert(df.select(functions.bpeEncodeIds(col("text"), merges))
      .as[Seq[Int]].head() === Seq(257, 257))
    // distributed loop: same overlap semantics
    assert(BpeTrain.train(df, "text", numMerges = 4,
      driverMaxWordTypes = 0L) === merges)
  }

  test("byte-level: a one-CHAR multi-byte word still trains its byte pair") {
    // "é" is one character but two UTF-8 bytes (0xC3 0xA9) — a
    // char-length word filter would silently exclude it from training
    val df = Seq("é é é").toDF("text")
    val merges = BpeTrain.train(df, "text", numMerges = 2)
    assert(merges === Seq((0xC3, 0xA9)))
    assert(BpeTrain.train(df, "text", 2, driverMaxWordTypes = 0L) === merges)
    // the learned merge encodes the word to its single piece id (the
    // ID path — renderMerges correctly refuses non-ASCII bytes)
    assert(df.select(functions.bpeEncodeIds(col("text"), merges))
      .as[Seq[Int]].head() === Seq(256, 256, 256))
    intercept[IllegalArgumentException](Bpe.renderMerges(merges))
  }

  test("training stops when no pair reaches minCount") {
    // every word appears once: no pair reaches the default minCount=2
    assert(BpeTrain.train(Seq("ab cd").toDF("text"), "text", 8) === Nil)
    // minCount=1 trains; numMerges=0 and 1-byte words are no-ops
    assert(BpeTrain.train(Seq("ab cd").toDF("text"), "text", 1, minCount = 1L)
      === Seq((97, 98)))
    assert(BpeTrain.train(corpus, "text", 0) === Nil)
    assert(BpeTrain.train(Seq("a b c").toDF("text"), "text", 8) === Nil)
  }

  test("compileIds validates ranks; renderMerges rejects non-ASCII bytes") {
    intercept[IllegalArgumentException](Bpe.compileIds(Seq((97, 300)))) // undefined id
    intercept[IllegalArgumentException](Bpe.compileIds(Seq((97, 98), (97, 98))))
    intercept[IllegalArgumentException](Bpe.renderMerges(Seq((200, 97))))
  }
}
