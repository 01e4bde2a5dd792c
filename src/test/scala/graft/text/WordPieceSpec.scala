package graft.text

import graft.SparkSpec

/** WordPiece trainer semantics: the ##-continuation discipline and the
  * likelihood (not raw-count) merge criterion that distinguishes the
  * family from BPE. */
class WordPieceSpec extends SparkSpec {

  private def toksDf(words: Seq[String]) = {
    import spark.implicits._
    words.toDF("tok")
  }

  test("## tagging: non-initial symbols carry the prefix, merges strip " +
    "the right piece's tag and keep the left's position") {
    import spark.implicits._
    // 'abc' x3: char split = [a, ##b, ##c]; every adjacent pair has a
    // ##-tagged right element, so every merged symbol keeps exactly one
    // leading tag state
    val (learned, vocab) =
      WordPiece.trainRounds(spark, toksDf(Seq.fill(3)("abc")), 2)
    assert(learned.map(m => (m._2, m._3, m._4)) ==
      Seq(("##b", "##c", "##bc"), ("a", "##bc", "abc")))
    val toks = vocab.as[(String, Long, Seq[String])].collect()
    assert(toks.toSeq == Seq(("abc", 3L, Seq("abc"))))
  }

  test("likelihood criterion: a rarer pair of rare symbols beats a more " +
    "frequent pair of ubiquitous symbols (where BPE picks by raw count)") {
    // corpus: 'xy' x5 (pair (x, ##y): n=5, cl=5, cr=5 -> score 0.2)
    //         'ab' x4 interleaved into many words so a/b are common:
    // make a and ##b each appear in MANY words: 'ab' x4, 'ac' x8, 'db' x8
    //   pair (a, ##b): n=4, cl=12, cr=12 -> score 4/144 = 0.028
    // BPE would need counts only; here (x, ##y) must win despite n=5 < 8
    //   pair (a, ##c): n=8, cl=12, cr=8 -> 8/96 = 0.083
    //   pair (d, ##b): n=8, cl=8, cr=12 -> 0.083
    val corpus = Seq.fill(5)("xy") ++ Seq.fill(4)("ab") ++
      Seq.fill(8)("ac") ++ Seq.fill(8)("db")
    val (learned, _) = WordPiece.trainRounds(spark, toksDf(corpus), 1)
    assert(learned.head._2 == "x" && learned.head._3 == "##y",
      s"likelihood must prefer (x, ##y); got ${learned.head}")
    // and the integer evidence rides the learned row
    assert((learned.head._5, learned.head._6, learned.head._7) ==
      ((5L, 5L, 5L)))
    // sanity: raw count would have ranked (a,##c) or (d,##b) first
  }

  test("longest match is maximal munch, not merge replay") {
    // vocab holds both 'ab' and '##bc': maximal munch takes the longer
    // INITIAL piece 'ab' then '##c' — whereas a trainer that learned
    // (##b,##c) before (a,##b) would have segmented 'abc' as a + ##bc
    val vocab = Set("a", "##b", "##c", "ab", "##bc")
    assert(WordPiece.longestMatch("abc", vocab) == Seq("ab", "##c"))
    // continuation tagging respected: '##b' never matches at position 0
    assert(WordPiece.longestMatch("b", vocab + "b") == Seq("b"))
    // out-of-alphabet input hits the [UNK] guard
    assert(WordPiece.longestMatch("zq", vocab) == Seq("[UNK]"))
  }

  test("merge fold is greedy left-to-right (overlapping occurrences)") {
    import spark.implicits._
    // 'aaa' x2: pairs (a,##a) n=4; merge 1 -> a##a applied greedily:
    // [a, ##a, ##a] -> [a##a, ##a] (left-to-right, no re-scan)
    val (learned, vocab) =
      WordPiece.trainRounds(spark, toksDf(Seq.fill(2)("aaa")), 1)
    assert(learned.head._4 == "aa") // merged symbol = l + strip##(r)
    val toks = vocab.as[(String, Long, Seq[String])].collect().head._3
    assert(toks == Seq("aa", "##a"))
  }
}
