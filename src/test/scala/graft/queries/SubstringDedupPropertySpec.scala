package graft.queries

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SchkTest}

/** Differential property test for substring dedup: for random small
  * corpora over a tiny vocabulary (forcing shared windows), the Spark
  * pipeline must equal a brute-force local reference of the semantics —
  * multiset window counts, >= 2 occurrences flags a start, coverage is
  * the interval union of flagged [pos, pos+K-1] spans. */
class SubstringDedupPropertySpec extends SparkSpec {

  private val K = 3

  /** Local reference: (doc_id -> (n_tokens, dup_windows, covered)). */
  private def reference(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val grams = toks.flatMap { case (id, ts) =>
      if (ts.length < K) Seq.empty
      else (0 to ts.length - K).map(i =>
        (id, i + 1, ts.slice(i, i + K).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val dupStarts = grams.filter(g => counts(g._3) >= 2)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    toks.map { case (id, ts) =>
      val starts = dupStarts.getOrElse(id, Seq.empty)
      var covered = 0L
      var end = -1 // last covered position so far
      starts.foreach { s =>
        val e = s + K - 1
        if (s > end) { covered += K; end = e }
        else if (e > end) { covered += e - end; end = e }
      }
      id -> ((ts.length.toLong, starts.size.toLong, covered))
    }.toMap
  }

  test("substring dedup equals the brute-force reference on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.chooseNum(0, 22).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.chooseNum(3, 8).flatMap(m =>
      Gen.listOfN(m, doc).map(_.zipWithIndex.map {
        case (t, i) => (i.toLong, t)
      }))
    val prop = Prop.forAll(corpus) { docs =>
      val got = LlmPipeline
        .substringDedup(docs.toDF("doc_id", "text"), K)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      val ref = reference(docs)
      docs.forall { case (id, _) =>
        val (n, dw, cov) = ref(id)
        val (gn, gdw, gcov, gpm) = got(id)
        gn == n && gdw == dw && gcov == cov &&
          gpm == cov * 1000 / math.max(n, 1)
      }
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
