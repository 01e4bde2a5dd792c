package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SchkTest}

/** Differential property test for dedup_winnowing: for random small
  * corpora over a tiny vocabulary (forcing shared passages), the Spark
  * pipeline must equal a brute-force local reference of the whole MOSS
  * chain — 5-gram 60-bit md5 hashes, 4-window minima selection, shared-
  * fingerprint candidate pairs, exact distinct-gram-digest Jaccard >= 0.5
  * verification. The reference recomputes md5 independently
  * (MessageDigest), so a drift in the hash derivation, the selection
  * frame, or the verify arithmetic all surface here. */
class WinnowingDedupPropertySpec extends SparkSpec {

  private val K = 5
  private val W = 4

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def hg(gram: String): Long =
    java.lang.Long.parseLong(md5hex(gram).take(15), 16)

  /** Local reference of the full chain. Output rows as the query emits
    * them: (a, b) -> (shared_fp, shared_grams, jaccard). */
  private def reference(docs: Seq[(Long, String)])
      : Map[(Long, Long), (Long, Long, Double)] = {
    val hashes = docs.map { case (id, t) =>
      val ts = t.split("\\s+").filter(_.nonEmpty).toSeq
      val hs =
        if (ts.length < K) Seq.empty[Long]
        else (0 to ts.length - K).map(i => hg(ts.slice(i, i + K).mkString(" ")))
      id -> hs
    }.toMap
    val fp = hashes.map { case (id, hs) =>
      id -> hs.sliding(W).filter(_.size == W).map(_.min).toSet
    }
    val gs = hashes.map { case (id, hs) => id -> hs.toSet }
    val ids = docs.map(_._1).sorted
    (for {
      a <- ids; b <- ids if a < b
      sharedFp = (fp(a) & fp(b)).size
      if sharedFp > 0
      i = (gs(a) & gs(b)).size
      j = BigDecimal(i.toDouble / (gs(a).size + gs(b).size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.5
    } yield (a, b) -> ((sharedFp.toLong, i.toLong, j))).toMap
  }

  test("dedup_winnowing equals the brute-force MOSS reference") {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.chooseNum(0, 26).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.chooseNum(3, 6).flatMap(m =>
      Gen.listOfN(m, doc).map(_.zipWithIndex.map {
        case (t, i) => (i.toLong, t)
      }))
    val prop = Prop.forAll(corpus) { docs =>
      val dir = java.nio.file.Files
        .createTempDirectory("winnow_prop").toString
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = LlmPipeline.dedupWinnowing(spark, dir).collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
          ((r.getAs[Long]("shared_fp"), r.getAs[Long]("shared_grams"),
            r.getAs[Double]("jaccard"))))
        .toMap
      got == reference(docs)
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
