package graft.queries

import graft.SparkSpec
import graft.sinks.ArtifactStore
import org.apache.spark.sql.functions._

/** corpus_retrain (round-16 ask #1): the retrain ACTUATION must
  * (1) commit exactly the family a from-scratch retrain would,
  * (2) build it INCREMENTALLY — the base family's committed stages are
  *     served, never re-committed,
  * (3) land exactly where the monolithic rebuild lands (the refreshed-
  *     parameter semantics the DuckDB oracle replays at verify time),
  * (4) serve post-retrain from the refreshed family ALONE — stale
  *     superseded artifacts are neither read nor resurrected. */
class CorpusRetrainSpec extends SparkSpec {

  private def mx: Long = graft.Tables.documents(spark, sf)
    .agg(max(col("doc_id"))).head().getLong(0) + 1

  /** Column-name-sorted row set of a committed artifact — content
    * comparison independent of column order and row order. */
  private def rowSet(name: String): Set[Vector[Any]] = {
    val df = ArtifactStore.load(spark, name)
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.toVector).toSet
  }

  test("incremental promotion commits the same family a from-scratch " +
    "retrain would build") {
    val s = spark
    val keys = CorpusBuild.incrStageNamesAt(s, sf, mx)
    keys.foreach(ArtifactStore.remove(s, _))
    CorpusBuild.corpusRetrain(s, sf).collect()
    assert(keys.forall(ArtifactStore.exists(s, _)),
      "retrain must commit the full-corpus family")
    val viaRetrain = keys.map(k => k -> rowSet(k)).toMap
    keys.foreach(ArtifactStore.remove(s, _))
    CorpusBuild.incrBase(s, sf, mx) // from-scratch builders
    keys.foreach { k =>
      assert(rowSet(k) == viaRetrain(k),
        s"$k: incremental promotion diverged from the from-scratch build")
    }
  }

  test("retrain serves the committed base stages (no base re-commit) " +
    "and lands exactly where the monolithic rebuild lands") {
    val s = spark
    val cut = CorpusBuild.incrCut(s, sf)
    CorpusBuild.corpusRetrain(s, sf).collect() // base family staged
    val baseKeys = CorpusBuild.incrStageNamesAt(s, sf, cut)
    assert(baseKeys.forall(ArtifactStore.exists(s, _)))
    def baseParts = baseKeys.map(k => SparkSpec.partListing(s, k))
    val before = baseParts
    CorpusBuild.incrStageNamesAt(s, sf, mx)
      .foreach(ArtifactStore.remove(s, _)) // force the retrain event
    val got = CorpusBuild.corpusRetrain(s, sf).collect().toSeq
    assert(baseParts == before,
      "the retrain event re-committed a base stage — the promotion " +
        "must SERVE the stop-independent stages, not re-pay them")
    val want = CorpusBuild.corpusBuildE2e(s, sf).collect().toSeq
    assert(got == want,
      s"retrain must equal the monolith under the refreshed stop set:\n" +
        s"got  ${got.mkString(", ")}\nwant ${want.mkString(", ")}")
  }

  test("post-retrain serving reads ONLY the refreshed family: stale " +
    "superseded artifacts are neither consulted nor resurrected") {
    val s = spark
    CorpusBuild.corpusRetrain(s, sf).collect() // refreshed family exists
    val fullKeys = CorpusBuild.incrStageNamesAt(s, sf, mx)
    def fullParts = fullKeys.map(k => SparkSpec.partListing(s, k))
    val before = fullParts
    // the superseded base family's stop-DEPENDENT artifacts are stale
    // the moment the parameter retrains — remove them and serve
    val cut = CorpusBuild.incrCut(s, sf)
    val staleKeys = CorpusBuild.incrStageNamesAt(s, sf, cut).slice(2, 5)
    staleKeys.foreach(ArtifactStore.remove(s, _))
    val served = CorpusBuild.corpusRetrain(s, sf).collect()
    assert(served.nonEmpty)
    staleKeys.foreach { k =>
      assert(!ArtifactStore.exists(s, k),
        s"serve path resurrected the stale artifact $k — post-retrain " +
          "serving must read the refreshed family alone")
    }
    assert(fullParts == before,
      "serving re-committed the refreshed family")
  }

  test("the lifecycle CONTINUES from the refreshed family: an append " +
    "after a retrain-to-the-90%-cut serves the retrain-built family " +
    "and lands exactly where an append after a from-scratch build does") {
    val s = spark
    val (cut1, cut2) = CorpusBuild.incr2Cuts(s, sf)
    val keys2 = CorpusBuild.incrStageNamesAt(s, sf, cut2)
    // reference: the next append over a from-scratch 90% family
    keys2.foreach(ArtifactStore.remove(s, _))
    CorpusBuild.incrBase(s, sf, cut2)
    val want = CorpusBuild.corpusBuildIncr(s, sf).collect().toSeq
    // now rebuild the SAME family via the retrain event from the 80%
    // family (promotion bounds [cut1, cut2)) and append on top of it
    keys2.foreach(ArtifactStore.remove(s, _))
    CorpusBuild.corpusRetrainAt(s, sf, cut1, cut2).collect()
    assert(keys2.forall(ArtifactStore.exists(s, _)),
      "the bounded promotion must commit the 90% family")
    def parts = keys2.map(k => SparkSpec.partListing(s, k))
    val before = parts
    val got = CorpusBuild.corpusBuildIncr(s, sf).collect().toSeq
    assert(got == want,
      "the append probing the retrain-built family diverged from the " +
        "append probing the from-scratch family — the lifecycle does " +
        "not continue from the refreshed keys")
    assert(parts == before,
      "the append re-committed the refreshed family instead of serving it")
  }
}
