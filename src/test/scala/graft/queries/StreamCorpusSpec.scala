package graft.queries

import graft.SparkSpec
import graft.sinks.ArtifactStore

/** u_stream_corpus_append — the chain's streaming write path must
  * (1) land exactly where the batch LSM stack lands (stream == the
  *     corpus_build_incr2 report, row for row),
  * (2) be EXACTLY-ONCE in the store's keyed-immutability sense: a
  *     complete second run (fresh feed, fresh checkpoint, same corpus)
  *     re-derives the same bid-keyed segments and SERVES them — every
  *     part listing untouched, and
  * (3) actually commit the per-batch segment families the read path
  *     depends on (both bids, all six tables). */
class StreamCorpusSpec extends SparkSpec {

  test("the stream drains into the batch answer: report rows equal " +
    "corpus_build_incr2's, and both streamed segments are committed") {
    val s = spark
    val streamed = CorpusBuild.uStreamCorpusAppend(s, sf)
      .collect().toSeq
    val batch = CorpusBuild.corpusBuildIncr2(s, sf).collect().toSeq
    assert(streamed == batch,
      "the streamed segment stack diverged from the batch LSM stack")
    val k = CorpusBuild.incr2FamilyKey(s, sf)
    (0L to 1L).foreach(bid =>
      CorpusBuild.streamSegKeys(k, bid).foreach(key =>
        assert(ArtifactStore.exists(s, key),
          s"micro-batch $bid must commit its segment table $key")))
  }

  test("exactly-once: a second full run (fresh feed + checkpoint) " +
    "serves every committed segment — part listings untouched") {
    val s = spark
    CorpusBuild.uStreamCorpusAppend(s, sf).collect()
    val k = CorpusBuild.incr2FamilyKey(s, sf)
    val keys = (0L to 1L).flatMap(CorpusBuild.streamSegKeys(k, _))
    def listings = keys.map(key => SparkSpec.partListing(s, key))
    val before = listings
    val again = CorpusBuild.uStreamCorpusAppend(s, sf).collect().toSeq
    assert(listings == before,
      "the rerun re-committed a segment instead of serving it — the " +
        "bid-keyed idempotence contract is broken")
    assert(again == CorpusBuild.corpusBuildIncr2(s, sf).collect().toSeq)
  }
}
