package graft.util

import org.apache.spark.sql.DataFrame

/** The SMALL-FRAME PIN convention, with its guardrail.
  *
  * `localCheckpoint(eager = true)` is the repo's idiom for a frame that
  * (a) feeds several consumers and (b) is SMALL — vocabulary-, R-,
  * cell-, or candidate-sized — so re-deriving it per consumer would
  * re-run upstream stages for no benefit while pinning it costs a few
  * MB of executor memory. The convention is NOT for corpus-sized
  * frames: a pinned corpus-scale frame is executor-memory-resident and
  * its lineage truncation turns one lost executor into a failed job
  * (the round-13 lesson that moved the chain's STAGE boundaries to
  * durable ArtifactStore commits instead).
  *
  * `pinSmall` encodes the convention: it pins, and — when
  * `-Dgraft.pins.assert=true` (set for `sbt test`) — counts the pinned
  * frame and fails loudly if it exceeds the bound, so the next
  * contributor who imitates the pattern on a corpus-sized frame gets a
  * test failure, not a silent memory hazard at scale. The count is
  * cheap: the frame is already materialized by the eager checkpoint.
  *
  * Delta-sized pins (the deltaPass intermediates — the slice IS the
  * unit of retry) remain plain `localCheckpoint(true)` calls with their
  * own adjudicated rationale; this helper is for frames that must stay
  * small at EVERY scale factor. */
object Pins {

  /** Default bound: 4M rows. Genuinely small frames (stop sets, band
    * keys of a takedown slice, drift profiles, per-cell scores) sit
    * orders of magnitude below this at any fixture SF; a corpus-sized
    * frame blows past it immediately at sf0.1. */
  val DefaultMaxRows: Long = 1L << 22

  private def assertEnabled: Boolean =
    sys.props.get("graft.pins.assert").exists(v => v == "1" || v == "true")

  /** Pin a small multi-consumer frame (eager localCheckpoint). `why`
    * names the frame and its consumers for the failure message. */
  def pinSmall(df: DataFrame, why: String,
               maxRows: Long = DefaultMaxRows): DataFrame = {
    val pinned = df.localCheckpoint(true)
    if (assertEnabled) {
      val n = pinned.count()
      require(n <= maxRows,
        s"pinSmall($why): $n rows exceeds the $maxRows-row bound — " +
          "this frame is not small; use a durable ArtifactStore commit " +
          "(corpus-sized stage) or a plain delta-sized localCheckpoint " +
          "with its own rationale instead")
    }
    pinned
  }
}
