package graft.util

/** Placement for per-run THROWAWAY stream scratch (checkpoints, drop-file
  * staging, micro-shard outputs): these directories live for one entry
  * invocation and are deleted by their owner's `finally` — durability is
  * deliberately not wanted, so they belong on the fastest local volume.
  * Structured Streaming writes offset/commit metadata plus per-partition
  * state files on EVERY micro-batch; on a disk-backed tmpdir those small
  * synchronous writes are pure fixed overhead per entry (the pack has 17
  * streaming entries). A real deployment's DURABLE checkpoints are
  * explicitly configured elsewhere (uStreamCorpusAppend's artifact
  * commits, for instance, stay on the ArtifactStore root); nothing
  * restart-critical may use this root. */
object TmpDirs {

  /** tmpfs when available, `java.io.tmpdir` otherwise. */
  val fastRoot: java.nio.file.Path = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) shm.getAbsolutePath
      else sys.props("java.io.tmpdir")
    java.nio.file.Paths.get(base)
  }

  /** Create a fresh throwaway dir under [[fastRoot]]. The caller owns
    * deletion. */
  def ephemeral(prefix: String): String =
    java.nio.file.Files.createTempDirectory(fastRoot, prefix).toString
}
