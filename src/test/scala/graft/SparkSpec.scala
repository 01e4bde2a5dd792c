package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one JVM-wide session; Spark reuses
  * it across suites via getOrCreate). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  /** Recursive part-file listing of a committed artifact — the
    * no-re-commit witness. Part-file names embed the writing job's
    * UUID, so ANY re-commit changes the listing; directory mtimes can
    * pass falsely when a re-commit lands within the same second on a
    * 1s-granularity filesystem (round-14 ADVICE). */
  def partListing(s: SparkSession, artifactName: String): Seq[String] = {
    val p = graft.sinks.ArtifactStore.path(artifactName)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) buf += it.next().getPath.toString
    buf.sorted.toSeq
  }
}
