package graft

import java.nio.file.{Files, Path}

/**
 * Per-JVM scratch directories for operators that materialize
 * intermediate state (persisted index self-checks, streaming replay
 * layouts). Every directory handed out here is registered for
 * recursive deletion at JVM exit, so repeated registry/bench sweeps
 * in one process — or many processes over a day — can't accumulate
 * unbounded disk (the minhash index self-check writes a real
 * partitioned index per invocation; at sf1 that is not small).
 *
 * Deletion is at JVM EXIT, not eagerly after the consuming query:
 * the DataFrames built over these paths are lazy — Verify/Bench
 * execute them long after construction — so the files must outlive
 * the constructing call. A caller that wants a different lifecycle
 * sets `spark.graft.scratchDir` style paths itself and skips this
 * helper.
 */
object Scratch {

  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(deleteRecursively)
    }))

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        // close deterministically: each recursion level otherwise holds
        // an open directory handle for the whole subtree's walk
        try children.forEach(deleteRecursively) finally children.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: Throwable => () } // best effort at exit
  }

  /** A fresh temp directory, deleted recursively at JVM exit. */
  def tempDir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  /**
   * Relative-path → byte-size snapshot of the parquet data files under
   * `root` — the before/after evidence that an append-only index write
   * left every pre-existing file untouched. Driver-side file METADATA
   * only (the listing a probe's planning does anyway), bounded by the
   * index's directory layout, never data-sized.
   */
  def parquetFiles(root: String): Map[String, Long] = {
    val base = java.nio.file.Paths.get(root)
    val walk = Files.walk(base)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => base.relativize(p).toString -> Files.size(p))
        .toMap
    } finally walk.close()
  }
}
