package graft.etl

/**
 * Extract-side file layout ≈ the reference's `slots_per_dir` /
 * `slots_per_file` grouping (`Extract.py:40-46`, `ExtractBatch.py`,
 * `ExtractStreaming.py`): blocks are grouped so no directory holds too
 * many files and no file grows too large — exactly the layout a
 * parallel (non-splittable gzip) ingest wants.
 *
 * Network extraction itself is out of scope in this environment; the
 * layout math is what the Spark side depends on.
 */
object ExtractLayout {

  /** Directory bucket for a slot: floor to the containing group. */
  def dirFor(slot: Long, slotsPerDir: Long): String = {
    val start = (slot / slotsPerDir) * slotsPerDir
    s"${start}_${start + slotsPerDir - 1}"
  }

  /** File bucket for a slot within streaming extraction. */
  def fileFor(slot: Long, slotsPerFile: Long): String = {
    val start = (slot / slotsPerFile) * slotsPerFile
    s"blocks_${start}_${start + slotsPerFile - 1}"
  }

  /** Full relative path for a batch-extracted block. */
  def blockPath(slot: Long, slotsPerDir: Long): String =
    s"${dirFor(slot, slotsPerDir)}/block_$slot.json.gz"

  /**
   * Retry schedule with doubling backoff capped at `maxDuration` —
   * the wait sequence `execute_with_backoff` walks (`Extract.py:49-77`).
   */
  def backoffSchedule(waitDuration: Int = 5, maxDuration: Int = 60): Seq[Int] =
    Iterator.iterate(waitDuration)(_ * 2).takeWhile(_ <= maxDuration).toSeq
}
