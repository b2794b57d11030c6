package graft.etl

import java.io.BufferedOutputStream
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/**
 * The reference's extraction client (`Extract.py:49-131`,
 * `ExtractBatch.py:1-55`) behind an injectable transport: the RPC
 * boundary (`solana.rpc.api.Client` in the reference) is a trait, so a
 * network implementation plugs in where the environment allows one,
 * while `FileReplayTransport` replays already-extracted blocks — the
 * retry/backoff/slot-walk logic is identical either way and fully
 * spec-driven.
 *
 * Semantics mirrored exactly:
 *  - doubling backoff: wait 5s, 10s, 20s, 40s … give up once the next
 *    wait would exceed `maxDuration` (`execute_with_backoff`);
 *  - RPC error -32004 ("block not yet available") retries until the
 *    backoff budget runs out (`BlockException.should_retry`); any other
 *    RPC error aborts the slot immediately;
 *  - transport exceptions always retry within the budget;
 *  - slot walk: ascending start→end, descending when end < start,
 *    unbounded count-up when end is None (`Extract.start`);
 *  - batch output: raw response gzipped to the `slots_per_dir` layout
 *    (`ExtractBatch.process_block` → `ExtractLayout.blockPath`), which
 *    is exactly what `BlockIngest.readAuto` ingests.
 *
 * The walker is sequential like the reference (one RPC in flight);
 * scale-out extraction is many clients on disjoint slot ranges — the
 * layout keys files by slot so ranges never collide.
 */
object ExtractClient {

  final case class RpcError(code: Int, message: String)

  /** -32004 = block not yet available: wait for it (`Extract.py:17-23`). */
  def shouldRetry(e: RpcError): Boolean = e.code == -32004

  final case class ExtractStats(fetched: Long, skipped: Long)

  /** The slot sequence `Extract.start` walks (`Extract.py:86-93`). */
  def slots(start: Long, end: Option[Long]): Iterator[Long] = end match {
    case None => Iterator.iterate(start)(_ + 1L)
    case Some(e) if e < start => Iterator.iterate(start)(_ - 1L).takeWhile(_ >= e)
    case Some(e) => Iterator.iterate(start)(_ + 1L).takeWhile(_ <= e)
  }
}

/** RPC boundary: fetch one block (jsonParsed) as raw JSON text. */
trait BlockTransport {
  /** Right(json) on success, Left(error) for an RPC-level error;
    * transport failures throw. */
  def getBlock(slot: Long): Either[ExtractClient.RpcError, String]
}

/**
 * Replay transport: serves blocks from already-extracted files
 * (`{slot}.json` / `{slot}.json.gz` anywhere under `sourceDir`).
 * Missing slots answer -32007 ("slot skipped"), the non-retryable
 * case a live validator reports for skipped slots.
 */
final class FileReplayTransport(sourceDir: String) extends BlockTransport {
  import ExtractClient.RpcError

  private val bySlot: Map[Long, Path] = {
    val name = raw"(\d+)\.json(\.gz)?".r
    val walk = Files.walk(Paths.get(sourceDir))
    try walk.iterator().asScala
      .flatMap { p =>
        p.getFileName.toString match {
          case name(slot, _) => Some(slot.toLong -> p)
          case _ => None
        }
      }.toMap
    finally walk.close()
  }

  override def getBlock(slot: Long): Either[RpcError, String] =
    bySlot.get(slot) match {
      case None => Left(RpcError(-32007, s"Slot $slot was skipped"))
      case Some(p) =>
        val in =
          if (p.toString.endsWith(".gz"))
            new GZIPInputStream(Files.newInputStream(p))
          else Files.newInputStream(p)
        try Right(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
}

class ExtractClient(
    transport: BlockTransport,
    sleep: Int => Unit = s => Thread.sleep(s * 1000L),
    log: String => Unit = _ => ()) {

  import ExtractClient._

  /**
   * One fetch under doubling backoff (`execute_with_backoff`,
   * `Extract.py:49-77`): retryable failures sleep `waitDuration` then
   * retry with double the wait; gives up when the wait would exceed
   * `maxDuration`; a non-retryable RPC error gives up immediately.
   */
  @annotation.tailrec
  final def fetchWithBackoff(slot: Long, waitDuration: Int = 5,
      maxDuration: Int = 60): Option[String] = {
    val attempt: Either[Option[RpcError], String] =
      try transport.getBlock(slot).left.map(Some(_))
      catch { case NonFatal(e) =>
        log(s"transport failure for slot $slot: ${e.getMessage}")
        Left(None)
      }
    attempt match {
      case Right(json) => Some(json)
      case Left(Some(err)) if !shouldRetry(err) =>
        log(s"Error fetching info for slot $slot: ${err.code} ${err.message}")
        None
      case Left(_) if waitDuration <= maxDuration =>
        log(s"Waiting $waitDuration seconds on slot $slot.")
        sleep(waitDuration)
        fetchWithBackoff(slot, waitDuration * 2, maxDuration)
      case Left(_) =>
        log(s"Max wait exceeded on slot $slot.")
        None
    }
  }

  /**
   * Batch extract (`ExtractBatch.process_block`): walk the slot range,
   * gzip each raw response into the slots-per-dir layout. The output
   * tree is directly ingestible by `BlockIngest.readAuto`, and
   * `StreamingEtl` pointed at it reproduces the reference's streaming
   * mode (`ExtractStreaming.py`: fetch → transform → file).
   */
  def runBatch(outputDir: String, start: Long, end: Option[Long],
      slotsPerDir: Long = 10000L,
      waitDuration: Int = 5, maxDuration: Int = 60): ExtractStats = {
    var fetched = 0L
    var skipped = 0L
    slots(start, end).foreach { slot =>
      fetchWithBackoff(slot, waitDuration, maxDuration) match {
        case Some(json) =>
          val p = Paths.get(outputDir, ExtractLayout.blockPath(slot, slotsPerDir))
          Files.createDirectories(p.getParent)
          val os = new GZIPOutputStream(
            new BufferedOutputStream(Files.newOutputStream(p)))
          try os.write(json.getBytes("UTF-8")) finally os.close()
          fetched += 1
        case None =>
          skipped += 1
      }
    }
    ExtractStats(fetched, skipped)
  }
}
