package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import ExtractClient.RpcError

class ExtractClientSpec extends AnyFunSuite {

  /** Scripted transport: answers per call from a queue; records calls. */
  private class Scripted(script: Either[RpcError, String]*) extends BlockTransport {
    val calls = scala.collection.mutable.ArrayBuffer[Long]()
    private val it = script.iterator
    override def getBlock(slot: Long): Either[RpcError, String] = {
      calls += slot
      if (it.hasNext) it.next() else Right("""{"result": null}""")
    }
  }

  private def client(t: BlockTransport, sleeps: scala.collection.mutable.ArrayBuffer[Int]) =
    new ExtractClient(t, sleep = sleeps += _)

  test("-32004 (block not yet available) retries with doubling waits until success") {
    val t = new Scripted(
      Left(RpcError(-32004, "not available")),
      Left(RpcError(-32004, "not available")),
      Right("""{"result": {"blockhash": "x"}}"""))
    val sleeps = scala.collection.mutable.ArrayBuffer[Int]()
    val got = client(t, sleeps).fetchWithBackoff(42L)
    assert(got.contains("""{"result": {"blockhash": "x"}}"""))
    assert(sleeps.toSeq == Seq(5, 10))
    assert(t.calls.toSeq == Seq(42L, 42L, 42L))
  }

  test("non-retryable RPC errors abort the slot without any wait") {
    val t = new Scripted(Left(RpcError(-32007, "slot skipped")))
    val sleeps = scala.collection.mutable.ArrayBuffer[Int]()
    assert(client(t, sleeps).fetchWithBackoff(7L).isEmpty)
    assert(sleeps.isEmpty)
    assert(t.calls.toSeq == Seq(7L))
  }

  test("transport exceptions retry through the full 5-10-20-40 schedule then give up") {
    val t = new BlockTransport {
      var calls = 0
      override def getBlock(slot: Long): Either[RpcError, String] = {
        calls += 1
        throw new java.io.IOException("connection reset")
      }
    }
    val sleeps = scala.collection.mutable.ArrayBuffer[Int]()
    assert(new ExtractClient(t, sleep = sleeps += _).fetchWithBackoff(9L).isEmpty)
    // Extract.py: wait while wait <= max (60): 5, 10, 20, 40; 80 aborts
    assert(sleeps.toSeq == Seq(5, 10, 20, 40))
    assert(t.calls == 5)
  }

  test("slot walk: ascending, descending when end < start, unbounded when None") {
    assert(ExtractClient.slots(3L, Some(6L)).toSeq == Seq(3L, 4L, 5L, 6L))
    assert(ExtractClient.slots(6L, Some(3L)).toSeq == Seq(6L, 5L, 4L, 3L))
    assert(ExtractClient.slots(100L, None).take(3).toSeq == Seq(100L, 101L, 102L))
  }

  test("replay extract writes the batch layout and BlockIngest.readAuto ingests it") {
    val fixtures = "/root/reference/test/resources/blocks"
    assume(new java.io.File(fixtures).exists(), "reference fixtures not present")
    val dest = java.nio.file.Files.createTempDirectory("graft_extract").toString

    val sleeps = scala.collection.mutable.ArrayBuffer[Int]()
    val c = new ExtractClient(new FileReplayTransport(fixtures), sleep = sleeps += _)
    // descending walk across both fixture slots; everything between
    // them is "skipped" by the validator and must not trigger waits,
    // so probe the two real slots plus two missing neighbors
    val stats = c.runBatch(dest, 110130001L, Some(110129999L))
    assert(stats == ExtractClient.ExtractStats(fetched = 1, skipped = 2))
    val stats2 = c.runBatch(dest, 110360000L, Some(110360000L))
    assert(stats2 == ExtractClient.ExtractStats(fetched = 1, skipped = 0))
    assert(sleeps.isEmpty)

    // layout: slot-keyed dirs/files, exactly what the ingest reads
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val blocks = BlockIngest.readAuto(spark, s"$dest/*/*.json.gz")
    assert(BlockIngest.valid(blocks).count() == 2)
    // and the full transform stack runs on the replayed extract
    assert(SolanaTransforms.blockInfo(blocks).count() == 2)
  }
}
