package graft.etl

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Exercises the live transport against a loopback JSON-RPC stub —
 * verifying the wire format (POST, getBlock, jsonParsed params), the
 * raw-envelope passthrough, and both failure channels (RPC error →
 * Left, HTTP error → throw) composing with ExtractClient's backoff.
 */
class HttpRpcTransportSpec extends AnyFunSuite {

  /** One-endpoint stub server; `handler` maps request body → (status, response). */
  private def withServer(handler: String => (Int, String))(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val req = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val (status, resp) = handler(req)
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(status, bytes.length)
      x.getResponseBody.write(bytes)
      x.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/")
    finally server.stop(0)
  }

  test("sends a getBlock jsonParsed request and passes the envelope through raw") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    // key order/whitespace chosen to prove NO re-serialization happens
    val envelope = """{"jsonrpc": "2.0", "result": {"blockhash": "abc", "parentSlot": 41}, "id": 1}"""
    withServer { req => seen += req; (200, envelope) } { url =>
      val got = new HttpRpcTransport(url).getBlock(42L)
      assert(got == Right(envelope))
    }
    val req = seen.head
    assert(req.contains(""""method":"getBlock""""))
    assert(req.contains("[42,"))
    assert(req.contains(""""encoding":"jsonParsed""""))
    assert(req.contains(""""maxSupportedTransactionVersion":0"""))
  }

  test("RPC error envelope surfaces as Left(RpcError) for the backoff logic") {
    val err = """{"jsonrpc":"2.0","error":{"code":-32004,"message":"Block not available for slot 7"},"id":1}"""
    withServer { _ => (200, err) } { url =>
      assert(new HttpRpcTransport(url).getBlock(7L) ==
        Left(ExtractClient.RpcError(-32004, "Block not available for slot 7")))
    }
  }

  test("non-2xx HTTP throws — the always-retryable transport-failure channel") {
    withServer { _ => (503, "try later") } { url =>
      intercept[java.io.IOException] { new HttpRpcTransport(url).getBlock(1L) }
    }
  }

  test("an interrupt mid-send cancels instead of retrying, flag restored") {
    // a server that never responds: send blocks until the interrupt
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => ()) // never answer
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
      @volatile var thrown: Throwable = null
      @volatile var flagRestored = false
      val t = new Thread(() => {
        try new ExtractClient(new HttpRpcTransport(url)).fetchWithBackoff(1L)
        catch { case e: Throwable =>
          thrown = e
          flagRestored = Thread.currentThread().isInterrupted
        }
      })
      t.start()
      Thread.sleep(300) // let send() block on the silent server
      t.interrupt()
      t.join(10000)
      assert(!t.isAlive, "walker thread did not stop on interrupt")
      assert(thrown != null && thrown.isInstanceOf[InterruptedException],
        s"expected InterruptedException to cancel the walk, got $thrown")
      assert(flagRestored, "thread interrupt status was not restored")
    } finally server.stop(0)
  }

  test("composes with ExtractClient: -32004 then success retries through backoff") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val ok = """{"jsonrpc":"2.0","result":{"blockhash":"x"},"id":1}"""
    val notYet = """{"jsonrpc":"2.0","error":{"code":-32004,"message":"not yet"},"id":1}"""
    withServer { _ => (200, if (calls.incrementAndGet() < 3) notYet else ok) } { url =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Int]()
      val client = new ExtractClient(new HttpRpcTransport(url), sleep = sleeps += _)
      assert(client.fetchWithBackoff(5L).contains(ok))
      assert(sleeps.toSeq == Seq(5, 10))
      assert(calls.get() == 3)
    }
  }
}
