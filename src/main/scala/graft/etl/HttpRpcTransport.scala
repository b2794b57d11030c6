package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/**
 * Live JSON-RPC transport — the network implementation of
 * `BlockTransport` the reference talks through `solana.rpc.api.Client`
 * (`Extract.py:47,80-85`; default endpoint
 * `https://api.mainnet-beta.solana.com`, `ExtractBatch.py` arg).
 *
 * POSTs a `getBlock(slot, jsonParsed)` request and returns the RAW
 * response envelope text: the reference gzips the whole envelope
 * (`ExtractBatch.process_block` writes `block_json` which still has the
 * top-level `result` key), and `BlockIngest.readAuto` parses that exact
 * shape — so the body passes through byte-for-byte, no re-serialization
 * that could reorder keys or mangle big integers.
 *
 * Error contract (what `ExtractClient.fetchWithBackoff` keys on):
 *  - RPC-level error (`{"error":{"code":…,"message":…}}`) → Left(RpcError):
 *    -32004 retries under backoff, anything else aborts the slot —
 *    mirroring `BlockException.should_retry` (`Extract.py:17-23`);
 *  - non-2xx HTTP or connect/read failure → throws, which the client
 *    treats as always-retryable within the backoff budget, same as any
 *    other transport exception.
 *
 * Jackson is used only to PEEK at the `error` field; the returned JSON
 * is the untouched body.
 */
final class HttpRpcTransport(
    endpoint: String,
    timeout: Duration = Duration.ofSeconds(30),
    client: HttpClient = HttpClient.newHttpClient())
  extends BlockTransport {

  private val mapper = new ObjectMapper()

  /** The reference's `get_block(slot, 'jsonParsed')`; version cap per
    * current mainnet requirement (legacy-only responses otherwise error
    * on v0 transactions). */
  private def requestBody(slot: Long): String =
    s"""{"jsonrpc":"2.0","id":1,"method":"getBlock","params":[$slot,""" +
      s"""{"encoding":"jsonParsed","maxSupportedTransactionVersion":0}]}"""

  override def getBlock(slot: Long): Either[ExtractClient.RpcError, String] = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(requestBody(slot)))
      .build()
    // An interrupt during the blocking send must CANCEL the walk, not
    // become a sleep-and-retry: restore the thread's interrupt status
    // (send clears it when it throws) and rethrow — InterruptedException
    // is fatal to scala.util.control.NonFatal, so it propagates past
    // ExtractClient.fetchWithBackoff's retry loop by construction.
    val resp =
      try client.send(req, HttpResponse.BodyHandlers.ofString())
      catch { case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw e
      }
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} from $endpoint for slot $slot")
    val body = resp.body()
    val err = mapper.readTree(body).get("error")
    if (err != null && !err.isNull)
      Left(ExtractClient.RpcError(
        err.path("code").asInt(), err.path("message").asText("")))
    else Right(body)
  }
}
