package graft.etl

import org.apache.spark.sql.SparkSession

/**
 * Operator-facing CLI over the library — the three commands a user of
 * the reference runs today, one subcommand each:
 *
 *   extract <output_dir> --start N [--end N] [--endpoint URL]
 *           [--slots-per-dir N] [--replay DIR] [--stream DEST]
 *     ≈ `ExtractBatch.py main()` (ExtractBatch.py:26-54): walk the
 *     slot range via RPC with retry/backoff, gzip raw envelopes into
 *     the slots-per-dir layout. `--replay DIR` swaps the live HTTP
 *     transport for `FileReplayTransport` (fixture replay / air-gapped
 *     runs — and the only transport testable in this sandbox).
 *     `--stream DEST` composes the two halves of the pipeline in ONE
 *     process ≈ `ExtractStreaming.py` (ExtractStreaming.py:11-46):
 *     the stateless task tables start as Structured Streaming queries
 *     over the extract layout BEFORE extraction begins, each fetched
 *     block becomes a micro-batch input as its file lands, and when
 *     the slot walk finishes the streams drain and stop — RPC →
 *     transform → files without a second command or a re-scan.
 *
 *   transform <blocks_dir> <dest_dir> [--tasks t1,t2|all]
 *             [--format parquet|csv]
 *     ≈ `FileOutput.py main()` (FileOutput.py:186-209): batch-parse
 *     extracted blocks, write the task tables as
 *     `<dest>_<task>` — tasks: transactions, transfers, accounts,
 *     blocks, errors (default all, reference's `--tasks all`).
 *
 *   stream <blocks_dir> <dest_dir> [--once]
 *     ≈ `ExtractStreaming.py main()` (ExtractStreaming.py:48-82):
 *     the stateless task tables as Structured Streaming jobs — new
 *     block files become micro-batches appended to the same tables.
 *     `--once` drains available input then exits (for pipelines and
 *     tests); default runs until terminated.
 *
 * Exit codes: 0 ok, 2 usage error.
 */
object EtlMain {

  private val usage =
    """usage:
      |  EtlMain extract <output_dir> --start N [--end N] [--endpoint URL] [--slots-per-dir N] [--replay DIR] [--stream DEST]
      |  EtlMain transform <blocks_dir> <dest_dir> [--tasks transactions,transfers,...|all] [--format parquet|csv]
      |  EtlMain stream <blocks_dir> <dest_dir> [--once]""".stripMargin

  /** (positionals, flags) — flags are `--key value` except boolean `--once`. */
  private[etl] def parseArgs(args: Seq[String]): (Seq[String], Map[String, String]) = {
    val bools = Set("--once")
    @annotation.tailrec
    def loop(rest: Seq[String], pos: Seq[String],
        flags: Map[String, String]): (Seq[String], Map[String, String]) =
      rest match {
        case Seq() => (pos, flags)
        case b +: tail if bools(b) => loop(tail, pos, flags + (b.drop(2) -> "true"))
        case f +: v +: tail if f.startsWith("--") => loop(tail, pos, flags + (f.drop(2) -> v))
        case f +: _ if f.startsWith("--") =>
          throw new IllegalArgumentException(s"flag $f needs a value")
        case p +: tail => loop(tail, pos :+ p, flags)
      }
    loop(args, Nil, Map.empty)
  }

  private def session(): SparkSession = SparkSession.builder()
    .appName("graft-etl")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** Runs a command; returns an exit code (separated from main for specs). */
  def run(args: Array[String], log: String => Unit = println): Int = {
    if (args.isEmpty) { log(usage); return 2 }
    try {
      val (pos, flags) = parseArgs(args.toSeq.drop(1))
      args(0) match {
        case "extract" =>
          val Seq(outputDir) = pos
          val transport = flags.get("replay")
            .map(dir => new FileReplayTransport(dir): BlockTransport)
            .getOrElse(new HttpRpcTransport(flags.getOrElse("endpoint",
              "https://api.mainnet-beta.solana.com")))
          val client = new ExtractClient(transport, log = log)
          // --stream: start the transform streams over the (possibly
          // still empty) extract layout before fetching, so blocks are
          // transformed incrementally as their files land
          val streams = flags.get("stream").map { dest =>
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outputDir))
            dest -> StreamingEtl.start(session(), s"$outputDir/*/*.json.gz", dest)
          }
          val stats = client.runBatch(outputDir,
            start = flags("start").toLong,
            end = flags.get("end").map(_.toLong),
            slotsPerDir = flags.getOrElse("slots-per-dir", "10000").toLong)
          log(s"extract done: fetched=${stats.fetched} skipped=${stats.skipped}")
          streams.foreach { case (dest, queries) =>
            queries.foreach(_.processAllAvailable())
            queries.foreach(_.stop())
            log(s"stream drained: ${queries.size} task tables -> ${dest}_*")
          }
          0
        case "transform" =>
          val Seq(blocksDir, destDir) = pos
          val spark = session()
          val asCsv = flags.getOrElse("format", "parquet") match {
            case "parquet" => false
            case "csv" => true
            case f => throw new IllegalArgumentException(s"unknown format $f")
          }
          val blocks = BlockIngest.readAuto(spark, blocksDir)
          val tasks = flags.getOrElse("tasks", "all") match {
            case "all" => FileSink.TaskNames
            case ts => ts.split(",").toSeq.map(_.trim)
          }
          FileSink.writeTasks(blocks, destDir, tasks, asCsv)
          log(s"transform done: ${tasks.mkString(", ")} -> ${destDir}_*")
          0
        case "stream" =>
          val Seq(blocksDir, destDir) = pos
          val spark = session()
          val queries = StreamingEtl.start(spark, blocksDir, destDir)
          if (flags.contains("once")) {
            queries.foreach(_.processAllAvailable())
            queries.foreach(_.stop())
            log(s"stream drained: ${queries.size} task tables -> ${destDir}_*")
          } else queries.foreach(_.awaitTermination())
          0
        case other =>
          log(s"unknown command: $other\n$usage"); 2
      }
    } catch {
      case e @ (_: MatchError | _: IllegalArgumentException |
          _: NoSuchElementException) =>
        log(s"bad arguments: ${e.getMessage}\n$usage"); 2
    }
  }

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }
}
