package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Drives each `EtlMain` subcommand end-to-end the way an operator
 * would, against the reference's real mainnet block fixtures via the
 * replay transport: extract → slot-layout files, transform → task
 * tables, stream --once → the same tables incrementally. The CLI is
 * the reference's command surface (`ExtractBatch.py:26-54`,
 * `FileOutput.py:186-209`, `ExtractStreaming.py:48-82`).
 */
class EtlMainSpec extends AnyFunSuite {

  // the batch/stream paths need a session; build it up-front so the
  // CLI's getOrCreate() resolves to a test-sized one
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fixtures = "/root/reference/test/resources/blocks"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("extract --replay walks slots and writes the batch layout") {
    assume(new java.io.File(fixtures).exists(), "reference fixtures not present")
    val out = tmp("etlmain_extract")
    val logs = scala.collection.mutable.ArrayBuffer[String]()
    val code = EtlMain.run(Array("extract", out,
      "--replay", fixtures, "--start", "110360000", "--end", "110360000"), logs += _)
    assert(code == 0, logs.mkString("\n"))
    assert(logs.exists(_.contains("fetched=1")))
    val files = Files.walk(Paths.get(out))
    try {
      import scala.jdk.CollectionConverters._
      assert(files.iterator().asScala.count(_.toString.endsWith(".json.gz")) == 1)
    } finally files.close()
  }

  test("transform writes the selected task tables") {
    spark // force the test session before the CLI's getOrCreate
    val src = tmp("etlmain_blocks")
    // stage one extracted fixture through the replay path
    new ExtractClient(new FileReplayTransport(fixtures))
      .runBatch(src, 110360000L, Some(110360000L))
    val dest = tmp("etlmain_transform") + "/out"
    val code = EtlMain.run(Array("transform", s"$src/*/*.json.gz", dest,
      "--tasks", "transactions,blocks"), _ => ())
    assert(code == 0)
    assert(spark.read.parquet(s"${dest}_transactions").count() > 0)
    assert(spark.read.parquet(s"${dest}_blocks").count() == 1)
    assert(!new java.io.File(s"${dest}_transfers").exists(),
      "unselected task was written")
  }

  test("stream --once drains the fixtures into the task tables") {
    spark
    val src = tmp("etlmain_stream_src")
    new ExtractClient(new FileReplayTransport(fixtures))
      .runBatch(src, 110360000L, Some(110360000L))
    // StreamingEtl reads a directory of .json files (schema'd source);
    // gunzip the staged block like the reference's streaming layout
    val plain = tmp("etlmain_stream_plain")
    val files = Files.walk(Paths.get(src))
    val gz = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.filter(_.toString.endsWith(".json.gz")).toSeq
    } finally files.close()
    gz.zipWithIndex.foreach { case (p, i) =>
      val in = new java.util.zip.GZIPInputStream(Files.newInputStream(p))
      try Files.write(Paths.get(plain, s"block_$i.json"), in.readAllBytes())
      finally in.close()
    }
    val dest = tmp("etlmain_stream_out") + "/out"
    val code = EtlMain.run(Array("stream", plain, dest, "--once"), _ => ())
    assert(code == 0)
    assert(spark.read.parquet(s"${dest}_transactions").count() > 0)
    assert(spark.read.parquet(s"${dest}_accounts").count() > 0)
  }

  test("extract --stream composes fetch and transform in one command") {
    spark
    val out = tmp("etlmain_composed_blocks")
    val dest = tmp("etlmain_composed_out") + "/out"
    // one process: replay-extract the fixture slot while the streaming
    // transforms watch the layout; drain; task tables must exist
    val code = EtlMain.run(Array("extract", out,
      "--start", "110360000", "--end", "110360000",
      "--replay", fixtures, "--stream", dest), _ => ())
    assert(code == 0)
    assert(spark.read.parquet(s"${dest}_transactions").count() > 0)
    assert(spark.read.parquet(s"${dest}_accounts").count() > 0)
    // the raw extract layout was still written (same as plain extract)
    val files = Files.walk(Paths.get(out))
    try {
      import scala.jdk.CollectionConverters._
      assert(files.iterator().asScala.count(_.toString.endsWith(".json.gz")) == 1)
    } finally files.close()
  }

  test("usage errors exit 2 with the usage text") {
    val logs = scala.collection.mutable.ArrayBuffer[String]()
    assert(EtlMain.run(Array.empty[String], logs += _) == 2)
    assert(EtlMain.run(Array("frobnicate"), logs += _) == 2)
    assert(EtlMain.run(Array("transform", "only-one-positional"), logs += _) == 2)
    assert(EtlMain.run(Array("extract", "out", "--start"), logs += _) == 2)
    assert(logs.exists(_.contains("usage:")))
  }

  test("flag parser: positionals, valued flags, boolean flags") {
    assert(EtlMain.parseArgs(Seq("a", "--x", "1", "b", "--once")) ==
      (Seq("a", "b"), Map("x" -> "1", "once" -> "true")))
  }
}
