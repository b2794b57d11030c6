package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/**
 * Drives the stateful sessionizer through a REAL streaming query:
 * MemoryStream source → flatMapGroupsWithState → memory sink, two
 * micro-batches. The first batch closes one session when the second
 * batch's events arrive past the gap.
 */
class SessionizeStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sessions emit across micro-batches when the gap passes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000000L
    val input = MemoryStream[Sessionize.Ev]
    val q = Sessionize.sessions(spark, input.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    try {
      // batch 1: two events 1 min apart -> one open session
      input.addData(Sessionize.Ev(1L, base, 1.0), Sessionize.Ev(1L, base + 60L * 1000000, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // still open
      // batch 2: an event 2 h later -> closes the first session
      input.addData(Sessionize.Ev(1L, base + 7200L * 1000000, 3.0))
      q.processAllAvailable()
      val done = spark.table("sessions_out").as[Sessionize.Session].collect()
      assert(done.map(s => (s.user_id, s.n_events, s.total_value)).toSeq ==
        Seq((1L, 2L, 3.0)))
    } finally q.stop()
  }

  test("transformWithState sessionizer emits the same sessions as fMGWS") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000000L
    val min = 60L * 1000000L
    // 10 users, 3 micro-batches, gaps straddling the 30-min threshold
    // in every batch — identical data fed to both implementations
    val batches: Seq[Seq[Sessionize.Ev]] = Seq(
      (0 until 10).flatMap(u => Seq(
        Sessionize.Ev(u, base + u * min, 1.0),
        Sessionize.Ev(u, base + u * min + 10 * min, 2.0))),
      (0 until 10).map(u =>
        Sessionize.Ev(u, base + u * min + (if (u % 2 == 0) 20 else 120) * min, 3.0)),
      (0 until 10).map(u =>
        Sessionize.Ev(u, base + u * min + 600 * min, 4.0)))

    def run(name: String, useTws: Boolean): Set[Sessionize.Session] = {
      val input = MemoryStream[Sessionize.Ev]
      val conf = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(conf)
      // transformWithState requires the RocksDB provider; restore the
      // default afterwards so other streaming specs are unaffected
      if (useTws) spark.conf.set(conf,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val ds = input.toDS()
        val out = if (useTws) Sessionize.sessionsTws(spark, ds, 30)
                  else Sessionize.sessions(spark, ds, 30)
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName(name).start()
        try {
          batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
          spark.table(name).as[Sessionize.Session].collect().toSet
        } finally q.stop()
      } finally {
        prev match {
          case Some(v) => spark.conf.set(conf, v)
          case None => spark.conf.unset(conf)
        }
        spark.catalog.dropTempView(name)
      }
    }

    val fmgws = run("sess_fmgws", useTws = false)
    val tws = run("sess_tws", useTws = true)
    assert(fmgws.nonEmpty)
    // every batch-2 long-gap user closed a session; short-gap users not yet
    assert(fmgws.map(_.user_id).size == 10)
    assert(tws == fmgws,
      s"only-fmgws=${fmgws -- tws}, only-tws=${tws -- fmgws}")
  }
}
