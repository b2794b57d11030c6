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
}
