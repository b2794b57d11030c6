package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Registry-wide executed-plan snapshot: every query's post-AQE plan
 * fingerprint (`Bench.planFingerprint` — noise-normalized, so only a
 * REAL operator/strategy change alters it) is pinned against a
 * checked-in file. A silent broadcast→sort-merge flip, a lost
 * pushdown, or an accidental nested loop now fails CI here instead of
 * surfacing as an unexplained timing swing in a later bench round.
 *
 * On an intended plan change: review the diff this spec prints, then
 * regenerate with  GRAFT_UPDATE_PLAN_SNAPSHOT=1 sbt test  and commit
 * the updated snapshot alongside the code change.
 */
class PlanFingerprintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val snapshotPath = Paths.get("src/test/resources/plan_fingerprints.txt")

  test("executed-plan fingerprints match the reviewed snapshot") {
    // pin EVERY plan-affecting conf the fingerprints were captured
    // under — test suites share one JVM session, and whichever spec
    // built it first leaks its confs (BucketedJoinSpec disables
    // auto-broadcast, which flips join strategies registry-wide)
    val pinned = Seq(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760b",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.session.timeZone" -> "UTC")
    val saved = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    val plans = scala.collection.mutable.Map[String, String]()
    val current: Seq[(String, String)] =
      try SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        // execute through a frame we keep: the AQE plan finalizes in
        // place and the fingerprint reads the plan that actually ran.
        // Bench.consumed forces EVERY column — a bare count lets the
        // optimizer prune whole subtrees out of the pinned plan.
        val counted = Bench.consumed(fn(spark, dir))
        counted.collect()
        val fp = Bench.planFingerprint(counted)
        plans(name) = Bench.normalizedPlan(counted)
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        name -> fp
      }
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }

    if (sys.env.contains("GRAFT_UPDATE_PLAN_SNAPSHOT") ||
        !Files.exists(snapshotPath)) {
      Files.createDirectories(snapshotPath.getParent)
      Files.write(snapshotPath,
        current.map { case (n, f) => s"$n $f" }.asJava)
      // keep the normalized plans the snapshot hashes came from — when
      // a later compare disagrees, the diff lives here, not in the hash
      val dump = Paths.get("target/plan_snapshot_src")
      Files.createDirectories(dump)
      current.foreach { case (n, _) =>
        Files.writeString(dump.resolve(s"$n.txt"), plans(n)) }
      info(s"snapshot written: $snapshotPath (${current.size} queries)")
    } else {
      val snap = Files.readAllLines(snapshotPath).asScala
        .filter(_.nonEmpty).map(_.split(" ", 2)).map(a => a(0) -> a(1)).toMap
      // Re-run every mismatching query once and compare BOTH ways:
      //  - run2 != snapshot  → a (possibly new) plan: report as changed;
      //  - run2 != run1      → the SAME query produced two different
      //    fingerprints in one JVM — that is a genuinely BISTABLE plan
      //    (an AQE strategy race or a normalizer gap, the exact bug
      //    class commit e67305d fixed), which a retry-matches-snapshot
      //    policy would have laundered into a transient info() ~half
      //    the time. Both failure modes fail the spec and dump plans.
      val firstPass = current.filter { case (n, f) => snap.get(n).exists(_ != f) }
      val rerun = firstPass.map { case (name, fp1) =>
        val counted = Bench.consumed(SparkEntry.queries(name)(spark, dir))
        counted.collect()
        val fp2 = Bench.planFingerprint(counted)
        val plan2 = Bench.normalizedPlan(counted)
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        (name, fp1, fp2, plan2)
      }
      val bistable = rerun.collect { case (n, fp1, fp2, plan2) if fp1 != fp2 =>
        val dump = Paths.get("target/plan_drift")
        Files.createDirectories(dump)
        Files.writeString(dump.resolve(s"${n}_run1.txt"), plans(n))
        Files.writeString(dump.resolve(s"${n}_run2.txt"), plan2)
        s"$n: $fp1 vs $fp2 (plans in target/plan_drift)"
      }
      val confirmed = rerun.collect {
        case (n, _, fp2, plan2) if snap.get(n).exists(_ != fp2) =>
          plans(n) = plan2
          n -> fp2
      }
      assert(bistable.isEmpty,
        s"NONDETERMINISTIC plan fingerprints (two runs, one JVM, " +
          s"different plans): ${bistable.mkString("; ")}")
      val changed = confirmed.map { case (n, f) => s"$n: ${snap(n)} -> $f" }
      // diagnostics: the fingerprint alone can't be diffed — dump the
      // drifted queries' normalized plans for comparison against a
      // reference run (e.g. FpProbe output)
      if (changed.nonEmpty) {
        val dump = Paths.get("target/plan_drift")
        Files.createDirectories(dump)
        confirmed.foreach { case (n, _) =>
          Files.writeString(dump.resolve(s"$n.txt"), plans(n))
        }
      }
      val added = current.collect { case (n, _) if !snap.contains(n) => n }
      val removed = (snap.keySet -- current.map(_._1)).toSeq.sorted
      assert(changed.isEmpty && added.isEmpty && removed.isEmpty,
        s"""plan fingerprints drifted from the reviewed snapshot.
           |changed: ${changed.mkString("; ")}
           |new queries (snapshot them): ${added.mkString(", ")}
           |dropped queries: ${removed.mkString(", ")}
           |If intended: GRAFT_UPDATE_PLAN_SNAPSHOT=1 sbt test, review, commit.""".stripMargin)
    }
  }
}
