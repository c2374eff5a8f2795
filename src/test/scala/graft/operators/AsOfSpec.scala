package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("asofJoin: latest at-or-before match per key, inclusive ties, " +
      "null when nothing precedes") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "u1", 100L),  // after right rows at 50 and 100 → ties to 100
      (2L, "u1", 60L),   // between 50 and 100 → 50
      (3L, "u1", 10L),   // before everything → null
      (4L, "u2", 500L),  // other key → u2's only row at 499
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("u1", 50L, 1050L), ("u1", 100L, 1100L), ("u1", 200L, 1200L),
      ("u2", 499L, 2499L), ("u3", 1L, 3001L),
    ).toDF("k", "t", "payload")
    val r = AsOf.asofJoin(left, right, "k", "t", Seq("payload"))
      .orderBy("event_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(3)) -1L else x.getLong(3)))
    assert(r.toSeq === Seq((1L, 1100L), (2L, 1050L), (3L, -1L), (4L, 2499L)))
  }

  test("rangeJoin: containment semantics — inside matches, at-start " +
      "matches, at-end and gap rows get null") {
    val s = spark
    import s.implicits._
    val probes = Seq(
      (1L, "u1", 15L),  // inside [10, 20) → session 110
      (2L, "u1", 10L),  // at start (inclusive) → 110
      (3L, "u1", 20L),  // at end (exclusive) → next session [20,30) → 120
      (4L, "u1", 35L),  // inside the open-ended last interval → null fin
      (5L, "u1", 5L),   // before any interval → null
    ).toDF("event_id", "k", "t")
    val intervals = Seq(
      ("u1", 10L, Some(20L), 110L),
      ("u1", 20L, Some(30L), 120L),
      ("u1", 30L, None: Option[Long], 130L),
    ).toDF("k", "start", "fin", "sid")
    val r = AsOf.rangeJoin(probes, intervals, "k", "t", "start", "fin",
        Seq("sid"))
      .orderBy("event_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(3)) -1L else x.getLong(3)))
    // open-ended (null fin) intervals never match: ts < null is unknown,
    // the same answer the SQL containment join gives
    assert(r.toSeq === Seq((1L, 110L), (2L, 110L), (3L, 120L),
      (4L, -1L), (5L, -1L)))
  }

  test("asofJoin plan: one exchange on the key, no nested-loop join") {
    val s = spark
    import s.implicits._
    val left = (1 to 50).map(i => (i.toLong, s"u${i % 5}", i.toLong * 10))
      .toDF("event_id", "k", "t")
    val right = (1 to 50).map(i => (s"u${i % 5}", i.toLong * 7, i.toLong))
      .toDF("k", "t", "payload")
    val plan = AsOf.asofJoin(left, right, "k", "t", Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // the carry-forward form has no join operator at all — one window
    assert(plan.contains("Window"), plan.take(1500))
  }
}
