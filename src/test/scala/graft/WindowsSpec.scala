package graft

import graft.operators.Windows

class WindowsSpec extends SparkSpec {

  test("sessionize_split equals sessionize on the real corpus") {
    val single = Windows.sessionize(tables).collect().map(_.toSeq).toSeq
    val split = Windows.sessionizeSplit(tables).collect().map(_.toSeq).toSeq
    assert(split == single)
  }

  test("sessionize_split: planted whale stitches across days; sort is per (user, day)") {
    import spark.implicits._
    val gap = Windows.SessionGapSec
    val day = 86400L
    // whale (user 1): an event every 10 min for 3 straight days — gaps all
    // under 30 min, so the TRUE answer is ONE session spanning 3 days;
    // the day pre-split cuts it into 3 local sessions that phase 2 must
    // stitch back (transitively, across two midnights)
    val whale = (0L until 3 * day by 600L).map(s => (s, 1L))
    // edge (user 2): last event 30 s before midnight, next exactly `gap`
    // later (boundary merge at the ≤-vs-< edge: gap == SessionGapSec merges)
    val edge = Seq((day - 30L, 2L), (day - 30L + gap, 2L))
    // sparse (user 3): two events > gap apart within one day — two sessions
    val sparse = Seq((1000L, 3L), (1000L + gap + 1L, 3L))
    val rows = (whale ++ edge ++ sparse).zipWithIndex.map { case ((s, u), i) =>
      (i.toLong, s * 1000000000L, u, 1.5) // ts as raw nanos, like testdata
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_whale").toString
    rows.toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val t = Tables(spark, dir)

    val split = Windows.sessionizeSplit(t).collect().map(_.toSeq).toSeq
    val single = Windows.sessionize(t).collect().map(_.toSeq).toSeq
    assert(split == single)

    def sessionsOf(u: Long) = split.filter(_.head == u)
    assert(sessionsOf(1L).size == 1, s"whale not stitched: ${sessionsOf(1L)}")
    val whaleSession = sessionsOf(1L).head
    assert(whaleSession(2) == 0L && whaleSession(3) == 3 * day - 600L)
    assert(whaleSession(4) == whale.size.toLong)
    assert(sessionsOf(2L).size == 1, "exact-gap boundary session must merge")
    assert(sessionsOf(3L).size == 2)

    // the whale-safety property itself: the event-level sort partitions
    // by (user_id, day), never by bare user_id
    val plan = Windows.sessionizeSplit(t).queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id#\\d+L?, day#\\d+".r
      .findFirstIn(plan).isDefined, plan)
  }
}
