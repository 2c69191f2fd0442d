package graft

import graft.storage.Generations

/** The generation GC: vacuumPlan must name exactly the retirable
  * committed generations and the DEAD uncommitted orphans (crashed
  * writes), never an in-flight write or a kept generation; vacuum
  * executes that plan and nothing else.
  */
class GenerationsSpec extends SparkSpec {

  test("vacuumPlan: retirable + dead orphans only; vacuum deletes exactly the plan") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-gen-vacuum").toString
    val art = "bounds"
    def publish(v: Long): Long =
      Generations.publish(root, art, Seq((v, v)).toDF("a", "b"))
    assert(publish(1L) == 0L && publish(2L) == 1L)

    // a crashed write: gen=2 exists with data but NO _SUCCESS marker
    val orphan = new java.io.File(s"$root/gen=2/$art")
    orphan.mkdirs()
    java.nio.file.Files.write(orphan.toPath.resolve("part-0.parquet"),
      Array[Byte](1, 2, 3))
    // publish numbers above every existing COMMITTED gen; the next
    // commit lands at 2? No — committed() ignores the orphan, so the
    // next publish would overwrite gen=2. Publish once more and check
    // the protocol takes the next committed slot:
    val n3 = Generations.publish(root, art, Seq((3L, 3L)).toDF("a", "b"))
    assert(n3 == 2L, "publish overwrites a dead orphan slot (documented)")
    val n4 = Generations.publish(root, art, Seq((4L, 4L)).toDF("a", "b"))
    assert(n4 == 3L)

    // uncommitted dirs ABOVE the current generation (7, 9 > 3) may be
    // writes in flight — the plan must never include them
    new java.io.File(s"$root/gen=9/$art").mkdirs()
    new java.io.File(s"$root/gen=7/$art").mkdirs()

    // committed now: 0,1,2,3 ; keep=2 -> retire 0,1 ; 7/9 untouchable
    val plan = Generations.vacuumPlan(root, art, keep = 2)
    assert(plan == Seq(0L -> true, 1L -> true),
      s"plan must be exactly the retirable committed gens, got $plan")

    val deleted = Generations.vacuum(root, art, keep = 2)
    assert(deleted == Seq(0L, 1L))
    val left = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(left == Set("gen=2", "gen=3", "gen=7", "gen=9"),
      s"vacuum must delete exactly the plan, left $left")
    assert(Generations.committed(root, art) == Seq(2L, 3L))

    // once a higher generation commits, a sub-current orphan is dead
    val n5 = Generations.publish(root, art, Seq((5L, 5L)).toDF("a", "b"))
    assert(n5 == 4L)
    // gen=7/9 still above? current=4 -> still alive; plant one below:
    // delete gen=2's marker? simpler: orphan at 1 (now vacant, < 4)
    new java.io.File(s"$root/gen=1/$art").mkdirs()
    val plan3 = Generations.vacuumPlan(root, art, keep = 2)
    assert(plan3.contains(1L -> false),
      s"dead orphan below current must be planned, got $plan3")
    Generations.vacuum(root, art, keep = 2)
    assert(!new java.io.File(s"$root/gen=1").exists())
  }
}
