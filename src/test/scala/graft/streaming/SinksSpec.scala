package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** In-memory "database" standing in for the reference's MySQL
  * (PersistWordCount.java:87-91 insert into wordcount). JVM-static so
  * executor threads and the spec see the same store in local mode.
  */
object TestStore {
  val rows = new ConcurrentHashMap[String, Long]()
  val opened = new AtomicInteger(0)

  /** A "connection": records that it was opened; writes upsert the map. */
  final class Conn {
    TestStore.opened.incrementAndGet()
    def upsert(word: String, count: Long): Unit = rows.put(word, count)
  }

  def reset(): Unit = { rows.clear(); opened.set(0) }
}

class SinksSpec extends SparkSpec {
  import org.apache.spark.sql.SQLContext
  implicit lazy val sqlCtx: SQLContext = spark.sqlContext

  test("ConnectionPool: lazy creation, bounded size, LIFO reuse") {
    var made = 0
    val pool = new Sinks.ConnectionPool[String](() => { made += 1; s"c$made" }, 2)
    val a = pool.acquire()
    assert(made == 1) // lazy: nothing created until asked
    val b = pool.acquire()
    assert(made == 2 && a != b)
    pool.release(b)
    assert(pool.acquire() == b) // reused, not recreated
    assert(made == 2 && pool.createdCount == 2)
    // a 3rd concurrent acquire blocks until a release (bounded pool)
    val got = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => got.put(pool.acquire()))
    t.start()
    Thread.sleep(50)
    assert(got.isEmpty) // still blocked — pool exhausted
    pool.release(a)
    assert(got.poll(2, java.util.concurrent.TimeUnit.SECONDS) == a)
    t.join()
  }

  test("ConnectionPool: failed factory rolls back its slot; discard frees one") {
    var fail = true
    var made = 0
    val pool = new Sinks.ConnectionPool[String](
      () => { if (fail) sys.error("db down"); made += 1; s"c$made" }, 1)
    intercept[RuntimeException](pool.acquire())
    // slot must be rolled back: with the backend healthy again the
    // single-slot pool can still open a connection (no permanent leak)
    fail = false
    val a = pool.acquire()
    assert(a == "c1" && pool.createdCount == 1)
    // discard (poisoned connection) frees the slot for a fresh one AND
    // closes the dropped connection for real (socket/txn release)
    var closed = List.empty[String]
    pool.discard(a, c => closed ::= c)
    assert(closed == List("c1"))
    assert(pool.createdCount == 0)
    assert(pool.acquire() == "c2")
  }

  test("ConnectionPool: slot is freed even when discard's close throws") {
    var made = 0
    val pool = new Sinks.ConnectionPool[String](() => { made += 1; s"c$made" }, 1)
    val a = pool.acquire()
    intercept[RuntimeException](pool.discard(a, _ => sys.error("close failed")))
    assert(pool.createdCount == 0) // slot not leaked
    assert(pool.acquire() == "c2")
  }

  test("ConnectionPool: acquire does not hold the monitor during a slow open") {
    // one thread stuck in a hung factory() must not block another
    // thread's release()/re-acquire of an existing connection
    val opened = new java.util.concurrent.LinkedBlockingQueue[String]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    var n = 0
    val pool = new Sinks.ConnectionPool[String](
      () => synchronized { n += 1; val c = s"c$n"; if (n == 2) gate.await(); c },
      2)
    val a = pool.acquire() // fast first connection
    val slow = new Thread(() => opened.put(pool.acquire())) // hangs in factory
    slow.start()
    Thread.sleep(50)
    // with the old lock-holding acquire these would deadlock behind gate
    pool.release(a)
    assert(pool.acquire() == a)
    gate.countDown()
    assert(opened.poll(2, java.util.concurrent.TimeUnit.SECONDS) == "c2")
    slow.join()
  }

  test("ConnectionPool: shutdown drains and closes idle connections") {
    val pool = new Sinks.ConnectionPool[String](() => "c", 2)
    val a = pool.acquire()
    val b = pool.acquire()
    pool.release(a); pool.release(b)
    var closed = 0
    pool.shutdown(_ => closed += 1)
    assert(closed == 2 && pool.createdCount == 0)
  }

  test("jdbcWriter: guarded one-jar enablement; builds against a present class") {
    // the zero-egress image ships no database drivers — the builder
    // must refuse up front with the enablement instruction, not fail
    // inside an executor task with a DriverManager lookup error
    assert(!Sinks.jdbcAvailable("com.mysql.cj.jdbc.Driver"))
    val e = intercept[IllegalArgumentException] {
      Sinks.jdbcWriter[(String, Long)](
        "jdbc:mysql://db:3306/graft", "com.mysql.cj.jdbc.Driver",
        "INSERT INTO wordcount(word, cnt) VALUES (?, ?) " +
          "ON DUPLICATE KEY UPDATE cnt = VALUES(cnt)",
        (ps, row, _) => { ps.setString(1, row._1); ps.setLong(2, row._2) })
    }
    assert(e.getMessage.contains("driver jar"))
    // with the class present the builder constructs lazily — the
    // connection is only opened per-partition in open(), so a writer
    // can be built and serialized with no live backend
    val w = Sinks.jdbcWriter[(String, Long)](
      "jdbc:fake://nowhere", "java.lang.String",
      "INSERT INTO t VALUES (?, ?)",
      (ps, row, _) => { ps.setString(1, row._1); ps.setLong(2, row._2) })
    assert(w != null)
  }

  test("jdbcWriter: pool identity separates writers differing in driver, size, or props") {
    // two sinks to the same url with different credentials or pool
    // sizes must NOT share one pool — the first-created pool's config
    // would silently win for both
    def w(size: Int, user: String) = {
      val p = new java.util.Properties
      p.setProperty("user", user)
      Sinks.jdbcWriter[(String, Long)](
        "jdbc:fake://nowhere", "java.lang.String",
        "INSERT INTO t VALUES (?, ?)",
        (ps, row, _) => { ps.setString(1, row._1); ps.setLong(2, row._2) },
        poolSize = size, props = p)
    }
    assert(w(10, "alice").poolId == w(10, "alice").poolId)
    assert(w(10, "alice").poolId != w(10, "bob").poolId)
    assert(w(10, "alice").poolId != w(5, "alice").poolId)
  }

  test("epoch-fenced upserts: a replayed epoch never double-counts") {
    // The exactly-once JDBC recipe jdbcWriter's bind contract exists
    // for: write per-epoch DELTAS keyed (key, epoch) with
    // insert-or-ignore semantics, so a retried epoch (task crash after
    // a partial write, before the commit) re-applies idempotently.
    // Backend = an in-memory (key, epoch) -> delta store with
    // putIfAbsent upsert — the JDK ships no JDBC driver, so this drives
    // the same PooledForeachWriter lifecycle Spark drives (open/process/
    // close per attempt) against the store the SQL would hit.
    val rows = new java.util.concurrent.ConcurrentHashMap[(String, Long), Long]()
    class Conn { var poisoned = false }
    Sinks.ConnectionPools.remove("epoch-store")
    def writer = new Sinks.PooledForeachWriter[(String, Long), Conn](
      poolId = "epoch-store",
      factory = () => new Conn,
      poolSize = 2,
      write = (c, row, epoch) => {
        require(!c.poisoned)
        rows.putIfAbsent((row._1, epoch), row._2); ()
      })
    def total(word: String): Long = {
      import scala.jdk.CollectionConverters._
      rows.asScala.collect { case ((w, _), v) if w == word => v }.sum
    }
    // epoch 0 commits cleanly
    val w0 = writer
    assert(w0.open(0, 0L)); w0.process(("a", 2L)); w0.process(("b", 1L))
    w0.close(null)
    // epoch 1, attempt 1: writes one row, then the task dies — Spark
    // calls close(error); the connection is discarded, the partial
    // write stays (no backend txn)
    val w1 = writer
    assert(w1.open(0, 1L)); w1.process(("a", 1L))
    w1.close(new RuntimeException("executor lost"))
    // epoch 1, attempt 2 (the replay): re-processes the FULL epoch
    val w2 = writer
    assert(w2.open(0, 1L)); w2.process(("a", 1L)); w2.process(("c", 4L))
    w2.close(null)
    // fencing holds: a's epoch-1 delta applied once despite two attempts
    assert(total("a") == 3L, s"double-counted: ${total("a")}")
    assert(total("b") == 1L && total("c") == 4L)
    // and a THIRD replay of a fully-committed epoch is a no-op
    val w3 = writer
    assert(w3.open(0, 1L)); w3.process(("a", 1L)); w3.process(("c", 4L))
    w3.close(null)
    assert(total("a") == 3L && total("c") == 4L)
  }

  test("PooledForeachWriter: per-partition pooled upserts reach the store") {
    import spark.implicits._
    TestStore.reset()
    Sinks.ConnectionPools.remove("test-store")

    val in = MemoryStream[String]
    val writer = new Sinks.PooledForeachWriter[(String, Long), TestStore.Conn](
      poolId = "test-store",
      factory = () => new TestStore.Conn,
      poolSize = 3,
      write = (c, row, _) => c.upsert(row._1, row._2))
    val q = Jobs.RunningCounts.counts(in.toDF())
      .writeStream.outputMode("update").foreach(writer).start()
    try {
      in.addData("hello world hello", "spark")
      q.processAllAvailable()
      in.addData("hello spark")
      q.processAllAvailable()

      import scala.jdk.CollectionConverters._
      assert(TestStore.rows.asScala.toMap ==
        Map("hello" -> 3L, "world" -> 1L, "spark" -> 2L))
      // pooling actually pooled: many partitions/epochs ran
      // (2 epochs × shuffle partitions), but connections stay ≤ pool size
      assert(TestStore.opened.get() <= 3)
    } finally q.stop()
  }
}
