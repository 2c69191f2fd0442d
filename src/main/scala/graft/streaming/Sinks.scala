package graft.streaming

import org.apache.spark.sql.ForeachWriter
import java.util.concurrent.ConcurrentHashMap

/** Persistence sinks — the reference's pooled-JDBC story (ref:
  * PersistWordCount.java:73-100 foreachRDD → foreachPartition → pooled
  * connection → insert; ConnectionPool.java:29-58 static LinkedList pool).
  *
  * Structured Streaming's unit of sink work is the [[ForeachWriter]]:
  * open(partition, epoch) / process(row) / close — exactly the reference's
  * one-connection-per-partition discipline, plus epoch ids for idempotent
  * retry (the DStream original re-inserted on replay; here a sink can
  * upsert keyed on (epochId, key)).
  */
object Sinks {

  /** Parquet append sink for finalized (watermark-closed) streaming
    * aggregates — the file twin of the reference's JDBC persistence
    * (PersistWordCount.java:73-100), for [[Jobs.SlidingCounts]] /
    * [[Jobs.SessionCounts]] or any append-mode stream.
    *
    * Exactly-once, concretely (Spark's file-sink commit protocol):
    *
    *   - The checkpoint's offset log pins each batch's exact source
    *     range BEFORE processing; the sink's `_spark_metadata` log under
    *     `outDir` records, per COMMITTED batch id, the manifest of files
    *     that batch produced. A batch id already present in the sink log
    *     is skipped on replay — that pair is the idempotence the
    *     reference approximated with per-key upserts.
    *   - A crash mid-batch can leave orphan part-files on disk, but they
    *     are in no committed manifest. Readers that go through Spark
    *     (`spark.read.parquet(outDir)` detects `_spark_metadata` and
    *     reads ONLY manifested files) therefore see exactly-once output.
    *     Raw directory listers (duckdb over `*.parquet`, `ls`) see
    *     at-least-once until orphans are vacuumed — at 100 TB, schedule
    *     manifest-aware compaction rather than trusting listings.
    *   - Append mode + watermark means a row is written once, when its
    *     window finalizes — so the parquet corpus is append-only and
    *     partition-friendly; no file is ever rewritten (the reference
    *     re-upserted every key every batch).
    *
    * Requires a replayable source (file dir, Kafka, MemoryStream) — a
    * socket source cannot replay the uncommitted batch after a crash.
    */
  def parquetAppend(finalized: org.apache.spark.sql.DataFrame,
                    outDir: String,
                    checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    finalized.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Bounded blocking pool, one per JVM per id — the semantics of the
    * reference's static synchronized LinkedList pool
    * (ConnectionPool.java:29: lazily built, acquire from head, return to
    * head), with two fixes: connections are created lazily up to `size`
    * (the reference eagerly opens all 10), and an empty pool blocks
    * instead of returning null (ConnectionPool.java:57 `poll()` hands a
    * null connection to the writer).
    */
  final class ConnectionPool[C](factory: () => C, val size: Int) {
    private val idle = new java.util.ArrayDeque[C]()
    private var created = 0

    /** Total connections ever created — the pool-reuse observable. */
    def createdCount: Int = synchronized(created)

    /** The factory runs OUTSIDE the pool monitor: the slot is reserved
      * under the lock, the (possibly slow or hung) connection open happens
      * unlocked, and a failed open rolls the slot back — so one stuck
      * backend handshake can never block release()/discard()/other
      * acquires on the executor.
      */
    def acquire(): C = {
      var reused: Option[C] = None
      synchronized {
        while (idle.isEmpty && created >= size) wait()
        if (idle.isEmpty) created += 1 // reserve the slot
        else reused = Some(idle.pop())
      }
      reused.getOrElse(
        try factory()
        catch { // roll the slot back or a failed open leaks it forever
          case e: Throwable =>
            synchronized { created -= 1; notifyAll() }
            throw e
        })
    }

    def release(conn: C): Unit = synchronized {
      idle.push(conn)
      notifyAll()
    }

    /** Drop a (possibly poisoned) connection instead of returning it,
      * freeing its slot so a fresh one can be opened. `close` releases
      * the connection's real resources (socket, open txn) — without it a
      * poisoned JDBC connection leaks until GC. The slot frees even if
      * close throws.
      */
    def discard(conn: C, close: C => Unit = (_: C) => ()): Unit =
      try close(conn)
      finally synchronized { created -= 1; notifyAll() }

    /** Shutdown path: drain every idle connection and close it. Live
      * (acquired) connections are the borrowers' to discard/release;
      * their slots stay counted until they do.
      */
    def shutdown(close: C => Unit = (_: C) => ()): Unit = {
      val drained = synchronized {
        val out = List.newBuilder[C]
        while (!idle.isEmpty) { out += idle.pop(); created -= 1 }
        notifyAll()
        out.result()
      }
      drained.foreach(c => try close(c) catch { case _: Throwable => () })
    }
  }

  /** JVM-local pool registry. A ForeachWriter is serialized to every
    * executor; the pool must NOT travel with it (a serialized pool would
    * be a fresh pool per task — no reuse). Writers carry only the pool id
    * + factory and bind to their executor's pool instance in open().
    */
  object ConnectionPools {
    private val pools = new ConcurrentHashMap[String, ConnectionPool[_]]()

    def getOrCreate[C](id: String, factory: () => C, size: Int): ConnectionPool[C] =
      pools.computeIfAbsent(id, _ => new ConnectionPool[C](factory, size))
        .asInstanceOf[ConnectionPool[C]]

    /** Test hook: drop a pool so each spec starts cold. */
    def remove(id: String): Unit = pools.remove(id)
  }

  /** Is a JDBC driver class loadable? The zero-egress build image ships
    * no database drivers, so [[jdbcWriter]] guards on this instead of
    * failing inside an executor task with a DriverManager lookup error.
    */
  def jdbcAvailable(driverClass: String): Boolean =
    try { Class.forName(driverClass); true }
    catch { case _: ClassNotFoundException => false }

  /** Real pooled JDBC sink (ref: PersistWordCount.java:73-100 upserts
    * word counts to MySQL through ConnectionPool.java's static pool):
    * a [[PooledForeachWriter]] over `java.sql.Connection`, one pooled
    * connection per partition, one caller-supplied parameterized upsert
    * per row. `java.sql` is JDK-resident, so this compiles and tests
    * with no driver jar; enablement on a real database is exactly ONE
    * jar on the classpath (e.g. `mysql-connector-j` for the reference's
    * MySQL) — no code changes, same one-jar story as
    * [[Sources.kafkaTopic]]. Until then the builder refuses with that
    * instruction (SinksSpec pins the guard).
    *
    * @param upsertSql parameterized statement, e.g.
    *   `INSERT INTO wordcount(word, cnt) VALUES (?, ?) ON DUPLICATE KEY
    *   UPDATE cnt = VALUES(cnt)` — vendor dialects differ, so the SQL
    *   is the caller's (the reference hardcoded MySQL's)
    * @param bind binds one row (+ epoch id, for idempotent-retry
    *   backends keyed on (epoch, key)) onto the prepared statement
    */
  def jdbcWriter[T](url: String, driverClass: String, upsertSql: String,
                    bind: (java.sql.PreparedStatement, T, Long) => Unit,
                    poolSize: Int = 10,
                    props: java.util.Properties = new java.util.Properties)
      : PooledForeachWriter[T, java.sql.Connection] = {
    require(jdbcAvailable(driverClass),
      s"JDBC driver $driverClass not on classpath: add the driver jar " +
        "(e.g. mysql-connector-j for MySQL) — no code changes needed")
    new PooledForeachWriter[T, java.sql.Connection](
      // the pool id folds in EVERYTHING that shapes a connection or the
      // pool itself: two writers differing only in credentials (props),
      // driver, or pool size must not silently share the first-created
      // pool (SinksSpec pins the separation)
      poolId = s"jdbc|$url|$driverClass|$poolSize|${props.hashCode}|$upsertSql",
      factory = () => {
        Class.forName(driverClass) // register with DriverManager on executors
        java.sql.DriverManager.getConnection(url, props)
      },
      poolSize = poolSize,
      write = (conn, row, epoch) => {
        val ps = conn.prepareStatement(upsertSql)
        try { bind(ps, row, epoch); ps.executeUpdate(); () }
        finally ps.close()
      },
      closeConn = c => c.close())
  }

  /** Per-partition pooled sink writer (ref: PersistWordCount.java:76-97:
    * acquire one connection per partition, write every row through it,
    * return it).
    *
    * @param poolId  executor-local pool identity (one pool per sink target)
    * @param factory opens a new backend connection (serialized to executors)
    * @param poolSize max live connections per executor JVM
    * @param write   writes one row through a connection; receives the epoch
    *                id so backends can make retried epochs idempotent
    * @param closeConn releases a connection's real resources when the pool
    *                discards it after a failed task (default no-op for
    *                handle-less backends)
    */
  final class PooledForeachWriter[T, C](
      val poolId: String,
      factory: () => C,
      poolSize: Int,
      write: (C, T, Long) => Unit,
      closeConn: C => Unit = (_: Any) => ()
  ) extends ForeachWriter[T] {

    @transient private var conn: C = _
    @transient private var epoch: Long = _

    override def open(partitionId: Long, epochId: Long): Boolean = {
      conn = ConnectionPools.getOrCreate(poolId, factory, poolSize).acquire()
      epoch = epochId
      true
    }

    override def process(value: T): Unit = write(conn, value, epoch)

    override def close(errorOrNull: Throwable): Unit =
      if (conn != null) {
        val pool = ConnectionPools.getOrCreate(poolId, factory, poolSize)
        // a failed task may have poisoned the connection (half-written
        // txn, broken socket) — never return it to the pool, and close
        // it for real so its socket/txn doesn't leak until GC
        if (errorOrNull == null) pool.release(conn)
        else pool.discard(conn, closeConn)
      }
  }
}
