package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sfDir: String = "/root/testdata/sf0.001"
  def tables: Tables = Tables(spark, sfDir)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.local(4)
    // StreamingJoinHelper WARN-logs an "[INTERNAL_ERROR] Cannot
    // evaluate expression" stack for every non-time `<`/`<=` conjunct
    // it probes while solving stream-stream state watermarks (e.g.
    // MinhashCandidates' `doc_a < doc_b`) — dozens per suite run.
    // Harmless by construction: the "stream-stream joins carry
    // state-cleanup watermarks on BOTH sides" pin in StreamingJobsSpec
    // asserts extraction SUCCEEDS from the time conjuncts, so the
    // probe noise carries no signal and is dropped here. Must run
    // AFTER session creation: GraftSession's setLogLevel("WARN")
    // resets EVERY logger's level and would wipe this override.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.analysis.StreamingJoinHelper",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
