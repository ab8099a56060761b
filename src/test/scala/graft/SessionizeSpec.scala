package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Session, SessionEvent}

/** Cross-batch sessionization: the open session must survive micro-batch
  * boundaries in state, close only on a proven gap or a flush, and emit
  * each session exactly once. */
class SessionizeSpec extends AnyFunSuite with SparkSpec {

  test("sessions merge across micro-batches; flush closes without opening") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val qn = "sessionize_spec"
    val q = Sessionize.sessions(input.toDS(), gapMs = 10L)
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      // batch 1: user 1 opens a session; user 2 opens one too
      input.addData(
        SessionEvent(1L, 0L, 100L, flush = false),
        SessionEvent(1L, 8L, 50L, flush = false),
        SessionEvent(1L, 5L, 25L, flush = false), // out of order inside batch
        SessionEvent(2L, 3L, 10L, flush = false))
      q.processAllAvailable()
      assert(spark.table(qn).count() == 0) // nothing closed yet — carried in state
      // batch 2: user 1 extends (gap 7 ≤ 10) then breaks (gap 25 > 10)
      input.addData(
        SessionEvent(1L, 15L, 7L, flush = false),
        SessionEvent(1L, 40L, 1L, flush = false))
      q.processAllAvailable()
      // batch 3: flush everyone
      input.addData(
        SessionEvent(1L, 1000L, 0L, flush = true),
        SessionEvent(2L, 1000L, 0L, flush = true))
      q.processAllAvailable()
      val got = spark.table(qn).as[Session].collect().toSet
      assert(got == Set(
        Session(1L, 0L, 15L, 4L, 182L),  // spans batches 1+2
        Session(1L, 40L, 40L, 1L, 1L),
        Session(2L, 3L, 3L, 1L, 10L)))
    } finally q.stop()
  }

  test("flush with no prior events emits nothing and leaves no state") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val qn = "sessionize_spec_empty"
    val q = Sessionize.sessions(input.toDS(), gapMs = 10L)
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      input.addData(SessionEvent(9L, 100L, 0L, flush = true))
      q.processAllAvailable()
      assert(spark.table(qn).count() == 0)
    } finally q.stop()
  }
}
