package graft

import java.io.{File, FileWriter}
import java.time.Instant

import org.scalatest.Reporter
import org.scalatest.events._

/** Persists every test failure/abort to `target/test-failures.log` so a
  * flake seen once under load can be *named* from the artifact instead of
  * reconstructed from scrollback (VERDICT r12 "What's wrong" #3: one
  * uncaptured flake whose test name was lost). Registered for every run
  * via `-C graft.FailureLogReporter` in build.sbt; appends, so the log
  * accumulates across repeated suite runs on the same tree.
  */
class FailureLogReporter extends Reporter {
  private def log(line: String): Unit = synchronized {
    val f = new File("target/test-failures.log")
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new FileWriter(f, true)
    try w.write(line + System.lineSeparator()) finally w.close()
  }

  override def apply(event: Event): Unit = event match {
    case e: TestFailed =>
      log(s"${Instant.ofEpochMilli(e.timeStamp)} FAILED ${e.suiteName} :: ${e.testName} :: ${e.message}")
    case e: TestCanceled =>
      log(s"${Instant.ofEpochMilli(e.timeStamp)} CANCELED ${e.suiteName} :: ${e.testName} :: ${e.message}")
    case e: SuiteAborted =>
      log(s"${Instant.ofEpochMilli(e.timeStamp)} SUITE-ABORTED ${e.suiteName} :: ${e.message}")
    case e: RunAborted =>
      log(s"${Instant.ofEpochMilli(e.timeStamp)} RUN-ABORTED :: ${e.message}")
    case _ => ()
  }
}
