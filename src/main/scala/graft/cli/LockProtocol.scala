package graft.cli

import java.nio.file.{Files, Path, StandardOpenOption}

/**
 * Lock-file mutual exclusion + 0/1 status-file protocol shared by the two
 * CLI drivers, mirroring `run_kafka_to_hive.py:41-43,59-72` and
 * `run_compact_tables.py:62-66,81-92`: both jobs contend on the same
 * `run_stream.lock` so ingest and compaction never run concurrently, and
 * each writes `0` (success) or `1` (lock held / failure) to its own status
 * file for the external scheduler.
 *
 * The reference's bare `except: os.remove(lock)` (`run_kafka_to_hive.py:66`)
 * deletes a lock held by ANOTHER instance on any failure — a real race
 * (SURVEY §2.7). Reproduced protocol, not the bug: the lock is created
 * atomically (CREATE_NEW) and removed only by the instance that created it.
 */
object LockProtocol {

  val lockName = "run_stream.lock"

  /** Run `body` under the lock. Returns the status code written: 0 on
    * success, 1 when the lock is held or `body` throws. */
  def withLock(lockDir: Path, statusFile: Path)(body: => Unit): Int = {
    val lock = lockDir.resolve(lockName)
    def writeStatus(code: Int): Int = {
      Files.createDirectories(statusFile.getParent)
      Files.writeString(statusFile, code.toString)
      code
    }
    Files.createDirectories(lockDir)
    val acquired =
      try { Files.write(lock, Array.emptyByteArray, StandardOpenOption.CREATE_NEW); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (!acquired) writeStatus(1)
    else {
      try { body; writeStatus(0) }
      catch {
        case e: Throwable =>
          System.err.println(s"[graft] run failed: ${e.getMessage}")
          writeStatus(1)
      } finally Files.deleteIfExists(lock)
    }
  }
}
