package graft

import java.nio.file.{Files, Paths}

/** Harness-local scratch placement (r16): the streaming checkpoints
  * already live on tmpfs when available (many small fsync'd files —
  * see StreamingOps.tempCheckpointDir); the per-run scratch dirs
  * (staged micro-batch files, per-epoch artifact/index versions,
  * foreachBatch sinks) are the same throwaway class, but were landing
  * on java.io.tmpdir — a spinning/virtual DISK on this host — so every
  * per-epoch parquet stage paid real I/O. One shared base keeps the
  * policy in one place: tmpfs when present and writable, else the JVM
  * tmpdir. A production deployment points these at durable shared
  * storage; this is placement of HARNESS plumbing, not the durability
  * story, and no content or naming changes.
  */
object Scratch {

  /** Preferred scratch base: /dev/shm when usable, else java.io.tmpdir. */
  lazy val base: String = {
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) shm.toString
    else sys.props("java.io.tmpdir")
  }

  /** A fresh scratch directory under [[base]]. */
  def tempDir(prefix: String): String =
    Files.createTempDirectory(Paths.get(base), prefix).toString
}
