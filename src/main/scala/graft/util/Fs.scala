package graft.util

/** Tiny filesystem helpers shared by the scratch-dir builders — one
  * definition so a future hardening (symlink guard, locked-file retry)
  * cannot desynchronize the call sites that used to carry private
  * clones of the same recursive delete. */
object Fs {

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Recursive byte size of a file tree (0 for a missing path). */
  def du(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty).map(du).sum

  /** A per-process scratch root under java.io.tmpdir:
    * `graft_<family>_p<pid><suffix>`. The PID suffix makes the root
    * single-writer by construction (two JVMs sharing tmpdir can never
    * rebuild one root under each other's reads), but a bare suffix
    * LEAKS: each process orphans a full copy of its tables when it
    * exits, unbounded across runs — repeated bench/verify rounds fill
    * tmp until runs die on ENOSPC. So computing a root also sweeps
    * stale SIBLINGS of the same family whose embedded pid is no longer
    * alive (once per family per JVM; a pid recycled by an unrelated
    * process just defers that dir's sweep to a later run — conservative
    * by design, never the reverse: a LIVE pid is never swept, and no
    * JVM ever reads another pid's root, so the sweep cannot race a
    * reader). Concurrent sweeps of the same dead dir are harmless —
    * [[deleteRecursively]] tolerates entries vanishing under it. */
  def processScratchRoot(family: String, suffix: String): String = {
    val tmpdir = sys.props("java.io.tmpdir")
    val prefix = s"graft_${family}_p"
    swept.synchronized {
      if (!swept.contains(prefix)) {
        sweepStaleSiblings(tmpdir, prefix)
        swept += prefix
      }
    }
    s"$tmpdir/$prefix${ProcessHandle.current().pid()}$suffix"
  }

  private val swept = scala.collection.mutable.Set[String]()

  private def sweepStaleSiblings(tmpdir: String, prefix: String): Unit =
    Option(new java.io.File(tmpdir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .foreach { f =>
        val pidStr = f.getName.stripPrefix(prefix).takeWhile(_.isDigit)
        val alive = pidStr.nonEmpty && {
          val h = ProcessHandle.of(pidStr.toLong)
          h.isPresent && h.get.isAlive
        }
        if (!alive) deleteRecursively(f)
      }
}
