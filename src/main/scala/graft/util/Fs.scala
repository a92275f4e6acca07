package graft.util

/** Tiny filesystem helpers shared by the scratch-dir builders — one
  * definition so a future hardening (symlink guard, locked-file retry)
  * cannot desynchronize the four call sites that used to carry private
  * clones of the same recursive delete. */
object Fs {

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}
