package graft

/** Recursive local-path delete — shared by the q206 drain's throwaway
  * store, the tier probes' work dirs, and the specs (code review r15:
  * the five-line walk/sort/delete/close idiom had been copy-pasted at
  * six-plus sites; any future fix — symlink handling, retry — now has
  * one home). */
object FsUtil {
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walked = java.nio.file.Files.walk(p)
      try walked
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walked.close()
    }

  def deleteRecursively(s: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(s))
}
