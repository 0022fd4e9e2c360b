package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Scratch-directory lifecycle shared by the per-run harnesses
  * (fresh ingest lakes, appended-index builds, shard exports). */
object Scratch {

  /** Recursively delete a directory tree if present. `Files.walk`
    * returns a Stream holding OPEN directory handles — close it, or
    * every fresh-scratch query run leaks a handle until GC. */
  def deleteRecursive(base: Path): Unit = {
    if (Files.exists(base)) {
      val st = Files.walk(base)
      try st.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))
      finally st.close()
    }
  }
}
