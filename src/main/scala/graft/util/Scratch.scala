package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Scratch-directory lifecycle shared by the per-run harnesses
  * (fresh ingest lakes, appended-index builds, shard exports). */
object Scratch {

  /** Absolute build-scratch root, resolved from the working directory
    * ONCE at class load — checkout-location-independent (the repo may
    * live anywhere) yet stable for the whole run even if something
    * later chdirs. All scratch writers go through [[under]] so the
    * entire engine shares one `target/` tree. */
  val Root: Path = java.nio.file.Paths.get("target")
    .toAbsolutePath.normalize

  /** Scratch path for `rel` under [[Root]]. */
  def under(rel: String): Path = Root.resolve(rel)

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
