package graft.util

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** File-landing helper shared by every streaming harness (the
  * registered stream queries and the stream stress tools): land a
  * one-file parquet slice into a watched directory ATOMICALLY. The
  * file-source contract behind it: a `Trigger.ProcessingTime(0)`
  * source lists continuously, and a mid-write copy could checkpoint a
  * truncated file — so slices are staged OUTSIDE the watch dir and
  * moved in with `ATOMIC_MOVE` (one copy of this logic, review r13:
  * three hand-rolled twins had to be kept in sync before). */
object StreamFiles {

  def landParquet(slice: DataFrame, stagingBase: String, watch: String,
      name: String): Unit = {
    val staged = s"$stagingBase/.staging_$name"
    slice.coalesce(1).write.mode("overwrite").parquet(staged)
    val listing = Files.list(Paths.get(staged))
    val files =
      try listing.toArray.map(_.toString)
        .filter(f => f.endsWith(".parquet") && !Paths.get(f)
          .getFileName.toString.startsWith("."))
      finally listing.close()
    files.zipWithIndex.foreach { case (f, i) =>
      Files.move(Paths.get(f), Paths.get(s"$watch/${name}_$i.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
      ()
    }
  }
}
