package graft.queries

/** The shared fixture-staging seam (factored in r11 from six
  * copy-pasted sites): a per-sf scratch directory under
  * `graft_export`, rebuilt whenever the SOURCE fixture is newer than
  * the staging marker — a driver-side fixture regeneration (the r5
  * events.ts incident) must never leave a gate reading stale staged
  * data. Per-sf keying means sf0.001/sf0.01/sf0.1 runs never mix
  * files.
  */
private[queries] object Staging {

  def scratchDir(sfDir: String, name: String): java.nio.file.Path =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_export",
      java.nio.file.Paths.get(sfDir).getFileName.toString, name)

  /** Return `name`'s scratch dir, (re)built by `write` when its
    * `_SUCCESS` marker is missing or older than `srcTable` (a parquet
    * file name in `sfDir`). `write` must end in a parquet overwrite (it
    * produces the `_SUCCESS` marker the staleness check reads).
    */
  def stageIfStale(sfDir: String, name: String, srcTable: String)
                  (write: java.nio.file.Path => Unit): java.nio.file.Path = {
    val dir = scratchDir(sfDir, name)
    val src = java.nio.file.Paths.get(sfDir, srcTable)
    val marker = dir.resolve("_SUCCESS")
    val stale = !java.nio.file.Files.exists(marker) ||
      java.nio.file.Files.getLastModifiedTime(src)
        .compareTo(java.nio.file.Files.getLastModifiedTime(marker)) > 0
    if (stale) write(dir)
    dir
  }

  /** Write `slices` as one parquet FILE each under `dir`, named
    * slice00…, with distinct increasing mtimes — so FileStreamSource
    * (maxFilesPerTrigger=1, oldest-first) delivers slice i as batch i.
    * Hoisted (r14) from the three per-gate stagers that hand-copied
    * the rename/mtime loop. Ends with the `_SUCCESS` marker
    * [[stageIfStale]] reads.
    */
  def writeSliceFiles(dir: java.nio.file.Path,
                      slices: Seq[org.apache.spark.sql.DataFrame],
                      tmpPrefix: String): Unit = {
    java.nio.file.Files.createDirectories(dir)
    // wipe any stale staged files so a restage can't leave extras
    Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .foreach(f => if (f.isFile) f.delete())
    val base = System.currentTimeMillis()
    slices.zipWithIndex.foreach { case (slice, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(tmpPrefix)
      slice.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"$tmpPrefix staging: no part file under $tmp"))
      val dest = dir.resolve(f"slice$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // distinct, increasing mtimes pin the batch order
      dest.toFile.setLastModified(base + i * 2000L)
    }
    java.nio.file.Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
  }
}
