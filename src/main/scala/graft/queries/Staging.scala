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
}
