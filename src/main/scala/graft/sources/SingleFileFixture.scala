package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Shared staging logic for the text-format source fixtures (CSV, JSONL):
  * write a Spark single-partition output into a `_stage` directory, move
  * the lone part file to its final name, remove the staging leftovers
  * (_SUCCESS/.crc), and record a content marker so re-runs are free.
  *
  * Fixture-only code — the production read paths
  * ([[CsvTables.eventsFromCsv]], [[JsonTables.eventsFromJsonl]]) take any
  * path/glob and never touch this. */
private[sources] object SingleFileFixture {

  /** Ensure `destFile` exists and matches `marker`; if not, run `write`
    * against a staging dir next to it and promote the part file. Returns
    * the destination path as a string. */
  def ensure(destFile: Path, marker: String)(write: Path => Unit): String =
    synchronized {
      val outDir = destFile.getParent
      val markerFile = outDir.resolve(".marker_" + destFile.getFileName)
      if (Files.exists(markerFile) && Files.exists(destFile)
          && new String(Files.readAllBytes(markerFile),
            StandardCharsets.UTF_8) == marker)
        return destFile.toString
      val stage = outDir.resolve("_stage_" + destFile.getFileName)
      write(stage)
      // close the directory stream (it holds an fd) and remove the staging
      // dir with its _SUCCESS/.crc leftovers once the part file is moved out
      val listing = Files.list(stage)
      val moved =
        try {
          val it = listing.iterator()
          var done = false
          while (it.hasNext && !done) {
            val p = it.next()
            if (p.getFileName.toString.startsWith("part-")) {
              Files.createDirectories(outDir)
              Files.move(p, destFile,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              done = true
            }
          }
          done
        } finally listing.close()
      require(moved, s"no part file produced under $stage")
      val leftovers = Files.list(stage)
      try leftovers.iterator().forEachRemaining(Files.deleteIfExists(_))
      finally leftovers.close()
      Files.deleteIfExists(stage)
      Files.write(markerFile, marker.getBytes(StandardCharsets.UTF_8))
      destFile.toString
    }
}
