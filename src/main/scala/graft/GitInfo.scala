package graft

/** Resolve the repository HEAD sha without shelling out (no JSON/process
  * deps in the bench tooling): `.git/HEAD` → direct sha, or a symbolic
  * ref resolved through `refs/heads/...` with a `packed-refs` fallback —
  * after `git gc` the loose ref file is absent and the sha lives only in
  * `.git/packed-refs` (`<sha> <refname>` lines; peeled `^...` lines
  * ignored). Returns "unknown" when nothing resolves, and the caller
  * decides how loudly to treat that. Shared by [[Bench]] (stamps
  * BENCH_SUMMARY.json) and [[BenchGuard]] (refuses to gate against a
  * stale summary) so the two can never drift. */
object GitInfo {
  def headSha(gitDir: String = ".git"): String = {
    def read(p: String): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p))).trim)
      catch { case _: Throwable => None }
    read(s"$gitDir/HEAD") match {
      case None => "unknown"
      case Some(head) if !head.startsWith("ref: ") => head
      case Some(head) =>
        val ref = head.stripPrefix("ref: ").trim
        read(s"$gitDir/$ref")
          .orElse(read(s"$gitDir/packed-refs").flatMap { packed =>
            packed.linesIterator
              .filterNot(l => l.startsWith("#") || l.startsWith("^"))
              .map(_.split(' '))
              .collectFirst { case Array(sha, name) if name == ref => sha }
          })
          .getOrElse("unknown")
    }
  }
}
