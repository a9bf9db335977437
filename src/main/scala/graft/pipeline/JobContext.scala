package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Job lifecycle + argument plumbing (SURVEY §2.10).
  *
  * - getResolvedOptions (awsglue/utils.py:80-159): `--KEY value` /
  *   `--KEY=value` parsing, reserved args, TempDir/RedshiftTempDir
  *   aliasing (utils.py:113-117,128-133), bookmark-option precedence
  *   (utils.py:135-155).
  * - Job.init/commit + bookmarks (awsglue/job.py:13-49): the
  *   transformation_ctx-keyed incremental-source checkpoint. Here a
  *   bookmark is a per-context watermark persisted to a state dir as
  *   JSON; `commit()` flushes atomically (write-new + move). The
  *   pipeline's actual incrementality is the anti-join (SURVEY §2.10);
  *   bookmarks cut re-reads of already-seen source slices.
  */
object GlueArgs {

  val Reserved: Set[String] = Set("JOB_NAME", "JOB_ID", "JOB_RUN_ID",
    "SECURITY_CONFIGURATION", "encryption_type", "TempDir")

  /** Parse argv into resolved options; every requested option must be
    * present (like utils.py raising GlueArgumentError).
    */
  def getResolvedOptions(args: Array[String], options: Seq[String]): Map[String, String] = {
    val parsed = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val body = a.stripPrefix("--")
        if (body.contains('=')) {
          val Array(k, v) = body.split("=", 2)
          parsed(k) = v
        } else if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          parsed(body) = args(i + 1); i += 1
        } else parsed(body) = ""
      }
      i += 1
    }
    // TempDir aliasing (utils.py:113-117): RedshiftTempDir ↔ TempDir
    if (parsed.contains("TempDir") && !parsed.contains("RedshiftTempDir"))
      parsed("RedshiftTempDir") = parsed("TempDir")
    if (parsed.contains("RedshiftTempDir") && !parsed.contains("TempDir"))
      parsed("TempDir") = parsed("RedshiftTempDir")
    val missing = options.filterNot(parsed.contains)
    require(missing.isEmpty, s"missing required arguments: ${missing.mkString(", ")}")
    (options ++ Reserved.filter(parsed.contains)).map(k => k -> parsed(k)).toMap
  }
}

/** File-backed job state: bookmarks keyed by transformation_ctx. */
final class Job(stateDir: String) {

  private var jobName: String = ""
  private val pending = scala.collection.mutable.Map.empty[String, String]
  private var committed: Map[String, String] = Map.empty

  def init(name: String, args: Map[String, String] = Map.empty): Unit = {
    jobName = name
    Files.createDirectories(Paths.get(stateDir))
    val f = Paths.get(stateDir, s"$name.bookmarks.json")
    committed =
      if (Files.exists(f)) parse(new String(Files.readAllBytes(f), "UTF-8"))
      else Map.empty
    pending.clear()
  }

  /** Current committed bookmark for a transformation context. */
  def bookmark(ctx: String): Option[String] = committed.get(ctx)

  /** Stage a new bookmark value; durable only after commit(). */
  def updateBookmark(ctx: String, value: String): Unit = pending(ctx) = value

  /** job.commit() (job.py:39-49): atomically persist staged bookmarks. */
  def commit(): Unit = {
    committed = committed ++ pending
    val f   = Paths.get(stateDir, s"$jobName.bookmarks.json")
    val tmp = Paths.get(stateDir, s"$jobName.bookmarks.json.tmp")
    Files.write(tmp, render(committed).getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, f, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    pending.clear()
  }

  private def render(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${escape(k)}": "${escape(v)}""""
    }.mkString("{", ", ", "}")

  private def escape(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private def parse(json: String): Map[String, String] = {
    val pair = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
    pair.findAllMatchIn(json).map { m =>
      unescape(m.group(1)) -> unescape(m.group(2))
    }.toMap
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
}
