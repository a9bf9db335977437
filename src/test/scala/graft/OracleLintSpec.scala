package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards against the round-8 oracle-typing incident: a `sum(...)` over
  * an integer expression returns HUGEINT (int128) in DuckDB where Spark
  * writes int64, so the driver's encoding hash fails on byte-identical
  * values. The repo convention is `CAST(sum(...) AS BIGINT/DOUBLE)` or
  * summing a DECIMAL/DOUBLE.
  *
  * Two layers:
  *
  *  1. a textual lint over the FINAL projection of every oracle (a bare
  *     integer sum is only a bug when its HUGEINT reaches the output
  *     schema — CTE-internal sums that are cast/divided later are fine,
  *     and 14 green oracles carry such intermediates);
  *  2. the authoritative check — run every oracle against sf0.001 in
  *     DuckDB and assert no result column is HUGEINT. This needs the
  *     driver-side python3+duckdb and the generated testdata, so it
  *     CANCELS (not fails) where those are absent; scripts/
  *     local_verify.py performs the same probe in the driver loop.
  *     The probe catches what no textual rule can: a CTE's bare sum
  *     leaking to the output through an untyped pass-through column
  *     (exactly q156's round-8 shape).
  */
class OracleLintSpec extends AnyFunSuite {

  /** The final top-level projection: text between the last depth-0
    * SELECT and the following depth-0 FROM (or end of string).
    */
  private def finalProjection(sqlRaw: String): String = {
    val sql = sqlRaw.toLowerCase
    var depth = 0
    var lastSelect = -1
    var fromAfter = sql.length
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && sql.startsWith("select", i) &&
              (i == 0 || !sql.charAt(i - 1).isLetterOrDigit)) {
            lastSelect = i
            fromAfter = sql.length
          } else if (depth == 0 && lastSelect >= 0 && i > lastSelect &&
              sql.startsWith("from", i) &&
              !sql.charAt(i - 1).isLetterOrDigit &&
              (i + 4 == sql.length || !sql.charAt(i + 4).isLetterOrDigit) &&
              fromAfter == sql.length) {
            fromAfter = i
          }
      }
      i += 1
    }
    if (lastSelect < 0) sql else sql.substring(lastSelect, fromAfter)
  }

  /** Index of the matching ')' for the '(' at `open`, or -1. */
  private def matching(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def wordBefore(s: String, p: Int): String = {
    var e = p
    while (e > 0 && s.charAt(e - 1).isWhitespace) e -= 1
    var b = e
    while (b > 0 && (s.charAt(b - 1).isLetterOrDigit || s.charAt(b - 1) == '_'))
      b -= 1
    s.substring(b, e)
  }

  /** Offsets of `sum(` calls in `sql` that are neither under an outer
    * CAST nor summing an inner CAST to a non-integer type.
    */
  private def unsafeSums(sqlRaw: String): Seq[Int] = {
    val sql = sqlRaw.toLowerCase
    val castDepth = new Array[Int](sql.length + 1)
    val stack = scala.collection.mutable.Stack.empty[Boolean]
    var depth = 0
    var i = 0
    while (i < sql.length) {
      castDepth(i) = depth
      sql.charAt(i) match {
        case '(' =>
          val isCast = wordBefore(sql, i) == "cast"
          stack.push(isCast)
          if (isCast) depth += 1
        case ')' if stack.nonEmpty =>
          if (stack.pop()) depth -= 1
        case _ =>
      }
      i += 1
    }
    val bad = scala.collection.mutable.ArrayBuffer.empty[Int]
    var from = 0
    while ({ from = sql.indexOf("sum(", from); from >= 0 }) {
      val isWordStart =
        from == 0 || !(sql.charAt(from - 1).isLetterOrDigit ||
          sql.charAt(from - 1) == '_')
      if (isWordStart && castDepth(from) == 0) {
        var a = from + 4
        while (a < sql.length && sql.charAt(a).isWhitespace) a += 1
        val innerOk =
          if (sql.startsWith("cast", a)) {
            var o = a + 4
            while (o < sql.length && sql.charAt(o).isWhitespace) o += 1
            if (o < sql.length && sql.charAt(o) == '(') {
              val close = matching(sql, o)
              close > 0 && {
                val inner = sql.substring(o + 1, close)
                val asIdx = inner.lastIndexOf(" as ")
                asIdx >= 0 && {
                  val t = inner.substring(asIdx + 4).trim
                  t.startsWith("decimal") || t.startsWith("numeric") ||
                    t.startsWith("double") || t.startsWith("float") ||
                    t.startsWith("real")
                }
              }
            } else false
          } else false
        if (!innerOk) bad += from
      }
      from += 4
    }
    bad.toSeq
  }

  test("no bare integer sum() in any oracle's FINAL projection") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val proj = finalProjection(sql)
        val bad = unsafeSums(proj)
        if (bad.isEmpty) Nil
        else Seq(s"$name: " + bad.map { p =>
          proj.substring(p, math.min(proj.length, p + 48)).replace('\n', ' ')
        }.mkString(" | "))
    }
    assert(offenders.isEmpty,
      "bare sum() in a final projection (DuckDB returns HUGEINT for " +
        "integer args; wrap in CAST(... AS BIGINT/DOUBLE) or sum a " +
        "DECIMAL/DOUBLE):\n  " + offenders.mkString("\n  "))
  }

  test("the textual lint distinguishes safe and unsafe shapes") {
    assert(unsafeSums("SELECT sum(x) FROM t").nonEmpty)
    assert(unsafeSums(
      "SELECT sum(CASE WHEN a THEN 1 ELSE 0 END) FROM t").nonEmpty)
    assert(unsafeSums("SELECT CAST(sum(x) AS BIGINT) FROM t").isEmpty)
    assert(unsafeSums(
      "SELECT CAST(COALESCE(sum(x) OVER (ORDER BY y), 0) AS BIGINT) " +
        "FROM t").isEmpty)
    assert(unsafeSums(
      "SELECT sum(CAST(x AS DECIMAL(18,4))) FROM t").isEmpty)
    assert(unsafeSums("SELECT sum(CAST(x AS DOUBLE)) FROM t").isEmpty)
    // an inner cast to an INTEGER type still yields HUGEINT from sum()
    assert(unsafeSums("SELECT sum(CAST(x AS BIGINT)) FROM t").nonEmpty)
    assert(unsafeSums("SELECT checksum(x) FROM t").isEmpty)
    assert(unsafeSums(
      "SELECT round(CAST(sum(g) AS DOUBLE) / count(*), 6) FROM t").isEmpty)
    // the projection scoper: CTE sums are out of scope, the final
    // select's are in scope — including after a WITH chain
    val cte = "WITH c AS (SELECT k, sum(v) AS t FROM x GROUP BY k) " +
      "SELECT k, CAST(t AS BIGINT) AS t FROM c"
    assert(unsafeSums(finalProjection(cte)).isEmpty)
    val cteBadFinal = "WITH c AS (SELECT k, sum(v) AS t FROM x GROUP BY k) " +
      "SELECT k, sum(t) AS s FROM c GROUP BY k"
    assert(unsafeSums(finalProjection(cteBadFinal)).nonEmpty)
  }

  test("DuckDB result schema of every oracle is HUGEINT-free (authoritative)") {
    val sfDir = new java.io.File("/root/testdata/sf0.001")
    val python = Seq("/usr/bin/env", "python3")
    val probeOk =
      try {
        val p = new ProcessBuilder(
          (python ++ Seq("-c", "import duckdb")): _*).start()
        p.waitFor() == 0
      } catch { case _: Exception => false }
    assume(sfDir.isDirectory && probeOk,
      "needs the driver-side python3+duckdb and generated testdata — " +
        "scripts/local_verify.py runs the same probe in the driver loop")

    // one python process for all oracles: LIMIT-0 type probes only
    val tmp = java.nio.file.Files.createTempDirectory("oracle_lint")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      java.nio.file.Files.writeString(tmp.resolve(s"$name.sql"), sql)
    }
    val script =
      s"""import duckdb, glob, os, sys
         |con = duckdb.connect()
         |sf = "${sfDir.getAbsolutePath}"
         |for t in ["region","nation","customer","supplier","part","orders",
         |          "lineitem","events","documents","embeddings"]:
         |    p = os.path.join(sf, t + ".parquet")
         |    if os.path.exists(p):
         |        con.execute(
         |            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
         |bad = []
         |for f in sorted(glob.glob("${tmp.toAbsolutePath}/*.sql")):
         |    name = os.path.basename(f)[:-4]
         |    rel = con.sql(open(f).read())
         |    hug = [c for c, t in zip(rel.columns, rel.types)
         |           if "HUGEINT" in str(t).upper()]
         |    if hug:
         |        bad.append(f"{name}: {hug}")
         |print("\\n".join(bad))
         |sys.exit(1 if bad else 0)
         |""".stripMargin
    val scriptPath = tmp.resolve("probe.py")
    java.nio.file.Files.writeString(scriptPath, script)
    val proc = new ProcessBuilder(
      (python :+ scriptPath.toAbsolutePath.toString): _*)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    val code = proc.waitFor()
    assert(code == 0, s"HUGEINT columns in oracle results:\n$out")
  }
}
