package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Oracle result-type gate: no `SparkEntry.oracleSql` entry may produce
  * a HUGEINT-class column in DuckDB.
  *
  * DuckDB widens integer `SUM()`/`PRODUCT()` to HUGEINT (sometimes
  * surfaced as DECIMAL(38,0)); the driver's canonicalization
  * stringifies those differently from Spark's BIGINT, so such an oracle
  * hash-fails on the DRIVER gate even when the local Python-int compare
  * is green — exactly the round-11 `stats_expectations` red row. This
  * spec shells out to `tools/oracle_lint.py` (binding-only, cheap) over
  * the full oracle map so the divergence class is caught by `sbt test`,
  * and self-tests the lint with a planted uncast SUM so a broken lint
  * cannot silently pass.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  private val sf = GraftSpark.sf
  private val lint = "tools/oracle_lint.py"

  private def pythonWithDuckdb: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  private def runLint(oracles: Map[String, String]): (Int, String) = {
    val json = oracles.map { case (k, v) =>
      def esc(s: String) = s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      s""""${esc(k)}": "${esc(v)}""""
    }.mkString("{", ",", "}")
    val tmp = Files.createTempFile("oracle_sql", ".json")
    Files.write(tmp, json.getBytes("UTF-8"))
    val out = new StringBuilder
    val code = Process(Seq("python3", lint, sf, tmp.toString))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(tmp)
    (code, out.toString)
  }

  test("no oracle SQL produces HUGEINT-class result columns") {
    assume(pythonWithDuckdb, "python3+duckdb unavailable on this host")
    assume(Files.exists(Paths.get(sf)), s"testdata $sf unavailable")
    val (code, out) = runLint(SparkEntry.oracleSql)
    assert(code == 0, s"oracle_lint flagged HUGEINT-class oracles:\n$out")
    assert(!out.contains("BAD"), out)
  }

  test("lint self-test: a planted uncast integer SUM is flagged") {
    assume(pythonWithDuckdb, "python3+duckdb unavailable on this host")
    assume(Files.exists(Paths.get(sf)), s"testdata $sf unavailable")
    val planted = Map("__canary__" ->
      "SELECT SUM(CASE WHEN r_regionkey > 0 THEN 1 ELSE 0 END) AS f FROM region")
    val (code, out) = runLint(planted)
    assert(code == 1, s"lint must flag the canary; output:\n$out")
    assert(out.contains("__canary__"), out)
  }
}
