package graft.tools

import java.nio.file.{Files, Paths}

/** Builder-side shortcut: write `oracle_sql.json` (the exact artifact
  * Verify emits) WITHOUT running any Spark query — the oracle map is a
  * pure value. Lets `tools/audit_oracle_types.py` type-check all 165
  * oracle statements in seconds instead of after a full Verify run.
  *
  * Usage: runMain graft.tools.DumpOracle <outFile>
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle statements to $out")
  }
}
