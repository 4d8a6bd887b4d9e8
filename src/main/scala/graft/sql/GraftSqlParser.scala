package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types._

import graft.ops.{ManifestTable, ZTable}

/** SQL TEXT front-end for the transactional table format — EP1
  * parity: the reference's dominant entry point is raw SQL strings
  * (`dags/logistics-airbyte-sql.py:25-49` — `MERGE INTO … USING (…)
  * AS src ON tgt.k = src.k WHEN MATCHED THEN UPDATE SET … WHEN NOT
  * MATCHED THEN INSERT (…) VALUES (…)`;
  * `dags/snowflake-EDW-ETL-dag.py:188-256` — multi-key MERGE +
  * DELETE/UPDATE statements), so a user must be able to paste that
  * statement TEXT at `spark.sql(...)` and have it land on the
  * manifest store. Injected via
  * [[graft.expressions.GraftExtensions]]'s `injectParser` (builder
  * extensions — the Delta pattern); graft tables are addressed as
  * `graft.`/abs/path`` (the `delta.`path`` idiom) or — once a
  * [[GraftCatalog]] base/registration is in place — by the
  * reference's own dotted names (`MERGE INTO silver.fact_shipments`,
  * `dags/logistics-airbyte-sql.py:25`).
  *
  * Surface (everything else delegates to Spark's parser verbatim):
  * {{{
  *   MERGE INTO graft.`/p` [AS t] USING <tbl|(subquery)> [AS s]
  *     ON t.k1 = s.k1 [AND …]
  *     WHEN MATCHED THEN UPDATE SET * | col = s.col[, …]
  *     WHEN NOT MATCHED THEN INSERT * | (cols) VALUES (s.cols)
  *   UPDATE graft.`/p` SET col = <expr>[, …] [WHERE <expr>]
  *   DELETE FROM graft.`/p` [WHERE <expr>]
  *   INSERT INTO graft.`/p` [(cols)] SELECT …|VALUES …
  *   CREATE TABLE graft.`/p` [PARTITIONED BY (col)] AS SELECT …
  *   GRAFT CATALOG SET BASE '<dir>' | REGISTER <name> AT '<dir>'
  *                 | UNREGISTER <name>
  *   GRAFT STREAM SYNC <src> TO <sink> KEYS (…) GROUP BY (…)
  *                [PARTITIONED BY (col)]
  *                VALUE <expr> AS <alias> CHECKPOINT '<dir>'
  *                [TICK <n> MILLISECONDS]
  *   GRAFT STREAM STOP '<id>'
  *   OPTIMIZE graft.`/p` [ZORDER BY (x, y[, tie])] [FILES n]
  *   OPTIMIZE graft.`/p` WHERE <pcol> = 'v' [OR …] | <pcol> IN (…)
  *                       ZORDER BY (x, y[, tie]) [FILES n]
  *   VACUUM graft.`/p` RETAIN <n> VERSIONS
  *   RESTORE [TABLE] graft.`/p` [TO] VERSION AS OF <n>
  *                              | TIMESTAMP AS OF '<UTC ts>'
  *   ALTER TABLE graft.`/p` RENAME COLUMN a TO b
  *                        | DROP COLUMN a | ADD COLUMN a <type>
  *   DESCRIBE HISTORY | DETAIL | COLUMNS graft.`/p`
  * }}}
  * The READ side is table-valued functions registered by
  * [[graft.expressions.GraftExtensions]]: `graft_table('/p')`,
  * `graft_version('/p', v)`, `graft_as_of('/p', ts)`,
  * `graft_changes('/p', from, to, keys)`,
  * `graft_partition('/p', 'v1,v2')`.
  *
  * Semantics route to the SAME kernels the Scala API uses —
  * [[ManifestTable.mergeWithRetry]] (OCC rebase),
  * [[ManifestTable.updateWhere]] (single-projection pre-update-row
  * SET), [[ManifestTable.deleteWhere]] (NULL = kept) — so the SQL and
  * Scala surfaces can never diverge. WHERE/SET right-hand sides are
  * parsed by Spark's own expression parser (`functions.expr`), so the
  * full function surface (incl. the [[graft.expressions]] natives) is
  * available inside them. MERGE restrictions are the kernel's own:
  * equality ON keys with the SAME column name on both sides,
  * UPDATE SET from same-named source columns, INSERT of the full
  * source row — exactly the reference's usage shape; anything else
  * fails loudly at parse time rather than silently doing the wrong
  * merge. Statement parsing is done with a quote/paren-aware
  * top-level scanner, NOT regex-through-subqueries — a `JOIN … ON`
  * or `CASE WHEN` inside the USING subquery cannot fool the splitter.
  *
  * 100-TB shape: the commands are thin routers — the heavy work runs
  * the same distributed plans as the Scala API; DESCRIBE outputs are
  * O(versions)/O(files) metadata rows (the only driver-side collect).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.route(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseExpression(s: String) = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String) =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String) =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String) =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String) = delegate.parseQuery(s)
  override def parseRoutineParam(s: String) = delegate.parseRoutineParam(s)
  override def parseTableSchema(s: String) = delegate.parseTableSchema(s)
  override def parseDataType(s: String) = delegate.parseDataType(s)
}

/** The routed statement as a runnable command: `body` executes the
  * table-format op against the live session and returns the result
  * rows (a version number for DML, metadata rows for DESCRIBE). */
case class GraftSqlCommand(statement: String,
    override val output: Seq[Attribute],
    body: SparkSession => Seq[Row]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = body(session)
  override def simpleString(maxFields: Int): String =
    s"GraftSqlCommand($statement)"
}

object GraftSqlParser {

  /** Route a statement to a table-format command; None = not ours
    * (delegate). Only statements whose graft.`path` ref follows the
    * verb DIRECTLY are taken — a non-graft UPDATE whose subquery
    * merely mentions a graft ref still belongs to Spark, while a
    * malformed statement that IS addressed at a graft table fails
    * loudly in its parse instead of producing a confusing Spark
    * error. */
  def route(sqlText: String): Option[LogicalPlan] = {
    val text = stripComments(sqlText).trim.stripSuffix(";").trim
    // GRAFT CATALOG / GRAFT STREAM statements lead with our keyword —
    // check first (anything misshapen after it fails loudly: it was
    // unambiguously addressed at us)
    if (catalogRx.pattern.matcher(text).matches())
      return Some(parseCatalog(text))
    if ("(?is)^GRAFT\\s+STREAM\\s".r.findPrefixMatchOf(text).isDefined)
      return Some(parseStream(text))
    // cheap gate: a graft.`path` ref anywhere, or a catalog that
    // COULD resolve a bare name (opt-in) — otherwise not ours
    def headed(verb: String, mustExist: Boolean = true): Boolean =
      ("(?is)^" + verb + "\\s+").r.findPrefixMatchOf(text)
        .exists(m =>
          resolveAnyRef(text.substring(m.end), mustExist).isDefined)
    if (headed("MERGE\\s+INTO")) Some(parseMerge(text))
    else if (headed("UPDATE")) Some(parseUpdate(text))
    else if (headed("DELETE\\s+FROM")) Some(parseDelete(text))
    else if (headed("INSERT\\s+INTO")) Some(parseInsert(text))
    else if (headed("CREATE\\s+TABLE", mustExist = false) &&
        createClaimable(text))
      Some(parseCreate(text))
    else if (headed("OPTIMIZE")) Some(parseOptimize(text))
    else if (headed("VACUUM")) Some(parseVacuum(text))
    else if (headed("RESTORE(?:\\s+TABLE)?"))
      Some(parseRestore(text))
    else if (headed("DESC(?:RIBE)?\\s+HISTORY"))
      Some(parseDescribe(text, history = true))
    else if (headed("DESC(?:RIBE)?\\s+DETAIL"))
      Some(parseDescribe(text, history = false))
    else if (headed("DESC(?:RIBE)?\\s+COLUMNS"))
      Some(parseDescribeColumns(text))
    else if (headed("ALTER\\s+TABLE")) Some(parseAlter(text))
    else None
  }

  private val refRx = "(?is)graft\\s*\\.\\s*`([^`]+)`".r

  /** CREATE TABLE claim discipline: an explicit graft.`/p` ref is
    * always ours (malformed → loud parse failure), but a bare dotted
    * NAME — resolvable whenever GRAFT CATALOG SET BASE is active — is
    * claimed only when the remainder actually has the
    * `[PARTITIONED BY (col)] AS <query>` shape. A legitimate Spark
    * statement like `CREATE TABLE db.t (id INT) USING parquet` falls
    * through untouched instead of dying in [[parseCreate]]. */
  private def createClaimable(text: String): Boolean = {
    val m = "(?is)^CREATE\\s+TABLE\\s+".r.findPrefixMatchOf(text).get
    val after = text.substring(m.end).trim
    if (refRx.findPrefixMatchOf(after).isDefined) true
    else resolveAnyRef(after, mustExist = false).exists { case (_, rest) =>
      ("(?is)^(?:PARTITIONED\\s+BY\\s*\\(\\s*\\S+?\\s*\\)\\s+)?AS\\s")
        .r.findPrefixMatchOf(rest).isDefined
    }
  }

  /** A dotted table NAME (≥ 2 parts — single-part names stay Spark's:
    * temp views must never be hijacked), resolvable via
    * [[GraftCatalog]]. The reference's 3-part Snowflake names
    * (`LOGISTICS_DEMO_1.SILVER.FACT_SHIPMENTS`) match here. */
  private val nameRx =
    ("(?is)^(`?[A-Za-z_][\\w$]*`?(?:\\s*\\.\\s*" +
      "`?[A-Za-z_][\\w$]*`?)+)").r

  /** Resolve a leading table reference — `graft.`/path`` (always
    * claimed) or a catalog-resolvable dotted name (claimed only when
    * it resolves AND, unless `mustExist=false` for CREATE, a
    * committed graft version exists at the resolved root — a
    * Spark-catalog table of the same shape falls through untouched).
    * Returns (root, rest-of-statement). */
  private def resolveAnyRef(s: String, mustExist: Boolean)
      : Option[(String, String)] = {
    val t = s.trim
    refRx.findPrefixMatchOf(t) match {
      case Some(m) => Some((m.group(1), t.substring(m.end).trim))
      case None => nameRx.findPrefixMatchOf(t).flatMap { m =>
        GraftCatalog.resolve(m.group(1)).flatMap { root =>
          val ok = !mustExist || scala.util.Try(
            graft.ops.ManifestTable.currentVersion(
              org.apache.spark.sql.SparkSession.active, root)
              .isDefined).getOrElse(false)
          if (ok) Some((root, t.substring(m.end).trim)) else None
        }
      }
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft SQL: $msg")

  // ---- quote/paren-aware top-level text scanning ----

  /** True when, inside a single- or double-quoted literal, `c` is a
    * backslash escaping the NEXT char (Spark SQL's default string
    * escaping): the scanner must skip the escaped char or the quote
    * state mis-toggles at the escaped quote and every downstream
    * clause split goes wrong. Backticks have no backslash escaping. */
  private def isEscape(c: Char, q: Char): Boolean =
    c == '\\' && (q == '\'' || q == '"')

  /** Drop `--` line comments (outside quotes/backticks). */
  private def stripComments(s: String): String = {
    val out = new StringBuilder
    var i = 0; var q = '\u0000'
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != '\u0000') {
        if (isEscape(c, q) && i + 1 < s.length) {
          out += c; out += s.charAt(i + 1); i += 2
        } else { if (c == q) q = '\u0000'; out += c; i += 1 }
      }
      else if (c == '\'' || c == '`' || c == '"') { q = c; out += c; i += 1 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else { out += c; i += 1 }
    }
    out.toString
  }

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Index of `word` (case-insensitive, word-boundary) at paren depth
    * 0 outside quotes/backticks; -1 if absent. A `JOIN … ON` or
    * `CASE WHEN` inside a parenthesized subquery sits at depth > 0
    * and never matches. */
  private def topIndexOf(s: String, word: String, from: Int = 0): Int = {
    var i = math.max(0, from); var depth = 0; var q = '\u0000'
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != '\u0000') {
        if (isEscape(c, q)) i += 1 // skip the escaped char
        else if (c == q) q = '\u0000'
      }
      else c match {
        case '\'' | '`' | '"' => q = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 &&
              s.regionMatches(true, i, word, 0, word.length) &&
              (i == 0 || !isWordChar(s.charAt(i - 1))) &&
              (i + word.length >= s.length ||
                !isWordChar(s.charAt(i + word.length))))
            return i
      }
      i += 1
    }
    -1
  }

  /** Split on top-level commas (or a top-level keyword like AND). */
  private def splitTop(s: String, sep: String): Seq[String] = {
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    var start = 0
    var i = if (sep.forall(!isWordChar(_))) indexOfTopChar(s, sep, 0)
      else topIndexOf(s, sep, 0)
    while (i >= 0) {
      parts += s.substring(start, i)
      start = i + sep.length
      i = if (sep.forall(!isWordChar(_))) indexOfTopChar(s, sep, start)
        else topIndexOf(s, sep, start)
    }
    parts += s.substring(start)
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def indexOfTopChar(s: String, tok: String, from: Int): Int = {
    var i = math.max(0, from); var depth = 0; var q = '\u0000'
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != '\u0000') {
        if (isEscape(c, q)) i += 1 // skip the escaped char
        else if (c == q) q = '\u0000'
      }
      else c match {
        case '\'' | '`' | '"' => q = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && s.startsWith(tok, i)) return i
      }
      i += 1
    }
    -1
  }

  /** Parse a leading table ref — `graft.`path`` or a
    * [[GraftCatalog]]-resolvable dotted name (route() already decided
    * the statement is ours); returns (root, rest). */
  private def parseRef(s: String): (String, String) =
    resolveAnyRef(s, mustExist = false).getOrElse(
      fail(s"expected graft.`<table path>` or a catalog-resolvable " +
        s"name at: ${s.take(60)}"))

  /** Strip an `alias.` prefix off a column reference; unquote. */
  private def bareName(ref: String): String = {
    val t = ref.trim.stripPrefix("`").stripSuffix("`")
    val i = t.lastIndexOf('.')
    (if (i < 0) t else t.substring(i + 1)).trim
      .stripPrefix("`").stripSuffix("`")
  }

  private def attrs(fields: (String, DataType)*): Seq[Attribute] =
    fields.map { case (n, t) =>
      AttributeReference(n, t, nullable = true)()
    }

  private val versionOut = attrs("version" -> LongType)

  // ---- statements ----

  private def parseMerge(text: String): LogicalPlan = {
    val m = "(?is)^MERGE\\s+INTO\\s+".r.findPrefixMatchOf(text)
      .getOrElse(fail(s"malformed MERGE: ${text.take(60)}"))
    val (root, rest) = parseRef(text.substring(m.end))
    val iUsing = topIndexOf(rest, "USING")
    if (iUsing < 0) fail("MERGE needs a USING clause")
    val iOn = topIndexOf(rest, "ON", iUsing)
    if (iOn < 0) fail("MERGE needs an ON clause")
    val iWhen = topIndexOf(rest, "WHEN", iOn)
    if (iWhen < 0) fail("MERGE needs WHEN clauses")
    val srcText = rest.substring(iUsing + 5, iOn).trim
    val condText = rest.substring(iOn + 2, iWhen).trim
    // ON: conjunction of same-name equalities — the upsert kernel's
    // key contract; anything else must fail loudly, not merge wrongly
    val keys = splitTop(condText, "AND").map { eq =>
      val sides = splitTop(eq, "=")
      if (sides.size != 2) fail(s"ON conjunct is not an equality: $eq")
      val (l, r) = (bareName(sides(0)), bareName(sides(1)))
      if (!l.equalsIgnoreCase(r))
        fail(s"ON keys must have the same column name on both sides " +
          s"(got $l vs $r) — the MERGE kernel matches by name")
      l
    }
    if (keys.isEmpty) fail("MERGE needs at least one ON key")
    // WHEN clauses: exactly the upsert pair (matched-update +
    // not-matched-insert) — the reference's only MERGE shape
    var updateCols: Option[Seq[String]] = None
    var sawUpdate = false; var sawInsert = false
    splitTop(rest.substring(iWhen), "WHEN").foreach { clause =>
      val cu = clause.trim
      val upd = "(?is)^MATCHED\\s+THEN\\s+UPDATE\\s+SET\\s+(.*)$".r
      val ins = "(?is)^NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s*(.*)$".r
      cu match {
        case upd(setSpec) =>
          sawUpdate = true
          if (setSpec.trim != "*") {
            val cols = splitTop(setSpec, ",").map { a =>
              val sides = splitTop(a, "=")
              if (sides.size != 2) fail(s"bad SET assignment: $a")
              val (l, r) = (bareName(sides(0)), bareName(sides(1)))
              if (!l.equalsIgnoreCase(r))
                fail(s"MERGE UPDATE SET supports col = src.col with " +
                  s"the same name (got $l = $r)")
              l
            }
            updateCols = Some(cols)
          }
        case ins(insSpec) =>
          sawInsert = true
          val is = insSpec.trim
          if (is != "*") {
            val lv = "(?is)^\\((.*?)\\)\\s*VALUES\\s*\\((.*)\\)$".r
            is match {
              case lv(colsT, valsT) =>
                val cs = splitTop(colsT, ",").map(bareName)
                val vs = splitTop(valsT, ",").map(bareName)
                if (cs.size != vs.size ||
                    cs.zip(vs).exists { case (c, v) =>
                      !c.equalsIgnoreCase(v) })
                  fail("MERGE INSERT must map each column from the " +
                    "same-named source column (the kernel inserts the " +
                    s"full source row): (${cs.mkString(",")}) VALUES " +
                    s"(${vs.mkString(",")})")
              case _ => fail(s"bad INSERT clause: ${is.take(60)}")
            }
          }
        case other => fail(s"unsupported WHEN clause: ${other.take(60)}")
      }
    }
    if (!sawUpdate || !sawInsert)
      fail("MERGE needs WHEN MATCHED THEN UPDATE and WHEN NOT MATCHED " +
        "THEN INSERT (the upsert kernel's shape)")
    val srcBody: SparkSession => org.apache.spark.sql.DataFrame =
      if (srcText.startsWith("(")) {
        val close = matchingParen(srcText, 0)
        val inner = srcText.substring(1, close)
        s => s.sql(inner)
      } else {
        val name = srcText.split("\\s+").head
        s => s.table(name)
      }
    GraftSqlCommand(s"MERGE INTO graft.`$root`", versionOut, session => {
      ManifestTable.mergeWithRetry(session, root, srcBody(session),
        keys, updateCols)
      Seq(Row(ManifestTable.currentVersion(session, root)
        .getOrElse(fail(s"no committed version at $root"))))
    })
  }

  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0; var i = open; var q = '\u0000'
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != '\u0000') {
        if (isEscape(c, q)) i += 1 // skip the escaped char
        else if (c == q) q = '\u0000'
      }
      else c match {
        case '\'' | '`' | '"' => q = c
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    fail("unbalanced parentheses")
  }

  /** `GRAFT CATALOG SET BASE '<dir>'` / `GRAFT CATALOG REGISTER
    * <name> AT '<dir>'` — the name→root registration surface as
    * statement text (clearly namespaced: no Spark statement starts
    * with GRAFT, so no delegation risk). */
  private val catalogRx =
    ("(?is)^GRAFT\\s+CATALOG\\s+(?:SET\\s+BASE\\s+'([^']+)'|" +
      "REGISTER\\s+(\\S+)\\s+AT\\s+'([^']+)'|" +
      "UNREGISTER\\s+(\\S+))\\s*$").r

  private def parseCatalog(text: String): LogicalPlan = text match {
    case catalogRx(base, name, root, dropName) =>
      GraftSqlCommand("GRAFT CATALOG", attrs("ok" -> BooleanType),
        _ => {
          if (base != null) GraftCatalog.setBase(base)
          else if (dropName != null) GraftCatalog.unregister(dropName)
          else GraftCatalog.register(name, root)
          Seq(Row(true))
        })
    case other => fail(s"bad GRAFT CATALOG statement: ${other.take(60)}")
  }

  /** `GRAFT STREAM SYNC <src> TO <sink> KEYS (k[, …]) GROUP BY
    * (g[, …]) VALUE <expr> AS <alias> CHECKPOINT '<dir>'
    * [TICK <n> MILLISECONDS]` — the native change-feed consumer
    * ([[graft.streaming.CdfStream.runSyncSink]], the q226 chained
    * shape) as statement text: keeps `<sink>` equal to the source's
    * grouped aggregate incrementally (exactly-once via the sink's own
    * `cdfv-` batch keys), source offsets = committed versions.
    * Returns the stream id; `GRAFT STREAM STOP '<id>'` stops it.
    * Both refs take graft.`/path` or catalog names. The VALUE
    * expression parses through Spark's own parser — route it through
    * the DECIMAL channel (`CAST(v AS DECIMAL(18,6))`) for
    * replay-exact sums, as the Scala callers do. */
  private def parseStream(text: String): LogicalPlan = {
    "(?is)^GRAFT\\s+STREAM\\s+STOP\\s+'([^']+)'\\s*$".r
      .findFirstMatchIn(text).foreach { sm =>
        val id = sm.group(1)
        return GraftSqlCommand("GRAFT STREAM STOP",
          attrs("ok" -> BooleanType), _ => {
            graft.streaming.GraftStreams.stop(id)
            Seq(Row(true))
          })
      }
    val m = "(?is)^GRAFT\\s+STREAM\\s+SYNC\\s+".r
      .findPrefixMatchOf(text).getOrElse(
        fail(s"bad GRAFT STREAM statement (SYNC …|STOP '<id>'): " +
          s"${text.take(60)}"))
    val (srcRoot, r1) = resolveAnyRef(text.substring(m.end),
      mustExist = true).getOrElse(
      fail("GRAFT STREAM SYNC needs a committed source table"))
    val toM = "(?is)^TO\\s+".r.findPrefixMatchOf(r1)
      .getOrElse(fail("GRAFT STREAM SYNC needs TO <sink>"))
    val (sinkRoot, r2) = resolveAnyRef(r1.substring(toM.end),
      mustExist = false).getOrElse(
      fail("GRAFT STREAM SYNC: unresolvable sink reference"))
    def parenList(s: String, kw: String): (Seq[String], String) = {
      val km = ("(?is)^" + kw + "\\s*\\(").r.findPrefixMatchOf(s)
        .getOrElse(fail(s"GRAFT STREAM SYNC needs " +
          s"${kw.replace("\\s+", " ")} (…)"))
      val open = km.end - 1
      val close = matchingParen(s, open)
      (splitTop(s.substring(open + 1, close), ",").map(bareName),
        s.substring(close + 1).trim)
    }
    val (keys, r3) = parenList(r2, "KEYS")
    val (groups, r4) = parenList(r3, "GROUP\\s+BY")
    // optional partition-scoped sink: each fold then replaces only
    // the partitions its delta touched
    val (pby, r4b) =
      if ("(?is)^PARTITIONED\\s+BY\\s*\\(".r
          .findPrefixMatchOf(r4).isDefined) {
        val (ps, rest) = parenList(r4, "PARTITIONED\\s+BY")
        if (ps.size != 1)
          fail("GRAFT STREAM SYNC: PARTITIONED BY takes ONE column")
        if (!groups.exists(_.equalsIgnoreCase(ps.head)))
          fail(s"GRAFT STREAM SYNC: PARTITIONED BY ${ps.head} must " +
            "be one of the GROUP BY columns")
        (Some(ps.head), rest)
      } else (None, r4)
    val vm = "(?is)^VALUE\\s+".r.findPrefixMatchOf(r4b)
      .getOrElse(fail("GRAFT STREAM SYNC needs VALUE <expr> AS <alias>"))
    val r5 = r4b.substring(vm.end)
    val iAs = topIndexOf(r5, "AS")
    if (iAs < 0) fail("GRAFT STREAM SYNC: VALUE needs AS <alias>")
    val valueText = r5.substring(0, iAs).trim
    "(?is)^(\\w+)\\s+CHECKPOINT\\s+'([^']+)'\\s*(.*)$".r
      .findFirstMatchIn(r5.substring(iAs + 2).trim) match {
      case Some(am) =>
        val (alias, ckpt, trail) =
          (am.group(1), am.group(2), am.group(3).trim)
        val tickMs = "(?is)^TICK\\s+(\\d+)\\s+MILLISECONDS$".r
          .findFirstMatchIn(trail).map(_.group(1).toLong)
        if (tickMs.isEmpty && trail.nonEmpty)
          fail("GRAFT STREAM SYNC: unexpected trailing text: " +
            trail.take(40))
        GraftSqlCommand(s"GRAFT STREAM SYNC graft.`$srcRoot`",
          attrs("query_id" -> StringType), session => {
            val q = graft.streaming.CdfStream.runSyncSink(session,
              srcRoot, sinkRoot, keys, groups,
              org.apache.spark.sql.functions.expr(valueText), alias,
              checkpoint = ckpt,
              tick = org.apache.spark.sql.streaming.Trigger
                .ProcessingTime(tickMs.getOrElse(1000L)),
              partitionBy = pby)
            Seq(Row(graft.streaming.GraftStreams.register(q)))
          })
      case None =>
        fail("GRAFT STREAM SYNC needs AS <alias> CHECKPOINT '<dir>'")
    }
  }

  /** `INSERT INTO <tbl> [(cols)] SELECT …|VALUES …` — O(batch)
    * append ([[ManifestTable.append]]: base files carried by
    * reference; partitioned bases extend `_parts`; stats/DV/colmap
    * compose). The reference's EDW load shape
    * (`dags/snowflake-EDW-ETL-dag.py:147-173`). With a column list,
    * the SELECT's output maps to the named columns POSITIONALLY and
    * the list must cover the target's columns exactly (a partial
    * INSERT would silently null-fill — refused loudly). */
  private def parseInsert(text: String): LogicalPlan = {
    val m = "(?is)^INSERT\\s+INTO\\s+".r.findPrefixMatchOf(text).get
    val (root, rest) = parseRef(text.substring(m.end))
    val (colsOpt, body) =
      if (rest.startsWith("(")) {
        val close = matchingParen(rest, 0)
        (Some(splitTop(rest.substring(1, close), ",").map(bareName)),
          rest.substring(close + 1).trim)
      } else (None, rest)
    val headOk = "(?is)^(SELECT|VALUES|WITH|TABLE|FROM)\\b".r
      .findPrefixMatchOf(body).isDefined
    if (!headOk) fail(s"INSERT INTO needs SELECT/VALUES/WITH/TABLE, " +
      s"got: ${body.take(60)}")
    GraftSqlCommand(s"INSERT INTO graft.`$root`", versionOut, session => {
      val df0 = session.sql(body)
      val target = ManifestTable.read(session, root).getOrElse(
        fail(s"no committed version at $root")).columns.toSeq
      // SQL INSERT binds POSITIONALLY (a bare VALUES row has no
      // names): the query's columns take the target's names — or the
      // explicit list's, which must cover the target exactly (a
      // partial INSERT would silently null-fill; refused loudly)
      val df = colsOpt match {
        case None =>
          if (df0.columns.length != target.length)
            fail(s"INSERT query produces ${df0.columns.length} " +
              s"columns but the target has ${target.length}")
          df0.toDF(target: _*)
        case Some(cols) =>
          if (df0.columns.length != cols.length)
            fail(s"INSERT column list has ${cols.length} names but " +
              s"the query produces ${df0.columns.length} columns")
          val missing = target.map(_.toLowerCase)
            .diff(cols.map(_.toLowerCase))
          if (missing.nonEmpty)
            fail(s"INSERT column list must cover the target exactly " +
              s"(missing: ${missing.mkString(", ")})")
          df0.toDF(cols: _*)
      }
      Seq(Row(ManifestTable.append(session, root, df)))
    })
  }

  /** `CREATE TABLE <tbl> [PARTITIONED BY (col)] AS SELECT …` — S12
    * parity (`dags/snowflake-EDW-ETL-dag.py:482-530`) onto the
    * manifest store: the query result commits as version 1
    * ([[ManifestTable.commit]], or
    * [[graft.ops.PartitionedTable.commitPartitioned]] with
    * PARTITIONED BY — every later INSERT then stays partition-pure).
    * An already-committed target is refused loudly (no silent
    * replace). */
  private def parseCreate(text: String): LogicalPlan = {
    val m = "(?is)^CREATE\\s+TABLE\\s+".r.findPrefixMatchOf(text).get
    val (root, rest) = parseRef(text.substring(m.end))
    val p = ("(?is)^(?:PARTITIONED\\s+BY\\s*\\(\\s*(\\S+?)\\s*\\)\\s+)?" +
      "AS\\s+(.*)$").r
    rest match {
      case p(pcol, query) =>
        GraftSqlCommand(s"CREATE TABLE graft.`$root`", versionOut,
          session => {
            if (ManifestTable.currentVersion(session, root).isDefined)
              fail(s"table already exists at $root (CREATE TABLE " +
                "refuses to replace; use INSERT INTO or DML)")
            val df = session.sql(query)
            val v =
              if (pcol == null) ManifestTable.commit(df, root)
              else graft.ops.PartitionedTable.commitPartitioned(
                session, root, df, bareName(pcol))
            Seq(Row(v))
          })
      case other =>
        fail(s"CREATE TABLE needs [PARTITIONED BY (col)] AS " +
          s"<query>, got: ${other.take(60)}")
    }
  }

  private def parseUpdate(text: String): LogicalPlan = {
    val m = "(?is)^UPDATE\\s+".r.findPrefixMatchOf(text).get
    val (root, rest) = parseRef(text.substring(m.end))
    val iSet = topIndexOf(rest, "SET")
    if (iSet < 0) fail("UPDATE needs a SET clause")
    val iWhere = topIndexOf(rest, "WHERE", iSet)
    val setText =
      if (iWhere < 0) rest.substring(iSet + 3)
      else rest.substring(iSet + 3, iWhere)
    val whereText =
      if (iWhere < 0) None else Some(rest.substring(iWhere + 5).trim)
    val assignments = splitTop(setText, ",").map { a =>
      val i = indexOfTopChar(a, "=", 0)
      if (i <= 0) fail(s"bad SET assignment: $a")
      bareName(a.substring(0, i)) -> a.substring(i + 1).trim
    }
    if (assignments.isEmpty) fail("empty SET clause")
    GraftSqlCommand(s"UPDATE graft.`$root`", versionOut, session => {
      // RHS text parses through Spark's own expression parser at run
      // time, against the PRE-update row (updateWhere's single
      // projection)
      val v = ManifestTable.updateWhere(session, root,
        whereText.map(expr).getOrElse(lit(true)),
        assignments.map { case (c, rhs) => c -> expr(rhs) }.toMap)
      Seq(Row(v))
    })
  }

  private def parseDelete(text: String): LogicalPlan = {
    val m = "(?is)^DELETE\\s+FROM\\s+".r.findPrefixMatchOf(text)
      .getOrElse(fail(s"malformed DELETE: ${text.take(60)}"))
    val (root, rest) = parseRef(text.substring(m.end))
    val iWhere = topIndexOf(rest, "WHERE")
    val whereText = if (iWhere < 0) None
      else Some(rest.substring(iWhere + 5).trim)
    GraftSqlCommand(s"DELETE FROM graft.`$root`", versionOut, session => {
      val v = ManifestTable.deleteWhere(session, root,
        whereText.map(expr).getOrElse(lit(true)))
      Seq(Row(v))
    })
  }

  private def parseOptimize(text: String): LogicalPlan = {
    val m = "(?is)^OPTIMIZE\\s+".r.findPrefixMatchOf(text).get
    val (root, rest0) = parseRef(text.substring(m.end))
    // Delta's partition-scoped form: `OPTIMIZE t WHERE <pcol> = 'v'
    // [OR …] | <pcol> IN ('a','b') ZORDER BY (x, y[, tie])` — only
    // the named partitions' files are z-clustered, the rest carried
    // by reference (ZTable.optimizeZOrderPartitions)
    val iWhere = topIndexOf(rest0, "WHERE")
    if (iWhere == 0) {
      val iZ = topIndexOf(rest0, "ZORDER")
      if (iZ < 0) fail("OPTIMIZE … WHERE needs ZORDER BY (partition-" +
        "scoped optimize is a layout pass; use DML to change data)")
      val predText = rest0.substring(iWhere + 5, iZ).trim
      val (pcolName, values) = parsePartitionPred(predText)
      val zTail = rest0.substring(iZ).trim
      val z = ("(?is)^ZORDER\\s+BY\\s*\\(([^)]*)\\)\\s*" +
        "(?:FILES\\s+(\\d+))?\\s*$").r
      zTail match {
        case z(colsT, filesT) =>
          val cols = splitTop(colsT, ",").map(bareName)
          if (cols.size < 2 || cols.size > 3)
            fail(s"ZORDER BY needs (x, y[, tie]), got $colsT")
          return GraftSqlCommand(
            s"OPTIMIZE graft.`$root` WHERE ZORDER", versionOut,
            session => {
              val v = ZTable.optimizeZOrderPartitions(session, root,
                values, cols(0), cols(1),
                if (cols.size > 2) cols(2) else cols(0),
                filesPerPartition =
                  Option(filesT).map(_.toInt).getOrElse(1),
                expectPcol = Some(pcolName))
              Seq(Row(v))
            })
        case other => fail(s"bad ZORDER clause: ${other.take(60)}")
      }
    }
    val rest = rest0
    val z = ("(?is)^ZORDER\\s+BY\\s*\\(([^)]*)\\)\\s*" +
      "(?:FILES\\s+(\\d+))?\\s*$").r
    val f = "(?is)^(?:FILES\\s+(\\d+))?\\s*$".r
    rest match {
      case z(colsT, filesT) =>
        val cols = splitTop(colsT, ",").map(bareName)
        if (cols.size < 2 || cols.size > 3)
          fail(s"ZORDER BY needs (x, y[, tie]), got $colsT")
        GraftSqlCommand(s"OPTIMIZE graft.`$root` ZORDER", versionOut,
          session => {
            val n = Option(filesT).map(_.toInt).getOrElse(
              // default layout grain: keep the current file count
              math.max(1, ManifestTable.read(session, root)
                .getOrElse(fail(s"nothing to optimize at $root"))
                .inputFiles.length))
            val v = ZTable.optimizeZOrder(session, root, cols(0),
              cols(1), if (cols.size > 2) cols(2) else cols(0), n)
            Seq(Row(v))
          })
      case f(filesT) =>
        GraftSqlCommand(s"OPTIMIZE graft.`$root`", versionOut,
          session => Seq(Row(ManifestTable.optimize(session, root,
            Option(filesT).map(_.toInt).getOrElse(1)))))
      case other => fail(s"bad OPTIMIZE options: ${other.take(60)}")
    }
  }

  /** A partition predicate for the scoped OPTIMIZE: `col = 'v'`
    * chained by OR (same column), or `col IN ('a','b')`. Returns
    * (column, values); anything else fails loudly. */
  private def parsePartitionPred(s: String): (String, Seq[String]) = {
    val in = "(?is)^(\\S+)\\s+IN\\s*\\((.*)\\)\\s*$".r
    val eq = "(?is)^(\\S+)\\s*=\\s*'([^']*)'\\s*$".r
    s.trim match {
      case in(c, vals) =>
        val vs = splitTop(vals, ",").map(_.trim).map { v =>
          if (v.startsWith("'") && v.endsWith("'") && v.length >= 2)
            v.substring(1, v.length - 1)
          else fail(s"IN list values must be string literals: $v")
        }
        if (vs.isEmpty) fail("empty IN list")
        (bareName(c), vs)
      case _ =>
        val parts = splitTop(s, "OR").map {
          case eq(c, v) => (bareName(c), v)
          case other => fail("partition predicate supports col = 'v' " +
            s"[OR …] or col IN ('a','b'); got: ${other.take(60)}")
        }
        val cols = parts.map(_._1).distinct
        if (cols.size != 1)
          fail(s"partition predicate must name ONE column, got: $cols")
        (cols.head, parts.map(_._2))
    }
  }

  private def parseVacuum(text: String): LogicalPlan = {
    val m = "(?is)^VACUUM\\s+".r.findPrefixMatchOf(text).get
    val (root, rest) = parseRef(text.substring(m.end))
    val r = "(?is)^RETAIN\\s+(\\d+)\\s+VERSIONS\\s*$".r
    rest match {
      case r(n) =>
        GraftSqlCommand(s"VACUUM graft.`$root`",
          attrs("dropped_dirs" -> LongType), session => {
            val planned = ManifestTable
              .vacuumPlan(session, root, n.toInt).size.toLong
            ManifestTable.vacuum(session, root, n.toInt)
            Seq(Row(planned))
          })
      case other =>
        fail(s"VACUUM needs RETAIN <n> VERSIONS, got: ${other.take(60)}")
    }
  }

  private def parseRestore(text: String): LogicalPlan = {
    val m = "(?is)^RESTORE\\s+(?:TABLE\\s+)?".r.findPrefixMatchOf(text).get
    val (root, rest) = parseRef(text.substring(m.end))
    val v = "(?is)^(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*$".r
    val t = "(?is)^(?:TO\\s+)?TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*$".r
    rest match {
      case v(ver) =>
        GraftSqlCommand(s"RESTORE graft.`$root`", versionOut,
          session => Seq(Row(
            ManifestTable.restore(session, root, ver.toLong))))
      case t(ts) =>
        // the literal is UTC (the engine's pinned session TZ), parsed
        // without any JVM-default-zone dependence
        val millis = java.time.LocalDateTime
          .parse(ts.trim.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        GraftSqlCommand(s"RESTORE graft.`$root`", versionOut,
          session => Seq(Row(
            ManifestTable.restoreAsOf(session, root, millis))))
      case other =>
        fail(s"RESTORE needs VERSION AS OF <n> or TIMESTAMP AS OF " +
          s"'<ts>', got: ${other.take(60)}")
    }
  }

  /** The metadata-only ALTER TABLE triple as statement text —
    * RENAME/DROP/ADD COLUMN route to the column-mapping commits
    * (zero bytes rewritten at any table size). */
  private def parseAlter(text: String): LogicalPlan = {
    val m = "(?is)^ALTER\\s+TABLE\\s+".r.findPrefixMatchOf(text).get
    val (root, rest) = parseRef(text.substring(m.end))
    val ren = "(?is)^RENAME\\s+COLUMN\\s+(\\S+)\\s+TO\\s+(\\S+)\\s*$".r
    val drp = "(?is)^DROP\\s+COLUMN\\s+(\\S+)\\s*$".r
    val add = "(?is)^ADD\\s+COLUMNS?\\s+(.+)$".r
    rest match {
      case ren(from, to) =>
        GraftSqlCommand(s"ALTER graft.`$root` RENAME", versionOut,
          session => Seq(Row(ManifestTable.renameColumn(session, root,
            bareName(from), bareName(to)))))
      case drp(name) =>
        GraftSqlCommand(s"ALTER graft.`$root` DROP", versionOut,
          session => Seq(Row(ManifestTable.dropColumn(session, root,
            bareName(name)))))
      case add(spec0) =>
        // strip ONE optional outer paren pair by BALANCE (a char-class
        // regex truncated parameterized types: `decimal(10,2)` lost
        // its closing paren); the remainder after the column name is
        // the full DDL type, validated by DataType.fromDDL downstream
        val spec1 = spec0.trim
        val spec =
          if (spec1.startsWith("(") &&
              matchingParen(spec1, 0) == spec1.length - 1)
            spec1.substring(1, spec1.length - 1).trim
          else spec1
        val iSp = spec.indexWhere(Character.isWhitespace)
        if (iSp <= 0) fail(s"ADD COLUMN needs <name> <type>, got: $spec")
        val name = spec.substring(0, iSp)
        val ddlType = spec.substring(iSp + 1).trim
        GraftSqlCommand(s"ALTER graft.`$root` ADD", versionOut,
          session => Seq(Row(ManifestTable.addColumn(session, root,
            bareName(name), ddlType))))
      case other => fail("ALTER TABLE supports RENAME COLUMN a TO b, " +
        s"DROP COLUMN a, ADD COLUMN a <type>; got: ${other.take(60)}")
    }
  }

  private def parseDescribeColumns(text: String): LogicalPlan = {
    val m = "(?is)^DESC(?:RIBE)?\\s+COLUMNS\\s+".r
      .findPrefixMatchOf(text).get
    val (root, rest) = parseRef(text.substring(m.end))
    if (rest.nonEmpty) fail(s"unexpected trailing text: ${rest.take(60)}")
    GraftSqlCommand(s"DESCRIBE COLUMNS graft.`$root`",
      attrs("column" -> StringType, "physical_name" -> StringType,
        "pending_type" -> StringType, "backed" -> BooleanType),
      session =>
        ManifestTable.describeColumns(session, root).collect().toSeq)
  }

  private def parseDescribe(text: String, history: Boolean): LogicalPlan = {
    val m = "(?is)^DESC(?:RIBE)?\\s+(?:HISTORY|DETAIL)\\s+".r
      .findPrefixMatchOf(text).get
    val (root, rest) = parseRef(text.substring(m.end))
    if (rest.nonEmpty) fail(s"unexpected trailing text: ${rest.take(60)}")
    if (history)
      GraftSqlCommand(s"DESCRIBE HISTORY graft.`$root`",
        attrs("version" -> LongType, "operation" -> StringType,
          "batch_key" -> StringType, "is_filelist" -> BooleanType,
          "data_retained" -> BooleanType, "commit_ts" -> LongType),
        session =>
          ManifestTable.history(session, root).collect().toSeq)
    else
      GraftSqlCommand(s"DESCRIBE DETAIL graft.`$root`",
        attrs("version" -> LongType, "n_versions_retained" -> LongType,
          "n_files" -> LongType, "size_bytes" -> LongType,
          "is_filelist" -> BooleanType, "has_stats" -> BooleanType,
          "has_bloom" -> BooleanType, "has_dv" -> BooleanType,
          "n_checks" -> LongType, "n_generated" -> LongType,
          "has_colmap" -> BooleanType),
        session =>
          ManifestTable.detail(session, root).collect().toSeq)
  }
}
