package graft.sql

/** THIN NAME → TABLE-ROOT CATALOG for the SQL front-end — EP1's last
  * addressing gap: the reference writes every statement against
  * 3-part names (`LOGISTICS_DEMO_1.SILVER.FACT_SHIPMENTS`,
  * `dags/logistics-airbyte-sql.py:25`;
  * `dags/snowflake-EDW-ETL-dag.py:147-256`), never paths. With a
  * catalog BASE directory set, any dotted name maps deterministically
  * to `base/part1/part2/…` (Hive-warehouse style); individual names
  * can also be pinned to arbitrary roots. [[GraftSqlParser]] then
  * accepts `MERGE INTO silver.fact_shipments …` — the reference's
  * verbatim statement shape — wherever it accepts `graft.`/path``.
  *
  * CLAIM DISCIPLINE (the parser must never hijack a Spark-catalog
  * table): a bare dotted name is only routed when it RESOLVES here —
  * explicitly registered, or under a base the user opted into — and,
  * for everything except CREATE TABLE, only when a committed graft
  * version actually exists at the resolved root. An unresolved or
  * uncommitted name falls through to Spark's parser untouched.
  *
  * JVM-global on purpose (like the scan registry): the parser is
  * constructed per session but names address SHARED storage roots;
  * names are case-insensitive (Snowflake's resolution). Driver-side
  * metadata only — nothing here touches data. */
object GraftCatalog {

  private val names =
    scala.collection.concurrent.TrieMap.empty[String, String]
  @volatile private var baseDir: Option[String] = None

  private def norm(name: String): String =
    name.split('.').map(_.trim.stripPrefix("`").stripSuffix("`"))
      .mkString(".").toLowerCase(java.util.Locale.ROOT)

  /** Pin one name to an explicit table root (overrides the base). */
  def register(name: String, root: String): Unit =
    names.put(norm(name), root)

  def unregister(name: String): Unit = names.remove(norm(name))

  /** Set the warehouse-style base: `a.b.c` → `base/a/b/c`. */
  def setBase(dir: String): Unit = baseDir = Some(dir)

  def clearBase(): Unit = baseDir = None

  /** The table root a dotted name addresses, if it resolves. */
  def resolve(name: String): Option[String] = {
    val n = norm(name)
    names.get(n).orElse(baseDir.map(b =>
      s"$b/${n.split('.').mkString("/")}"))
  }
}
