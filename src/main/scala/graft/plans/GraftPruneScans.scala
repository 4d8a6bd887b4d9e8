package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileStatusCache,
  HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{LongType, StringType}

import graft.ops.GraftPruning

/** PREDICATE-DRIVEN FILE PRUNING for manifest-store scans — the
  * Catalyst half of [[graft.ops.GraftPruning]], injected through
  * `injectOptimizerRule` ([[graft.expressions.GraftExtensions]]).
  *
  * Matches `Filter` directly over a file-source scan whose EXACT file
  * set is registered as a committed graft version (Catalyst's own
  * predicate pushdown has already walked the filter through the
  * deletion-vector anti-join and any column-mapping projection by the
  * time the operator-optimization batch converges, so the shape is
  * canonical), intersects the filter's top-level conjuncts with the
  * version's committed `_parts` / `_stats` / `_bloom` frames, and —
  * only when that PROVES some files empty — swaps in a pruned
  * `InMemoryFileIndex` over the surviving files. The `Filter` node
  * stays; output attributes are reused verbatim (exprIds — including
  * the `_metadata` column the DV anti-join reads — stay bound).
  *
  * This is what makes the three pruning frames work WITHOUT being
  * asked: `spark.sql("SELECT … FROM graft_table('/p') WHERE
  * o_month = '1995-06' AND o_custkey BETWEEN 100 AND 150")` opens
  * exactly the files a hand-written `readPartitions` +
  * `scanXRange` composition would — Snowflake's
  * prune-from-the-predicate behavior, which the reference's gold
  * queries silently rely on (`dags/logistics-gold-metrics-sql.py:33`).
  * The rewrite is idempotent (a pruned index's file set is not a
  * registered version, so the fixed-point batch cannot re-fire) and
  * off-switchable (`SET spark.graft.prune.enabled=false`).
  *
  * Soundness is delegated to [[GraftPruning]] (conservative conjunct
  * shapes, weak range comparisons, keep-on-unknown); scale notes
  * there. Streaming relations are left alone. */
class GraftPruneScans(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (GraftPruning.isEmpty) return plan
    if (conf.getConfString(GraftPruning.enabledKey, "true") != "true")
      return plan
    plan.transformDown {
      case f @ Filter(cond, lr: LogicalRelation) if !lr.isStreaming =>
        tryPrune(cond, lr) match {
          case Some(pruned) => Filter(cond, pruned)
          case None => f
        }
    }
  }

  private def tryPrune(cond: Expression, lr: LogicalRelation)
      : Option[LogicalRelation] = lr.relation match {
    case hfs: HadoopFsRelation =>
      val roots = hfs.location.rootPaths.map(_.toString)
      if (roots.isEmpty || !GraftPruning.looksLikeGraft(roots.head))
        return None
      GraftPruning.lookup(roots).flatMap { case (root, dir) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (!conjuncts.exists(isCandidate)) return None
        val m = GraftPruning.meta(spark, root, dir)
        if (m.pcol.isEmpty && m.xCol.isEmpty && m.bloomCol.isEmpty)
          return None
        val files = hfs.location.inputFiles.toIndexedSeq
        val keyOf = files.map(p =>
          p -> p.split('/').takeRight(2).mkString("/")).toMap
        var kept = files
        conjuncts.foreach { c =>
          val excluded = excludedKeys(c, m, root, dir)
          if (excluded.nonEmpty)
            kept = kept.filterNot(p => excluded(keyOf(p)))
        }
        if (kept.size >= files.size) None
        else {
          val newIndex = new InMemoryFileIndex(spark,
            kept.map(new org.apache.hadoop.fs.Path(_)),
            hfs.options, Some(hfs.dataSchema),
            FileStatusCache.getOrCreate(spark))
          val newRel = hfs.copy(location = newIndex)(spark)
          Some(lr.copy(relation = newRel))
        }
      }
    case _ => None
  }

  /** Could this conjunct possibly prune? (cheap structural gate so
    * the metadata load is never paid for un-prunable predicates) */
  private def isCandidate(e: Expression): Boolean = e match {
    case EqualTo(_: AttributeReference, _: Literal) => true
    case EqualTo(_: Literal, _: AttributeReference) => true
    case In(_: AttributeReference, list)
      if list.forall(_.isInstanceOf[Literal]) => true
    case InSet(_: AttributeReference, _) => true
    case GreaterThan(_: AttributeReference, _: Literal) => true
    case GreaterThan(_: Literal, _: AttributeReference) => true
    case GreaterThanOrEqual(_: AttributeReference, _: Literal) => true
    case GreaterThanOrEqual(_: Literal, _: AttributeReference) => true
    case LessThan(_: AttributeReference, _: Literal) => true
    case LessThan(_: Literal, _: AttributeReference) => true
    case LessThanOrEqual(_: AttributeReference, _: Literal) => true
    case LessThanOrEqual(_: Literal, _: AttributeReference) => true
    case StartsWith(_: AttributeReference, _: Literal) => true
    case _ => false
  }

  /** File keys PROVABLY empty under conjunct `e` — empty set when the
    * conjunct doesn't speak to any committed frame. */
  private def excludedKeys(e: Expression, m: GraftPruning.Meta,
      root: String, dir: String): Set[String] = {
    val sameName = spark.sessionState.analyzer.resolver
    def isPart(a: AttributeReference) =
      m.pcol.exists(sameName(_, a.name))
    // string-vs-string comparison on the partition column: only then
    // is SQL ordering == the frame's string ordering
    def isStrPart(a: AttributeReference, l: Literal): Boolean =
      a.dataType == StringType && l.dataType == StringType &&
        l.value != null && isPart(a)
    def isBloom(a: AttributeReference) =
      m.bloomCol.exists(sameName(_, a.name))
    def dim(a: AttributeReference): Option[Boolean] = // true = x dim
      if (m.xCol.exists(sameName(_, a.name))) Some(true)
      else if (m.yCol.exists(sameName(_, a.name))) Some(false)
      else None

    e match {
      // -- partition equality / IN --------------------------------
      case EqualTo(a: AttributeReference, l: Literal) if isPart(a) =>
        partExcluded(m, asString(l).toSet)
      case EqualTo(l: Literal, a: AttributeReference) if isPart(a) =>
        partExcluded(m, asString(l).toSet)
      case In(a: AttributeReference, list) if isPart(a) &&
          list.forall(_.isInstanceOf[Literal]) =>
        partExcluded(m,
          list.flatMap(l => asString(l.asInstanceOf[Literal])).toSet)
      case InSet(a: AttributeReference, hset) if isPart(a) =>
        partExcluded(m, hset.flatMap(v =>
          asString(Literal(v, a.dataType))).toSet)

      // -- partition RANGE / PREFIX on a STRING partition column ----
      // the reference's gold date cuts (`o_month >= '1995-07'`,
      // `o_month LIKE '1996-%'`): for a StringType column vs a
      // StringType literal, SQL comparison IS UTF8 binary order and
      // the committed `_parts` value IS the column value — the range
      // check against the frame is EXACT, no weakening needed.
      // Compared through Spark's own UTF8String (Java String
      // compareTo is UTF-16 code-unit order; they diverge above the
      // BMP).
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
        if isStrPart(a, l) => partOrdExcluded(m, l, keep = _ >= 0)
      case LessThanOrEqual(l: Literal, a: AttributeReference)
        if isStrPart(a, l) => partOrdExcluded(m, l, keep = _ >= 0)
      case GreaterThan(a: AttributeReference, l: Literal)
        if isStrPart(a, l) => partOrdExcluded(m, l, keep = _ > 0)
      case LessThan(l: Literal, a: AttributeReference)
        if isStrPart(a, l) => partOrdExcluded(m, l, keep = _ > 0)
      case LessThanOrEqual(a: AttributeReference, l: Literal)
        if isStrPart(a, l) => partOrdExcluded(m, l, keep = _ <= 0)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
        if isStrPart(a, l) => partOrdExcluded(m, l, keep = _ <= 0)
      case LessThan(a: AttributeReference, l: Literal)
        if isStrPart(a, l) => partOrdExcluded(m, l, keep = _ < 0)
      case GreaterThan(l: Literal, a: AttributeReference)
        if isStrPart(a, l) => partOrdExcluded(m, l, keep = _ < 0)
      case StartsWith(a: AttributeReference, l: Literal)
        if isStrPart(a, l) => // LIKE 'x%' optimizes to StartsWith
        val prefix = l.value.toString
        m.partValue.collect {
          case (k, v) if !v.startsWith(prefix) => k
        }.toSet

      // -- Bloom point key / IN (composes with same-col ranges) -----
      case EqualTo(a: AttributeReference, l: Literal) if isBloom(a) =>
        bloomExcluded(m, root, dir, a, Seq(l))
      case EqualTo(l: Literal, a: AttributeReference) if isBloom(a) =>
        bloomExcluded(m, root, dir, a, Seq(l))
      case In(a: AttributeReference, list) if isBloom(a) &&
          list.size <= 16 && list.forall(_.isInstanceOf[Literal]) =>
        bloomExcluded(m, root, dir, a,
          list.map(_.asInstanceOf[Literal]))

      // -- min/max ranges on the committed dims ---------------------
      // WEAK comparisons only: long-truncated stats of a fractional
      // column satisfy trunc(a) < trunc(b) ⟹ a < b, nothing more
      case EqualTo(a: AttributeReference, l: Literal) =>
        dim(a).fold(Set.empty[String])(x => asLong(l).fold(
          Set.empty[String])(v =>
          rangeExcluded(m, x, lo = Some(v), hi = Some(v))))
      case EqualTo(l: Literal, a: AttributeReference) =>
        dim(a).fold(Set.empty[String])(x => asLong(l).fold(
          Set.empty[String])(v =>
          rangeExcluded(m, x, lo = Some(v), hi = Some(v))))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        lower(m, dim(a), l)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        lower(m, dim(a), l) // weakened to >=
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        lower(m, dim(a), l)
      case LessThan(l: Literal, a: AttributeReference) =>
        lower(m, dim(a), l)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        upper(m, dim(a), l)
      case LessThan(a: AttributeReference, l: Literal) =>
        upper(m, dim(a), l) // weakened to <=
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        upper(m, dim(a), l)
      case GreaterThan(l: Literal, a: AttributeReference) =>
        upper(m, dim(a), l)

      case _ => Set.empty
    }
  }

  private def lower(m: GraftPruning.Meta, d: Option[Boolean],
      l: Literal): Set[String] =
    d.fold(Set.empty[String])(x => asLong(l).fold(Set.empty[String])(
      v => rangeExcluded(m, x, lo = Some(v), hi = None)))

  private def upper(m: GraftPruning.Meta, d: Option[Boolean],
      l: Literal): Set[String] =
    d.fold(Set.empty[String])(x => asLong(l).fold(Set.empty[String])(
      v => rangeExcluded(m, x, lo = None, hi = Some(v))))

  /** Files whose committed partition value is NOT in `wanted`; files
    * without a partition row are kept. */
  private def partExcluded(m: GraftPruning.Meta,
      wanted: Set[String]): Set[String] =
    m.partValue.collect {
      case (k, v) if !wanted.contains(v) => k
    }.toSet

  /** Files whose committed partition value fails `keep` applied to
    * UTF8-binary `compareTo(lit)` — exact, string-vs-string only. */
  private def partOrdExcluded(m: GraftPruning.Meta, l: Literal,
      keep: Int => Boolean): Set[String] = {
    import org.apache.spark.unsafe.types.UTF8String
    val lit = UTF8String.fromString(l.value.toString)
    m.partValue.collect {
      case (k, v) if !keep(UTF8String.fromString(v).compareTo(lit)) => k
    }.toSet
  }

  /** Files whose committed [min, max] on the chosen dim provably
    * misses [lo, hi]; NULL bounds (all-null files) are kept. */
  private def rangeExcluded(m: GraftPruning.Meta, xDim: Boolean,
      lo: Option[Long], hi: Option[Long]): Set[String] =
    m.ranges.collect { case (k, r) =>
      val (mn, mx) = if (xDim) (r.minX, r.maxX) else (r.minY, r.maxY)
      val missLo = lo.exists(l => mx.exists(_ < l))
      val missHi = hi.exists(h => mn.exists(_ > h))
      if (missLo || missHi) Some(k) else None
    }.flatten.toSet

  /** Point key(s) against the committed registers: a file survives if
    * ANY key may live in it (IN = union of per-key candidate sets);
    * only files with a committed register row may be excluded (a file
    * missing from the frame has no Bloom verdict). NULL keys keep
    * everything (no verdict). */
  private def bloomExcluded(m: GraftPruning.Meta, root: String,
      dir: String, a: AttributeReference, ls: Seq[Literal])
      : Set[String] = {
    if (ls.exists(_.value == null)) return Set.empty
    val candidates = ls.map { l =>
      GraftPruning.bloomCandidates(spark, root, dir,
        CatalystTypeConverters.convertToScala(l.value, l.dataType))
    }.reduce(_ union _)
    m.ranges.keySet.filterNot(candidates.contains)
  }

  /** The literal as the committed `_parts` representation — Spark's
    * own cast-to-string, evaluated with the session timezone (the
    * exact cast that produced the frame values). */
  private def asString(l: Literal): Option[String] = {
    if (l.value == null) return None
    if (l.dataType == StringType) return Some(l.value.toString)
    scala.util.Try(
      Cast(l, StringType, Option(conf.sessionLocalTimeZone)).eval())
      .toOption.flatMap(Option(_)).map(_.toString)
  }

  /** The literal as the committed `_stats` representation — Spark's
    * own cast-to-long (what `writeStats` applied to the column). */
  private def asLong(l: Literal): Option[Long] = {
    if (l.value == null) return None
    if (l.dataType == LongType)
      return Some(l.value.asInstanceOf[Long])
    if (!Cast.canCast(l.dataType, LongType)) return None
    scala.util.Try(
      Cast(l, LongType, Option(conf.sessionLocalTimeZone)).eval())
      .toOption.flatMap(Option(_)).map(_.asInstanceOf[Long])
  }
}

/** Executed-plan file-count audit used by the q243 in-band proofs and
  * the plan-regression lock: how many files do this DataFrame's
  * file-source scans actually open? (AQE-aware; `Dataset.inputFiles`
  * reads the ANALYZED plan and cannot see optimizer pruning.) */
object GraftPruneScans {
  def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Long =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: FileSourceScanExec =>
          // DATA files only: a merge-on-read plan also scans the
          // version's `_dv` (and pruned-read audits its `_stats`) —
          // metadata frames, not table IO the proofs count
          s.relation.location.inputFiles.count(p =>
            !p.split('/').exists(_.startsWith("_"))).toLong
        case other => other.children.map(walk).sum +
          other.subqueries.map(walk).sum
      }
    walk(df.queryExecution.executedPlan)
  }
}
