package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  Join, Limit, LogicalPlan, Project}
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
          case Some((cond2, pruned)) => Filter(cond2, pruned)
          case None => f
        }
      case j: Join => tryDppPrune(j).getOrElse(j)
    }
  }

  /** The (root, dir) of a registered graft scan, or None. */
  private def graftScanOf(lr: LogicalRelation)
      : Option[(HadoopFsRelation, String, String)] = lr.relation match {
    case hfs: HadoopFsRelation =>
      val roots = hfs.location.rootPaths.map(_.toString)
      if (roots.isEmpty || !GraftPruning.looksLikeGraft(roots.head))
        None
      else GraftPruning.lookup(roots).map { case (root, dir) =>
        (hfs, root, dir) }
    case _ => None
  }

  /** `lr` with its file index replaced by `kept` — output attributes
    * (exprIds) reused verbatim, so everything above stays bound. */
  private def withPrunedIndex(lr: LogicalRelation,
      hfs: HadoopFsRelation, kept: Seq[String]): LogicalRelation = {
    val newIndex = new InMemoryFileIndex(spark,
      kept.map(new org.apache.hadoop.fs.Path(_)),
      hfs.options, Some(hfs.dataSchema),
      FileStatusCache.getOrCreate(spark))
    lr.copy(relation = hfs.copy(location = newIndex)(spark))
  }

  private def tryPrune(cond: Expression, lr: LogicalRelation)
      : Option[(Expression, LogicalRelation)] =
    graftScanOf(lr).flatMap { case (hfs, root, dir) =>
      if (!splitConjunctivePredicates(cond).exists(isCandidate))
        return None
      val m = GraftPruning.meta(spark, root, dir)
      if (m.pcol.isEmpty && m.xCol.isEmpty && m.bloomCol.isEmpty)
        return None
      // RUNTIME watermark cuts: evaluate uncorrelated scalar
      // subqueries compared against frame columns NOW and pin the
      // value into the condition — pruning and the row filter then
      // use the SAME literal (sound by construction), and the
      // runtime subquery execution is saved outright
      val cond2 = substituteWatermarks(cond, m)
      val conjuncts = splitConjunctivePredicates(cond2)
      val files = hfs.location.inputFiles.toIndexedSeq
      val keyOf = files.map(p =>
        p -> p.split('/').takeRight(2).mkString("/")).toMap
      var kept = files
      conjuncts.foreach { c =>
        val excluded = excludedKeys(c, m, root, dir)
        if (excluded.nonEmpty)
          kept = kept.filterNot(p => excluded(keyOf(p)))
      }
      if (kept.size >= files.size) {
        if (cond2 fastEquals cond) None else Some((cond2, lr))
      } else Some((cond2, withPrunedIndex(lr, hfs, kept)))
    }

  /** Replace `cmp(frameCol, (SELECT agg ...))` conjuncts — the
    * reference's incremental spine, `extracted_at > (SELECT MAX(…)
    * FROM target)` (`dags/logistics-airbyte-sql.py:35-38`, 7×) — with
    * the subquery's VALUE, evaluated here at optimize time. Only
    * uncorrelated, deterministic, nested-subquery-free plans qualify;
    * an empty result pins SQL's scalar-subquery NULL; a result of ≥2
    * rows is left alone (the runtime error surface must stay
    * Spark's). The aggregate the user's query was going to execute
    * anyway runs once, HERE — the filter keeps the pinned literal, so
    * what was pruned with is exactly what rows are filtered by. */
  private def substituteWatermarks(cond: Expression,
      m: GraftPruning.Meta): Expression = {
    val sameName = spark.sessionState.analyzer.resolver
    def frameCol(a: AttributeReference): Boolean =
      (m.pcol.toSeq ++ m.xCol ++ m.yCol ++ m.bloomCol)
        .exists(sameName(_, a.name))
    def subbable(s: ScalarSubquery): Boolean =
      s.outerAttrs.isEmpty && s.joinCond.isEmpty &&
        s.plan.find(p => p.expressions.exists(e =>
          !e.deterministic || e.exists(_.isInstanceOf[PlanExpression[_]])
        )).isEmpty
    def evalScalar(s: ScalarSubquery): Option[Literal] =
      scala.util.Try {
        val rows = spark.sessionState.executePlan(s.plan)
          .executedPlan.executeTake(2)
        if (rows.length > 1) None
        else if (rows.isEmpty) Some(Literal(null, s.dataType))
        else Some(Literal(rows.head.get(0, s.dataType), s.dataType))
      }.toOption.flatten
    def sub(e: Expression): Expression = e match {
      case b: BinaryComparison => (b.left, b.right) match {
        case (a: AttributeReference, s: ScalarSubquery)
          if frameCol(a) && subbable(s) =>
          evalScalar(s).fold(e)(l => b.withNewChildren(Seq(a, l)))
        case (s: ScalarSubquery, a: AttributeReference)
          if frameCol(a) && subbable(s) =>
          evalScalar(s).fold(e)(l => b.withNewChildren(Seq(l, a)))
        case _ => e
      }
      case other => other
    }
    val cs = splitConjunctivePredicates(cond)
    val cs2 = cs.map(sub)
    if (cs.lazyZip(cs2).forall((a, b) => a eq b)) cond
    else cs2.reduce(And.apply)
  }

  // ---- DPP analog: dim-filtered joins onto the partition column ----

  private val dppMaxKeys = 1024
  // joins already probed this pass, by IDENTITY: a join whose dim-side
  // eval pruned nothing must not re-execute that eval on every
  // fixed-point iteration (unchanged nodes keep their identity across
  // iterations; the bound keeps cross-query leakage trivial)
  private val dppSeen = java.util.Collections.newSetFromMap(
    new java.util.IdentityHashMap[Join, java.lang.Boolean]())

  /** Spark's own dynamic partition pruning cannot see the graft
    * `InMemoryFileIndex` (the table is not hive-partitioned), so the
    * star-join shape every warehouse prunes —
    * `fact JOIN dim ON fact.pcol = dim.key WHERE dim.flag = …`
    * (`dags/logistics-gold-metrics-sql.py:195`) — scanned every fact
    * file. Here: when a registered graft fact equi-joins a
    * BROADCAST-SMALL dim side on its partition column (string-typed
    * both sides), evaluate the dim side's DISTINCT keys (bounded by
    * [[dppMaxKeys]]; the side is under the broadcast threshold by
    * Spark's own estimate, so this is strictly cheaper than the
    * broadcast the join will do anyway) and intersect `_parts` with
    * the key set. Sound only where unmatched fact rows cannot reach
    * the output: Inner (either side) and LeftSemi (left side). */
  private def tryDppPrune(j: Join): Option[Join] = {
    val okType = j.joinType == Inner || j.joinType == LeftSemi
    if (!okType || j.condition.isEmpty) return None
    if (dppSeen.synchronized(dppSeen.contains(j))) return None
    def unwrap(p: LogicalPlan): Option[LogicalRelation] = p match {
      case lr: LogicalRelation if !lr.isStreaming => Some(lr)
      case Project(_, c) => unwrap(c)
      case Filter(_, c) => unwrap(c)
      case _ => None
    }
    val sides =
      if (j.joinType == LeftSemi) Seq((j.left, j.right, true))
      else Seq((j.left, j.right, true), (j.right, j.left, false))
    for ((factSide, dimSide, factIsLeft) <- sides) {
      for (lr <- unwrap(factSide); pruned <- dppAttempt(j, lr, dimSide)) {
        val newSide = factSide.transformUp {
          case l: LogicalRelation if l eq lr => pruned
        }
        return Some(if (factIsLeft) j.copy(left = newSide)
          else j.copy(right = newSide))
      }
    }
    dppSeen.synchronized {
      if (dppSeen.size > 256) dppSeen.clear()
      dppSeen.add(j)
    }
    None
  }

  /** The dim side's DISTINCT join-key values (null-free, as Scala
    * values), or None when the eval failed or exceeded `cap`. */
  private def dppKeys(dimSide: LogicalPlan, dimKey: AttributeReference,
      cap: Int): Option[Seq[Any]] = scala.util.Try {
    val distinct = Aggregate(Seq(dimKey), Seq(dimKey),
      Project(Seq(dimKey), dimSide))
    val rows = spark.sessionState
      .executePlan(Limit(Literal(cap + 1), distinct))
      .executedPlan.executeTake(cap + 1)
    if (rows.length > cap) None
    else Some(rows.iterator.filterNot(_.isNullAt(0))
      .map(r => CatalystTypeConverters.convertToScala(
        r.get(0, dimKey.dataType), dimKey.dataType)).toSeq)
  }.toOption.flatten

  /** File-grain runtime semi-join pushdown against ALL THREE frames:
    * an equi-key on the partition column intersects `_parts`; on the
    * Bloom column, the key set probes the registers (files admitting
    * NO key drop); on a stats dim, files whose [min,max] contains no
    * key's long form drop (sound for any cast-to-long type: a row
    * equal to k has trunc(row) = trunc(k) inside the file's bounds).
    * Multiple matching keys compose — each excludes independently. */
  private def dppAttempt(j: Join, lr: LogicalRelation,
      dimSide: LogicalPlan): Option[LogicalRelation] =
    graftScanOf(lr).flatMap { case (hfs, root, dir) =>
      val m = GraftPruning.meta(spark, root, dir)
      val sameName = spark.sessionState.analyzer.resolver
      val factOut = lr.outputSet
      val dimOut = dimSide.outputSet
      // classify each equi-pair by the frame column the fact side hits
      sealed trait Kind
      case object PartK extends Kind
      case object BloomK extends Kind
      case class DimK(x: Boolean) extends Kind
      def kindOf(a: AttributeReference): Option[Kind] =
        if (m.pcol.exists(sameName(_, a.name)) &&
            a.dataType == StringType) Some(PartK)
        else if (m.bloomCol.exists(sameName(_, a.name))) Some(BloomK)
        else if (m.xCol.exists(sameName(_, a.name))) Some(DimK(true))
        else if (m.yCol.exists(sameName(_, a.name))) Some(DimK(false))
        else None
      val pairs = splitConjunctivePredicates(j.condition.get).flatMap {
        case EqualTo(a: AttributeReference, b: AttributeReference)
          if factOut.contains(a) && dimOut.contains(b) &&
            a.dataType == b.dataType =>
          kindOf(a).map(k => (k, b))
        case EqualTo(b: AttributeReference, a: AttributeReference)
          if factOut.contains(a) && dimOut.contains(b) &&
            a.dataType == b.dataType =>
          kindOf(a).map(k => (k, b))
        case _ => None
      }
      if (pairs.isEmpty) return None
      val thr = conf.autoBroadcastJoinThreshold
      val maxBytes = if (thr > 0) thr else 32L * 1024 * 1024
      if (dimSide.stats.sizeInBytes > BigInt(maxBytes)) return None
      var excluded = Set.empty[String]
      pairs.foreach { case (kind, dimKey) =>
        val cap = kind match {
          case BloomK => 64 // one register pass per probe set
          case _ => dppMaxKeys
        }
        dppKeys(dimSide, dimKey, cap).foreach { keys =>
          kind match {
            case PartK =>
              excluded ++= partExcluded(m,
                keys.map(String.valueOf).toSet)
            case BloomK if keys.nonEmpty =>
              val cands = GraftPruning.bloomCandidatesIn(spark, root,
                dir, keys)
              excluded ++= m.ranges.keySet.filterNot(cands.contains)
            case BloomK => // empty dim: inner join yields nothing,
              // but DROPPING all files is a plan rewrite the empty
              // relation handles anyway — keep conservative
            case DimK(x) =>
              val longs = keys.map(v =>
                asLong(Literal.create(v, dimKey.dataType)))
              if (longs.nonEmpty && longs.forall(_.isDefined)) {
                val ls = longs.flatten
                excluded ++= m.ranges.collect { case (k, r) =>
                  val (mn, mx) = if (x) (r.minX, r.maxX)
                    else (r.minY, r.maxY)
                  val miss = mn.isDefined && mx.isDefined &&
                    ls.forall(l => l < mn.get || l > mx.get)
                  if (miss) Some(k) else None
                }.flatten.toSet
              }
          }
        }
      }
      if (excluded.isEmpty) None
      else {
        val files = hfs.location.inputFiles.toIndexedSeq
        val keyOf = files.map(p =>
          p -> p.split('/').takeRight(2).mkString("/")).toMap
        val kept = files.filterNot(p => excluded(keyOf(p)))
        if (kept.size >= files.size) None
        else Some(withPrunedIndex(lr, hfs, kept))
      }
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
    case EqualNullSafe(_: AttributeReference, _: Literal) => true
    case EqualNullSafe(_: Literal, _: AttributeReference) => true
    // OR of partition equalities (every disjunct pins a column)
    case o: Or => splitDisjunctivePredicates(o).forall {
      case EqualTo(_: AttributeReference, _: Literal) => true
      case EqualTo(_: Literal, _: AttributeReference) => true
      case In(_: AttributeReference, list)
        if list.forall(_.isInstanceOf[Literal]) => true
      case _ => false
    }
    // runtime watermark shape — resolved by [[substituteWatermarks]]
    case b: BinaryComparison =>
      (b.left.isInstanceOf[AttributeReference] &&
        b.right.isInstanceOf[ScalarSubquery]) ||
      (b.left.isInstanceOf[ScalarSubquery] &&
        b.right.isInstanceOf[AttributeReference])
    case _ => false
  }

  /** File keys PROVABLY empty under conjunct `e` — empty set when the
    * conjunct doesn't speak to any committed frame. */
  private def excludedKeys(e: Expression, m: GraftPruning.Meta,
      root: String, dir: String): Set[String] = {
    val sameName = spark.sessionState.analyzer.resolver
    // TimestampType's string form depends on the SESSION TIMEZONE: the
    // committed `_parts` values were rendered under the WRITER's tz,
    // and `asString` below renders the literal under the READER's — a
    // tz change between write and read would make equal instants
    // string-unequal and wrongly drop satisfying files. Every other
    // type's cast-to-string is tz-independent (TIMESTAMP_NTZ included),
    // so the "representations can never disagree" argument holds only
    // off TimestampType — skip partition pruning there.
    def isPart(a: AttributeReference) =
      a.dataType != org.apache.spark.sql.types.TimestampType &&
        m.pcol.exists(sameName(_, a.name))
    // ORDERED comparison on the partition column — sound for exactly
    // two type shapes: string-vs-string (SQL ordering IS the frame's
    // UTF8 string ordering) and integral-vs-castable-to-long (the
    // committed string round-trips the integer exactly, compared as
    // long). Fractional/temporal stay out: their string forms don't
    // order like their values.
    def isOrdPart(a: AttributeReference, l: Literal): Boolean =
      l.value != null && isPart(a) && (
        (a.dataType == StringType && l.dataType == StringType) ||
        (integral(a.dataType) && asLong(l).isDefined))
    def integral(dt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      dt == LongType || dt == IntegerType || dt == ShortType ||
        dt == ByteType
    }
    def isBloom(a: AttributeReference) =
      m.bloomCol.exists(sameName(_, a.name))
    // cast-to-long `_stats` are order-consistent with the SQL
    // comparison ONLY for numeric/temporal column types: a StringType
    // dim compares in UTF8 binary order while its stats cover just the
    // numerically-parseable rows (a file holding ['1','zzz'] has
    // max=1 yet satisfies `x >= '5'`) — range pruning there would be
    // UNSOUND, so non-ordinal dims get no range verdict at all.
    def ordinalDim(a: AttributeReference): Boolean = a.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.DateType => true
      case org.apache.spark.sql.types.TimestampType => true
      case org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    def dim(a: AttributeReference): Option[Boolean] = // true = x dim
      if (!ordinalDim(a)) None
      else if (m.xCol.exists(sameName(_, a.name))) Some(true)
      else if (m.yCol.exists(sameName(_, a.name))) Some(false)
      else None

    e match {
      // -- partition equality / IN --------------------------------
      case EqualTo(a: AttributeReference, l: Literal) if isPart(a) =>
        partExcluded(m, asString(l).toSet)
      case EqualTo(l: Literal, a: AttributeReference) if isPart(a) =>
        partExcluded(m, asString(l).toSet)
      // null-safe equality: for a NON-NULL literal, `a <=> l` matches
      // exactly the rows `a = l` does (both false on null a) — same
      // wanted-set; a NULL literal matches only null values, which
      // the frame cannot attest — no verdict
      case EqualNullSafe(a: AttributeReference, l: Literal)
        if isPart(a) && l.value != null =>
        partExcluded(m, asString(l).toSet)
      case EqualNullSafe(l: Literal, a: AttributeReference)
        if isPart(a) && l.value != null =>
        partExcluded(m, asString(l).toSet)
      case In(a: AttributeReference, list) if isPart(a) &&
          list.forall(_.isInstanceOf[Literal]) =>
        partExcluded(m,
          list.flatMap(l => asString(l.asInstanceOf[Literal])).toSet)
      case InSet(a: AttributeReference, hset) if isPart(a) =>
        partExcluded(m, hset.flatMap(v =>
          asString(Literal(v, a.dataType))).toSet)
      // -- OR of partition equalities ------------------------------
      // the gold pack's `o_month = a OR o_month = b` (the IN shape a
      // human writes longhand): when EVERY disjunct pins the partition
      // column to literal values, the union of those values is the
      // wanted set — a row satisfying ANY disjunct has its value in
      // the union, so dropping files outside it is sound. One
      // un-pinnable disjunct (or a null/uncastable literal) voids the
      // whole verdict.
      case o: Or =>
        val wanted = splitDisjunctivePredicates(o).map {
          case EqualTo(a: AttributeReference, l: Literal)
            if isPart(a) && l.value != null => asString(l).map(Set(_))
          case EqualTo(l: Literal, a: AttributeReference)
            if isPart(a) && l.value != null => asString(l).map(Set(_))
          case In(a: AttributeReference, list) if isPart(a) &&
              list.forall(_.isInstanceOf[Literal]) &&
              list.forall(_.asInstanceOf[Literal].value != null) =>
            val vs = list.map(l => asString(l.asInstanceOf[Literal]))
            if (vs.forall(_.isDefined)) Some(vs.flatten.toSet) else None
          case _ => None
        }
        if (wanted.exists(_.isEmpty)) Set.empty
        else partExcluded(m, wanted.flatten.flatten.toSet)

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
        if isOrdPart(a, l) => partOrdExcluded(m, a, l, keep = _ >= 0)
      case LessThanOrEqual(l: Literal, a: AttributeReference)
        if isOrdPart(a, l) => partOrdExcluded(m, a, l, keep = _ >= 0)
      case GreaterThan(a: AttributeReference, l: Literal)
        if isOrdPart(a, l) => partOrdExcluded(m, a, l, keep = _ > 0)
      case LessThan(l: Literal, a: AttributeReference)
        if isOrdPart(a, l) => partOrdExcluded(m, a, l, keep = _ > 0)
      case LessThanOrEqual(a: AttributeReference, l: Literal)
        if isOrdPart(a, l) => partOrdExcluded(m, a, l, keep = _ <= 0)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
        if isOrdPart(a, l) => partOrdExcluded(m, a, l, keep = _ <= 0)
      case LessThan(a: AttributeReference, l: Literal)
        if isOrdPart(a, l) => partOrdExcluded(m, a, l, keep = _ < 0)
      case GreaterThan(l: Literal, a: AttributeReference)
        if isOrdPart(a, l) => partOrdExcluded(m, a, l, keep = _ < 0)
      case StartsWith(a: AttributeReference, l: Literal)
        if isOrdPart(a, l) && a.dataType == StringType =>
        // LIKE 'x%' optimizes to StartsWith
        val prefix = l.value.toString
        m.partValue.collect {
          case (k, v) if !v.startsWith(prefix) => k
        }.toSet

      // -- Bloom point key / IN (composes with same-col ranges) -----
      case EqualTo(a: AttributeReference, l: Literal) if isBloom(a) =>
        bloomExcluded(m, root, dir, a, Seq(l))
      case EqualTo(l: Literal, a: AttributeReference) if isBloom(a) =>
        bloomExcluded(m, root, dir, a, Seq(l))
      case EqualNullSafe(a: AttributeReference, l: Literal)
        if isBloom(a) && l.value != null =>
        bloomExcluded(m, root, dir, a, Seq(l))
      case EqualNullSafe(l: Literal, a: AttributeReference)
        if isBloom(a) && l.value != null =>
        bloomExcluded(m, root, dir, a, Seq(l))
      case In(a: AttributeReference, list) if isBloom(a) &&
          list.size <= 64 && list.forall(_.isInstanceOf[Literal]) =>
        bloomExcluded(m, root, dir, a,
          list.map(_.asInstanceOf[Literal]))
      // IN lists past spark.sql.optimizer.inSetConversionThreshold
      // (default 10) arrive as InSet — the shape that used to dodge
      // the Bloom probe entirely
      case InSet(a: AttributeReference, hset) if isBloom(a) &&
          hset.size <= 64 =>
        bloomExcluded(m, root, dir, a,
          hset.toSeq.map(v => Literal(v, a.dataType)))

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
      // `<=>` with a non-null literal matches the same rows `=` does
      case EqualNullSafe(a: AttributeReference, l: Literal)
        if l.value != null =>
        dim(a).fold(Set.empty[String])(x => asLong(l).fold(
          Set.empty[String])(v =>
          rangeExcluded(m, x, lo = Some(v), hi = Some(v))))
      case EqualNullSafe(l: Literal, a: AttributeReference)
        if l.value != null =>
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
    * `compare(value, lit)` — UTF8-binary for string-vs-string,
    * parse-back-to-long for integral partition columns (the committed
    * string round-trips the integer exactly; a value that fails to
    * parse keeps its file, conservatively). */
  private def partOrdExcluded(m: GraftPruning.Meta,
      a: AttributeReference, l: Literal,
      keep: Int => Boolean): Set[String] =
    if (a.dataType == StringType) {
      import org.apache.spark.unsafe.types.UTF8String
      val lit = UTF8String.fromString(l.value.toString)
      m.partValue.collect {
        case (k, v) if !keep(UTF8String.fromString(v).compareTo(lit)) => k
      }.toSet
    } else asLong(l).fold(Set.empty[String]) { lv =>
      m.partValue.collect {
        case (k, v) if scala.util.Try(v.trim.toLong).toOption
          .exists(pv => !keep(java.lang.Long.compare(pv, lv))) => k
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
    val scalaVals = ls.map(l =>
      CatalystTypeConverters.convertToScala(l.value, l.dataType))
    val candidates =
      if (scalaVals.size == 1)
        GraftPruning.bloomCandidates(spark, root, dir, scalaVals.head)
      else // IN list: ONE register pass for the whole key set
        GraftPruning.bloomCandidatesIn(spark, root, dir, scalaVals)
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
