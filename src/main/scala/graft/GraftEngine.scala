package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.{QueryCache, ResultFormatter}
import graft.functions.GraftFunctions
import graft.mdl.{Manifest, ManifestJson}
import graft.planner.{CatalogResolver, PathResolver, SemanticPlanner, TableResolver}
import graft.semantics.{ManifestExtractor, Substitution, Validator}

/** Public engine API, mirroring the reference's session surface
  * (`wren_core.SessionContext.transform_sql/query/...`, wren-core-py/src/context.rs:222-408,
  * and the v3 HTTP routes, ibis-server/app/routers/v3/connector.py:70-247): deploy a
  * manifest, then run SQL written against model names. Execution is Spark itself (the
  * reference's Mode::LocalRuntime analogue, wren-core/core/src/mdl/context.rs:119-128);
  * there is no unparse-to-dialect layer because Catalyst plans and executes directly.
  */
object GraftEngine {

  def deploy(
      spark: SparkSession,
      manifest: Manifest,
      resolver: TableResolver = new CatalogResolver,
      properties: Map[String, String] = Map.empty): GraftSession = {
    manifest.validateLayoutVersion()
    val planner = new SemanticPlanner(spark, manifest, resolver, properties)
    // deployment writes the shared temp-view namespace AND the constructor
    // claims view ownership — both must happen atomically with any concurrent
    // session's analysis, or a session swapping its views in between would
    // leave ownership pointing at THIS deployment while the catalog holds the
    // other one's views (and this session's first query would skip reregister)
    GraftSession.viewLock(spark).synchronized {
      planner.deploy()
      GraftFunctions.register(spark)
      new GraftSession(spark, manifest, planner, properties)
    }
  }

  /** Deploy from a JSON (or base64 JSON) manifest string, pruned to the models a given
    * SQL actually needs when `forSql` is set (manifest extractor, A14).
    */
  def deployJson(
      spark: SparkSession,
      manifestJson: String,
      resolver: TableResolver = new CatalogResolver,
      properties: Map[String, String] = Map.empty,
      forSql: Option[String] = None): GraftSession = {
    val raw =
      if (manifestJson.trim.startsWith("{")) ManifestJson.parse(manifestJson)
      else ManifestJson.parseBase64(manifestJson)
    val manifest = forSql.map(sql => ManifestExtractor.extract(raw, sql)).getOrElse(raw)
    deploy(spark, manifest, resolver, properties)
  }

  /** Deployment cache for `deployOnDir`: keyed structurally on (session, manifest,
    * dir, properties). Building the governed model plans costs hundreds of ms per
    * manifest; a cache hit only re-registers the temp views (plans are immutable),
    * which keeps correctness even when other work on the session has shadowed the
    * view names in between.
    */
  // keyed on the SparkSession reference itself (identity equality) — an int hash
  // could collide across GC'd sessions and hand back a GraftSession bound elsewhere
  private val deployCache =
    new LruCache[(SparkSession, Manifest, String, Map[String, String]), GraftSession](64)

  /** Convenience: models over `<dir>/<table>.parquet` files. */
  def deployOnDir(
      spark: SparkSession,
      manifest: Manifest,
      dir: String,
      properties: Map[String, String] = Map.empty): GraftSession = {
    val key = (spark, manifest, dir, properties)
    val cached = deployCache.get(key)
    if (cached != null) { cached.reregister(); cached }
    else {
      val s = deploy(spark, manifest, new PathResolver(dir), properties)
      deployCache.put(key, s) // LRU-bounded

      s
    }
  }
}

/** A query exceeded its time budget and its Spark jobs were cancelled. */
final class QueryTimeoutException(msg: String) extends RuntimeException(msg)

/** Tiny synchronized LRU (access-order LinkedHashMap) for the engine's session/plan
  * caches: at capacity the least-recently-USED entry is evicted — the old bound
  * cleared the whole map, cold-starting every cached tenant/plan at once.
  */
private[graft] final class LruCache[K, V](capacity: Int) {
  private val m = new java.util.LinkedHashMap[K, V](capacity * 2, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size > capacity
  }
  private var hitN = 0L
  private var missN = 0L
  def get(k: K): V = m.synchronized {
    val v = m.get(k)
    if (v == null) missN += 1 else hitN += 1
    v
  }
  def put(k: K, v: V): Unit = m.synchronized { m.put(k, v); () }
  def size: Int = m.synchronized(m.size)
  /** (hits, misses) since construction/reset — the plan-cache hit-rate
    * evidence PlanProfile reports (round-14 planning-drift adjudication).
    */
  def stats: (Long, Long) = m.synchronized((hitN, missN))
  def resetStats(): Unit = m.synchronized { hitN = 0L; missN = 0L }
}

object GraftSession {
  /** Which deployment's temp views are currently registered, per Spark session.
    * Sessions over the same SparkSession (e.g. per-query property overrides) share
    * one view namespace; a query from a session that is not the current owner
    * re-registers its views first (milliseconds — the plans are immutable).
    */
  private val viewOwner =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, AnyRef]

  /** Per-SparkSession lock serializing view-ownership swap + query ANALYSIS.
    * Two GraftSessions share one temp-view namespace; without atomicity a
    * thread could swap the views in while another thread's query is mid-
    * analysis and silently resolve against the WRONG deployment. Execution
    * stays fully parallel — resolved plans never re-read the catalog — so the
    * lock costs only the (sub-ms, warm) analysis window.
    */
  private val viewLocks =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, AnyRef]
  private[graft] def viewLock(spark: SparkSession): AnyRef =
    viewLocks.computeIfAbsent(spark, _ => new Object)

  /** Executor for time-bounded query actions (daemon threads — must not block JVM
    * exit; cached — bounded by concurrent timed queries, idle threads reaped).
    */
  private lazy val timeoutPool = java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-timeout-runner")
    t.setDaemon(true)
    t
  })

  /** Cache hit/miss/override outcome for one cached execution — what the HTTP layer
    * needs to populate `X-Cache-Hit` / `X-Cache-Create-At` / `X-Cache-Override[-At]`
    * (reference: connector.py:126-204's cache_headers).
    */
  final case class CacheOutcome(
      df: DataFrame, hit: Boolean, createdAtMs: Option[Long],
      overridden: Boolean, overriddenAtMs: Option[Long])
}

final class GraftSession(
    val spark: SparkSession,
    val manifest: Manifest,
    planner: SemanticPlanner,
    properties: Map[String, String] = Map.empty) {

  GraftSession.viewOwner.put(spark, this)

  /** Run `f` (which must cover every catalog-touching step — view lookup and
    * plan ANALYSIS) with this deployment's views atomically in place.
    */
  private def withViews[T](f: => T): T =
    GraftSession.viewLock(spark).synchronized {
      if (GraftSession.viewOwner.put(spark, this) ne this) planner.reregister()
      f
    }

  /** Sessions derived from this deployment under overridden properties, one per
    * distinct merged property set (bounded; rebuilds are cheap — base scans are
    * shared through the planner).
    */
  private val propSessions = new LruCache[Map[String, String], GraftSession](64)

  /** A session over the SAME deployment with per-query session properties — the
    * reference's `x-wren-variable-*` headers (ibis-server/app/mdl/rewriter.py:177-189).
    * Overrides merge onto deploy-time properties; RLAC filters and CLAC projections
    * re-resolve against the merged set without re-reading sources. The property
    * `timezone` (the `x-wren-timezone` analogue, wren-core/core/src/mdl/context.rs:50-52)
    * is applied as the session timezone while this session's queries are analyzed.
    */
  def withProperties(overrides: Map[String, String]): GraftSession = {
    val merged = properties ++ overrides
    if (merged == properties) this
    else {
      val cached = propSessions.get(merged)
      if (cached != null) cached
      else {
        val p = planner.withProperties(merged)
        // deploy + ownership claim atomic with concurrent analysis (see deploy())
        val s = GraftSession.viewLock(spark).synchronized {
          p.deploy()
          new GraftSession(spark, manifest, p, merged)
        }
        propSessions.put(merged, s) // LRU-bounded
        s
      }
    }
  }

  /** Like `withProperties`, but `props` REPLACES the deploy-time properties instead
    * of merging over them — the per-request form (an HTTP request's headers are the
    * complete property set; a session deployed for tenant A must not leak A's
    * properties into a request that supplied none). Shares the planner's base scans
    * like `withProperties`; only RLAC/CLAC re-resolve.
    */
  def withExactProperties(props: Map[String, String]): GraftSession =
    if (props == properties) this
    else {
      val cached = propSessions.get(props)
      if (cached != null) cached
      else {
        val p = planner.withProperties(props)
        // deploy + ownership claim atomic with concurrent analysis (see deploy())
        val s = GraftSession.viewLock(spark).synchronized {
          p.deploy()
          new GraftSession(spark, manifest, p, props)
        }
        propSessions.put(props, s) // LRU-bounded
        s
      }
    }

  /** Per-query properties: resolve against a property-override session and run. */
  def query(sql: String, props: Map[String, String]): DataFrame =
    withProperties(props).query(sql)

  /** The session timezone binds into timestamp expressions during analysis
    * (ResolveTimeZone), so scoping the conf around `spark.sql` is enough for the
    * resulting lazy DataFrame to keep it.
    */
  private def withSessionTimezone[T](f: => T): T =
    properties.collectFirst { case (k, v) if k.equalsIgnoreCase("timezone") => v } match {
      case Some(tz) =>
        val key = "spark.sql.session.timeZone"
        val prev = spark.conf.get(key)
        spark.conf.set(key, tz)
        try f finally spark.conf.set(key, prev)
      case None => f
    }

  /** Execute user SQL written against model/view names. `limit` clamps the result like
    * the reference's pushdown_limit (wren-core-py/src/context.rs:271-320).
    *
    * Permission UX (the reference's two-phase PermissionAnalyze, mdl/mod.rs:497-592):
    * a CLAC-dropped column fails Spark analysis as "column not found"; when the
    * column *does* exist in the manifest, that error is converted into an explicit
    * access-denied message instead of a confusing resolution failure.
    */
  /** Warm-path plan cache: raw SQL → its ANALYZED plan, plus the OPTIMIZED plan when
    * the query is time-stable. Analysis (view expansion, resolution, access checks)
    * and optimization are each deterministic for a fixed deployment + property set
    * (both fixed per GraftSession), so re-running either warm is pure overhead — and
    * together they are nearly all of warm planning latency. The optimized plan is
    * withheld (None) exactly when caching it would change semantics: plans carrying
    * time-dependent foldables (current_timestamp & co. — the optimizer freezes them
    * per-optimization) or non-deterministic expressions (rand, uuid) re-optimize per
    * call so every execution gets fresh values.
    */
  private final case class CachedPlan(
      analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      optimized: Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan])

  private val planCache = new LruCache[(String, Option[Int], String), CachedPlan](256)

  /** (hits, misses) of the per-session plan cache — PlanProfile evidence. */
  def planCacheStats: (Long, Long) = planCache.stats
  def resetPlanCacheStats(): Unit = planCache.resetStats()

  /** False when any expression (subqueries included) is non-deterministic or bound
    * to query-submission time — the set the optimizer's ComputeCurrentTime /
    * ReplaceExpressions freeze per optimization run.
    */
  private def timeStable(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    var stable = true
    plan.transformAllExpressionsWithSubqueries {
      case e if !e.deterministic || e.isInstanceOf[CurrentTimestamp] ||
          e.isInstanceOf[CurrentDate] || e.isInstanceOf[Now] ||
          e.isInstanceOf[LocalTimestamp] || e.isInstanceOf[CurrentTimeZone] ||
          e.isInstanceOf[CurrentDatabase] || e.isInstanceOf[CurrentCatalog] =>
        stable = false; e
    }
    stable
  }

  /** Analysis-relevant session conf baked into cached plans — a change must miss. */
  private def planConfKey: String =
    spark.conf.get("spark.sql.session.timeZone") + "|" +
      spark.conf.get("spark.sql.ansi.enabled", "false") + "|" +
      spark.conf.get("spark.sql.caseSensitive", "false")

  def query(sql: String, limit: Option[Int] = None): DataFrame = {
    val key = (sql, limit, planConfKey)
    val hit = planCache.get(key)
    if (hit != null) return hit.optimized match {
      case Some(opt) =>
        org.apache.spark.sql.graft.Bridge.ofRowsPreOptimized(spark, hit.analyzed, opt)
      case None => org.apache.spark.sql.graft.Bridge.ofRows(spark, hit.analyzed)
    }
    withViews {
    val df =
      try withSessionTimezone(planner.runSql(sql))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition != null && e.getCondition.startsWith("UNRESOLVED_COLUMN") =>
          // The unresolved name comes from the error's structured parameters
          // (`objectName`, stable across message-text changes), not a grep of the
          // rendered message; the regex remains only as a fallback for parameter-less
          // builds. Multi-part names keep their last segment.
          val missing = Option(e.getMessageParameters.get("objectName"))
            .map(_.split("\\.").last.replace("`", ""))
            .orElse("`([^`]+)`".r.findFirstMatchIn(e.getMessage).map(_.group(1)))
          // Convert only when the column belongs to a model the query actually names
          // AND its rule denies under THIS session's properties — a typo on an
          // unrestricted column stays a plain resolution error.
          def referenced(name: String): Boolean =
            ("(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
              .findFirstIn(sql).nonEmpty
          val denied = missing.exists(colName => manifest.models.exists(m =>
            referenced(m.name) && planner.clacDenied(m, colName)))
          if (denied)
            throw new graft.planner.GraftException(
              s"Access denied: column ${missing.get} is restricted by column-level " +
                "access control for this session")
          else throw e
      }
    val limited = limit.map(df.limit).getOrElse(df)
    // A6 partial-model pruning: drop engine-generated to-one join sides the query
    // never references (see PartialModelPruner) — then cache the pruned plan.
    val pruned = graft.planner.PartialModelPruner.prune(limited.queryExecution.analyzed)
    val out = org.apache.spark.sql.graft.Bridge.ofRows(spark, pruned)
    // Optimize eagerly on the miss path (execution would anyway) so warm hits can
    // skip the optimizer entirely; time-sensitive plans cache analyzed-only.
    val optimized =
      if (timeStable(pruned))
        scala.util.Try(out.queryExecution.optimizedPlan).toOption
      else None
    planCache.put(key, CachedPlan(pruned, optimized))
    out
    }
  }

  /** The planned form of the SQL — the `/dry-plan` analogue. The reference returns
    * backend SQL (transform_sql_with_ctx, mdl/mod.rs:477-541); on Spark the natural
    * "planned" artifact is the analyzed/optimized Catalyst plan.
    */
  def transformSql(sql: String): String =
    query(sql).queryExecution.optimizedPlan.toString

  /** `/dry-plan` with a target dialect — the reference's `Mode::Unparse`
    * (wren_dialect.rs:41-110): the optimized semantic-layer expansion rendered
    * as executable SQL text. `"spark"` emits self-contained Spark SQL over
    * `parquet.`path`` scans; `"duckdb"` emits DuckDB SQL over logical table
    * names; null/empty/`"plan"` return the Catalyst plan dump above; any other
    * name is rejected with IllegalArgumentException (HTTP 422), like the
    * reference's unknown-dialect error.
    */
  def transformSql(sql: String, dialect: String): String =
    if (dialect == null || dialect.isEmpty || dialect == "plan") transformSql(sql)
    else {
      val qe = query(sql).queryExecution
      // Optimize the analyzed plan directly, skipping QueryExecution's
      // cached-data substitution: the emitted text must rebuild from the
      // SOURCES on whatever engine runs it — an InMemoryRelation swapped in
      // because some earlier job cached an overlapping scan is local session
      // state, not part of the query's meaning.
      val optimized = spark.sessionState.optimizer.execute(qe.analyzed)
      graft.semantics.SqlUnparser.unparse(optimized,
        qe.analyzed.output.map(_.name),
        graft.semantics.SqlUnparser.dialectFor(dialect))
    }

  /** Plan without executing; throws on invalid SQL / access violations (the `/dry-run`
    * analogue, connector.py:110-123).
    */
  def dryRun(sql: String): Unit = {
    query(sql).queryExecution.assertAnalyzed()
    ()
  }

  /** Strict-mode policy validation before planning (the reference SDK's
    * `validate_sql_policy`, wren/src/wren/policy.py:15-110): every table must be a
    * deployed model/view or an in-scope CTE, table-valued functions are rejected,
    * and `deniedFunctions` names are rejected anywhere in the query. Runs on the
    * parsed plan only — no data access.
    */
  def validatePolicy(
      sql: String, strictMode: Boolean = true,
      deniedFunctions: Set[String] = Set.empty): Unit =
    graft.semantics.Policy.validate(spark, sql,
      (manifest.models.map(_.name) ++ manifest.views.map(_.name) ++
        manifest.metrics.map(_.name)).toSet,
      strictMode, deniedFunctions)

  /** [[query]] gated by [[validatePolicy]] — the strict-mode query entry point. */
  def queryStrict(sql: String, deniedFunctions: Set[String] = Set.empty): DataFrame = {
    validatePolicy(sql, strictMode = true, deniedFunctions)
    query(sql)
  }

  def modelDF(name: String): DataFrame = withViews(spark.table(name))

  /** Re-register this deployment's temp views (cache-hit path of deployOnDir). */
  private[graft] def reregister(): Unit =
    GraftSession.viewLock(spark).synchronized {
      GraftSession.viewOwner.put(spark, this)
      planner.reregister()
    }

  /** Refresh the deployment's cached source file listings — call after the
    * underlying table directories were REWRITTEN in place (e.g. a
    * [[graft.mdl.LandRaw]] merge/replace re-land): Spark caches leaf-file
    * listings in each scan's `FileIndex`, so queries through an already
    * deployed session would otherwise chase deleted part files or serve the
    * stale row set. Appends don't strictly need it but see new files sooner.
    */
  def refresh(): Unit = planner.refreshSources()

  /** Model substitution (A13): run SQL written against *physical* table names by
    * rewriting each relation to its governing model (substitute.py:14-124).
    */
  def querySubstituted(sql: String): DataFrame = withViews {
    // same enum semantics as query(): Enum.Value rewrites before substitution
    org.apache.spark.sql.graft.Bridge.ofRows(spark, planner.rewriteEnums(
      Substitution.substitute(spark, manifest, planner.stripNamespace(sql))))
  }

  /** Collision-resistant deployment identity: SHA-256 over the full structural
    * rendering of the manifest (expressions, access-control rules, ...), so an
    * edited manifest with unchanged model names never serves stale results and two
    * manifests sharing catalog.schema cannot collide the way a 32-bit hash could.
    */
  private lazy val manifestDigest: String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(manifest.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Result cache (A17): execute through a parquet-backed cache keyed by
    * (manifest, sql, session properties).
    */
  def queryCached(sql: String, cache: QueryCache): DataFrame =
    queryCachedMeta(sql, cache).df

  /** Like [[queryCached]], reporting how the cache behaved. `overrideCache` forces
    * re-execution and re-write even on a hit (the reference's `overrideCache` query
    * parameter).
    */
  def queryCachedMeta(sql: String, cache: QueryCache, overrideCache: Boolean = false)
      : GraftSession.CacheOutcome = {
    import GraftSession.CacheOutcome
    val id = s"${manifest.catalog}.${manifest.schema}:$manifestDigest"
    val cached = cache.get(spark, id, sql, properties)
    (cached, overrideCache) match {
      case (Some(df), false) =>
        CacheOutcome(df, hit = true, cache.createdAt(id, sql, properties),
          overridden = false, None)
      case (hitBefore, _) =>
        val prevAt = if (hitBefore.isDefined) cache.createdAt(id, sql, properties) else None
        val df = cache.put(query(sql), id, sql, properties)
        CacheOutcome(df, hit = false, prevAt,
          overridden = hitBefore.isDefined, cache.createdAt(id, sql, properties))
    }
  }

  /** Formatted JSON response (A18) — the v3 query-response shape. */
  def queryJson(sql: String, limit: Int = 1000): String =
    ResultFormatter.toJsonResponse(query(sql), limit)

  /** Run `action` with a wall-clock budget — the reference's
    * `execute_query_with_timeout` (ibis-server/app/model/connector.py:157-160),
    * built on Spark's job-group cancellation. The action runs on a pool thread
    * under a unique job group with `interruptOnCancel`; on timeout every job the
    * group has launched is cancelled (running tasks are interrupted), the thread
    * is interrupted for any non-Spark wait, and a [[QueryTimeoutException]] is
    * thrown. The session stays fully usable — cancellation is scoped to the group.
    */
  def withTimeout[T](timeoutMs: Long)(action: => T): T = {
    val sc = spark.sparkContext
    val group = s"graft-timeout-${java.util.UUID.randomUUID()}"
    val task = GraftSession.timeoutPool.submit(new java.util.concurrent.Callable[T] {
      override def call(): T = {
        sc.setJobGroup(group, s"graft query (budget $timeoutMs ms)", interruptOnCancel = true)
        try action finally sc.clearJobGroup()
      }
    })
    try task.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        sc.cancelJobGroup(group)
        task.cancel(true)
        throw new QueryTimeoutException(
          s"query exceeded its $timeoutMs ms budget and was cancelled")
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }
  }

  /** Time-bounded collect of a governed query. */
  def collectWithTimeout(sql: String, timeoutMs: Long, limit: Option[Int] = None)
      : Array[org.apache.spark.sql.Row] =
    withTimeout(timeoutMs)(query(sql, limit).collect())

  /** Time-bounded v3 JSON response (the HTTP route's `timeout` parameter). */
  def queryJsonWithTimeout(sql: String, limit: Int, timeoutMs: Long): String =
    withTimeout(timeoutMs)(queryJson(sql, limit))

  /** Validation probes (A19). */
  def validateColumn(model: String, column: String): Validator.ValidationResult =
    Validator.columnIsValid(spark, model, column)
  def validateRelationships(): Seq[Validator.ValidationResult] =
    manifest.relationships.map(r => Validator.relationshipIsValid(spark, manifest, r))
  def validateRlacSyntax(condition: String): Validator.ValidationResult =
    Validator.rlacConditionSyntaxIsValid(spark, condition)
  def validateCubeHierarchies(): Seq[Validator.ValidationResult] =
    manifest.cubes.map(Validator.cubeHierarchyIsValid)

  /** Cube materialization: the reference carries cubes in the manifest but never
    * plans them (SURVEY §1.1 Cube row); here a cube becomes a real `CUBE()` rollup
    * over its base model, registered as a view (and thus queryable/cacheable like
    * any model). Measures aggregate over the full cube lattice; time dimensions are
    * truncated per their declared grain suffix (`col:grain`, default day).
    */
  def materializeCube(name: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val cube = manifest.cubes.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new graft.planner.GraftException(s"cube $name not found in manifest"))
    if (cube.measures.isEmpty)
      throw new graft.planner.GraftException(s"cube $name declares no measures")
    if (manifest.model(cube.name).nonEmpty)
      throw new graft.planner.GraftException(
        s"cube $name would shadow the model view of the same name")
    withViews {
      val base = spark.table(cube.baseObject)
      val timeDims = cube.timeDimensions.map { td =>
        val (c, grain) = td.split(':') match {
          case Array(c, g) => (c, g)
          case _ => (td, "day")
        }
        date_trunc(grain, col(c)).alias(s"${c}_$grain")
      }
      val dims = cube.dimensions.map(d => col(d)) ++ timeDims
      val measures = cube.measures.map(m =>
        expr(m.expression.replace("\"", "`")).alias(m.name))
      val df = base.cube(dims: _*).agg(measures.head, measures.tail: _*)
      df.createOrReplaceTempView(cube.name)
      df
    }
  }

  /** Function listing for the `/functions` API (A20). */
  def functions: Seq[GraftFunctions.FnSpec] = GraftFunctions.listing

  /** Metadata: deployed models with their visible columns and types (the
    * `/metadata` routes, ibis-server/app/routers/v3/connector.py).
    */
  def metadata: Seq[(String, Seq[(String, String)])] =
    manifest.models.map { m =>
      m.name -> m.columns.filter(c => c.relationship.isEmpty && !c.isHidden)
        .map(c => c.name -> c.`type`)
    }
}
