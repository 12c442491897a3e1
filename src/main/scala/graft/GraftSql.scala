package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The general SQL entry point — the first surface a user of a query
  * engine reaches for: register every testdata table once, then route
  * arbitrary ANSI SQL through Catalyst.
  *
  * There is deliberately nothing clever here. The views are thin logical
  * plans over the parquet scans, so every Catalyst optimization the
  * DataFrame surface enjoys — predicate pushdown into the scan, column
  * pruning, join reorder, broadcast selection, AQE — applies unchanged to
  * SQL text (the sql1–sql3 gate queries pin that end to end; PlanSpec
  * asserts the pushdown visibly reaches the scan). At cluster scale the
  * same two calls work against any catalog-backed tables; the `dir`
  * parameter only reflects the gate's directory-of-parquet layout.
  */
object GraftSql {

  /** Plain parquet-backed tables (schema used as stored). */
  private val plainTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings")

  /** Register all testdata tables under `dir` as session temp views,
    * replacing any prior registration (idempotent per session+dir).
    * `events` goes through [[graft.sources.Tables.events]] so its
    * TIMESTAMP(NANOS) column arrives as a proper timestamp here too.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    plainTables.foreach { n =>
      graft.sources.Tables(spark, dir, n).createOrReplaceTempView(n)
    }
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events")
    // the native expressions ride along: SQL users get graft_dot /
    // graft_proj without touching the Column API
    graft.functions.VectorFunctions.registerSqlFunctions(spark)
  }

  /** Register (idempotent) and run one SQL statement. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }

  // ---- DML over the keyed lake table ----
  //
  // The write path (LakeTable.merge/applyChanges/deleteRange) reached
  // from SQL TEXT — the surface a pipeline author living in the SQL
  // entry point needs. The grammar is deliberately small and LOUD:
  // exactly the forms below are accepted (keywords case-insensitive,
  // the USING body is any SELECT this entry can run); anything else
  // that LOOKS like DML fails with the supported grammar in the
  // message rather than half-parsing. Semantics are exactly the Scala
  // API's (same candidate pruning, same OCC, same reports):
  //
  //   MERGE INTO LAKE '<root>' KEY <col> [WITH SCHEMA EVOLUTION]
  //     USING <select…>
  //   APPLY CHANGES INTO LAKE '<root>' KEY <col> [OP <col>]
  //     USING <select…>            -- op column ∈ {'U','D'}
  //   DELETE FROM LAKE '<root>' WHERE <col> BETWEEN <lo> AND <hi>
  //   CHANGES FROM LAKE '<root>' KEY <col>
  //     BETWEEN '<generation>' AND '<generation>'
  //   GENERATIONS FROM LAKE '<root>'
  //   OPTIMIZE LAKE '<root>' BUCKETS <n> [ZORDER BY <col>]
  //   VACUUM LAKE '<root>' [RETAIN <n> HOURS]
  //
  // OPTIMIZE needs NO key in the grammar — the manifest records the
  // table's key column (the io16 field), which is the point of
  // recording it: maintenance doesn't re-guess what the writers
  // declared. Lex form derives equal-width splits from the manifest
  // bounds (compactAuto); ZORDER BY routes to compactZ. VACUUM is the
  // grace-gated sweep; RETAIN 0 HOURS is the single-writer collect-now
  // mode (forfeits time travel/CDF history — the stated tradeoff).
  //
  // and, inside any SELECT/WITH statement, the TABLE forms (sql8 —
  // the Delta `VERSION AS OF` read, the first query every auditor
  // runs; rewritten to temp views over LakeTable.read/readAt before
  // Catalyst sees the text, so pushdown/pruning apply unchanged):
  //
  //   ... FROM LAKE '<root>'                          -- live state
  //   ... FROM LAKE '<root>' VERSION AS OF '<gen>'    -- time travel
  //
  // (Ranges-only DELETE is honest, not lazy: the metadata-only drop
  // economics io20 locks exist exactly for key-range predicates; an
  // arbitrary-predicate delete is a caller-side applyChanges. CHANGES
  // is the io22 row-level feed — generation names come from
  // GENERATIONS/LakeTable.generations or a name captured around a
  // write.)

  private val MergeRe =
    """(?is)\s*MERGE\s+INTO\s+LAKE\s+'([^']+)'\s+KEY\s+(\w+)\s+(?:(WITH\s+SCHEMA\s+EVOLUTION)\s+)?USING\s+(.+)""".r
  private val ApplyRe =
    """(?is)\s*APPLY\s+CHANGES\s+INTO\s+LAKE\s+'([^']+)'\s+KEY\s+(\w+)\s+(?:OP\s+(\w+)\s+)?USING\s+(.+)""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+LAKE\s+'([^']+)'\s+WHERE\s+(\w+)\s+BETWEEN\s+(-?\d+)\s+AND\s+(-?\d+)\s*;?\s*""".r
  private val ChangesRe =
    """(?is)\s*CHANGES\s+FROM\s+LAKE\s+'([^']+)'\s+KEY\s+(\w+)\s+BETWEEN\s+'([^']+)'\s+AND\s+'([^']+)'\s*;?\s*""".r
  private val GenerationsRe =
    """(?is)\s*GENERATIONS\s+FROM\s+LAKE\s+'([^']+)'\s*;?\s*""".r
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+LAKE\s+'([^']+)'\s+BUCKETS\s+(\d+)(?:\s+ZORDER\s+BY\s+(\w+))?\s*;?\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+LAKE\s+'([^']+)'(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""".r
  private val DmlShaped =
    """(?is)\s*(MERGE|DELETE|APPLY|CHANGES|GENERATIONS|OPTIMIZE|VACUUM)\b.*""".r
  // a LAKE table reference inside a SELECT/WITH — optional time travel
  private val LakeRefRe =
    """(?i)LAKE\s+'([^']+)'(?:\s+VERSION\s+AS\s+OF\s+'([^']+)')?""".r
  private val SelectShaped = """(?is)\s*(SELECT|WITH)\b.*""".r

  private def grammarError(statement: String): Nothing =
    sys.error(
      "unsupported DML clause. Supported forms:\n" +
        "  MERGE INTO LAKE '<root>' KEY <col> [WITH SCHEMA EVOLUTION] " +
        "USING <select>\n" +
        "  APPLY CHANGES INTO LAKE '<root>' KEY <col> [OP <col>] " +
        "USING <select>\n" +
        "  DELETE FROM LAKE '<root>' WHERE <col> BETWEEN <lo> AND <hi>\n" +
        "  CHANGES FROM LAKE '<root>' KEY <col> BETWEEN '<gen>' AND " +
        "'<gen>'\n" +
        "  GENERATIONS FROM LAKE '<root>'\n" +
        "  OPTIMIZE LAKE '<root>' BUCKETS <n> [ZORDER BY <col>]\n" +
        "  VACUUM LAKE '<root>' [RETAIN <n> HOURS]\n" +
        "  SELECT ... FROM LAKE '<root>' [VERSION AS OF '<gen>'] ...\n" +
        s"got: ${statement.trim.take(200)}")

  /** Route one statement: lake DML to the LakeTable write path,
    * anything else to [[sql]]. DML returns its report as a one-row
    * frame (the write itself has already committed when this returns).
    */
  def exec(spark: SparkSession, dir: String, statement: String): DataFrame = {
    import spark.implicits._
    statement match {
      case MergeRe(root, key, evolve, select) =>
        val rep = graft.sources.LakeTable.merge(
          sql(spark, dir, rewriteLakeRefs(spark, select)), root, key,
          mergeSchema = evolve != null)
        Seq((rep.touched.size.toLong, rep.untouched.size.toLong,
          rep.pureInsert))
          .toDF("touched_batches", "untouched_batches", "pure_insert")
      case ApplyRe(root, key, opCol, select) =>
        val rep = graft.sources.LakeTable.applyChanges(
          sql(spark, dir, rewriteLakeRefs(spark, select)), root, key,
          opCol = Option(opCol).getOrElse("op"))
        Seq((rep.touched.size.toLong, rep.untouched.size.toLong,
          rep.pureInsert))
          .toDF("touched_batches", "untouched_batches", "pure_insert")
      case DeleteRe(root, key, lo, hi) =>
        val rep = graft.sources.LakeTable.deleteRange(
          spark, root, key, lo.toLong, hi.toLong)
        Seq((rep.droppedMetadataOnly.size.toLong,
          rep.rewritten.size.toLong, rep.untouched.size.toLong))
          .toDF("dropped_metadata_only", "rewritten_batches",
            "untouched_batches")
      case ChangesRe(root, key, fromGen, toGen) =>
        graft.sources.LakeTable
          .changesBetween(spark, root, key, fromGen, toGen)
      case GenerationsRe(root) =>
        val gens = graft.sources.LakeTable.generations(spark, root)
        gens.map(g => (g, graft.sources.LakeTable.ordinal(g)))
          .toDF("generation", "ordinal")
      case OptimizeRe(root, buckets, zcol) =>
        val lk = graft.sources.LakeTable
        val (before, _, keyOpt) = lk.currentStateKeyed(spark, root)
        val key = keyOpt.getOrElse(sys.error(
          s"the manifest under $root predates key recording — run one " +
            "keyed write first (it stamps the key) or use the Scala API"))
        if (zcol != null) lk.compactZ(spark, root, key, zcol, buckets.toInt)
        else lk.compactAuto(spark, root, key, buckets.toInt)
        Seq((before.size.toLong, lk.currentRows(spark, root).size.toLong))
          .toDF("batches_before", "batches_after")
      case VacuumRe(root, hours) =>
        // bounded before the multiply: an astronomical RETAIN would
        // overflow Long to a NEGATIVE grace — i.e. collect-everything-
        // now, the exact opposite of the maximally-conservative intent
        val grace = Option(hours).map { h =>
          require(
            h.length <= 7 && h.toLong <= 876000L, // ≤ 100 years
            s"RETAIN $h HOURS out of range (0..876000)")
          h.toLong * 3600000L
        }.getOrElse(15L * 60L * 1000L)
        val rep = graft.sources.LakeTable.sweep(spark, root, grace)
        Seq((rep.gensSwept, rep.dirsSwept,
          graft.sources.LakeTable.currentRows(spark, root).size.toLong))
          .toDF("gens_swept", "dirs_swept", "batches_live")
      case DmlShaped(_) => grammarError(statement)
      case sel @ SelectShaped(_) if LakeRefRe.findFirstIn(sel).isDefined =>
        sql(spark, dir, rewriteLakeRefs(spark, sel))
      case other if LakeRefRe.findFirstIn(other).isDefined =>
        grammarError(statement) // LAKE-shaped but not a form we accept
      case other => sql(spark, dir, other)
    }
  }

  /** TIME TRAVEL + live lake reads from SQL text: each LAKE reference
    * becomes a temp view over readAt/read (immutable generation
    * manifests make the as-of view byte-stable), and the rewritten
    * statement runs through Catalyst unchanged — a view is a thin
    * logical plan, so pushdown reaches the scan (plan-locked in
    * SqlTimeTravelSpec). View names carry a UNIQUE token: two threads
    * sharing one session must never cross-wire each other's rewrites
    * through a fixed name. Applied to SELECT statements AND to
    * MERGE/APPLY USING bodies, so a lake-to-lake hop
    * (`MERGE INTO LAKE 'a' ... USING SELECT ... FROM LAKE 'b'`) works
    * as the grammar promises.
    */
  private def rewriteLakeRefs(
      spark: SparkSession, statement: String): String =
    LakeRefRe.replaceAllIn(statement, m => {
      val frame = Option(m.group(2)) match {
        case Some(gen) =>
          graft.sources.LakeTable.readAt(spark, m.group(1), gen)
        case None => graft.sources.LakeTable.read(spark, m.group(1))
      }
      val view = "graft_lake_ref_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      frame.createOrReplaceTempView(view)
      view
    })
}
