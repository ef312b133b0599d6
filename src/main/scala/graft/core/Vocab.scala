package graft.core

/** Fixed vocabularies + alias dictionary for the deterministic corpus
  * (FIXTURES.md §1, §4). Everything here is closed-form: no entropy.
  *
  * The alias dictionary drives entity linking (candidate generation via
  * broadcast hash join — SURVEY §2.3 J2) and canonicalization
  * (connected components over shared-alias edges). A driver-side
  * union-find (`canonicalOf`) provides the closed-form expected result
  * the distributed CC must reproduce.
  */
object Vocab {

  // 64 lowerCamel identifiers (function / variable names).
  val idents: Vector[String] = Vector(
    "parseTree", "buildPlan", "scanTable", "mergeRows", "sortKeys",
    "hashJoin", "filterRows", "projectCols", "aggSum", "countRows",
    "readBlock", "writeBlock", "openFile", "closeFile", "seekOffset",
    "flushBuffer", "encodeRow", "decodeRow", "packBits", "unpackBits",
    "splitRange", "joinRange", "pruneParts", "pushFilter", "foldConst",
    "rewriteExpr", "bindRefs", "resolveCols", "checkTypes", "castValue",
    "evalExpr", "genCode", "spillPage", "loadPage", "pinBuffer",
    "unpinBuffer", "lockRow", "unlockRow", "beginTxn", "commitTxn",
    "abortTxn", "logWrite", "replayLog", "snapshotState", "restoreState",
    "sampleRows", "estimateCard", "chooseJoin", "reorderJoins", "broadcastDim",
    "shuffleRows", "repartitionBy", "coalesceParts", "zipIndex", "explodeArr",
    "collectSet", "dedupRows", "rankRows", "windowAgg", "sessionize",
    "watermarkTs", "emitLate", "checkpointTo", "compactFiles")

  // 24 capitalized type names.
  val types: Vector[String] = Vector(
    "String", "Int", "Long", "Double", "Row", "Schema", "Column", "Plan",
    "Table", "Block", "Buffer", "Page", "Txn", "Expr", "Batch", "Vector",
    "Matrix", "Graph", "Node", "Edge", "Span", "Token", "Index", "Stream")

  // 16 doc-comment entities (Capitalized).
  val docEntities: Vector[String] = Vector(
    "Catalyst", "Tungsten", "Parquet", "Iceberg", "Arrow", "Calcite",
    "Velox", "Photon", "Presto", "Trino", "Flink", "Kafka", "Hive",
    "Hudi", "Delta", "Gluten")

  // lowercase filler words for doc comments.
  val verbs: Vector[String] = Vector(
    "build", "scan", "merge", "sort", "hash", "filter", "project",
    "encode", "decode", "split")
  val nouns: Vector[String] = Vector(
    "plans", "rows", "blocks", "pages", "spans", "tokens", "batches",
    "columns", "tables", "graphs")

  // 8 annotation / decorator names (lowercase, so tagged IDENT; none
  // collides with an alias-dictionary key — asserted in tests).
  val annots: Vector[String] = Vector(
    "deprecated", "memoized", "tailcall", "threadsafe", "inlined",
    "cachedop", "asyncsafe", "pureop")

  // Capitalized words that may open a doc comment but are NOT entities.
  val docStopCaps: Set[String] =
    Set("Uses", "The", "This", "Returns", "A", "An", "It", "See", "Note")

  val libs: Vector[String] = Vector(
    "corelib", "sqlkit", "planx", "rowio", "colstore", "netrpc",
    "memgr", "txnlog")
  val mods: Vector[String] = Vector(
    "Exec", "Optim", "Store", "Net", "Mem", "Log", "Util", "Fmt")
  // Imported symbols are drawn from `types`.

  /** All canonical entity names (link targets). */
  val entities: Vector[String] = (idents ++ types ++ docEntities).distinct

  /** snake_case variant of a lowerCamel identifier. */
  def snake(s: String): String =
    s.flatMap(c => if (c.isUpper) s"_${c.toLower}" else c.toString)

  /** Alias dictionary rows (alias -> entity). Includes:
    *  - identity aliases for every entity,
    *  - snake_case + lowercase variants,
    *  - chain aliases shared by entity pairs (so CC must merge),
    *  - one high-degree alias shared by 8 entities (skew probe).
    */
  val aliasRows: Vector[(String, String)] = {
    val identity = entities.map(e => (e, e))
    val variants = idents.flatMap { e =>
      Vector((snake(e), e), (e.toLowerCase, e))
    } ++ types.map(t => (t.toLowerCase + "_t", t)) ++
      docEntities.map(d => (d.toLowerCase, d))
    // chains: ident(2i) and ident(2i+1) share a bridge alias for i<4
    val chains = (0 until 4).flatMap { i =>
      val bridge = s"bridge$i"
      Vector((bridge, idents(2 * i)), (bridge, idents(2 * i + 1)))
    }
    // one hot alias shared by 8 entities — exercises skew handling in CC
    val hot = (0 until 8).map(i => ("common", idents(32 + i)))
    (identity ++ variants ++ chains ++ hot).distinct.toVector
  }

  /** Driver-side union-find over shared-alias edges: two entities are in
    * the same component iff they share an alias (transitively).
    * Canonical id = lexicographic min entity in the component.
    * The distributed connected-components stage must reproduce this. */
  lazy val canonicalOf: Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    aliasRows.groupBy(_._1).values.foreach { grp =>
      grp.map(_._2).distinct.sliding(2).foreach {
        case Seq(a, b) => union(a, b)
        case _ =>
      }
    }
    // path-compress to lexicographic min per component
    val comps = entities.groupBy(find)
    comps.flatMap { case (_, members) =>
      val canon = members.min
      members.map(_ -> canon)
    }
  }

  /** alias -> candidate entities (for candidate generation). */
  lazy val aliasToEntities: Map[String, Vector[String]] =
    aliasRows.groupBy(_._1).map { case (a, rows) =>
      a -> rows.map(_._2).distinct.sorted
    }
}
