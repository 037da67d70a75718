package graft.plans

import graft.wds.datasource.{WdsScan, WdsTable}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Automatic tar-entry PAYLOAD pruning for the `wds` source — the
  * optimizer half of the seekable-scan work: a query that touches
  * `entries` only as `element_at(entries, '<literal key>')` (or as the
  * reference's idiomatic `to_dict` projection, which compiles to
  * `map_filter(entries, (k,v) -> k IN <literal set>)` —
  * `tokenize/main.py:165` via `SampleOps.toDict`) provably never
  * observes any other entry's bytes, so the scan can seek past them.
  * Without this, `select element_at(entries,'txt') from wds` over fat
  * multimodal shards reads every jpg/mp4 byte to satisfy a text-only
  * projection; with it, the scan gets `payload_select = *.txt`
  * injected and moves ~the text bytes.
  *
  * Soundness contract (why this never changes answers):
  *  - payload pruning keeps every entry NAME — group boundaries, row
  *    counts, `map_keys`, and sample membership are byte-identical to
  *    the unpruned read; only VALUES of non-matching entries become
  *    empty arrays;
  *  - the rewrite fires only when EVERY occurrence of the `entries`
  *    attribute (and of pass-through aliases of it, traced positionally
  *    ACROSS Union branches — `Union.output` reuses only the head
  *    child's exprIds, so sibling-branch forwarding must be folded into
  *    the id set or a non-head branch would escape the root-output
  *    guard) in the WHOLE plan is `GetMapValue`/`ElementAt` with a
  *    string literal key, a `MapFilter` whose lambda is a pure
  *    literal-key membership test, or a key-structure-only read
  *    (`map_keys`/`size`/`map_contains_key` — names always flow, so
  *    these are identical under pruning; a query using ONLY them
  *    prunes every payload via the match-nothing glob), and no
  *    alias/attr reaches the plan's root output;
  *  - a `MapFilter` keep-set is sound to prune to because the filtered
  *    map can only ever expose those keys' values (names of dropped
  *    keys vanish from the RESULT map, but the result is a new
  *    expression — the SCAN still emits every name); a lambda that
  *    touches the VALUE variable is rejected — evaluating a predicate
  *    over a blanked payload could change which keys survive;
  *  - collected keys map to entry-name globs by derivation: a dot-free
  *    map key `txt` only arises from an entry `*.txt`
  *    (`Sample.basePlusExt` — prefixes are dot-free, so the suffix is
  *    everything after the FIRST dot); a dotted key `K` arises from an
  *    entry `*.K` (multi-dot suffix) or, under the interleave fold
  *    (`tariterators.py:213-219`), from `*-K` (the folded key is
  *    `<rem>.<sufx>` of an entry `<id>-<rem>.<sufx>`, i.e. the entry
  *    name ends in `-K`), so both globs are emitted — over-matching
  *    only keeps more bytes, never changes results.
  *
  * Runs in the post-pushdown position (`extraOptimizations` /
  * injected rule re-applied after V2 pushdown), so it matches the
  * [[DataSourceV2ScanRelation]] and swaps the [[WdsScan]] itself.
  * Idempotent: a scan that already carries `select` or
  * `payload_select` (user-set or a prior application) is ineligible.
  */
object WdsPayloadPrune extends Rule[LogicalPlan] {

  /** Keys a glob can be built for verbatim: no glob metacharacters
    * (`*?[]{}()` would change matching), no comma (the option string is
    * comma-joined), no slash (map keys never contain one). Dots are
    * fine — see the derivation note in the class doc. */
  private val SafeKey = "^[A-Za-z0-9._-]+$".r

  private def literalKey(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) if s != null => Some(s.toString)
    case _ => None
  }

  /** `map_filter(entries, (k, v) -> <pure literal membership on k>)`
    * → the keep-set. `In`/`InSet`/`EqualTo`/`Or` cover every shape the
    * optimizer leaves `Column.isInCollection` in (OptimizeIn rewrites
    * 1-element `In` to `EqualTo` and big sets to `InSet`). Any other
    * predicate — and in particular anything referencing the VALUE
    * lambda variable — returns None. */
  private def mapFilterKeepSet(f: Expression): Option[Set[String]] =
    f match {
      case LambdaFunction(pred, Seq(k: NamedLambdaVariable, _), _) =>
        def keySet(e: Expression): Option[Set[String]] = e match {
          case In(kv: NamedLambdaVariable, list)
            if kv.exprId == k.exprId =>
            val lits = list.map(literalKey)
            if (lits.forall(_.isDefined)) Some(lits.flatten.toSet)
            else None
          case InSet(kv: NamedLambdaVariable, hset)
            if kv.exprId == k.exprId &&
              hset.forall(_.isInstanceOf[UTF8String]) =>
            Some(hset.map(_.asInstanceOf[UTF8String].toString).toSet)
          case EqualTo(kv: NamedLambdaVariable, l)
            if kv.exprId == k.exprId => literalKey(l).map(Set(_))
          case EqualTo(l, kv: NamedLambdaVariable)
            if kv.exprId == k.exprId => literalKey(l).map(Set(_))
          case Or(a, b) =>
            for { sa <- keySet(a); sb <- keySet(b) } yield sa ++ sb
          case _ => None
        }
        keySet(pred)
      case _ => None
    }

  /** All `entries`-attribute uses conform → Some(keys); any bare or
    * non-literal use → None. `ids` starts at the relation's attr and
    * grows over pass-through `Alias(attr)` projections AND positionally
    * across Union branches (both directions: a branch attr in the set
    * pulls in the Union output attr and every sibling's attr at the
    * same position, and vice versa — Union is the one operator whose
    * output does NOT share non-head children's exprIds). */
  private def conformingKeys(
      plan: LogicalPlan, id0: ExprId): Option[Set[String]] = {
    // uses can hide inside subquery plans (correlated OuterReferences
    // over the tracked map) — fold every nested subquery plan into the
    // walk so such uses are SEEN (and, being non-conforming shapes,
    // block the rewrite) rather than silently missed
    val scopes = plan +: plan.subqueriesAll
    var ids = Set(id0)
    var grew = true
    while (grew) {
      grew = false
      scopes.foreach(_.foreach {
        case Project(items, _) => items.foreach {
          case al @ Alias(a: Attribute, _)
            if ids(a.exprId) && !ids(al.exprId) =>
            ids += al.exprId; grew = true
          case _ => ()
        }
        case u: Union =>
          val outs = u.output +: u.children.map(_.output)
          u.output.indices.foreach { i =>
            val slot = outs.collect { case o if i < o.length => o(i) }
            if (slot.exists(a => ids(a.exprId)) &&
                !slot.forall(a => ids(a.exprId))) {
              slot.foreach(a => ids += a.exprId); grew = true
            }
          }
        case _ => ()
      })
    }
    // the map observed wholesale at the root → no pruning
    if (plan.output.exists(a => ids(a.exprId))) return None
    var keys = Set.empty[String]
    var nameOnly = false // key-structure uses (map_keys/size/contains)
    var ok = true
    def visit(e: Expression): Unit = if (ok) e match {
      case g: GetMapValue =>
        (g.child, literalKey(g.key)) match {
          case (a: Attribute, Some(k)) if ids(a.exprId) => keys += k
          case _ => g.children.foreach(visit)
        }
      case ea: ElementAt =>
        (ea.left, literalKey(ea.right)) match {
          case (a: Attribute, Some(k)) if ids(a.exprId) => keys += k
          case _ => ea.children.foreach(visit)
        }
      case mf: MapFilter =>
        (mf.argument, mapFilterKeepSet(mf.function)) match {
          case (a: Attribute, Some(ks)) if ids(a.exprId) => keys ++= ks
          case _ => mf.children.foreach(visit)
        }
      // NAME-ONLY observations: payload pruning keeps every entry
      // name (the scan's soundness contract), so key-structure reads
      // over the tracked map are identical under pruning and
      // contribute no keys — the check stage's map_keys/size audits
      // must not block a json-only sweep
      case mk: MapKeys if mk.child.isInstanceOf[Attribute] &&
        ids(mk.child.asInstanceOf[Attribute].exprId) => nameOnly = true
      case s: Size if s.child.isInstanceOf[Attribute] &&
        ids(s.child.asInstanceOf[Attribute].exprId) => nameOnly = true
      case mc: MapContainsKey if mc.left.isInstanceOf[Attribute] &&
        ids(mc.left.asInstanceOf[Attribute].exprId) =>
        nameOnly = true
        visit(mc.right) // the key expr could itself reference the map
      case a: Attribute if ids(a.exprId) => ok = false // bare use
      case other => other.children.foreach(visit)
    }
    scopes.foreach(_.foreach {
      case Project(items, _) => items.foreach {
        // a bare attr / bare alias projectList item just forwards the
        // column — its real consumers are checked at their own nodes,
        // and the root-output guard above catches forwarding all the
        // way out
        case _: Attribute => ()
        case al: Alias if al.child.isInstanceOf[Attribute] => ()
        case e => visit(e)
      }
      // a relation's `expressions` list its own OUTPUT attributes —
      // definitional, not uses; visiting them would read every wds
      // scan as a bare use of its own column
      case _: DataSourceV2ScanRelation | _: DataSourceV2Relation => ()
      case other => other.expressions.foreach(visit)
    })
    if (!ok || (keys.isEmpty && !nameOnly)) None
    else if (keys.forall(k => SafeKey.matches(k))) Some(keys)
    else None // glob metachars / separators in a key: bail
  }

  /** An empty keep-set (key-structure-only query) prunes EVERY
    * payload: a wildcard-free, dot-free glob can only match a dotless
    * entry name, and dotless entries never form samples
    * (`Sample.basePlusExt` requires a dot), so their payloads are
    * unobservable by construction — the glob matches nothing that
    * matters, self-describing in `.explain()`. */
  private[graft] val MatchNothing = "-none-"

  private def globsFor(keys: Set[String]): String =
    if (keys.isEmpty) MatchNothing
    else keys.toSeq.sorted.flatMap { k0 =>
      val k = k0.toLowerCase(java.util.Locale.ROOT)
      // dotted keys: `*.K` (multi-dot suffix) + `*-K` (interleave fold)
      if (k.contains('.')) Seq("*." + k, "*-" + k) else Seq("*." + k)
    }.distinct.mkString(",")

  /** The wds `entries` column's type (map<string,binary>, nullability
    * flags ignored): the only shape that can smuggle raw payloads
    * through an exprId-severing CTE reference. */
  private def isEntriesType(dt: org.apache.spark.sql.types.DataType) =
    dt match {
      case m: org.apache.spark.sql.types.MapType =>
        m.keyType == StringType &&
          m.valueType == org.apache.spark.sql.types.BinaryType
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Non-inlined CTEs are the OTHER exprId-remapping operator (after
    // Union, handled positionally above): every CTERelationRef mints
    // FRESH exprIds for the shared def's output, so a reference
    // forwarding `entries` to the root would be invisible to both the
    // use-walk and the root-output guard — the same hole class fixed
    // for Union, but with no positional structure to fold (the refs
    // aren't children of a shared parent). The bail is narrowed to the
    // plans where forwarding is POSSIBLE: only a def/ref output column
    // of the entries map type can carry raw payloads across the ref
    // boundary (wrapping the map into a struct/array at the def root
    // is itself a use the walk visits — bare attr → no pruning), so a
    // CTE whose outputs carry no such column cannot hide a payload
    // observation and prunes like any other plan. SQL-text queries
    // whose retained CTEs DO carry the map read unpruned (a user can
    // still set `select` explicitly).
    import org.apache.spark.sql.catalyst.plans.logical.{CTERelationDef, CTERelationRef}
    val cteMayForward = plan.exists {
      case d: CTERelationDef => d.output.exists(a => isEntriesType(a.dataType))
      case r: CTERelationRef => r.output.exists(a => isEntriesType(a.dataType))
      case _ => false
    }
    val top = if (cteMayForward) plan else applyEligible(plan)
    // Each subquery plan is its own pruning scope — the natural SQL
    // spelling of decontamination, `... WHERE NOT EXISTS (SELECT 1
    // FROM wds ...)`, prunes here (pre-pushdown wiring sees predicate
    // subqueries before RewritePredicateSubquery turns them into
    // joins; scalar/lateral/DPP subqueries survive to both wirings).
    // Soundness: inner attributes reach the outer plan only through
    // the subquery's ROOT output, which the scope's own root-output
    // guard covers; outer (correlated) `entries` uses inside a
    // subquery are visited by conformingKeys' scope walk below and
    // read as bare uses (OuterReference is not a conforming shape) —
    // conservative, never unsound.
    top.transformAllExpressions {
      case se: SubqueryExpression =>
        val np = apply(se.plan)
        if (np eq se.plan) se else se.withNewPlan(np)
    }
  }

  private def applyEligible(plan: LogicalPlan): LogicalPlan = plan.transform {
    // post-V2-pushdown shape ("User Provided Optimizers" batch, the
    // register() wiring): the scan object itself is swapped
    case sr: DataSourceV2ScanRelation if sr.scan.isInstanceOf[WdsScan] &&
      !sr.scan.asInstanceOf[WdsScan].hasEntryPruning =>
      sr.output.find(_.name == "entries")
        .flatMap(a => conformingKeys(plan, a.exprId)) match {
        case Some(keys) =>
          sr.copy(scan = sr.scan.asInstanceOf[WdsScan]
            .withPayloadSelect(globsFor(keys)))
        case None => sr
      }
    // pre-pushdown shape (injectOptimizerRule wiring, operator batch):
    // rewrite the relation's read options; newScanBuilder merges them
    // over the table properties when the scan is built later
    case r: DataSourceV2Relation if r.table.isInstanceOf[WdsTable] &&
      !r.table.asInstanceOf[WdsTable].hasEntryPruning &&
      r.options.get("select") == null &&
      r.options.get("payload_select") == null =>
      r.output.find(_.name == "entries")
        .flatMap(a => conformingKeys(plan, a.exprId)) match {
        case Some(keys) =>
          val m = new java.util.HashMap[String, String](r.options)
          m.put("payload_select", globsFor(keys))
          r.copy(options = new CaseInsensitiveStringMap(m))
        case None => r
      }
  }
}
