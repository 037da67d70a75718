package graft.plans

import graft.wds.datasource.{WdsScan, WdsTable}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Automatic tar-entry PAYLOAD pruning for the `wds` source — the
  * optimizer half of the seekable-scan work: a query that touches
  * `entries` only as `element_at(entries, '<literal key>')` provably
  * never observes any other entry's bytes, so the scan can seek past
  * them. Without this, `select element_at(entries,'txt') from wds`
  * over fat multimodal shards reads every jpg/mp4 byte to satisfy a
  * text-only projection; with it, the scan gets
  * `payload_select = *.txt` injected and moves ~the text bytes.
  *
  * Soundness contract (why this never changes answers):
  *  - payload pruning keeps every entry NAME — group boundaries, row
  *    counts, `map_keys`, and sample membership are byte-identical to
  *    the unpruned read; only VALUES of non-matching entries become
  *    empty arrays;
  *  - the rewrite fires only when EVERY occurrence of the `entries`
  *    attribute (and of pass-through aliases of it) in the WHOLE plan
  *    is `GetMapValue`/`ElementAt` with a string literal key, no
  *    alias/attr reaches the plan's root output, and every collected
  *    key is a plain token (no dots/globs — interleaved `0.jpg`-style
  *    keys bail conservatively);
  *  - so the only observable values are the keys' own, which match
  *    `*.<key>` and keep their real bytes.
  *
  * Runs in the post-pushdown position (`extraOptimizations` /
  * injected rule re-applied after V2 pushdown), so it matches the
  * [[DataSourceV2ScanRelation]] and swaps the [[WdsScan]] itself.
  * Idempotent: a scan that already carries `select` or
  * `payload_select` (user-set or a prior application) is ineligible.
  */
object WdsPayloadPrune extends Rule[LogicalPlan] {

  private val SimpleKey = "^[A-Za-z0-9_-]+$".r

  private def literalKey(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) if s != null => Some(s.toString)
    case _ => None
  }

  /** All `entries`-attribute uses conform → Some(keys); any bare or
    * non-literal use → None. `ids` starts at the relation's attr and
    * grows over pass-through `Alias(attr)` projections. */
  private def conformingKeys(
      plan: LogicalPlan, id0: ExprId): Option[Set[String]] = {
    var ids = Set(id0)
    var grew = true
    while (grew) {
      grew = false
      plan.foreach {
        case Project(items, _) => items.foreach {
          case al @ Alias(a: Attribute, _)
            if ids(a.exprId) && !ids(al.exprId) =>
            ids += al.exprId; grew = true
          case _ => ()
        }
        case _ => ()
      }
    }
    // the map observed wholesale at the root → no pruning
    if (plan.output.exists(a => ids(a.exprId))) return None
    var keys = Set.empty[String]
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
      case a: Attribute if ids(a.exprId) => ok = false // bare use
      case other => other.children.foreach(visit)
    }
    plan.foreach {
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
    }
    if (!ok || keys.isEmpty) None
    else if (keys.forall(k => SimpleKey.matches(k))) Some(keys)
    else None // interleaved '0.jpg'-style keys: bail conservatively
  }

  private def globsFor(keys: Set[String]): String =
    keys.toSeq.sorted
      .map(k => "*." + k.toLowerCase(java.util.Locale.ROOT))
      .mkString(",")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
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
