package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Union}

/**
 * Column-level lineage from the Catalyst analyzed plan: which LEAF
 * (scan) columns feed each output column of a composed frame. The
 * governance question — "does this export derive from anything PII-
 * tagged?" — and the impact-analysis question — "which reports break if
 * this column changes type?" — are both lineage lookups, and at 100 TB
 * nobody re-reads pipeline code to answer them; the plan already knows.
 *
 * Mechanics: one bottom-up pass over the ANALYZED plan (before the
 * optimizer prunes, so lineage survives column pruning) building
 * `ExprId → leaf columns` for every Alias and generator output it
 * meets; Union maps outputs to every child positionally; everything
 * else (Project, Aggregate, Join, Window, Filter, …) resolves through
 * Alias definitions and attribute pass-through. Driver-side metadata
 * walk — no job runs.
 */
object Lineage {

  /** Output column name → the set of leaf scan columns it derives from
    * (data lineage of the VALUE, not of predicates: a filter's columns
    * influence which rows survive but do not flow into any output
    * value, matching the usual column-lineage definition). */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val leafOf = scala.collection.mutable.Map[Long, Set[String]]()

    def leaves(e: Expression): Set[String] = {
      // subqueries contribute the lineage of their own output
      val sub = e.collect {
        case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          visit(sq.plan)
          sq.plan.output.flatMap(a => leafOf.getOrElse(a.exprId.id,
            Set.empty[String])).toSet
      }.flatten.toSet
      e.references.toSeq.flatMap(a => leafOf.getOrElse(a.exprId.id,
        Set.empty[String])).toSet ++ sub
    }

    def visit(p: LogicalPlan): Unit = {
      p.children.foreach(visit)
      p match {
        case _ if p.children.isEmpty =>
          // a leaf relation: every output attribute is its own lineage
          p.output.foreach(a => leafOf(a.exprId.id) = Set(a.name))
        case u: Union =>
          // positional: output i derives from child-output i of EVERY child
          u.output.zipWithIndex.foreach { case (out, i) =>
            leafOf(out.exprId.id) = u.children
              .flatMap(c => leafOf.getOrElse(c.output(i).exprId.id,
                Set.empty[String])).toSet
          }
        case g: Generate =>
          // exploded columns derive from the generator's inputs
          g.generatorOutput.foreach(a =>
            leafOf(a.exprId.id) = leaves(g.generator))
          registerAliases(p)
        case _ =>
          registerAliases(p)
      }
    }

    def registerAliases(p: LogicalPlan): Unit =
      p.expressions.foreach { e =>
        e.foreach {
          case al: Alias => leafOf(al.exprId.id) = leaves(al.child)
          case _ =>
        }
      }

    visit(plan)
    plan.output.map(a =>
      a.name -> leafOf.getOrElse(a.exprId.id, Set.empty[String])).toMap
  }

  /** The union of leaf columns feeding ANY output — "what does this
    * export actually read" (for access review / minimal-grant checks). */
  def inputColumns(df: DataFrame): Set[String] =
    columnLineage(df).values.flatten.toSet

  /** True when any output column derives from one of `tagged` leaf
    * columns — the PII/export gate as a plan predicate. */
  def derivesFrom(df: DataFrame, tagged: Set[String]): Boolean =
    inputColumns(df).exists(tagged.contains)
}
