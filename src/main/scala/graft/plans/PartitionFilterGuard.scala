package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.{CatalogTable, HiveTableRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{Command, Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Plan-time full-scan guard for partitioned tables — the governance rule
  * every warehouse grows at scale (Hive strict mode, BigQuery
  * `require_partition_filter`): a query that reads a protected table
  * WITHOUT any predicate on one of its partition columns is rejected at
  * plan time, before a single file is listed. At 100 TB a forgotten
  * `WHERE partition_date = …` on the reference's billing tables
  * (`Dcache_kafka_to_hive.py:161-262` — all four are
  * `PARTITIONED BY (partition_date)`) is a five-figure accidental scan;
  * the place to stop it is the planner, not a code review.
  *
  * Injected by [[graft.functions.GraftExtensions]] as an OPTIMIZER rule —
  * deliberately not an analysis check rule: every intermediate Dataset is
  * analyzed eagerly as it is composed, so an analysis-time guard would
  * reject `spark.table(t)` before `.filter(...)` could ever be appended.
  * The optimizer runs once per ACTION on the complete query, which is the
  * semantics the guard wants ("this query, as it will execute, carries no
  * partition predicate"). The rule validates and returns the plan
  * unchanged, and is OFF by default: it activates only for the tables
  * named in `spark.graft.requirePartitionFilter.tables` (comma-separated,
  * either `db.table` or bare `table`). A predicate in any `Filter`, or a
  * join condition on the partition column (the q85/s12 dynamic-partition-
  * pruning shape — a dim-side cut IS a partition filter at runtime),
  * satisfies the guard. Write commands are exempt on the target side
  * (their partition discipline is the writer's dynamic overwrite, not a
  * scan filter): a command optimizes only its SOURCE query, so an
  * unfiltered insert-SELECT from a protected table still throws.
  */
class PartitionFilterGuard(session: SparkSession)
    extends Rule[LogicalPlan] {

  final val TablesConf = "spark.graft.requirePartitionFilter.tables"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = session.conf.get(TablesConf, "")
    if (conf.trim.isEmpty) return plan
    val names = conf.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
    // defensive: if a command does reach the optimizer, exempt its target
    val roots: Seq[LogicalPlan] = plan match {
      case c: Command => c.children
      case p          => Seq(p)
    }
    roots.foreach(check(_, names))
    plan
  }

  private def matches(names: Set[String], ct: CatalogTable): Boolean = {
    val id = ct.identifier
    names.contains(id.table.toLowerCase) ||
      names.contains(id.unquotedString.toLowerCase) ||
      id.database.exists(db => names.contains(s"$db.${id.table}".toLowerCase))
  }

  private def check(plan: LogicalPlan, names: Set[String]): Unit = {
    // every attribute referenced by any predicate anywhere in the query
    // (subqueries included): Filter conditions + join conditions
    val predicateRefs = AttributeSet(plan.collectWithSubqueries {
      case f: Filter => f.condition.references.toSeq
      case j: Join   => j.condition.map(_.references.toSeq).getOrElse(Nil)
    }.flatten)

    def requireFiltered(ct: CatalogTable, partAttrs: Seq[Attribute]): Unit =
      if (partAttrs.nonEmpty && !partAttrs.exists(predicateRefs.contains)) {
        throw new SparkException(
          s"Full scan of partition-filter-protected table " +
            s"${ct.identifier.unquotedString}: add a predicate on one of " +
            s"its partition columns (${partAttrs.map(_.name).mkString(", ")}) " +
            s"or remove it from $TablesConf")
      }

    // relations gathered WITH subqueries so a protected scan inside an
    // IN/EXISTS/scalar subquery is guarded like any other
    plan.collectWithSubqueries {
      case r: HiveTableRelation if matches(names, r.tableMeta) =>
        () => requireFiltered(r.tableMeta, r.partitionCols)
      case lr: LogicalRelation if lr.catalogTable.exists(matches(names, _)) =>
        () => lr.relation match {
          case fs: HadoopFsRelation =>
            val partNames =
              fs.partitionSchema.fieldNames.map(_.toLowerCase).toSet
            requireFiltered(lr.catalogTable.get,
              lr.output.filter(a => partNames(a.name.toLowerCase)))
          case _ => ()
        }
    }.foreach(_.apply())
  }
}
