package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 CATALOG plugin — the Spark counterpart of the
  * reference's catalog module (its table/schema registry that the
  * planner resolves identifiers against): `graft_cat.gen.range_<N>`
  * (N in plain digits) resolves through Catalyst's multi-part
  * identifier machinery to a [[RangeTable]], so plain SQL
  * (`SELECT … FROM graft_cat.gen.range_100000`) reaches the
  * pushdown-negotiating source with no `format(...)` glue.
  *
  * The catalog is DERIVED, not stored: any `range_<N>` identifier under
  * the `gen` namespace is valid, which makes listTables a documented
  * infinite family (it lists the conventional sizes). Registered in
  * [[graft.Session]] under `spark.sql.catalog.graft_cat`. */
class GenCatalog extends CatalogPlugin with TableCatalog {
  private var catalogName: String = "graft_cat"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catalogName = name }

  override def name(): String = catalogName

  private val Ns = Array("gen")
  private val RangeRe = "range_([0-9]+)".r

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespace.sameElements(Ns))
      throw new NoSuchNamespaceException(namespace.toSeq)
    // the family is infinite (any range_<N>); list the conventional sizes
    Array(1000L, 100000L, 10000000L)
      .map(n => Identifier.of(Ns, s"range_$n"))
  }

  override def loadTable(ident: Identifier): Table = {
    if (!ident.namespace().sameElements(Ns))
      throw new NoSuchTableException(ident)
    ident.name() match {
      // toLong can still overflow on a 20-digit name: surface that as
      // the same clean analysis error as any other unknown identifier
      case RangeRe(n) =>
        try new RangeTable(n.toLong, 4)
        catch { case _: NumberFormatException =>
          throw new NoSuchTableException(ident) }
      case _ => throw new NoSuchTableException(ident)
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft_cat is a derived catalog; tables cannot be created")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft_cat is a derived catalog; tables cannot be altered")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft_cat is a derived catalog; tables cannot be renamed")
}
