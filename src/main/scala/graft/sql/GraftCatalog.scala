package graft.sql

import scala.collection.concurrent.TrieMap

import graft.tables.SnapshotTable

/**
 * Session-level registry mapping SQL names to [[SnapshotTable]]s — the
 * engine's analogue of the reference's Hive/Glue catalog sync
 * (`hudi/hudi_scd_script.py:35-40`). Registering also publishes a temp
 * view (refreshed on every commit), so the table is readable from plain
 * SQL; the MERGE resolution rule ([[GraftExtensions]]) uses the registry
 * to route `MERGE INTO <name>` to the native [[graft.ops.MergeInto]].
 */
object GraftCatalog {
  private val tables = TrieMap[String, SnapshotTable]()

  def register(name: String, table: SnapshotTable): SnapshotTable = {
    tables.put(name.toLowerCase, table)
    table.registerView(name)
    table
  }

  def get(name: String): Option[SnapshotTable] = tables.get(name.toLowerCase)

  def unregister(name: String): Unit = tables.remove(name.toLowerCase)
}
