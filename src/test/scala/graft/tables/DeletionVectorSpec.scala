package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Deletion vectors (`graft.dv.enabled`): DELETE commits O(deleted rows)
 * sidecar bytes instead of rewriting touched files; readers anti-join the
 * positions away; purge folds them back into clean files.
 */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def dvTable(prefix: String, n: Int = 10000): SnapshotTable = {
    val t = SnapshotTable(spark, tmpDir(prefix))
    t.overwrite(spark.range(0, n).toDF("id")
      .withColumn("v", concat(lit("row"), col("id")))
      .repartition(4))
    t.setProperties(Map("graft.dv.enabled" -> "true"))
    t
  }

  test("DV delete: O(deleted rows) commit — base files untouched, reads correct") {
    val t = dvTable("dv_basic")
    val baseFiles = t.manifest().toSet
    val baseBytes = t.manifestEntries().map(_.bytes).sum
    val rewritten = t.delete(col("id") % 1000 === 0) // 10 of 10000 rows
    assert(rewritten === 0) // pure-DV commit: no data file written
    assert(t.manifest().toSet === baseFiles) // byte-identical base
    assert(t.manifestAction().contains("delete-dv"))
    // the commit added ONLY the sidecar, and it is tiny
    val dvBytes = t.dvManifest().map(p => new java.io.File(p).length()).sum
    assert(t.dvManifest().nonEmpty)
    assert(dvBytes < baseBytes / 10,
      s"sidecar $dvBytes bytes vs base $baseBytes — not O(deleted rows)")
    // reads apply the vectors
    assert(t.read().count() === 9990)
    assert(t.read().filter(col("id") % 1000 === 0).count() === 0)
    assert(t.readBase().count() === 9990) // DVs are base state
    assert(t.scan(col("id") === 2000).count() === 0) // pruned scan path too
    assert(t.scan(col("id") === 2001).count() === 1)
    // time travel: the pre-delete version still serves all rows
    assert(t.readVersion(t.currentVersion() - 1).count() === 10000)
  }

  test("DV deletes stack; re-deleting deleted rows is a no-op; fraction policy rewrites") {
    val t = dvTable("dv_stack")
    t.delete(col("id") < 10)
    t.delete(col("id") < 20) // overlaps the first delete
    assert(t.read().count() === 9980)
    val sidecars = t.dvManifest()
    assert(sidecars.size === 2)
    // positions are not duplicated across sidecars
    val dv = spark.read.parquet(sidecars: _*)
    assert(dv.count() === dv.distinct().count())
    assert(dv.count() === 20)
    // deleting everything blows the maxFraction policy: classic rewrite
    val rewritten = t.delete(col("id") < 9000)
    assert(rewritten > 0)
    assert(t.read().count() === 1000)
    assert(t.read().agg(min(col("id"))).head().getLong(0) === 9000)
  }

  test("change feed reports DV deletes as delete rows; purge is change-neutral") {
    val t = dvTable("dv_cdf", n = 100)
    t.setProperties(Map("graft.cdf.keys" -> "id"))
    val v0 = t.currentVersion()
    t.delete(col("id") >= 97) // 3 rows, pure DV
    val changes = t.readChanges(v0)
      .select(col("id").cast("long"), col("_change_type")).as[(Long, String)]
      .collect().toSet
    assert(changes === Set((97L, "delete"), (98L, "delete"), (99L, "delete")))
    // purge rewrites the dv'd files and clears the vectors…
    val vBefore = t.currentVersion()
    val purged = t.purgeDeletionVectors()
    assert(purged > 0)
    assert(t.dvManifest().isEmpty)
    assert(t.manifestAction().contains("purge-dv"))
    assert(t.read().count() === 97)
    // …and reports NO row-level change (the q55 compaction invariant)
    assert(t.readChanges(vBefore).count() === 0)
    // a second purge is a no-op
    assert(t.purgeDeletionVectors() === 0)
  }

  test("MERGE on a DV-bearing table neither resurrects nor miscounts") {
    val t = dvTable("dv_merge", n = 100)
    t.delete(col("id") === 5 || col("id") === 50)
    // update one surviving row, insert one new, try to update a DELETED row
    val src = Seq((5L, "ghost"), (6L, "six!"), (200L, "new")).toDF("id", "nv")
    t.merge(src, col("t.id") === col("s.id"))
      .whenMatched().update(Map("v" -> col("s.nv")))
      .whenNotMatched().insert(Map("id" -> col("s.id"), "v" -> col("s.nv")))
      .execute()
    val rows = t.read().as[(Long, String)].collect().toMap
    assert(rows.size === 100) // 98 survivors + ghost-insert(5) + 200
    // id 5 was DELETED: the source row must NOT match it — it inserts
    assert(rows(5L) === "ghost")
    assert(rows(6L) === "six!")
    assert(rows(200L) === "new")
    assert(!rows.contains(50L))
  }

  test("row-level UPDATE and appends compose with pending vectors") {
    val t = dvTable("dv_update", n = 100)
    t.delete(col("id") < 10)
    // CoW update must not resurrect the deleted rows it rewrites past
    t.update(col("id") === 20, Map("v" -> lit("twenty")))
    assert(t.read().count() === 90)
    assert(t.read().filter(col("id") === 20).select("v").as[String].head() === "twenty")
    assert(t.read().filter(col("id") < 10).count() === 0)
    // blind append carries the vectors forward
    t.append(Seq((500L, "appended")).toDF("id", "v"))
    assert(t.read().count() === 91)
    assert(t.read().filter(col("id") < 10).count() === 0)
    // incremental feed: the new file's rows only, not resurrected ones
    val inc = t.readIncremental(t.currentVersion() - 1)
    assert(inc.as[(Long, String)].collect().toSet === Set((500L, "appended")))
  }

  test("DV update: O(matched rows) commit — positions vectorized, new rows appended") {
    val t = dvTable("dv_upd")
    val baseFiles = t.manifest().toSet
    val rewritten = t.update(col("id") % 1000 === 0, // 10 of 10000 rows
      Map("v" -> lit("updated")))
    assert(rewritten === 0) // pure DV + append: no touched file rewritten
    assert(t.manifestAction().contains("update-dv"))
    assert(baseFiles.subsetOf(t.manifest().toSet)) // old files byte-identical
    val appended = t.manifest().toSet -- baseFiles
    assert(appended.nonEmpty)
    // the appended files hold ONLY the 10 reassigned rows
    val appendedRows = spark.read.parquet(appended.toSeq: _*)
    assert(appendedRows.count() === 10)
    assert(appendedRows.select("v").distinct().as[String].collect().toSeq === Seq("updated"))
    // the view: updated rows visible once, with new values
    assert(t.read().count() === 10000)
    assert(t.read().filter(col("v") === "updated").count() === 10)
    assert(t.read().filter(col("id") === 3000).select("v").as[String].head() === "updated")
    assert(t.read().filter(col("id") === 3001).select("v").as[String].head() === "row3001")
    // update of already-DV-updated rows composes
    t.update(col("id") === 3000, Map("v" -> lit("twice")))
    assert(t.read().filter(col("id") === 3000).select("v").as[String].head() === "twice")
    assert(t.read().count() === 10000)
    // CDF: pre/postimage pair for the keyed diff
    t.setProperties(Map("graft.cdf.keys" -> "id"))
    val vb = t.currentVersion()
    t.update(col("id") === 7777, Map("v" -> lit("cdf")))
    val ch = t.readChanges(vb).select(col("id").cast("long"), col("v"), col("_change_type"))
      .as[(Long, String, String)].collect().toSet
    assert(ch === Set((7777L, "row7777", "update_preimage"), (7777L, "cdf", "update_postimage")))
    // mass update blows the fraction policy: classic rewrite, same result
    val rw = t.update(col("id") < 9000, Map("v" -> lit("bulk")))
    assert(rw > 0)
    assert(t.read().filter(col("v") === "bulk").count() === 9000)
    assert(t.read().count() === 10000)
  }

  test("vacuum keeps sidecars alive; catalog scans refuse DV snapshots until purge") {
    val t = dvTable("dv_vacuum", n = 1000)
    t.delete(col("id") === 1)
    val sidecars = t.dvManifest()
    t.overwriteWhere(col("id") === 2, Seq((2L, "replaced")).toDF("id", "v"))
    assert(t.vacuum(retainVersions = 10, retainMillis = 0L) >= 0)
    assert(sidecars.forall(p => new java.io.File(p).exists()),
      "vacuum reclaimed a live DV sidecar")
    assert(t.read().filter(col("id") === 1).count() === 0)
    assert(t.read().filter(col("id") === 2).select("v").as[String].head() === "replaced")
    // stats-only aggregates must not answer from the (overcounting) manifest
    assert(t.read().count() === 999)
  }
}
