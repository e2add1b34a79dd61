package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.SnapshotTable

/** The reference's literal MERGE SQL (modulo table names) against a
 *  registered native snapshot table — `iceberg/iceberg_scd_script.py:75-82`
 *  and `delta/delta_scd_script.py:88-95` shapes. */
class MergeSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRegistered(name: String): SnapshotTable = {
    val t = SnapshotTable.create(spark, tmpDir("sqlmerge"),
      Seq((1, "ck1", 1), (2, "ck2", 1), (3, "ck3", 1)).toDF("id", "checksum", "iscurrent"))
    GraftCatalog.register(name, t)
  }

  test("Iceberg-script shape: ON (id, checksum), UPDATE SET *, INSERT *") {
    val t = freshRegistered("contact_ice")
    // staged source: id=2 changed payload (new checksum row current, old row
    // expired), id=4 brand new — the windowed-source output shape
    Seq((2, "ck2", 0), (2, "ck2b", 1), (4, "ck4", 1))
      .toDF("id", "checksum", "iscurrent")
      .createOrReplaceTempView("staged_update")
    spark.sql(
      """MERGE INTO contact_ice target
        |USING (SELECT * FROM staged_update) source
        |ON target.id = source.id AND target.checksum = source.checksum
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = t.read().as[(Int, String, Int)].collect().toSet
    assert(got === Set(
      (1, "ck1", 1), // untouched
      (2, "ck2", 0), // matched on (id, checksum) → full-row update (expired)
      (2, "ck2b", 1), // not matched → inserted
      (3, "ck3", 1),
      (4, "ck4", 1)))
  }

  test("Delta-script shape: NULL mergeKey, clause condition, partial UPDATE, INSERT *") {
    val t = freshRegistered("contact_del")
    // NULL mergeKey row never matches → always inserts the new version;
    // the non-null row expires the old version (partial update)
    Seq((Option.empty[Int], 2, "ck2b", 1), (Some(2), 2, "ck2b", 1), (Some(1), 1, "ck1", 1))
      .toDF("mergeKey", "id", "checksum", "iscurrent")
      .createOrReplaceTempView("staged_del")
    spark.sql(
      """MERGE INTO contact_del target
        |USING staged_del source
        |ON target.id = source.mergeKey
        |WHEN MATCHED AND target.checksum != source.checksum AND target.iscurrent = 1
        |  THEN UPDATE SET iscurrent = 0
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = t.read().as[(Int, String, Int)].collect().toSet
    assert(got === Set(
      (1, "ck1", 1), // matched but checksum equal → clause condition false
      (2, "ck2", 0), // matched + changed → expired
      (2, "ck2b", 1), // NULL-mergeKey row → inserted (extra mergeKey col dropped)
      (3, "ck3", 1)))
  }

  test("MERGE WITH SCHEMA EVOLUTION INTO adds new source columns") {
    val t = freshRegistered("contact_evo")
    Seq((2, "ck2b", 1, "eu"), (5, "ck5", 1, "us"))
      .toDF("id", "checksum", "iscurrent", "origin")
      .createOrReplaceTempView("staged_evo")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO contact_evo target
        |USING staged_evo source
        |ON target.id = source.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(t.schema.fieldNames.toSeq === Seq("id", "checksum", "iscurrent", "origin"))
    val got = t.read().as[(Int, String, Int, Option[String])].collect().toSet
    assert(got === Set(
      (1, "ck1", 1, None), (2, "ck2b", 1, Some("eu")),
      (3, "ck3", 1, None), (5, "ck5", 1, Some("us"))))
  }

  test("WITH SCHEMA EVOLUTION widens by the full source schema even under explicit assignments") {
    val t = freshRegistered("contact_evo2")
    Seq((2, "ck2b", 0, "eu")).toDF("id", "checksum", "iscurrent", "origin")
      .createOrReplaceTempView("staged_evo2")
    // Spark-native semantics: the table gains `origin` (evolution is driven
    // by the source schema, not the clause list), but an explicit partial
    // UPDATE that never assigns it leaves it NULL.
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO contact_evo2 target
        |USING staged_evo2 source
        |ON target.id = source.id
        |WHEN MATCHED THEN UPDATE SET iscurrent = source.iscurrent""".stripMargin)
    assert(t.schema.fieldNames.toSeq === Seq("id", "checksum", "iscurrent", "origin"))
    assert(t.read().filter($"id" === 2)
      .as[(Int, String, Int, Option[String])].head() === ((2, "ck2", 0, None)))
  }

  test("MERGE DELETE clause via SQL") {
    val t = freshRegistered("contact_delrow")
    Seq(Tuple1(2)).toDF("id").createOrReplaceTempView("to_delete")
    spark.sql(
      """MERGE INTO contact_delrow target USING to_delete source
        |ON target.id = source.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(t.read().select("id").as[Int].collect().toSet === Set(1, 3))
  }

  test("qualified assignment keys (SET target.col = ...) resolve to the column") {
    val t = freshRegistered("contact_qual")
    Seq(Tuple1(2)).toDF("id").createOrReplaceTempView("qual_src")
    spark.sql(
      """MERGE INTO contact_qual target USING qual_src source
        |ON target.id = source.id
        |WHEN MATCHED THEN UPDATE SET target.iscurrent = 0""".stripMargin)
    assert(t.read().filter($"iscurrent" === 0).select("id").as[Int].collect().toSeq === Seq(2))
  }

  test("SQL UPDATE with WHERE expires rows on a registered table") {
    val t = freshRegistered("contact_upd")
    spark.sql("UPDATE contact_upd SET iscurrent = 0 WHERE id = 2")
    assert(t.read().as[(Int, String, Int)].collect().toSet === Set(
      (1, "ck1", 1), (2, "ck2", 0), (3, "ck3", 1)))
    assert(t.manifestAction().contains("update"))
    // unconditional UPDATE touches every row
    spark.sql("UPDATE contact_upd SET checksum = concat(checksum, '!')")
    assert(t.read().select("checksum").as[String].collect().toSet ===
      Set("ck1!", "ck2!", "ck3!"))
  }

  test("SQL DELETE FROM with WHERE removes rows on a registered table") {
    val t = freshRegistered("contact_sqldel")
    spark.sql("DELETE FROM contact_sqldel WHERE checksum = 'ck2' OR id = 3")
    assert(t.read().select("id").as[Int].collect().toSet === Set(1))
    // delete is a commit: time travel still sees the pre-delete rows
    assert(t.readVersion(t.currentVersion() - 1).count() === 3)
  }

  test("SQL DELETE FROM a table with pending MoR deltas lands as tombstones") {
    val t = SnapshotTable.create(spark, tmpDir("sqlmerge"),
      Seq((1, "ck1", 1L), (2, "ck2", 1L), (3, "ck3", 1L)).toDF("id", "checksum", "ts"))
    GraftCatalog.register("contact_mordel", t)
    t.upsertDeferred(Seq((4, "ck4", 2L)).toDF("id", "checksum", "ts"),
      keys = Seq("id"), precombine = "ts")
    val baseFiles = t.manifest()
    // DELETE must not demand applyDeltas(): it routes to the tombstone path
    spark.sql("DELETE FROM contact_mordel WHERE id <= 2")
    assert(t.manifest() === baseFiles, "base was rewritten")
    assert(t.manifestAction().contains("delta-delete"))
    assert(t.read().select("id").as[Int].collect().toSet === Set(3, 4))
    // fold-in produces the same state
    t.applyDeltas()
    assert(t.read().select("id").as[Int].collect().toSet === Set(3, 4))
  }

  test("DELETE and UPDATE reject foreign qualifiers in conditions") {
    val t = freshRegistered("contact_fq")
    val e1 = intercept[Exception](
      spark.sql("DELETE FROM contact_fq WHERE staged.id = 3"))
    assert(e1.getMessage.contains("staged.id"))
    val e2 = intercept[Exception](
      spark.sql("UPDATE contact_fq SET iscurrent = 0 WHERE staged.id = 3"))
    assert(e2.getMessage.contains("staged.id"))
    // nothing was deleted or updated by the failed statements
    assert(t.read().count() === 3)
    // target-qualified and alias forms still resolve
    spark.sql("DELETE FROM contact_fq WHERE contact_fq.id = 3")
    assert(t.read().select("id").as[Int].collect().toSet === Set(1, 2))
  }

  test("UPDATE rejects assignment keys with foreign qualifiers") {
    val t = freshRegistered("contact_badqual")
    // "s" is not the target's name or alias — silently updating the
    // same-named top-level column would commit wrong data
    val e = intercept[Exception](
      spark.sql("UPDATE contact_badqual SET s.iscurrent = 0 WHERE id = 2"))
    assert(e.getMessage.contains("assignment key"))
    // qualifying by the target name itself is fine
    spark.sql("UPDATE contact_badqual SET contact_badqual.iscurrent = 0 WHERE id = 2")
    assert(t.read().filter($"iscurrent" === 0).select("id").as[Int].collect().toSeq === Seq(2))
  }

  test("MERGE into an unregistered table still fails analysis") {
    Seq((1, "x")).toDF("id", "v").createOrReplaceTempView("plain_view")
    Seq(Tuple1(1)).toDF("id").createOrReplaceTempView("src_v")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO plain_view t USING src_v s ON t.id = s.id
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e.getMessage != null)
  }
}
