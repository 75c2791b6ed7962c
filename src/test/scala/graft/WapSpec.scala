package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.ManifestTable

/** WRITE-AUDIT-PUBLISH over the engine's own primitives — the Iceberg
  * WAP pattern composed from shallow clone (stage), arbitrary reads
  * (audit) and branch merge-back (publish). Nothing here is new
  * machinery; the spec PINS the composition so the workflow is a
  * documented, tested recipe:
  *
  *   1. STAGE:  cloneAt(src -> wap) — one manifest write, zero data
  *      copy; the writer lands its batch on the branch.
  *   2. AUDIT:  read the BRANCH — the audit sees exactly the staged
  *      state, production readers of `src` see none of it.
  *   3. PUBLISH: audit pass => mergeBranch (atomic, conflict-checked);
  *      audit fail => drop the branch directory — the source never
  *      carries a byte of the rejected batch.
  */
class WapSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType)))

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def mergeRows(root: String, batch: Long,
      rows: (Long, Long)*): Unit = {
    val m = new graft.mapping.Mapping()
    m.auto("id"); m.auto("v")
    m.complete(schema)
    val raw = rows.zipWithIndex
      .map { case ((id, v), i) => (Seq(id.toString, v.toString), i.toLong) }
      .toDF("_raw", "_line")
    ManifestTable.merge(m.project(raw), batch, m, root, schema,
      streamId = "wap-spec")
  }

  private def state(root: String): Map[Long, Long] =
    ManifestTable.read(spark, root, schema).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("audit-pass path: staged batch is invisible to the source " +
      "until publish, then lands atomically") {
    val src = freshRoot("wap_src")
    val wap = freshRoot("wap_stage")
    ManifestTable.create(
      (1L to 50L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    val v0 = ManifestTable.currentVersion(spark, src).get
    // STAGE
    ManifestTable.cloneAt(spark, src, wap)
    mergeRows(wap, 1L, (5L, 555L), (100L, 100L))
    // staged rows are invisible to production
    assert(state(src)(5L) == 5L && !state(src).contains(100L))
    assert(ManifestTable.currentVersion(spark, src).get == v0,
      "staging must not commit anything on the source")
    // AUDIT on the branch: the staged state, exactly
    val staged = state(wap)
    assert(staged(5L) == 555L && staged(100L) == 100L)
    val nulls = ManifestTable.read(spark, wap, schema)
      .filter(col("v").isNull).count()
    assert(nulls == 0L, "audit example: no NULL v staged")
    // PUBLISH
    val (up, del, conf) =
      ManifestTable.mergeBranch(spark, src, wap, token = 9L)
    assert(conf == 0L && del == 0L && up == 2L)
    assert(state(src)(5L) == 555L && state(src)(100L) == 100L)
  }

  test("audit-fail path: dropping the branch leaves the source " +
      "byte-identical (no version moved, no file added)") {
    val src = freshRoot("wapf_src")
    val wap = freshRoot("wapf_stage")
    ManifestTable.create(
      (1L to 50L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    val before = ManifestTable.currentManifest(spark, src).get
    ManifestTable.cloneAt(spark, src, wap)
    // the "bad" batch: v goes NULL for an existing key
    val m = new graft.mapping.Mapping()
    m.auto("id"); m.auto("v")
    m.complete(schema)
    ManifestTable.merge(m.project(
      Seq((Seq("5", ""), 0L)).toDF("_raw", "_line")),
      1L, m, wap, schema, streamId = "wap-spec")
    // AUDIT fails: a NULL v was staged
    val bad = ManifestTable.read(spark, wap, schema)
      .filter(col("v").isNull).count()
    assert(bad == 1L, "the audit must SEE the staged defect")
    // reject: drop the branch, nothing else
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wap))
    val after = ManifestTable.currentManifest(spark, src).get
    assert(after.version == before.version &&
      after.entries == before.entries,
      "a rejected WAP batch must leave the source untouched")
    assert(state(src)(5L) == 5L)
  }

  test("a concurrent source writer during the audit window surfaces " +
      "as a PUBLISH conflict (fail mode), so WAP can re-stage") {
    val src = freshRoot("wapc_src")
    val wap = freshRoot("wapc_stage")
    ManifestTable.create(
      (1L to 50L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    ManifestTable.cloneAt(spark, src, wap)
    mergeRows(wap, 1L, (5L, 555L))
    // production writes the SAME key while the audit runs
    mergeRows(src, 2L, (5L, 777L))
    val e = intercept[IllegalStateException] {
      ManifestTable.mergeBranch(spark, src, wap, token = 9L)
    }
    assert(e.getMessage.toLowerCase.contains("conflict"), e.getMessage)
    // the failed publish left production's concurrent value standing
    assert(state(src)(5L) == 777L)
  }
}
