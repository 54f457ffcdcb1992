package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referential-integrity algebra — Spark has no FKs, so the reference's
  * SQLite constraint semantics (schema.sql:1,14,25-26,39-41,67,91) become
  * join rewrites (SURVEY §1.5, §2.3 J1-J5):
  *
  *   - insert validation  = left-anti child-keys vs parent-keys
  *   - cascade delete     = anti-join children against deleted parent keys
  *   - recursive cascade  = semi-join to fixpoint over the self-FK tree
  *   - restrict delete    = semi-join guard (non-empty → abort)
  *
  * Scale: parent key-sets are projections of dimension tables → broadcast;
  * the only shuffles are on the FK columns themselves. The recursive
  * fixpoint iterates driver-side over *plans* (no collect of data rows —
  * only an isEmpty check per round).
  */
object Integrity {

  /** J1 — FK insert-validation: rows of `child` whose `fk` has no match in
    * `parent.pk`. Non-empty result = the batch the reference would reject
    * with IntegrityError (cmds/archive.py:160,309,345). NULL fks are not
    * violations (SQL FK semantics). */
  def fkViolations(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as("_pk")), col(fk) === col("_pk"),
        "left_anti")

  /** J4 — ON DELETE RESTRICT guard: parent rows in `deleteSet` still
    * referenced by `child.fk` (schema.sql:14,67). Non-empty → the delete
    * must abort. */
  def restrictViolations(deleteSet: DataFrame, pk: String,
      child: DataFrame, fk: String): DataFrame =
    deleteSet.join(child.select(col(fk).as("_fk")), col(pk) === col("_fk"),
      "left_semi")

  /** J2 — ON DELETE CASCADE, one level: survivors of `child` after the
    * parent keys in `deletedKeys(pk)` are removed. */
  def cascade(child: DataFrame, fk: String,
      deletedKeys: DataFrame, pk: String): DataFrame =
    child.join(broadcast(deletedKeys.select(col(pk).as("_delk"))),
      col(fk) === col("_delk"), "left_anti")

  /** J3 — recursive cascade over a self-FK tree (comments.parent,
    * schema.sql:41): starting from `seedKeys(pk)`, repeatedly add rows
    * whose parent is already deleted, to fixpoint. Returns the full
    * deleted key set. `maxDepth` caps pathological chains.
    *
    * Each round: frontier = rows whose `parentCol` semi-joins the current
    * frontier keys, minus already-deleted. Plans accumulate; `localCheckpoint`
    * every round truncates lineage so depth-k trees don't build k-deep
    * plan stacks (important for deep threads at scale). */
  def cascadeRecursive(table: DataFrame, pk: String, parentCol: String,
      seedKeys: DataFrame, maxDepth: Int = 100): DataFrame = {
    // synthetic column names avoid self-join attribute ambiguity; the
    // edge projection is probed once per round, so pin it (memory,
    // spilling to disk) instead of re-running the scan each level —
    // unpinned after the fixpoint
    val edges = table.select(col(pk).as("_k"), col(parentCol).as("_p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var deleted = seedKeys.select(col(pk).as("_k")).distinct()
        .localCheckpoint(true)
      var frontier = deleted
      var depth = 0
      while (depth < maxDepth && !frontier.isEmpty) {
        val next = edges
          .join(broadcast(frontier.select(col("_k").as("_p"))), Seq("_p"),
            "left_semi")
          .select("_k")
          .join(deleted, Seq("_k"), "left_anti")
          .localCheckpoint(true)
        frontier = next
        if (!next.isEmpty)
          deleted = deleted.unionByName(next).localCheckpoint(true)
        depth += 1
      }
      deleted.select(col("_k").as(pk))
    } finally edges.unpersist(blocking = false)
  }

  /** W5 composite — delete a video with its cascades (schema.sql:25,39,41;
    * exercised by Unarchive, cmds/archive.py:408). Returns the surviving
    * (comments, videoTags) pair; comment replies cascade recursively. */
  def unarchiveVideo(videoIds: DataFrame, idCol: String,
      comments: DataFrame, videoTags: DataFrame): (DataFrame, DataFrame) = {
    val directComments = comments
      .join(broadcast(videoIds.select(col(idCol).as("_vid"))),
        comments("video") === col("_vid"), "left_semi")
      .select(col("comment_id"))
    val allDeleted = cascadeRecursive(comments, "comment_id", "parent",
      directComments).select(col("comment_id").as("_del"))
    val survComments = comments.join(broadcast(allDeleted),
      comments("comment_id") === col("_del"), "left_anti")
    val survTags = cascade(videoTags, "video", videoIds, idCol)
    (survComments, survTags)
  }
}
