package graft.pipeline

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delete propagation — the right-to-be-forgotten pass a production
  * corpus runs when takedown/deletion requests arrive. Deleting raw
  * docs is the easy half; the derived artifacts are the hard half:
  * near-dup clusters whose KEEPER was deleted still label every
  * surviving member with a ghost id, and every downstream store keyed
  * on keeper ids (weights, quality reps, pack manifests) inherits the
  * ghost. This op computes exactly the re-election a deletion batch
  * forces — the rebucket-delta pattern ([[Mixing]]) applied to the
  * dedup graph: emit only the clusters a tombstone touched, never the
  * corpus.
  *
  * Tombstones here are a deterministic hash rule standing in for the
  * request table (md5 nibble in the `forget|` seed namespace, ~1/16 of
  * doc ids) so the op is oracle-checkable; production swaps in its
  * real tombstone table — the shape is one broadcast/semi join either
  * way.
  */
object Forget {

  /** Tombstone rule: ~1/16 of doc ids, deterministic both engines. */
  private[graft] def tombstoned(docId: Column): Column =
    substring(md5(concat(lit("forget|"), docId.cast("string"))), 1, 1) === "0"

  private[graft] val tombstonedSql: String =
    "substr(md5('forget|' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'"

  /** Keeper re-election for every near-dup cluster a deletion batch
    * touches: per [[Dedup.nearDupClusters]] component with ≥ 1
    * tombstoned member, emit (cluster_id, new_keeper, n_dropped,
    * n_left) — `new_keeper` is the min surviving member (NULL when the
    * whole cluster is deleted), so `new_keeper != cluster_id` rows are
    * the relabel feed downstream consumers replay (the
    * [[graft.storage.ClusterStore.relabelDelta]] shape) and NULL rows
    * are full retractions.
    *
    * Scale: the near-dup label frame is graph-sized (vanishing
    * fraction of the corpus); tombstoning is a map-side hash predicate
    * on it; the election is one partial aggregation per touched
    * cluster. Output = touched clusters only.
    */
  def forgetKeepers(t: Tables): DataFrame =
    Dedup.nearDupClusters(t)
      .select(col("doc_id"), col("keeper_id"),
        tombstoned(col("doc_id")).as("ts"))
      .groupBy(col("keeper_id").as("cluster_id"))
      .agg(sum(when(col("ts"), 1L).otherwise(0L)).as("n_dropped"),
        min(when(!col("ts"), col("doc_id"))).as("new_keeper"),
        sum(when(!col("ts"), 1L).otherwise(0L)).as("n_left"))
      .filter(col("n_dropped") >= 1)
      .select(col("cluster_id"), col("new_keeper"), col("n_dropped"),
        col("n_left"))
      .orderBy(col("cluster_id"))

  def forgetKeepersSql: String =
    s"""WITH RECURSIVE ${Dedup.verifiedPairCtes},
       |${Dedup.clusterLabCtes},
       |m AS (SELECT doc_id, keeper_id, $tombstonedSql AS ts FROM lab)
       |SELECT keeper_id AS cluster_id,
       |  MIN(CASE WHEN NOT ts THEN doc_id END) AS new_keeper,
       |  SUM(CASE WHEN ts THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       |  SUM(CASE WHEN ts THEN 0 ELSE 1 END)::BIGINT AS n_left
       |FROM m
       |GROUP BY keeper_id
       |HAVING SUM(CASE WHEN ts THEN 1 ELSE 0 END) >= 1
       |ORDER BY cluster_id""".stripMargin

  /** [[forgetKeepers]] for EXACT-duplicate classes — the other half of
    * the dedup surface a deletion touches: `dedup_exact` keeps the min
    * doc_id per md5(text) class, so a tombstone on that keeper orphans
    * the class the same way a cluster keeper deletion does. Emits, per
    * multi-member class with ≥ 1 tombstoned member, (class_h,
    * old_keeper, new_keeper, n_dropped, n_left) — NULL new_keeper is a
    * full retraction. Single-member classes need no election (deleting
    * the doc deletes the class) and stay out, matching the near-dup
    * op's touched-clusters-only contract.
    *
    * Scale: one (hash, id) corpus aggregation with map-side partials —
    * the `dedup_exact` pass itself — with the tombstone predicate
    * folded into the same aggregate; output = touched multi-member
    * classes only. (Legitimately empty at sf0.01 — the synthetic
    * corpus plants exact dups only at sf0.1, the `report_dup_matrix`
    * precedent; ForgetSpec plants both classes.)
    */
  def forgetExactKeepers(t: Tables): DataFrame =
    t.documents
      .select(md5(col("text")).as("class_h"), col("doc_id"),
        tombstoned(col("doc_id")).as("ts"))
      .groupBy(col("class_h"))
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("old_keeper"),
        sum(when(col("ts"), 1L).otherwise(0L)).as("n_dropped"),
        min(when(!col("ts"), col("doc_id"))).as("new_keeper"),
        sum(when(!col("ts"), 1L).otherwise(0L)).as("n_left"))
      .filter(col("n_members") >= 2 && col("n_dropped") >= 1)
      .select(col("class_h"), col("old_keeper"), col("new_keeper"),
        col("n_dropped"), col("n_left"))
      .orderBy(col("class_h"))

  def forgetExactKeepersSql: String =
    s"""SELECT class_h, old_keeper, new_keeper, n_dropped, n_left
       |FROM (
       |  SELECT md5(text) AS class_h, COUNT(*) AS n_members,
       |    MIN(doc_id) AS old_keeper,
       |    SUM(CASE WHEN $tombstonedSql THEN 1 ELSE 0 END)::BIGINT
       |      AS n_dropped,
       |    MIN(CASE WHEN NOT ($tombstonedSql) THEN doc_id END)
       |      AS new_keeper,
       |    SUM(CASE WHEN $tombstonedSql THEN 0 ELSE 1 END)::BIGINT
       |      AS n_left
       |  FROM documents GROUP BY md5(text))
       |WHERE n_members >= 2 AND n_dropped >= 1
       |ORDER BY class_h""".stripMargin

  /** The deletion batch's corpus-level audit: one row — how many docs
    * the rule tombstones, how many survive, how many near-dup clusters
    * need relabeling (keeper deleted, survivors remain) vs full
    * retraction (cluster emptied) vs member-only loss (keeper
    * survives). The numbers a deletion job publishes for compliance.
    *
    * Scale: one corpus scan with a map-side predicate for the totals
    * + the graph-sized election frame for the cluster classes.
    */
  def forgetStats(t: Tables): DataFrame = {
    val totals = t.documents
      .agg(sum(when(tombstoned(col("doc_id")), 1L).otherwise(0L))
        .as("n_forgotten"),
        sum(when(!tombstoned(col("doc_id")), 1L).otherwise(0L))
          .as("n_kept"))
    val classes = forgetKeepers(t)
      .agg(coalesce(sum(when(col("new_keeper").isNull, 1L)
        .otherwise(0L)), lit(0L)).as("clusters_retracted"),
        coalesce(sum(when(col("new_keeper").isNotNull &&
          col("new_keeper") =!= col("cluster_id"), 1L).otherwise(0L)),
          lit(0L)).as("clusters_relabeled"),
        coalesce(sum(when(col("new_keeper") === col("cluster_id"), 1L)
          .otherwise(0L)), lit(0L)).as("clusters_thinned"))
    totals.crossJoin(classes)
  }

  def forgetStatsSql: String =
    s"""WITH RECURSIVE ${Dedup.verifiedPairCtes},
       |${Dedup.clusterLabCtes},
       |m AS (SELECT doc_id, keeper_id, $tombstonedSql AS ts FROM lab),
       |el AS (SELECT keeper_id AS cluster_id,
       |         MIN(CASE WHEN NOT ts THEN doc_id END) AS new_keeper,
       |         SUM(CASE WHEN ts THEN 1 ELSE 0 END) AS n_dropped
       |       FROM m GROUP BY keeper_id
       |       HAVING SUM(CASE WHEN ts THEN 1 ELSE 0 END) >= 1),
       |tot AS (SELECT
       |          SUM(CASE WHEN $tombstonedSql THEN 1 ELSE 0 END)::BIGINT
       |            AS n_forgotten,
       |          SUM(CASE WHEN $tombstonedSql THEN 0 ELSE 1 END)::BIGINT
       |            AS n_kept
       |        FROM documents),
       |cl AS (SELECT
       |         COALESCE(SUM(CASE WHEN new_keeper IS NULL
       |           THEN 1 ELSE 0 END), 0)::BIGINT AS clusters_retracted,
       |         COALESCE(SUM(CASE WHEN new_keeper IS NOT NULL
       |           AND new_keeper <> cluster_id THEN 1 ELSE 0 END), 0)::BIGINT
       |           AS clusters_relabeled,
       |         COALESCE(SUM(CASE WHEN new_keeper = cluster_id
       |           THEN 1 ELSE 0 END), 0)::BIGINT AS clusters_thinned
       |       FROM el)
       |SELECT n_forgotten, n_kept, clusters_retracted,
       |  clusters_relabeled, clusters_thinned
       |FROM tot, cl""".stripMargin
}
