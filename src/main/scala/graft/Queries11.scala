package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Round-11 registry: compositions over the new kNN-graph build
  * policy plus snapshot-level embedding QC —
  *
  *  - `knn_graph_clusters_auto` — semantic micro-clusters: the
  *    policy-routed graph ([[Similarity.knnGraphClusters]] — exact
  *    blocked tile join below the measured crossover, NN-descent
  *    above), cosine-thresholded edges, O(log n) star-contraction
  *    connected components. The oracle re-derives the measured gate,
  *    BOTH graph branches (the exact arm emptied by the gate before
  *    its quadratic self-join), and the components via a recursive
  *    min-label reachability CTE.
  *  - `embedding_snapshot_drift` — per-dimension centroid drift
  *    between two corpus snapshots in exact integer sums, means as
  *    the one final double step.
  */
object Queries11 extends ExtHelpers {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // gate at 1000 (the knn_graph_build_auto convention): sf corpora
    // (500 vectors) cluster the EXACT graph, the organic ×10 corpus
    // clusters the descent graph — the scaled gate runs the descent
    // chain + recursive CC live in DuckDB
    "knn_graph_clusters_auto" -> ((s, dir) =>
      Similarity.knnGraphClusters(t(s, dir, "embeddings"), k = 4,
          minCosine = 0.3, exactThreshold = knnGateN)
        .orderBy("vec_id")),

    // eval set = the 8 lowest-id vectors (the query-set convention):
    // those 8 corpus rows ARE the leak (cosine 1.0 to themselves),
    // everything else reports its honest max eval similarity
    "decontamination_semantic" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.semanticDecontaminate(e, e.filter(col("vec_id") < 8))
        .orderBy("vec_id")
    }),

    // snapshots = even/odd vec_ids (two interleaved ingest batches of
    // the same corpus — drift should be near zero, which the oracle
    // pins exactly rather than assumes)
    "embedding_snapshot_drift" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.embeddingDrift(
          e.filter(pmod(col("vec_id"), lit(2)) === 0),
          e.filter(pmod(col("vec_id"), lit(2)) === 1))
        .orderBy("dim")
    }),
  )

  val oracles: Map[String, String] = Map(

    // the measured gate, both graph branches (exact arm emptied BEFORE
    // the quadratic self-join), thresholded edges, recursive min-label
    // CC — singletons self-label via the UNION base case
    "knn_graph_clusters_auto" ->
      s"""WITH RECURSIVE q AS ($quantSql),
         par AS (SELECT CAST(count(*) AS BIGINT) AS n,
                        count(*) < $knnGateN AS is_exact
                 FROM embeddings),
         exq AS (SELECT q.vec_id, q.q FROM q, par WHERE par.is_exact),
         ex AS (
           SELECT q_id, n_id, cosine FROM (
             SELECT q_id, n_id, cosine,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY cosine DESC, n_id) AS rank
             FROM (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                          ${qcosSql("a.q", "b.q")} AS cosine
                   FROM exq a JOIN exq b ON a.vec_id <> b.vec_id))
           WHERE rank <= 4),
         ${nndChainSql(4)},
         ge AS (
           SELECT e.q_id, e.n_id, e.cosine FROM ex e, par WHERE par.is_exact
           UNION ALL
           SELECT g2.src, g2.dst, g2.cosine FROM g2, par WHERE NOT par.is_exact),
         pairs AS (
           SELECT least(q_id, n_id) AS a, greatest(q_id, n_id) AS b
           FROM ge WHERE cosine >= 0.3 GROUP BY 1, 2),
         edges AS (SELECT a AS src, b AS dst FROM pairs
                   UNION ALL SELECT b, a FROM pairs),
         r AS (SELECT vec_id AS node, vec_id AS m FROM q
               UNION
               SELECT e.dst AS node, r.m FROM r JOIN edges e ON e.src = r.node),
         clusters AS (SELECT node AS vec_id, min(m) AS cluster_id FROM r GROUP BY node)
         SELECT c.vec_id, c.cluster_id, c.vec_id = c.cluster_id AS is_canonical,
                CASE WHEN par.is_exact THEN 'exact_blocked'
                     ELSE 'nn_descent' END AS graph_mode,
                par.n AS n_corpus
         FROM clusters c, par ORDER BY c.vec_id""",

    "decontamination_semantic" ->
      s"""WITH q AS ($quantSql),
         ev AS (SELECT vec_id AS eval_id, q AS e_q FROM q WHERE vec_id < 8),
         sc AS (SELECT c.vec_id, ev.eval_id,
                       ${qcosSql("c.q", "ev.e_q")} AS cosine
                FROM q c CROSS JOIN ev),
         r AS (SELECT vec_id, eval_id, cosine,
                      row_number() OVER (PARTITION BY vec_id
                        ORDER BY cosine DESC, eval_id) AS rn
               FROM sc)
         SELECT vec_id, cosine AS max_eval_cosine, eval_id AS closest_eval_id,
                cosine >= 0.95 AS is_contaminated
         FROM r WHERE rn = 1 ORDER BY vec_id""",

    "embedding_snapshot_drift" ->
      """WITH q AS (
           SELECT vec_id,
                  [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
           FROM embeddings),
         x AS (
           SELECT vec_id % 2 = 0 AS is_old,
                  unnest([struct_pack(d := i, v := q[i + 1]) FOR i IN range(0, len(q))]) AS s
           FROM q),
         o AS (SELECT CAST(s['d'] AS INT) AS dim,
                      CAST(count(*) AS BIGINT) AS n_old,
                      CAST(sum(s['v']) AS BIGINT) AS sum_old
               FROM x WHERE is_old GROUP BY 1),
         nn AS (SELECT CAST(s['d'] AS INT) AS dim,
                       CAST(count(*) AS BIGINT) AS n_new,
                       CAST(sum(s['v']) AS BIGINT) AS sum_new
                FROM x WHERE NOT is_old GROUP BY 1)
         SELECT o.dim, o.n_old, o.sum_old, nn.n_new, nn.sum_new,
                CAST(o.sum_old AS DOUBLE) / CAST(o.n_old AS DOUBLE) AS mean_old,
                CAST(nn.sum_new AS DOUBLE) / CAST(nn.n_new AS DOUBLE) AS mean_new,
                CAST(nn.sum_new AS DOUBLE) / CAST(nn.n_new AS DOUBLE)
                  - CAST(o.sum_old AS DOUBLE) / CAST(o.n_old AS DOUBLE) AS shift
         FROM o JOIN nn USING (dim) ORDER BY o.dim""",
  )
}
