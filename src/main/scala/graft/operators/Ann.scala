package graft.operators

import graft.{Q, Tables}
import graft.functions._
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding store
  * (north-star similarity-search surface). Exact brute-force top-k is
  * `rag_knn_topk`/`join_knn_topk`; these are the two standard scale paths:
  *
  *  - LSH: bucket every vector by random-hyperplane signature at write
  *    time; a probe scans only buckets within small Hamming distance of
  *    its own signature. At 100 TB the bucket column is a partition/
  *    cluster key, so the probe prunes partitions instead of filtering
  *    rows.
  *  - IVF: partition vectors into cells (here the fixture's `label` plays
  *    the k-means assignment), keep per-cell centroids (distributed
  *    `vector_avg` UDAF — no driver collect), probe the nprobe nearest
  *    cells exactly.
  *
  * Both are hash/assignment-defined → no SQL oracle; AnnSpec asserts
  * recall against the exact scan.
  */
object Ann {

  val defs: Seq[Q] = Seq(

    Q.noOracle("ann_lsh_topk") { (s, d) =>
      // OR-amplification: L=3 independent signature tables (seeded
      // hyperplane sets); a vector is a candidate if ANY signature lands
      // within Hamming distance 5 of the probe's. Per-table recall on the
      // fixture's near-random embeddings is ~0.7 (cosine ~0.4 ⇒ ~0.34
      // per-plane flip; 5 of 12 planes), so three independent tables give
      // ~1-0.3^3 ≈ 0.97 — DedupSpec asserts >= 0.9 vs the exact scan. At
      // 100 TB each signature is its own partition/cluster key and the
      // disjunction becomes L bucket-joins unioned before the verify step;
      // here all signatures are scan-side codegen'd expressions, so one
      // pass computes all three.
      val seeds = Seq(42L, 1337L, 271828L)
      val e = seeds.zipWithIndex.foldLeft(Tables.embeddings(s, d)) {
        case (df, (sd, i)) =>
          df.withColumn(s"b$i", lsh_bucket(col("embedding"), 12, sd))
      }
      val probe = e.where(col("vec_id") === 0)
        .select(col("embedding").as("probe") +:
          seeds.indices.map(i => col(s"b$i").as(s"pb$i")): _*)
      val anyTableHits = seeds.indices
        .map(i => bit_count(col(s"b$i").bitwiseXOR(col(s"pb$i"))) <= 5)
        .reduce(_ || _)
      e.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .where(anyTableHits)
        .select(col("vec_id"),
          round(cosine_sim(col("embedding"), col("probe")), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    },

    // The optimizer-rule path (SURVEY §4.3 stretch goal): an EXACT top-k
    // program — no LSH in the user's query — rewritten by AnnTopKRewrite
    // into a bucket-pruned candidate scan because the session opted in.
    Q.noOracle("ann_rewrite_topk") { (s, d) =>
      import graft.plans.AnnTopKRewrite
      if (!s.experimental.extraOptimizations.contains(AnnTopKRewrite))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ AnnTopKRewrite
      val probe = Tables.embeddings(s, d).where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val exact = Tables.embeddings(s, d)
        .where(col("vec_id") =!= 0)
        .select(col("vec_id"),
          cosine_sim(col("embedding"), lit_vector(probe)).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
      // The rewrite fires at OPTIMIZATION time — i.e. when this frame is
      // executed, after this fn has returned — so the enable flag cannot
      // simply be set here and unset by the caller. Leaving it set leaked
      // session state: any later literal-probe cosine top-k in the same
      // session was silently rewritten to an approximate scan. Instead,
      // execute the k-row result eagerly under the flag (localCheckpoint
      // materializes the optimized — i.e. rewritten — plan distributedly;
      // k bounds the footprint) and always drop the flag in `finally`.
      // ExtensionsSpec proves a subsequent exact top-k is NOT rewritten.
      s.conf.set(AnnTopKRewrite.EnabledKey, "true")
      try exact.localCheckpoint(true)
      finally s.conf.unset(AnnTopKRewrite.EnabledKey)
    },

    Q.noOracle("ann_ivf_topk") { (s, d) =>
      val e = Tables.embeddings(s, d)
      val cents = e.groupBy("label")
        .agg(vector_avg(col("embedding")).as("cent"))
      val probe = e.where(col("vec_id") === 0)
        .select(col("embedding").as("probe"))
      val top2 = cents.crossJoin(broadcast(probe))
        .select(col("label"), cosine_sim(col("cent"), col("probe")).as("cs"))
        .orderBy(col("cs").desc, col("label"))
        .limit(2)
      e.join(broadcast(top2.select("label")), "label")
        .where(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"),
          round(cosine_sim(col("embedding"), col("probe")), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    },
  )
}
