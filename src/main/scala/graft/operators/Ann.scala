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
  * The sketch paths are hash/assignment-defined → no SQL oracle (AnnSpec
  * asserts recall against the exact scan); the exact-scan family
  * (`ann_range_search`, `ann_filtered_topk`) is fully oracled, hash-
  * checking the cosine kernel itself against DuckDB.
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

    // Self-contained IVF: cells come from a few distributed k-means
    // iterations (not the fixture's label column) — seeded deterministic
    // init, `vector_avg` UDAF recompute per round, no driver collect.
    // nprobe nearest cells are searched exactly. At 100 TB: `cell` is the
    // partition/cluster key, centroids (k rows) broadcast, and the
    // assignment crossJoin is n×k scan-side work.
    Q.noOracle("ann_ivf_topk") { (s, d) =>
      val e = Tables.embeddings(s, d)
      // k=4 cells, nprobe=3: the fixture's embeddings are near-random
      // (the probe's true top-10 sit at cosine ~0.3, barely above
      // background), which caps ANY sub-linear ANN's recall — measured:
      // k=8/nprobe=2 (~25% scanned) recalls only ~0.4 here. Real
      // embedding corpora cluster sharply and take k≫4 with small
      // nprobe; on this corpus ~0.9 recall costs ~75% scan, and k/nprobe
      // are the knobs that trade it.
      val assign = kmeansCells(e, k = 4, iters = 3)
      val cents = assign.groupBy("cell")
        .agg(vector_avg(col("embedding")).as("cent"))
      val probe = e.where(col("vec_id") === 0)
        .select(col("embedding").as("probe"))
      val topCells = cents.crossJoin(broadcast(probe))
        .select(col("cell"), cosine_sim(col("cent"), col("probe")).as("cs"))
        .orderBy(col("cs").desc, col("cell"))
        .limit(3)
      assign.join(broadcast(topCells.select("cell")), "cell")
        .where(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"),
          round(cosine_sim(col("embedding"), col("probe")), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    },

    // Quantized scoring: the store carries int8-quantized vectors (4×
    // smaller — at 100 TB that is the difference between an in-memory and
    // a spilling store) and is scored DIRECTLY on the quantized bytes
    // with integer accumulators; cosine's per-vector scale invariance
    // means no dequantization and no stored scale. AnnSpec gates recall
    // and the quantization error bound vs exact float cosine.
    Q.noOracle("ann_quantized_topk") { (s, d) =>
      val q = Tables.embeddings(s, d)
        .select(col("vec_id"), quantize_i8(col("embedding")).as("qe"))
      val probe = q.where(col("vec_id") === 0)
        .select(col("qe").as("qprobe"))
      q.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"),
          round(cosine_sim_i8(col("qe"), col("qprobe")), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    },

    // The persisted-index lifecycle: build the IVF index ONCE (cells as
    // parquet partition directories + a k-row centroid table), then every
    // probe reads only its nprobe cell partitions — static partition
    // pruning, PlanSpec-asserted by runtime scan metrics (3 of 4
    // partitions listed). The nprobe cell ids must be LITERALS for the
    // pruning to be static, so probe routing collects them — an O(nprobe)
    // driver read of a k-row table, the same bounded pattern as the
    // probe-vector head(); everything data-sized stays distributed.
    Q.noOracle("ann_ivf_persisted") { (s, d) =>
      val dir = ivfIndex(s, d)
      val probe = Tables.embeddings(s, d).where(col("vec_id") === 0)
        .select(col("embedding").as("probe"))
      val cells = s.read.parquet(s"$dir/centroids")
        .crossJoin(broadcast(probe))
        .select(col("cell"), cosine_sim(col("cent"), col("probe")).as("cs"))
        .orderBy(col("cs").desc, col("cell"))
        .limit(3)
        .select("cell").collect().map(_.getString(0))
      s.read.parquet(s"$dir/cells")
        .where(col("cell").isin(cells.toIndexedSeq: _*))
        .where(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"),
          round(cosine_sim(col("embedding"), col("probe")), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    },

    // Range search — the similarity family's other query shape: not the
    // k nearest but EVERYTHING above a similarity floor (the form dedup
    // thresholds and retrieval filters actually use). Exact scan, O(3)
    // probes broadcast against the store; fully SQL-expressible, so this
    // one carries a DuckDB oracle for the whole cosine kernel path.
    Q("ann_range_search",
      """SELECT probe_id, vec_id, c FROM (
        |  SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                 CAST(p.embedding AS DOUBLE[])), 4)
        |      AS c
        |  FROM embeddings e
        |  JOIN (SELECT vec_id, embedding FROM embeddings
        |        WHERE vec_id IN (0, 1, 2)) p
        |    ON e.vec_id <> p.vec_id)
        |WHERE c >= 0.3
        |ORDER BY probe_id, vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val probes = e.where(col("vec_id").isin(0, 1, 2))
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      e.crossJoin(broadcast(probes))
        .where(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          round(cosine_sim(col("embedding"), col("pe")), 4).as("c"))
        .where(col("c") >= 0.3)
        .orderBy("probe_id", "vec_id")
    },

    // Metadata-filtered vector search: top-5 per probe AMONG rows matching
    // a structured predicate (label = 1) — the "filtered ANN" shape every
    // production vector store serves (tenant / language / date filters).
    // The predicate is applied BEFORE scoring, pushed to the parquet scan
    // (PushedFilters), so the cosine kernel runs on the filtered subset
    // only; at 100 TB the filter column is a partition key and this
    // becomes partition pruning. Exact within the subset → SQL oracle.
    Q("ann_filtered_topk",
      """SELECT probe_id, rnk, vec_id, round(score, 6) AS score FROM (
        |  SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                           CAST(p.embedding AS DOUBLE[])) AS score,
        |    row_number() OVER (
        |      PARTITION BY p.vec_id
        |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                 CAST(p.embedding AS DOUBLE[])) DESC, e.vec_id) AS rnk
        |  FROM (SELECT * FROM embeddings WHERE label = 1) e,
        |       (SELECT * FROM embeddings WHERE vec_id < 3) p
        |  WHERE e.vec_id <> p.vec_id)
        |WHERE rnk <= 5
        |ORDER BY probe_id, rnk""".stripMargin) { (s, d) =>
      val store = Tables.embeddings(s, d).where(col("label") === 1)
      val probes = Tables.embeddings(s, d).where(col("vec_id") < 3)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("probe_id"))
        .orderBy(col("score").desc, col("vec_id").asc)
      store.crossJoin(broadcast(probes))
        .where(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          cosine_sim(col("embedding"), col("pe")).as("score"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .select(col("probe_id"), col("rnk"), col("vec_id"),
          round(col("score"), 6).as("score"))
        .orderBy("probe_id", "rnk")
    },
  )

  private val indexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One-time persisted IVF index (built once per (session, sf), like the
    * other layout builders): the k-means assignment written as parquet
    * PARTITIONED BY cell — on a real table this is the cluster/partition
    * key — plus the per-cell centroid table (k rows) used for probe
    * routing.
    */
  private[graft] def ivfIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    indexDirs.computeIfAbsent(d, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx_")
        .toString
      val assign = kmeansCells(Tables.embeddings(s, d), k = 4, iters = 3)
        .withColumn("cell", col("cell").cast("string")) // stable partition-column type
      assign.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/cells")
      assign.groupBy("cell")
        .agg(vector_avg(col("embedding")).as("cent"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
      dir
    })

  /** Distributed k-means over the embedding column: returns the final
    * (vec_id, embedding, cell) assignment. Init takes the k
    * hash-smallest vectors as seed centroids (deterministic, spread by
    * the hash, no driver collect — a TakeOrderedAndProject of k rows);
    * each round broadcasts the k centroids, reassigns via argmax cosine
    * (struct-max for deterministic tie-break), and recomputes centroids
    * with the `vector_avg` UDAF. `localCheckpoint` pins each round's
    * tiny centroid table so round r+1 doesn't replay rounds 1..r.
    */
  private[graft] def kmeansCells(e: org.apache.spark.sql.DataFrame,
      k: Int, iters: Int): org.apache.spark.sql.DataFrame = {
    var cents = e
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("cell"), col("embedding").as("cent"))
      .localCheckpoint(true)
    def assignTo(c: org.apache.spark.sql.DataFrame) = e
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(c))
      .select(col("vec_id"), col("embedding"),
        struct(cosine_sim(col("embedding"), col("cent")).as("cs"),
          col("cell").as("cell")).as("sc"))
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("embedding"), max(col("sc")).as("m"))
      .select(col("vec_id"), col("embedding"), col("m.cell").as("cell"))
    for (_ <- 1 until iters)
      cents = assignTo(cents)
        .groupBy("cell").agg(vector_avg(col("embedding")).as("cent"))
        .localCheckpoint(true)
    assignTo(cents)
  }
}
