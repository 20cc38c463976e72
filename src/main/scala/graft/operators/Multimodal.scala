package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column surface (north-star): media payloads are opaque
  * `BINARY` columns with typed metadata alongside. The decode step is a
  * clearly-marked deterministic STUB (no codec libraries in this
  * environment); everything around it — schema, binary plumbing, per-
  * partition decoder lifecycle, frame fan-out shape — is real and tested.
  *
  * Scale notes: decode/feature-extract are scan-side per-row (or per-frame
  * after the fan-out) with no shuffle; the typed `mapPartitions` pipeline
  * initializes its "codec" once per partition, the Spark analog of the
  * reference's per-task `open()` (`StreamingStoreKnowledge.java:86-89`).
  */
object Multimodal {

  /** A media row: opaque bytes + metadata (the at-rest shape). */
  case class MediaRow(doc_id: Long, data: Array[Byte], mime: String)

  /** "Decoded" media metadata (the post-decode shape). */
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
      channels: Int, sig: Long)

  /** STUB DECODER — stands in for an image/audio codec, which this
    * environment does not ship. Deterministic function of the bytes only;
    * a real deployment swaps `decode` for e.g. a JPEG header parse keeping
    * the identical signature and the per-partition init pattern.
    */
  final class StubCodec {
    def decode(r: MediaRow): MediaMeta = {
      val n = r.data.length
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < n) { h ^= (r.data(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      MediaMeta(r.doc_id, n, n % 640, (n * 7) % 480, 3, h)
    }
  }

  /** Typed decode pipeline: one codec per partition, streamed rows. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new StubCodec // per-partition init, not per-row
      rows.map(codec.decode)
    }
  }

  /** The documents table recast as media rows (text bytes play the blob). */
  def asMedia(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("data"),
        lit("application/octet-stream").as("mime"))
      .as[MediaRow]
  }

  val defs: Seq[Q] = Seq(

    // One wide row per document: text metadata + vector + scalars from the
    // embedding — the "multimodal columns" at-rest layout.
    Q("multimodal_columns",
      """SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
        |  round(CAST(e.embedding[1] AS DOUBLE), 5) AS e0
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("vec_id") === col("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("label"),
          round(element_at(col("embedding"), 1).cast("double"), 5).as("e0"))
        .orderBy("doc_id")
    },

    // Binary-column decode, SQL flavor: metadata derived from the opaque
    // bytes (deterministic stub arithmetic — both engines compute it from
    // octet_length, so the plumbing is oracled even though the "decode" is
    // fake).
    Q("multimodal_decode_stub",
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  octet_length(encode(text)) % 640 AS width,
        |  (octet_length(encode(text)) * 7) % 480 AS height,
        |  octet_length(encode(text)) % 24 + 1 AS n_frames,
        |  md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("data", encode(col("text"), "utf-8"))
        .select(col("doc_id"),
          octet_length(col("data")).as("byte_len"),
          (octet_length(col("data")) % 640).as("width"),
          (octet_length(col("data")) * 7 % 480).as("height"),
          (octet_length(col("data")) % 24 + 1).as("n_frames"),
          md5(col("text")).as("checksum"))
        .orderBy("doc_id")
    },

    // Frame-sampling fan-out: every 5th frame index of each "video",
    // with a per-frame byte offset and signature — the row→frames shape a
    // video pipeline needs (explode keeps it scan-side; no shuffle).
    Q("multimodal_frame_sample",
      """SELECT doc_id, frame_idx,
        |  frame_idx * (byte_len // n_frames) AS frame_off,
        |  md5(substr(text, frame_idx * 17 + 1, 16)) AS frame_sig
        |FROM (
        |  SELECT doc_id, text,
        |    octet_length(encode(text)) AS byte_len,
        |    octet_length(encode(text)) % 24 + 1 AS n_frames
        |  FROM documents),
        |  LATERAL (SELECT unnest(generate_series(0, n_frames - 1, 5)) AS frame_idx)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("byte_len", octet_length(encode(col("text"), "utf-8")))
        .withColumn("n_frames", col("byte_len") % 24 + 1)
        .select(col("doc_id"), col("text"), col("byte_len"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          (col("frame_idx") * expr("byte_len div n_frames")).as("frame_off"),
          md5(expr("substring(text, frame_idx * 17 + 1, 16)")).as("frame_sig"))
        .orderBy("doc_id", "frame_idx")
    },

    // SCENE-CUT detection plumbing — the video-curation step between
    // frame sampling and per-scene embedding: consecutive-frame
    // "luminance" deltas above a threshold mark scene boundaries, and
    // a 100 TB pipeline samples ONE representative frame per scene
    // instead of every k-th frame (the frame_sample query's fixed
    // stride wastes embedding budget inside long static scenes). The
    // decode is the documented deterministic stub (per-frame luminance
    // = the codepoint of a deterministic text offset — integer,
    // engine-identical); what's REAL and oracled is the detection
    // kernel: per-doc frame-lum arrays via HOFs, consecutive deltas,
    // threshold census — all row-local, ZERO shuffle, pixels never
    // leave the task (the mapInPandas batch UDF slots into the lum
    // extraction at deployment, same contract as multimodal_decode).
    Q("multimodal_scene_cuts",
      """WITH m AS (
        |  SELECT doc_id, text,
        |    octet_length(encode(text)) % 24 + 1 AS n_frames
        |  FROM documents WHERE length(text) >= 1),
        |f AS (
        |  SELECT doc_id, n_frames,
        |    list_transform(generate_series(0, n_frames - 1),
        |      i -> ascii(substr(text, (i * 17) % length(text) + 1, 1)))
        |      AS lums
        |  FROM m),
        |c AS (
        |  SELECT doc_id, n_frames,
        |    list_filter(list_transform(generate_series(1, n_frames - 1),
        |      i -> CASE WHEN abs(lums[i + 1] - lums[i]) > 64
        |                THEN i ELSE -1 END), x -> x >= 0) AS cuts
        |  FROM f)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(len(cuts) AS BIGINT) AS n_cuts,
        |  CAST(cuts[1] AS BIGINT) AS first_cut,
        |  CAST(len(cuts) + 1 AS BIGINT) AS n_scenes
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .where(length(col("text")) >= 1)
        .withColumn("n_frames",
          octet_length(encode(col("text"), "utf-8")) % 24 + 1)
        .withColumn("lums",
          expr("""transform(sequence(0, n_frames - 1),
                 |  i -> ascii(substring(text,
                 |    (i * 17) % length(text) + 1, 1)))""".stripMargin))
        .withColumn("cuts",
          // slice-from-2 instead of sequence(1, n-1): Spark's sequence
          // DESCENDS when start > stop, so a single-frame doc would get
          // [1, 0] (and element_at(lums, 0) throws) where DuckDB's
          // generate_series is empty — the slice is empty both engines
          expr("""filter(transform(slice(sequence(0, n_frames - 1),
                 |    2, greatest(n_frames - 1, 0)),
                 |  i -> IF(abs(element_at(lums, i + 1)
                 |            - element_at(lums, i)) > 64, i, -1)),
                 |  x -> x >= 0)""".stripMargin))
        .select(col("doc_id"),
          col("n_frames").cast("long").as("n_frames"),
          size(col("cuts")).cast("long").as("n_cuts"),
          expr("try_element_at(cuts, 1)").cast("long").as("first_cut"),
          (size(col("cuts")) + 1).cast("long").as("n_scenes"))
        .orderBy("doc_id")
    },

    // RESIZE + inference-batch shaping — the preprocessing stage between
    // decode and the model: letterbox each image into a 224×224 budget
    // preserving aspect ratio (pure integer geometry on the stub's
    // decoded dims — the pixel resample itself is the codec stub's job),
    // assign fixed-size inference batches, and emit each batch's PADDED
    // shape (max out_w/out_h = the padding target) + total tensor bytes —
    // exactly what a GPU feeder allocates from. Scan-side arithmetic +
    // one tiny batch-keyed combiner shuffle; no row ever carries pixels
    // through a shuffle.
    Q("multimodal_resize_batch",
      """WITH m AS (
        |  SELECT doc_id,
        |    greatest(octet_length(encode(text)) % 640, 1) AS w,
        |    greatest((octet_length(encode(text)) * 7) % 480, 1) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, w, h,
        |    CAST((w * 224) // greatest(w, h) AS BIGINT) AS out_w,
        |    CAST((h * 224) // greatest(w, h) AS BIGINT) AS out_h,
        |    doc_id // 32 AS batch_id
        |  FROM m)
        |SELECT batch_id, count(*) AS n_imgs,
        |  max(out_w) AS pad_w, max(out_h) AS pad_h,
        |  CAST(sum(out_w * out_h * 3) AS BIGINT) AS tensor_bytes
        |FROM r GROUP BY batch_id
        |ORDER BY batch_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("bl", octet_length(encode(col("text"), "utf-8")))
        .select(col("doc_id"),
          greatest(col("bl") % 640, lit(1)).as("w"),
          greatest(col("bl") * 7 % 480, lit(1)).as("h"))
        .select(col("doc_id"),
          expr("(w * 224) div greatest(w, h)").cast("long").as("out_w"),
          expr("(h * 224) div greatest(w, h)").cast("long").as("out_h"),
          expr("doc_id div 32").as("batch_id"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n_imgs"),
          max(col("out_w")).as("pad_w"), max(col("out_h")).as("pad_h"),
          sum(col("out_w") * col("out_h") * 3).cast("bigint")
            .as("tensor_bytes"))
        .orderBy("batch_id")
    },

    // ViT PATCH-GRID token budgeting — the step after resize that decides
    // what a vision-language training batch actually costs: each image's
    // patch grid at patch size 16 (ceil division on the stub's decoded
    // dims), patch count + CLS token, whether it fits a 256-patch
    // context budget, and the packed (truncated) token count the batch
    // planner allocates from. Pure scan-side integer geometry — the same
    // zero-shuffle class as multimodal_scene_cuts; at 100 TB this is a
    // projection riding the decode scan, and the budget census below it
    // is one tiny combiner aggregate away (not taken here: the per-doc
    // table IS the planner's input).
    Q("multimodal_patch_grid",
      """WITH m AS (
        |  SELECT doc_id,
        |    greatest(octet_length(encode(text)) % 640, 1) AS w,
        |    greatest((octet_length(encode(text)) * 7) % 480, 1) AS h
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, w, h,
        |    (w + 15) // 16 AS grid_w, (h + 15) // 16 AS grid_h
        |  FROM m)
        |SELECT doc_id, w, h, grid_w, grid_h,
        |  grid_w * grid_h AS n_patches,
        |  grid_w * grid_h + 1 AS n_tokens,
        |  grid_w * grid_h <= 256 AS fits_budget,
        |  least(grid_w * grid_h, 256) + 1 AS packed_tokens
        |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("bl", octet_length(encode(col("text"), "utf-8")))
        .select(col("doc_id"),
          greatest(col("bl") % 640, lit(1)).as("w"),
          greatest(col("bl") * 7 % 480, lit(1)).as("h"))
        .select(col("doc_id"), col("w"), col("h"),
          expr("(w + 15) div 16").as("grid_w"),
          expr("(h + 15) div 16").as("grid_h"))
        .select(col("doc_id"), col("w"), col("h"),
          col("grid_w"), col("grid_h"),
          (col("grid_w") * col("grid_h")).as("n_patches"),
          (col("grid_w") * col("grid_h") + 1).as("n_tokens"),
          (col("grid_w") * col("grid_h") <= 256).as("fits_budget"),
          (least(col("grid_w") * col("grid_h"), lit(256)) + 1)
            .as("packed_tokens"))
        .orderBy("doc_id")
    },

    // Typed mapPartitions decode pipeline (per-partition codec init).
    // Algorithm-defined sig → no SQL oracle; MultimodalSpec pins values.
    Q.noOracle("multimodal_decode_typed") { (s, d) =>
      decodeMeta(asMedia(s, d)).toDF()
        .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
          col("channels"), col("sig"))
        .orderBy("doc_id")
    },

    // Vector-column hygiene profile: the ingest audit a vector store runs
    // before indexing — null vectors, dimension consistency, non-finite
    // components, norm range. One scan, everything scan-side HOFs; norms
    // are sequential folds in BOTH engines (same accumulation order) and
    // only rounded extremes are emitted — no sum-order drift.
    Q("profile_embeddings",
      """SELECT count(*) AS n,
        |  count(*) FILTER (WHERE embedding IS NULL) AS null_vecs,
        |  count(DISTINCT len(embedding)) AS n_dims,
        |  min(len(embedding)) AS min_dim, max(len(embedding)) AS max_dim,
        |  count(*) FILTER (WHERE len(list_filter(embedding,
        |    x -> isnan(x) OR isinf(x))) > 0) AS nonfinite_vecs,
        |  round(min(sqrt(list_sum(list_transform(
        |    CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS min_norm,
        |  round(max(sqrt(list_sum(list_transform(
        |    CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS max_norm
        |FROM embeddings""".stripMargin) { (s, d) =>
      val norm = sqrt(expr(
        "aggregate(embedding, 0d, (acc, x) -> acc + cast(x as double) * cast(x as double))"))
      Tables.embeddings(s, d).agg(
        count(lit(1)).as("n"),
        sum(when(col("embedding").isNull, 1).otherwise(0)).cast("long")
          .as("null_vecs"),
        countDistinct(size(col("embedding"))).as("n_dims"),
        min(size(col("embedding"))).as("min_dim"),
        max(size(col("embedding"))).as("max_dim"),
        sum(when(expr(
          """exists(embedding, x -> isnan(x)
            |  OR x = cast('Infinity' as float)
            |  OR x = cast('-Infinity' as float))""".stripMargin), 1)
          .otherwise(0)).cast("long").as("nonfinite_vecs"),
        round(min(norm), 4).as("min_norm"),
        round(max(norm), 4).as("max_norm"))
    },

    // Audio chunking plumbing: window a (stubbed) PCM stream into fixed
    // 1 s chunks with 25% overlap — the segmentation every
    // speech/audio-embedding pipeline runs before the model. The decode
    // is the documented stub (sample count derived deterministically
    // from the byte length; a real decoder is a mapInPandas batch UDF —
    // this query oracles the WINDOW ARITHMETIC and schema, which is the
    // Spark-side contract): chunk=16000 samples @16 kHz, hop=12000,
    // n_chunks = (n−chunk) div hop + 1, final-chunk zero-padding
    // reported. Row-local integers, zero shuffle; at scale the
    // per-chunk explode is `sequence(0, n_chunks-1)` + explode feeding
    // the batch UDF, exactly the frame_sample shape.
    Q("multimodal_audio_chunks",
      """SELECT doc_id, n_samples,
        |  (n_samples - 16000) // 12000 + 1 AS n_chunks,
        |  ((n_samples - 16000) // 12000) * 12000 AS last_offset,
        |  CASE WHEN ((n_samples - 16000) // 12000) * 12000 + 16000
        |            - n_samples > 0
        |       THEN ((n_samples - 16000) // 12000) * 12000 + 16000
        |            - n_samples
        |       ELSE 0 END AS padded_tail
        |FROM (SELECT doc_id,
        |        (octet_length(encode(text)) * 997) % 480000 + 16000
        |          AS n_samples
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          (octet_length(encode(col("text"), "utf-8")) * 997 % 480000
            + 16000).cast("long").as("n_samples"))
        .select(col("doc_id"), col("n_samples"),
          expr("(n_samples - 16000) div 12000 + 1").as("n_chunks"),
          expr("((n_samples - 16000) div 12000) * 12000").as("last_offset"),
          greatest(
            expr("((n_samples - 16000) div 12000) * 12000 + 16000"
              + " - n_samples"), lit(0L)).as("padded_tail"))
        .orderBy("doc_id")
    },

    // Scalar INT8 quantization audit — the 4× memory compression every
    // vector store applies before ANN serving, as a per-vector
    // reconstruction report: per-DIMENSION corpus min/max define an
    // affine uint8 grid (q = floor((v-mn)·255/(mx-mn) + 0.5), exact —
    // v ∈ [mn, mx] by construction so no clamp branch), and the MSE of
    // the dequantized vector tells which vectors the codec hurts. The
    // dim profile is ONE combiner shuffle to <= dim rows (posexplode
    // partials combine map-side), broadcast back as two aligned arrays;
    // scoring is scan-side, a sequential in-order fold per vector (both
    // engines fold the list left-to-right, so double accumulation order
    // is identical) with the dequantization chain written VERBATIM in
    // both engines; MSE is rounded to 6 (the profile_embeddings round
    // parity). At 100 TB nothing changes: the profile is dim-sized.
    Q("embeddings_quantize_int8",
      """WITH d AS (
        |  SELECT pos, CAST(min(x) AS DOUBLE) AS mn,
        |              CAST(max(x) AS DOUBLE) AS mx
        |  FROM (SELECT unnest(embedding) AS x,
        |               generate_subscripts(embedding, 1) AS pos
        |        FROM embeddings)
        |  GROUP BY pos),
        |prof AS (SELECT list(mn ORDER BY pos) AS mns,
        |                list(mx ORDER BY pos) AS mxs FROM d)
        |SELECT vec_id, round(list_sum(list_transform(
        |    generate_series(1, len(embedding)), i ->
        |      CASE WHEN mxs[i] > mns[i] THEN
        |        (CAST(embedding[i] AS DOUBLE)
        |          - (mns[i] + floor((CAST(embedding[i] AS DOUBLE) - mns[i])
        |                * 255 / (mxs[i] - mns[i]) + 0.5)
        |              * (mxs[i] - mns[i]) / 255))
        |        * (CAST(embedding[i] AS DOUBLE)
        |          - (mns[i] + floor((CAST(embedding[i] AS DOUBLE) - mns[i])
        |                * 255 / (mxs[i] - mns[i]) + 0.5)
        |              * (mxs[i] - mns[i]) / 255))
        |      ELSE 0.0 END)) / len(embedding), 6) AS mse
        |FROM embeddings, prof
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val dims = Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("pos").agg(min(col("x")).cast("double").as("mn"),
          max(col("x")).cast("double").as("mx"))
      val prof = dims
        .agg(collect_list(struct(col("pos"), col("mn"), col("mx"))).as("p"))
        .select(expr("transform(array_sort(p), s -> s.mn)").as("mns"),
          expr("transform(array_sort(p), s -> s.mx)").as("mxs"))
      Tables.embeddings(s, d).crossJoin(broadcast(prof))
        .select(col("vec_id"), round(expr(
          """aggregate(sequence(1, size(embedding)), 0D, (acc, i) ->
            |  acc + (CASE WHEN element_at(mxs, i) > element_at(mns, i) THEN
            |    (cast(element_at(embedding, i) as double)
            |      - (element_at(mns, i)
            |          + floor((cast(element_at(embedding, i) as double)
            |                - element_at(mns, i))
            |              * 255 / (element_at(mxs, i) - element_at(mns, i))
            |              + 0.5)
            |            * (element_at(mxs, i) - element_at(mns, i)) / 255))
            |    * (cast(element_at(embedding, i) as double)
            |      - (element_at(mns, i)
            |          + floor((cast(element_at(embedding, i) as double)
            |                - element_at(mns, i))
            |              * 255 / (element_at(mxs, i) - element_at(mns, i))
            |              + 0.5)
            |            * (element_at(mxs, i) - element_at(mns, i)) / 255))
            |  ELSE 0D END)) / size(embedding)""".stripMargin), 6)
          .as("mse"))
        .orderBy("vec_id")
    },
  )
}
