package graft.operators

import graft.{Q, Tables}
import graft.functions.{chunks, winnow_fingerprint, word_ngrams}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` corpus (north-star
  * LLM-data-pipeline surface): tokenization stats, chunking (the UDTF
  * surface via `posexplode`), language-ID heuristic, quality scoring,
  * token counting, and document fingerprinting.
  *
  * All are scan-side, shuffle-free per-row computations except the token
  * aggregations — exactly the shape that scales linearly to 100 TB (the
  * groupBys shuffle only (token)-sized keys, with map-side partial
  * aggregation).
  */
object Text {

  /** Small English stopword list shared by lang-ID and quality scoring. */
  private[operators] val Stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private[operators] def stopList = Stopwords.map(w => s"'$w'").mkString(", ")

  /** DuckDB twin of the `word_ngrams` kernel expression. */
  private[operators] def oracleGram(n: Int): String = {
    val words = (0 until n)
      .map(j => s"string_split(text, ' ')[i + $j]").mkString(" || ' ' || ")
    s"""list_transform(generate_series(1, len(string_split(text, ' ')) - ${n - 1}),
       |      i -> $words)""".stripMargin
  }

  val defs: Seq[Q] = Seq(

    Q("text_tokenize_stats",
      """SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY tok
        |ORDER BY n DESC, tok""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n").desc, col("tok"))
    },

    // Chunking: 100-char windows, 20-char overlap (stride 80). The oracle
    // reproduces the window arithmetic with generate_series + substr.
    Q("text_chunk",
      """SELECT doc_id, i AS chunk_idx, substr(text, i * 80 + 1, 100) AS chunk
        |FROM (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0,
        |      CASE WHEN length(text) <= 100 THEN 0
        |           ELSE CAST(ceil((length(text) - 100) / 80.0) AS INT) END)) AS i
        |  FROM documents)
        |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(chunks(col("text"), 100, 20)).as(Seq("chunk_idx", "chunk")))
        .orderBy("doc_id", "chunk_idx")
    },

    // Language-ID heuristic: stopword-hit ratio over whitespace tokens.
    // (The synthetic corpus draws all langs from one vocab, so the declared
    // `lang` column is echoed alongside for comparison, not predicted.)
    Q("text_lang_id",
      s"""SELECT doc_id, lang, n_tok, n_stop,
         |  CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
         |  CASE WHEN CAST(n_stop AS DOUBLE) / n_tok >= 0.05
         |       THEN 'en' ELSE 'unk' END AS guess
         |FROM (
         |  SELECT doc_id, lang,
         |    len(string_split(text, ' ')) AS n_tok,
         |    len(list_filter(string_split(text, ' '),
         |        x -> x IN ($stopList))) AS n_stop
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tok"),
          size(filter(split(col("text"), " "),
            x => x.isInCollection(Stopwords))).as("n_stop"))
        .select(col("doc_id"), col("lang"), col("n_tok"), col("n_stop"),
          (col("n_stop").cast("double") / col("n_tok")).as("stop_ratio"),
          when(col("n_stop").cast("double") / col("n_tok") >= 0.05, "en")
            .otherwise("unk").as("guess"))
        .orderBy("doc_id")
    },

    // Quality scoring: length, punctuation ratio, mean token length,
    // composite in [0, 1].
    Q("text_quality_score",
      """SELECT doc_id, n_chars2, n_tok, punct_ratio, mean_tok_len,
        |  least(1.0, n_tok / 100.0) * (1.0 - punct_ratio) AS quality
        |FROM (
        |  SELECT doc_id, length(text) AS n_chars2,
        |    len(string_split(text, ' ')) AS n_tok,
        |    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
        |         AS DOUBLE) / length(text) AS punct_ratio,
        |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |         / len(string_split(text, ' ')) AS mean_tok_len
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).as("n_chars2"),
          size(split(col("text"), " ")).as("n_tok"),
          (length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
            .cast("double") / length(col("text"))).as("punct_ratio"),
          (length(replace(col("text"), lit(" "), lit(""))).cast("double")
            / size(split(col("text"), " "))).as("mean_tok_len"))
        .select(col("doc_id"), col("n_chars2"), col("n_tok"),
          col("punct_ratio"), col("mean_tok_len"),
          (least(lit(1.0), col("n_tok") / 100.0)
            * (lit(1.0) - col("punct_ratio"))).as("quality"))
        .orderBy("doc_id")
    },

    // Token counting: whitespace split, BPE-ish regex token runs, and the
    // chars/4 estimate common in LLM budgeting.
    Q("text_token_count",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS re_tokens,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("re_tokens"),
          ceil(length(col("text")) / 4.0).as("bpe_est"))
        .orderBy("doc_id")
    },

    // Content-defined fingerprint of the canonicalized text (exact-dup
    // detection robust to case/punctuation/whitespace noise).
    Q("text_fingerprint",
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
        |  substr(md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))),
        |         1, 8) AS fp8
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val canon = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), md5(canon).as("fp"),
          substring(md5(canon), 1, 8).as("fp8"))
        .orderBy("doc_id")
    },

    // Winnowing rolling-hash fingerprint — algorithm-defined (no SQL
    // oracle); scalar projections keep the driver's rows-only check happy.
    Q.noOracle("text_winnow_fingerprint") { (s, d) =>
      val fp = winnow_fingerprint(col("text"), 8, 16)
      Tables.documents(s, d)
        .select(col("doc_id"), fp.as("fp"))
        .select(col("doc_id"),
          size(col("fp")).as("n_fp"),
          element_at(col("fp"), 1).as("fp_min"),
          element_at(col("fp"), -1).as("fp_max"))
        .orderBy("doc_id")
    },

    // Intra-document repetition signals (Gopher-style): duplicate 2-gram
    // and 3-gram fractions per doc. Pure row-local HOFs — one codegen'd
    // projection, no shuffle, linear to 100 TB. (The cross-document
    // counterpart is `text_boilerplate_ngrams`.)
    Q("text_repetition_score",
      s"""SELECT doc_id, n_2grams,
         |  1.0 - CAST(len(list_distinct(${oracleGram(2)}))
         |        AS DOUBLE) / len(${oracleGram(2)}) AS dup2_frac,
         |  1.0 - CAST(len(list_distinct(${oracleGram(3)}))
         |        AS DOUBLE) / len(${oracleGram(3)}) AS dup3_frac
         |FROM (SELECT doc_id, text,
         |        len(string_split(text, ' ')) - 1 AS n_2grams
         |      FROM documents WHERE len(string_split(text, ' ')) >= 3)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      def dupFrac(n: Int) =
        lit(1.0) - size(array_distinct(word_ngrams(col("text"), n)))
          .cast("double") / size(word_ngrams(col("text"), n))
      Tables.documents(s, d)
        .where(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          (size(split(col("text"), " ")) - 1).as("n_2grams"),
          dupFrac(2).as("dup2_frac"),
          dupFrac(3).as("dup3_frac"))
        .orderBy("doc_id")
    },

    // Bigram language-model statistics: corpus bigram counts with the
    // conditional estimate P(w2|w1) ≈ c(w1 w2)/c(w1) (unigram-count
    // denominator — the standard MLE up to end-of-doc truncation). The
    // n-gram-LM / tokenizer-analysis building block: two combiner-friendly
    // count shuffles + one join on the first token; both counts are exact
    // longs so the one double division is bit-identical cross-engine.
    Q("text_bigram_lm",
      s"""WITH b AS (
         |  SELECT g, count(*) AS c2 FROM (
         |    SELECT unnest(${oracleGram(2)}) AS g
         |    FROM documents WHERE len(string_split(text, ' ')) >= 2)
         |  GROUP BY g),
         |u AS (
         |  SELECT tok, count(*) AS c1 FROM (
         |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY tok)
         |SELECT g, c2, c1, CAST(c2 AS DOUBLE) / c1 AS p
         |FROM b JOIN u ON string_split(g, ' ')[1] = u.tok
         |ORDER BY c2 DESC, g
         |LIMIT 50""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val b = docs.where(size(split(col("text"), " ")) >= 2)
        .select(explode(word_ngrams(col("text"), 2)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c2"))
      val u = docs
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c1"))
      b.join(u, substring_index(col("g"), " ", 1) === col("tok"))
        .select(col("g"), col("c2"), col("c1"),
          (col("c2").cast("double") / col("c1")).as("p"))
        .orderBy(col("c2").desc, col("g"))
        .limit(50)
    },

    // Per-doc bigram cross-entropy under the corpus LM — the CCNet-style
    // perplexity quality filter (docs scoring far above the corpus norm
    // are gibberish/boilerplate; far below are degenerate repetition).
    // Model: add-1/2-smoothed P(w2|w1) = (c2+0.5)/(c1+0.5V) over the
    // whole corpus; score: xent = -mean log P over the doc's bigram
    // OCCURRENCES. Scale shape: two combiner-friendly count shuffles
    // build the model; scoring is ONE hash join of doc-bigrams to the
    // model on the gram key (at 100 TB the model is top-K pruned +
    // broadcast and the join disappears into the scan). Float parity:
    // ln is the one transcendental → rounded to 8 BEFORE use; per-doc
    // summation folds over the SORTED logp list so both engines add
    // identical operands in identical order; the final -sum/n division
    // is emitted unrounded.
    Q("text_perplexity_bigram",
      s"""WITH b AS (
         |  SELECT g, count(*) AS c2 FROM (
         |    SELECT unnest(${oracleGram(2)}) AS g
         |    FROM documents WHERE len(string_split(text, ' ')) >= 2)
         |  GROUP BY g),
         |u AS (
         |  SELECT tok, count(*) AS c1 FROM (
         |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY tok),
         |v AS (SELECT count(*) AS v FROM u),
         |m AS (
         |  SELECT g, round(ln((c2 + 0.5) / (c1 + 0.5 * v.v)), 8) AS logp
         |  FROM b JOIN u ON string_split(g, ' ')[1] = u.tok CROSS JOIN v),
         |dg AS (
         |  SELECT doc_id, unnest(${oracleGram(2)}) AS g
         |  FROM documents WHERE len(string_split(text, ' ')) >= 2)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  -list_reduce(list_sort(list(m.logp)), (a, b) -> a + b)
         |    / count(*) AS xent
         |FROM dg JOIN m USING (g)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val b = docs.where(size(split(col("text"), " ")) >= 2)
        .select(explode(word_ngrams(col("text"), 2)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c2"))
      val u = docs
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c1"))
      val v = u.select(count(lit(1)).as("v"))
      val m = b.join(u, substring_index(col("g"), " ", 1) === col("tok"))
        .crossJoin(broadcast(v))
        .select(col("g"),
          round(log((col("c2") + 0.5) / (col("c1") + lit(0.5) * col("v"))), 8)
            .as("logp"))
      val dg = docs.where(size(split(col("text"), " ")) >= 2)
        .select(col("doc_id"), explode(word_ngrams(col("text"), 2)).as("g"))
      dg.join(m, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sort_array(collect_list(col("logp"))).as("lps"))
        .select(col("doc_id"), col("n_bigrams"),
          (-expr("aggregate(lps, 0D, (acc, x) -> acc + x)")
            / col("n_bigrams")).as("xent"))
        .orderBy("doc_id")
    },

    // Cross-document boilerplate detection: 5-grams shared by >= 3
    // distinct docs (headers/footers/license blocks in a real corpus).
    // Per-doc-distinct grams explode map-side, then ONE count shuffle on
    // gram with map-side partials; the >= filter collapses the output to
    // the boilerplate set and top-100 bounds it. At 100 TB the gram key
    // space is what shuffles — high-cardinality but combiner-friendly
    // (singleton grams dominate and die in the HAVING).
    Q("text_boilerplate_ngrams",
      s"""SELECT gram, n_docs FROM (
         |  SELECT gram, count(*) AS n_docs FROM (
         |    SELECT DISTINCT doc_id, unnest(list_distinct(${oracleGram(5)}))
         |           AS gram
         |    FROM documents WHERE len(string_split(text, ' ')) >= 5)
         |  GROUP BY gram)
         |WHERE n_docs >= 3
         |ORDER BY n_docs DESC, gram
         |LIMIT 100""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .where(size(split(col("text"), " ")) >= 5)
        .select(col("doc_id"),
          explode(array_distinct(word_ngrams(col("text"), 5))).as("gram"))
        .groupBy("gram")
        .agg(count(lit(1)).as("n_docs"))
        .where(col("n_docs") >= 3)
        .orderBy(col("n_docs").desc, col("gram"))
        .limit(100)
    },
  )
}
