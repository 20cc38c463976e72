package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function families (SURVEY.md §2.2 "Scalar functions") — one query
  * per family, several functions each, all codegen'd built-ins (no UDFs in
  * the hot path; at 100 TB these run inside the scan stage's whole-stage
  * codegen span).
  *
  * Oracle-parity notes baked into each query:
  *   - DuckDB `regexp_replace` is first-match-only without the 'g' flag;
  *     Spark's replaces all — oracle always passes 'g'.
  *   - Spark `dayofweek` is 1=Sunday..7; DuckDB `dayofweek` 0=Sunday..6.
  *   - Spark `floor`/`ceil` return BIGINT; DuckDB return DOUBLE — oracle
  *     casts.
  *   - float arrays are cast to DOUBLE before any arithmetic on BOTH
  *     engines, so accumulation error stays ~1e-15 and rounding to 4-6
  *     decimals is order-insensitive in practice.
  *   - libm-backed fns (ln/log10/pow) are rounded to 6 decimals: engines'
  *     libms may differ in the last ulp.
  */
object Functions {

  val defs: Seq[Q] = Seq(

    Q("fn_string",
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  substring(p_name, 1, 6) AS sub,
        |  length(p_name) AS len,
        |  concat_ws('-', p_brand, p_type) AS cw,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS devowel,
        |  string_split(p_name, ' ')[1] AS tok1,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS pad,
        |  trim(concat('  ', p_name, '  ')) AS trm
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 6).as("sub"),
          length(col("p_name")).as("len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("devowel"),
          element_at(split(col("p_name"), " "), 1).as("tok1"),
          lpad(col("p_size").cast("string"), 4, "0").as("pad"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("trm"))
        .orderBy("p_partkey")
    },

    Q("fn_date",
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate) AS mon,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mth,
        |  dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dsince,
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("mon"),
          year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mth"),
          dayofweek(col("o_orderdate")).as("dow"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).as("dsince"),
          date_add(col("o_orderdate").cast("date"), 30)
            .cast("timestamp").as("plus30"),
          last_day(col("o_orderdate")).cast("timestamp").as("eom"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")
    },

    Q("fn_math",
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 1) AS r1,
        |  CAST(floor(l_discount * 100) AS BIGINT) AS fl,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS ce,
        |  abs(l_quantity - 25) AS ab,
        |  round(pow(l_quantity, 2), 4) AS pw,
        |  round(sqrt(l_extendedprice), 6) AS sq,
        |  round(ln(l_extendedprice + 1), 6) AS lg,
        |  round(log10(l_extendedprice + 1), 6) AS l10,
        |  greatest(l_tax, l_discount) AS gr,
        |  least(l_tax, l_discount) AS le,
        |  ((l_orderkey % 7) + 7) % 7 AS pm,
        |  CAST(sign(l_discount - 0.05) AS INT) AS sg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 1).as("r1"),
          floor(col("l_discount") * 100).as("fl"),
          ceil(col("l_discount") * 100).as("ce"),
          abs(col("l_quantity") - 25).as("ab"),
          round(pow(col("l_quantity"), 2), 4).as("pw"),
          round(sqrt(col("l_extendedprice")), 6).as("sq"),
          round(log(col("l_extendedprice") + 1), 6).as("lg"),
          round(log10(col("l_extendedprice") + 1), 6).as("l10"),
          greatest(col("l_tax"), col("l_discount")).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"),
          pmod(col("l_orderkey"), lit(7)).as("pm"),
          signum(col("l_discount") - 0.05).cast("int").as("sg"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Higher-order array functions over the embedding column; all arithmetic
    // on DOUBLE (cast first on both engines — see object scaladoc).
    Q("fn_array",
      """SELECT vec_id, n, el6, mx, second, s_pos, nrm2 FROM (
        |  SELECT vec_id,
        |    len(e) AS n,
        |    round(e[6], 5) AS el6,
        |    round(list_aggregate(e, 'max'), 5) AS mx,
        |    round(list_sort(e)[2], 5) AS second,
        |    round(list_sum(list_filter(e, x -> x > 0)), 4) AS s_pos,
        |    round(list_sum(list_transform(e, x -> x * x)), 4) AS nrm2
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |        FROM embeddings))
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("e"))
        .select(
          col("vec_id"),
          size(col("e")).as("n"),
          round(element_at(slice(col("e"), 5, 3), 2), 5).as("el6"),
          round(array_max(col("e")), 5).as("mx"),
          round(element_at(array_sort(col("e")), 2), 5).as("second"),
          round(aggregate(filter(col("e"), x => x > 0),
            lit(0.0), (a, x) => a + x), 4).as("s_pos"),
          round(aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
            lit(0.0), (a, x) => a + x), 4).as("nrm2"))
        .orderBy("vec_id")
    },

    Q("fn_map",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS kval,
        |  len(json_keys(props)) AS nk,
        |  json_keys(props)[1] AS kname,
        |  value AS ev_val
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val m = from_json(col("props"), lit("map<string,int>"))
      Tables.events(s, d)
        .withColumn("m", m)
        // map_from_entries round-trip: rebuild a map from (type, value)
        // entries and read `value` back out of it.
        .withColumn("m2", map_from_entries(
          array(struct(col("event_type"), col("value")))))
        .select(
          col("event_id"),
          element_at(col("m"), "k").as("kval"),
          size(map_keys(col("m"))).as("nk"),
          element_at(map_keys(col("m")), 1).as("kname"),
          element_at(map_values(col("m2")), 1).as("ev_val"))
        .orderBy("event_id")
    },

    // Higher-order MAP functions (the lambda family fn_map's entry-level
    // accessors don't touch): transform_values / transform_keys /
    // map_zip_with / map_filter, all codegen-friendly Catalyst lambdas.
    // Scalar extractions keep the oracle plain integer arithmetic on the
    // same JSON value.
    Q("fn_map_lambda",
      """SELECT event_id,
        |  2 * j AS k2,
        |  2 * j + 1 AS kz,
        |  j AS tk,
        |  CASE WHEN j > 50 THEN 1 ELSE 0 END AS nbig
        |FROM (SELECT event_id,
        |        CAST(json_extract_string(props, '$.k') AS INTEGER) AS j
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val m = from_json(col("props"), lit("map<string,int>"))
      Tables.events(s, d)
        .withColumn("m", m)
        // a second map with every value +1, built from the first
        .withColumn("m1", map_from_arrays(map_keys(col("m")),
          transform(map_values(col("m")), v => v + 1)))
        .select(
          col("event_id"),
          element_at(transform_values(col("m"), (_, v) => v * 2), "k")
            .as("k2"),
          element_at(map_zip_with(col("m"), col("m1"),
            (_, a, b) => a + b), "k").as("kz"),
          element_at(transform_keys(col("m"),
            (k, _) => concat(k, lit("!"))), "k!").as("tk"),
          size(map_filter(col("m"), (_, v) => v > 50)).as("nbig"))
        .orderBy("event_id")
    },

    Q("fn_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS gj,
        |  json_extract_string(props, '$.k') AS jtk,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS kv,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS kv2
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("props"),
          get_json_object(col("props"), "$.k").as("gj"),
          from_json(col("props"), lit("struct<k:int>")).getField("k").as("kv"))
        .select(col("event_id"), col("gj"),
          json_tuple(col("props"), "k").as("jtk"),
          col("kv"), (col("kv") * 2).as("kv2"))
        .select("event_id", "gj", "jtk", "kv", "kv2")
        .orderBy("event_id")
    },

    Q("fn_conditional",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS co,
        |  CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
        |       THEN 'has' ELSE 'none' END AS nn,
        |  CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS pos
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
            .as("co"),
          expr("nvl2(nullif(c_mktsegment, 'BUILDING'), 'has', 'none')").as("nn"),
          expr("if(c_acctbal > 0, 1, 0)").as("pos"))
        .orderBy("c_custkey")
    },

    // md5 + sha256 oracled; xxhash64/crc32 have no DuckDB twin and are
    // exercised by the minhash/fingerprint operators + unit tests instead.
    Q("fn_hash",
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"),
          md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha"))
        .orderBy("doc_id")
    },

    Q("fn_bitwise",
      """SELECT event_id,
        |  event_id & 255 AS b_and,
        |  event_id | 4096 AS b_or,
        |  xor(event_id, 21845) AS b_xor,
        |  event_id << 3 AS b_shl,
        |  event_id >> 2 AS b_shr,
        |  bit_count(event_id) AS b_cnt
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
          col("event_id"),
          col("event_id").bitwiseAND(255).as("b_and"),
          col("event_id").bitwiseOR(4096).as("b_or"),
          col("event_id").bitwiseXOR(21845).as("b_xor"),
          shiftleft(col("event_id"), 3).as("b_shl"),
          shiftright(col("event_id"), 2).as("b_shr"),
          bit_count(col("event_id")).cast("long").as("b_cnt"))
        .orderBy("event_id")
    },

    // printf-style formatting — identical C format-string semantics.
    Q("fn_format",
      """SELECT p_partkey,
        |  printf('%s#%04d', p_brand, p_size) AS tag,
        |  printf('%.2f', p_retailprice) AS price_s,
        |  repeat('*', p_size % 5) AS stars,
        |  reverse(p_name) AS rev,
        |  translate(p_name, 'aeiou', '01234') AS tr
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          format_string("%s#%04d", col("p_brand"), col("p_size")).as("tag"),
          format_string("%.2f", col("p_retailprice")).as("price_s"),
          repeat(lit("*"), col("p_size") % 5).as("stars"),
          reverse(col("p_name")).as("rev"),
          translate(col("p_name"), "aeiou", "01234").as("tr"))
        .orderBy("p_partkey")
    },

    Q("fn_string2",
      """SELECT p_partkey,
        |  position(' ' IN p_name) AS sp,
        |  left(p_name, 4) AS l4,
        |  right(p_name, 4) AS r4,
        |  replace(p_type, 'O', '0') AS rep,
        |  contains(p_name, 'bolt') AS has_bolt,
        |  starts_with(p_type, 'PROMO') AS is_promo,
        |  ends_with(p_name, 'widget') AS is_widget
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          expr("instr(p_name, ' ')").as("sp"),
          expr("left(p_name, 4)").as("l4"),
          expr("right(p_name, 4)").as("r4"),
          replace(col("p_type"), lit("O"), lit("0")).as("rep"),
          col("p_name").contains("bolt").as("has_bolt"),
          col("p_type").startsWith("PROMO").as("is_promo"),
          col("p_name").endsWith("widget").as("is_widget"))
        .orderBy("p_partkey")
    },

    Q("fn_date2",
      """SELECT o_orderkey,
        |  quarter(o_orderdate) AS q,
        |  dayofyear(CAST(o_orderdate AS DATE)) AS doy,
        |  weekofyear(CAST(o_orderdate AS DATE)) AS woy,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
        |  CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS wk
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
          col("o_orderkey"),
          quarter(col("o_orderdate")).as("q"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("woy"),
          add_months(col("o_orderdate").cast("date"), 3)
            .cast("timestamp").as("plus3m"),
          date_trunc("week", col("o_orderdate")).as("wk"))
        .orderBy("o_orderkey")
    },

    // Regex family over the corpus: extract / extract-all / count-via-len /
    // global replace / match-test. Patterns stay in the RE2 ∩ java.util
    // .regex common subset (char classes + greedy quantifiers, leftmost
    // non-overlapping matching in both engines). DuckDB's regexp_replace
    // is first-match-only without the 'g' flag — the classic parity trap.
    Q("fn_regex",
      """SELECT doc_id,
        |  regexp_extract(text, '(s[a-z]+)', 1) AS first_s,
        |  CAST(len(regexp_extract_all(text, 's[a-z]+')) AS BIGINT) AS n_s,
        |  length(regexp_replace(text, 's[a-z]+', '#', 'g')) AS redacted_len,
        |  regexp_matches(text, 'query') AS has_query
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"),
          regexp_extract(col("text"), "(s[a-z]+)", 1).as("first_s"),
          size(regexp_extract_all(col("text"), lit("s[a-z]+"), lit(0)))
            .cast("long").as("n_s"),
          length(regexp_replace(col("text"), "s[a-z]+", "#"))
            .cast("long").as("redacted_len"),
          col("text").rlike("query").as("has_query"))
        .orderBy("doc_id")
    },

    // URL parsing family: Spark's dedicated parse_url (HOST / PATH /
    // QUERY / per-key param) over deterministic synthetic URLs built from
    // corpus columns; DuckDB has no parse_url, so the oracle mirrors each
    // component with an anchored regexp — which also pins parse_url's
    // exact component boundaries (PATH excludes the query, QUERY excludes
    // '?', param is the raw value).
    Q("fn_url_parse",
      """SELECT doc_id, url,
        |  regexp_extract(url, '^([a-z]+)://', 1) AS proto,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query,
        |  regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param
        |FROM (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/docs/' || doc_id
        |      || '?lang=' || lang || '&v=2' AS url
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/docs/"),
            col("doc_id"), lit("?lang="), col("lang"), lit("&v=2"))
            .as("url"))
        .select(col("doc_id"), col("url"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"))
        .orderBy("doc_id")
    },

    // VARIANT (Spark 4's open semi-structured type): parse once into the
    // binary variant encoding, then typed path extraction — unlike
    // fn_json's per-access string re-parsing, a VARIANT column parses at
    // INGEST and every downstream access is a cheap binary traversal,
    // the 100 TB answer for JSON-heavy event streams (store props as
    // VARIANT, prune/extract at scan). try_parse_json covers the dirty-
    // input path: malformed rows become NULL, not a failed job.
    Q("fn_variant",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS kv,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) / 10 AS k_bucket,
        |  CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS ok,
        |  CAST(NULL AS INTEGER) AS bad_k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("props"),
          expr("parse_json(props)").as("v"),
          // malformed input: NULL variant, not an error
          expr("try_parse_json(substr(props, 2))").as("vbad"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("kv"),
          (expr("variant_get(v, '$.k', 'long')") / 10).as("k_bucket"),
          when(col("v").isNotNull, 1).otherwise(0).as("ok"),
          expr("variant_get(vbad, '$.k', 'int')").as("bad_k"))
        .orderBy("event_id")
    },

    // XML ingestion (from_xml, built-in since Spark 4): schema-directed
    // extraction from an XML payload column — the remaining wire format
    // after JSON (fn_json) and VARIANT (fn_variant). The XML is built
    // from fixture fields, so the oracle pins the extraction by
    // selecting those fields directly — any parse/extract drift
    // hash-fails without DuckDB needing an XML parser.
    Q("fn_xml",
      """SELECT doc_id, lang AS xlang, n_chars AS xn, source AS xsrc
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("<doc><lang>"), col("lang"), lit("</lang><n>"),
            col("n_chars"), lit("</n><src>"), col("source"),
            lit("</src></doc>")).as("xml"))
        .select(col("doc_id"),
          expr("from_xml(xml, 'lang STRING, n BIGINT, src STRING')").as("v"))
        .select(col("doc_id"), col("v.lang").as("xlang"),
          col("v.n").as("xn"), col("v.src").as("xsrc"))
        .orderBy("doc_id")
    },

    // Collated comparison (Spark 4 collation surface): UTF8_LCASE makes
    // equality/grouping case-insensitive AT THE TYPE level — the scan and
    // the hash join/agg see collated keys, instead of every predicate
    // wrapping lower() (which blocks pushdown and breaks statistics on
    // the original column). The oracle pins semantics via lower().
    Q("fn_collation",
      """SELECT lower(p_type) AS t, count(*) AS n,
        |  count(CASE WHEN lower(p_type) = 'promo' THEN 1 END) AS promo_ci
        |FROM part
        |GROUP BY lower(p_type)
        |ORDER BY t""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .groupBy(lower(expr("p_type COLLATE UTF8_LCASE")).as("t"))
        .agg(count(lit(1)).as("n"),
          count(when(expr("p_type COLLATE UTF8_LCASE") === lit("Promo"), 1))
            .as("promo_ci"))
        .select(col("t").cast("string").as("t"), col("n"), col("promo_ci"))
        .orderBy("t")
    },
  )
}
