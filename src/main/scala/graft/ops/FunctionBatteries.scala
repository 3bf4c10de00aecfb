package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Scalar-function batteries widening the engine's expression surface
  * beyond the reference's needs (SURVEY.md §2.3/§2.8): JSON functions and
  * array/higher-order functions, each exercised end-to-end against the
  * DuckDB oracle.
  *
  * Determinism: only integers and exact string equality leave the
  * per-row expressions — no raw JSON strings (engines format JSON
  * differently) and no floats through text round-trips.
  */
object FunctionBatteries {

  // -------------------------------------------------------------------------
  // F14 JSON battery: schema-on-read parse (from_json), generator-style
  // extraction (json_tuple), path extraction after a construction round
  // trip (to_json(struct(...)) → get_json_object), array length and key
  // enumeration. All map-side; one aggregate on event_type.
  def fJsonFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .withColumn("k", from_json($"props", StructType(Seq(StructField("k", IntegerType)))).getField("k"))
      .select($"event_id", $"event_type", $"props", $"k",
        json_tuple($"props", "k").as("k_str"))
      .withColumn("rt", get_json_object(
        to_json(struct($"event_type".as("t"), $"k".as("k"))), "$.t"))
      .withColumn("jal", json_array_length(
        concat(lit("["), $"k".cast("string"), lit(","), $"k".cast("string"), lit("]"))))
      .withColumn("n_keys", size(json_object_keys($"props")))
    e.groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        sum($"k_str".cast(IntegerType)).as("sum_k_tuple"),
        sum(when($"rt" === $"event_type", 1L).otherwise(0L)).as("n_roundtrip_ok"),
        sum($"jal".cast(LongType)).as("sum_arr_len"),
        sum($"n_keys".cast(LongType)).as("sum_n_keys"))
      .orderBy($"event_type")
  }

  val fJsonFuncsSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_tuple,
      |    json_extract_string(
      |      to_json(struct_pack(t := event_type, k := CAST(json_extract_string(props, '$.k') AS INTEGER))),
      |      '$.t') AS rt,
      |    json_array_length('[' || CAST(json_extract_string(props, '$.k') AS INTEGER)
      |      || ',' || CAST(json_extract_string(props, '$.k') AS INTEGER) || ']') AS jal,
      |    len(json_keys(props)) AS n_keys
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(SUM(k_tuple) AS BIGINT) AS sum_k_tuple,
      |  CAST(SUM(CASE WHEN rt = event_type THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
      |  CAST(SUM(jal) AS BIGINT) AS sum_arr_len,
      |  CAST(SUM(n_keys) AS BIGINT) AS sum_n_keys
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------------
  // F15 array / higher-order-function battery over the documents token
  // arrays: transform+aggregate (fold), filter, exists, forall, zip_with,
  // flatten, slice, set ops (union/intersect/except as sizes — size-only
  // keeps element ORDER differences between engines out of the compare),
  // min/max element, positional lookup. Everything is per-row array math
  // (no explode, no shuffle) until the per-lang audit aggregate — the
  // 100 TB-friendly shape for per-document feature extraction.
  def fArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .withColumn("toks", split($"text", " "))
      .withColumn("sum_len", aggregate(transform($"toks", t => length(t)), lit(0L), (a, b) => a + b))
      .withColumn("n_long", size(filter($"toks", t => length(t) > 4)))
      .withColumn("has_the", array_contains($"toks", "the").cast(LongType))
      .withColumn("any_long8", exists($"toks", t => length(t) > 8).cast(LongType))
      .withColumn("all_nonempty", forall($"toks", t => length(t) > 0).cast(LongType))
      .withColumn("n_mirror", size(filter(
        zip_with($"toks", reverse($"toks"), (a, b) => (a === b).cast(IntegerType)),
        x => x === 1)))
      .withColumn("n_flat", size(flatten(array(slice($"toks", 1, 3), slice($"toks", 1, 2)))))
      .withColumn("n_union", size(array_union($"toks", slice($"toks", 1, 5))))
      .withColumn("n_inter", size(array_intersect($"toks", array(lit("the"), lit("a")))))
      .withColumn("n_except", size(array_except($"toks", array(lit("the"), lit("a")))))
      .withColumn("min_tok", array_min($"toks"))
      .withColumn("max_tok", array_max($"toks"))
      .withColumn("pos_the", array_position($"toks", "the"))
    d.groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"sum_len").as("sum_tok_len"),
        sum($"n_long".cast(LongType)).as("n_long_toks"),
        sum($"has_the").as("n_has_the"),
        sum($"any_long8").as("n_any_long8"),
        sum($"all_nonempty").as("n_all_nonempty"),
        sum($"n_mirror".cast(LongType)).as("n_mirror"),
        sum($"n_flat".cast(LongType)).as("n_flat"),
        sum($"n_union".cast(LongType)).as("n_union"),
        sum($"n_inter".cast(LongType)).as("n_inter"),
        sum($"n_except".cast(LongType)).as("n_except"),
        min($"min_tok").as("min_tok"),
        max($"max_tok").as("max_tok"),
        sum($"pos_the").as("sum_pos_the"))
      .orderBy($"lang")
  }

  val fArrayFuncsSql: String =
    """WITH d AS (
      |  SELECT lang, string_split(text, ' ') AS toks FROM documents),
      |m AS (
      |  SELECT lang,
      |    list_sum(list_transform(toks, t -> len(t))) AS sum_len,
      |    len(list_filter(toks, t -> len(t) > 4)) AS n_long,
      |    CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END AS has_the,
      |    CASE WHEN len(list_filter(toks, t -> len(t) > 8)) > 0 THEN 1 ELSE 0 END AS any_long8,
      |    CASE WHEN len(list_filter(toks, t -> NOT len(t) > 0)) = 0 THEN 1 ELSE 0 END AS all_nonempty,
      |    len(list_filter(list_zip(toks, list_reverse(toks)), z -> z[1] = z[2])) AS n_mirror,
      |    len(flatten([list_slice(toks, 1, 3), list_slice(toks, 1, 2)])) AS n_flat,
      |    len(list_distinct(list_concat(toks, list_slice(toks, 1, 5)))) AS n_union,
      |    len(list_filter(list_distinct(toks), t -> t = 'the' OR t = 'a')) AS n_inter,
      |    len(list_filter(list_distinct(toks), t -> NOT (t = 'the' OR t = 'a'))) AS n_except,
      |    list_aggregate(toks, 'min') AS min_tok,
      |    list_aggregate(toks, 'max') AS max_tok,
      |    COALESCE(list_position(toks, 'the'), 0) AS pos_the
      |  FROM d)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(sum_len) AS BIGINT) AS sum_tok_len,
      |  CAST(SUM(n_long) AS BIGINT) AS n_long_toks,
      |  CAST(SUM(has_the) AS BIGINT) AS n_has_the,
      |  CAST(SUM(any_long8) AS BIGINT) AS n_any_long8,
      |  CAST(SUM(all_nonempty) AS BIGINT) AS n_all_nonempty,
      |  CAST(SUM(n_mirror) AS BIGINT) AS n_mirror,
      |  CAST(SUM(n_flat) AS BIGINT) AS n_flat,
      |  CAST(SUM(n_union) AS BIGINT) AS n_union,
      |  CAST(SUM(n_inter) AS BIGINT) AS n_inter,
      |  CAST(SUM(n_except) AS BIGINT) AS n_except,
      |  MIN(min_tok) AS min_tok,
      |  MAX(max_tok) AS max_tok,
      |  CAST(SUM(pos_the) AS BIGINT) AS sum_pos_the
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------------------------
  // F16 regex battery: extraction, counting, replacement, matching and
  // regex splitting over the documents text. All map-side; one aggregate.
  def fRegexFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .withColumn("first_num", regexp_extract($"text", "([0-9]+)", 1))
      .withColumn("n_vowel_runs", size(regexp_extract_all($"text", lit("[aeiou]+"), lit(0))))
      .withColumn("devoweled_len", length(regexp_replace($"text", "[aeiou]", "")))
      // NB: no backreferences — DuckDB's RE2 has none, so the portable
      // battery sticks to the regular-language subset
      .withColumn("has_digitrun", $"text".rlike("[0-9]{2,}").cast(LongType))
      .withColumn("n_segments", size(split($"text", "[ .]+")))
    d.groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"first_num" === "", 0L).otherwise(1L)).as("n_with_number"),
        sum($"n_vowel_runs".cast(LongType)).as("n_vowel_runs"),
        sum($"devoweled_len".cast(LongType)).as("devoweled_len"),
        sum($"has_digitrun").as("n_has_digitrun"),
        sum($"n_segments".cast(LongType)).as("n_segments"))
      .orderBy($"lang")
  }

  val fRegexFuncsSql: String =
    """WITH d AS (
      |  SELECT lang,
      |    regexp_extract(text, '([0-9]+)', 1) AS first_num,
      |    len(regexp_extract_all(text, '[aeiou]+')) AS n_vowel_runs,
      |    len(regexp_replace(text, '[aeiou]', '', 'g')) AS devoweled_len,
      |    CASE WHEN regexp_matches(text, '[0-9]{2,}') THEN 1 ELSE 0 END AS has_digitrun,
      |    len(regexp_split_to_array(text, '[ .]+')) AS n_segments
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN first_num = '' THEN 0 ELSE 1 END) AS BIGINT) AS n_with_number,
      |  CAST(SUM(n_vowel_runs) AS BIGINT) AS n_vowel_runs,
      |  CAST(SUM(devoweled_len) AS BIGINT) AS devoweled_len,
      |  CAST(SUM(has_digitrun) AS BIGINT) AS n_has_digitrun,
      |  CAST(SUM(n_segments) AS BIGINT) AS n_segments
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------------------------
  // F17 collect battery: collect_set/collect_list are ORDER-NONDETERMINISTIC
  // in a distributed engine, so every collected value is sorted before it
  // leaves the aggregate (sort_array) and compared as a joined string —
  // the only portable way to emit grouped lists. string_agg/listagg
  // equivalent included via array_join.
  def fCollectFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        array_join(sort_array(collect_set($"l_linestatus")), ",").as("statuses"),
        size(collect_list($"l_linestatus")).as("n_collected"),
        array_join(slice(sort_array(collect_set($"l_shipdate".cast("date").cast("string"))), 1, 3), ",")
          .as("first_ship_dates"),
        expr("listagg(DISTINCT l_linestatus, '|') WITHIN GROUP (ORDER BY l_linestatus)")
          .as("statuses_listagg"))
      .orderBy($"l_returnflag")
  }

  val fCollectFuncsSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
      |  CAST(len(list(l_linestatus)) AS INTEGER) AS n_collected,
      |  array_to_string(list_slice(list_sort(list_distinct(list(CAST(CAST(l_shipdate AS DATE) AS VARCHAR)))), 1, 3), ',')
      |    AS first_ship_dates,
      |  string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus) AS statuses_listagg
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------------
  // F18 bitwise-aggregate battery: bit_and / bit_or / bit_xor per group —
  // the bitmap/flag-mask roll-up surface (permission masks, feature flags,
  // bloom-ish membership words). All three are order-independent and
  // partial-mergeable, so the plan is the same single partial+final hash
  // aggregate as any sum.
  def fBitwiseFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .withColumn("sk", $"l_suppkey".cast("long"))
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        expr("bit_and(sk)").as("mask_and"),
        expr("bit_or(sk)").as("mask_or"),
        expr("bit_xor(sk)").as("mask_xor"),
        expr("bit_or(shiftleft(1L, CAST(sk % 16 AS INT)))").as("bitmap16"))
      .orderBy($"l_returnflag")
  }

  val fBitwiseFuncsSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  bit_and(CAST(l_suppkey AS BIGINT)) AS mask_and,
      |  bit_or(CAST(l_suppkey AS BIGINT)) AS mask_or,
      |  bit_xor(CAST(l_suppkey AS BIGINT)) AS mask_xor,
      |  bit_or(CAST(1 AS BIGINT) << CAST(l_suppkey % 16 AS INT)) AS bitmap16
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------------
  // F19 variant battery: the semi-structured VARIANT type (Spark 4's
  // schema-flexible ingestion column — the engine-native answer to the
  // reference's Snowflake VARIANT stage scans, SURVEY §2.1 S4). A JSON
  // string is built deterministically from table columns (identical text in
  // both engines), parsed once into a VARIANT, and fields are read back
  // with typed variant_get paths; try_variant_get on an absent path proves
  // the null-not-error contract. VARIANT stores a parsed binary form, so
  // repeated path reads skip re-tokenizing the JSON text — the 100 TB win
  // over get_json_object on raw strings. Oracle reads the same text with
  // DuckDB's JSON extractors.
  def fVariantFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("raw", concat(
        lit("{\"id\":"), $"doc_id".cast("string"),
        lit(",\"meta\":{\"lang\":\""), $"lang",
        lit("\",\"n\":"), $"n_chars".cast("string"), lit("}}")))
      .withColumn("v", expr("parse_json(raw)"))
      .select(
        expr("variant_get(v, '$.meta.lang', 'string')").as("vlang"),
        expr("variant_get(v, '$.id', 'long')").as("vid"),
        expr("variant_get(v, '$.meta.n', 'long')").as("vn"),
        expr("try_variant_get(v, '$.meta.missing', 'string')").as("vmissing"))
      .groupBy($"vlang")
      .agg(
        count(lit(1)).as("n"),
        sum($"vid").as("sum_id"),
        sum($"vn").as("sum_n"),
        count($"vmissing").as("n_missing"))
      .orderBy($"vlang")
  }

  val fVariantFuncsSql: String =
    """WITH d AS (
      |  SELECT '{"id":' || doc_id || ',"meta":{"lang":"' || lang || '","n":' || n_chars || '}}' AS raw
      |  FROM documents)
      |SELECT json_extract_string(raw, '$.meta.lang') AS vlang, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract(raw, '$.id') AS BIGINT)) AS BIGINT) AS sum_id,
      |  CAST(SUM(CAST(json_extract(raw, '$.meta.n') AS BIGINT)) AS BIGINT) AS sum_n,
      |  CAST(COUNT(json_extract_string(raw, '$.meta.missing')) AS BIGINT) AS n_missing
      |FROM d GROUP BY vlang ORDER BY vlang""".stripMargin

  // -------------------------------------------------------------------------
  // F20 ANSI-safe try_* battery: Spark 4 runs under ANSI SQL semantics, so
  // bare arithmetic THROWS on overflow / bad casts — the try_* family is
  // the row-level "null, don't kill the 100 TB job" escape hatch (one
  // poison row in a trillion must not fail the stage). Each signal is
  // replicated in the oracle as an explicit CASE guard, proving the
  // null-contract semantics match: division by zero, int64 overflow,
  // unparseable cast. Float discipline: the only non-count output is
  // floor()ed integer division (IEEE-identical in both engines).
  def fTryFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .withColumn("cents", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .withColumn("qm25", $"l_quantity".cast(LongType) - 25L)
      .select($"l_returnflag",
        expr("try_divide(cents, qm25)").as("per_unit"),
        expr("try_add(9223372036854775807, cents)").as("ov"),
        expr("try_cast(l_returnflag AS INT)").as("bad_int"))
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"per_unit".isNull, 1L).otherwise(0L)).as("n_div_null"),
        sum(when($"ov".isNull, 1L).otherwise(0L)).as("n_overflow"),
        sum(when($"bad_int".isNull, 1L).otherwise(0L)).as("n_badcast"),
        sum(floor($"per_unit").cast(LongType)).as("sum_floor_per_unit"))
      .orderBy($"l_returnflag")
  }

  val fTryFuncsSql: String =
    """WITH l AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(l_quantity AS BIGINT) - 25 AS qm25
      |  FROM lineitem)
      |SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN qm25 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
      |  CAST(SUM(CASE WHEN cents > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
      |  COUNT(*) AS n_badcast,
      |  CAST(SUM(CASE WHEN qm25 = 0 THEN NULL
      |       ELSE CAST(floor(CAST(cents AS DOUBLE) / qm25) AS BIGINT) END) AS BIGINT)
      |    AS sum_floor_per_unit
      |FROM l GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f_try_funcs"     -> (fTryFuncs _),
    "f_variant_funcs" -> (fVariantFuncs _),
    "f_bitwise_funcs" -> (fBitwiseFuncs _),
    "f_json_funcs"    -> (fJsonFuncs _),
    "f_array_funcs"   -> (fArrayFuncs _),
    "f_regex_funcs"   -> (fRegexFuncs _),
    "f_collect_funcs" -> (fCollectFuncs _))

  val oracles: Map[String, String] = Map(
    "f_try_funcs"     -> fTryFuncsSql,
    "f_variant_funcs" -> fVariantFuncsSql,
    "f_bitwise_funcs" -> fBitwiseFuncsSql,
    "f_json_funcs"    -> fJsonFuncsSql,
    "f_array_funcs"   -> fArrayFuncsSql,
    "f_regex_funcs"   -> fRegexFuncsSql,
    "f_collect_funcs" -> fCollectFuncsSql)
}
