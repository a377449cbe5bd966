package graft.operators

import graft.{Num, QueryModule}
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.7): string / date / math / array /
  * JSON expressions.
  *
  * The reference computes nothing per-record beyond hashCode/equals/serialize
  * (SURVEY.md §1.1); the engine takes the whole scalar layer from
  * `org.apache.spark.sql.functions` so every expression stays inside
  * whole-stage codegen — no UDFs anywhere in these plans, so Catalyst can
  * push filters past them and the hot loop never leaves generated code.
  */
object ScalarQueries extends QueryModule {

  /** q40 — string functions: case, trim, substring, concat, length, replace,
    * instr over part names, aggregated so output stays small at any scale. */
  val q40String: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        instr(col("p_name"), "ring").cast("long").as("ring_pos"))
      .orderBy(col("p_partkey"))

  /** q41 — date/time functions: year/month/day extraction, truncation,
    * day arithmetic, dayofweek — grouped monthly order stats. */
  val q41Date: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .groupBy(col("y"), col("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Num.cents(col("o_totalprice"))).as("total_cents"))
      .orderBy(col("y"), col("m"))

  /** q42 — math functions: abs/ceil/floor/round/sqrt/ln/exp/pow/mod on
    * lineitem numerics, spot-checkable row by row. */
  val q42Math: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("abs_dev"),
        ceil(col("l_discount") * 100).cast("long").as("disc_pct_ceil"),
        floor(col("l_tax") * 100).cast("long").as("tax_pct_floor"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        pmod(col("l_orderkey"), lit(7)).cast("long").as("key_mod7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** q43 — array functions over tokenized text: split, size, distinct count,
    * sort, first element. Arrays never leave the executor (aggregated out). */
  val q43Array: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_unique"),
        array_min(col("toks")).as("min_tok"),
        array_max(col("toks")).as("max_tok"),
        element_at(col("toks"), 1).as("first_tok"))
      .orderBy(col("doc_id"))

  /** q44 — JSON extraction from the events.props payload column (the
    * reference's opaque-V analogue, SURVEY.md §1.3): parse, extract, cast,
    * aggregate. get_json_object is codegen'd; no UDF. */
  val q44Json: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** q45 — null handling: coalesce / nullif / nvl2-style / null-safe equality
    * on a derived nullable column. */
  val q45Nulls: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"))
      .select(
        coalesce(col("seg_nb"), lit("(building)")).as("seg_or_default"),
        col("seg_nb").isNull.cast("long").as("is_building"))
      .groupBy(col("seg_or_default"))
      .agg(count(lit(1)).as("n"), sum(col("is_building")).as("n_building"))
      .orderBy(col("seg_or_default"))

  /** q46 — string aggregation + distinct collect: sorted CSV of regions per
    * nation-prefix group (deterministic via array_sort before join). */
  val q46StringAgg: Q = (s, dir) => {
    val n = Tables.load(s, dir, "nation")
    val r = broadcast(Tables.load(s, dir, "region"))
    n.join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(substring(col("n_name"), 1, 1).as("initial"))
      .agg(
        count(lit(1)).as("n_nations"),
        concat_ws(",", array_sort(collect_set(col("r_name")))).as("regions"))
      .orderBy(col("initial"))
  }

  /** q47 — map functions over the JSON payload: parse to MapType, explode to
    * entries, aggregate per key (MapType itself never reaches the sink —
    * exploded long before, which also keeps the oracle engine-neutral). */
  val q47Map: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType)).as("m"))
      .select(col("event_type"), explode(col("m")).as(Seq("k", "v")))
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .orderBy(col("event_type"), col("k"))

  /** q48 — regex surface: rlike filter, capture-group extraction, match
    * counting — all codegen'd, all pushable past by Catalyst. */
  val q48Regex: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .filter(col("p_name").rlike("^[a-z]+ [a-z]+"))
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)", 1).as("adj"),
        regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)", 2).as("noun"),
        size(expr("regexp_extract_all(p_name, '[aeiou]', 0)")).cast("long").as("n_vowels"))
      .groupBy(col("adj"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("noun")).as("n_nouns"),
        sum(col("n_vowels")).as("tot_vowels"))
      .orderBy(col("adj"))

  def queries: Map[String, Q] = Map(
    "q47_map_funcs"    -> q47Map,
    "q48_regex"        -> q48Regex,
    "q40_string_funcs" -> q40String,
    "q41_date_funcs"   -> q41Date,
    "q42_math_funcs"   -> q42Math,
    "q43_array_funcs"  -> q43Array,
    "q44_json_funcs"   -> q44Json,
    "q45_null_funcs"   -> q45Nulls,
    "q46_string_agg"   -> q46StringAgg)

  def oracles: Map[String, String] = Map(
    "q47_map_funcs" -> """
      WITH keys AS (
        SELECT event_type, props, unnest(json_keys(props)) AS k FROM events),
      kv AS (
        SELECT event_type, k,
          CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS v
        FROM keys)
      SELECT event_type, k, count(*) AS n,
        CAST(sum(v) AS BIGINT) AS sum_v,
        min(v) AS min_v, max(v) AS max_v
      FROM kv GROUP BY 1, 2 ORDER BY event_type, k""",
    "q48_regex" -> """
      WITH m AS (
        SELECT p_partkey,
          regexp_extract(p_name, '^([a-z]+) ([a-z]+)', 1) AS adj,
          regexp_extract(p_name, '^([a-z]+) ([a-z]+)', 2) AS noun,
          CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels
        FROM part WHERE regexp_matches(p_name, '^[a-z]+ [a-z]+'))
      SELECT adj, count(*) AS n,
        count(DISTINCT noun) AS n_nouns,
        CAST(sum(n_vowels) AS BIGINT) AS tot_vowels
      FROM m GROUP BY adj ORDER BY adj""",
    "q40_string_funcs" -> """
      SELECT p_partkey,
        upper(p_name) AS uname,
        substring(p_name, 1, 5) AS prefix5,
        CAST(length(p_name) AS BIGINT) AS name_len,
        concat_ws('|', p_brand, p_type) AS brand_type,
        replace(p_name, ' ', '_') AS snake,
        CAST(instr(p_name, 'ring') AS BIGINT) AS ring_pos
      FROM part ORDER BY p_partkey""",
    "q41_date_funcs" -> """
      SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        CAST(month(o_orderdate) AS BIGINT) AS m,
        count(*) AS n_orders,
        CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders GROUP BY 1, 2 ORDER BY y, m""",
    "q42_math_funcs" -> """
      SELECT l_orderkey, l_linenumber,
        abs(l_quantity - 25) AS abs_dev,
        CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
        round(sqrt(l_quantity), 6) AS sqrt_qty,
        round(ln(l_extendedprice), 6) AS ln_price,
        CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
      FROM lineitem WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber""",
    "q43_array_funcs" -> """
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
        list_min(string_split(text, ' ')) AS min_tok,
        list_max(string_split(text, ' ')) AS max_tok,
        string_split(text, ' ')[1] AS first_tok
      FROM documents ORDER BY doc_id""",
    "q44_json_funcs" -> """
      SELECT event_type,
        count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q45_null_funcs" -> """
      SELECT coalesce(nullif(c_mktsegment, 'BUILDING'), '(building)') AS seg_or_default,
        count(*) AS n,
        CAST(sum(CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_building
      FROM customer GROUP BY 1 ORDER BY seg_or_default""",
    "q46_string_agg" -> """
      SELECT substring(n_name, 1, 1) AS initial,
        count(*) AS n_nations,
        array_to_string(list_sort(list_distinct(list(r_name))), ',') AS regions
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1 ORDER BY initial""")
}
