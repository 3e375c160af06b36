package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function families (SURVEY.md §2.8).
  *
  * Siddhi analogs [unverified public-repo paths; /root/reference empty]:
  * core executors `siddhi-core executor/function/{Coalesce,Convert,
  * IfThenElse,Maximum,Minimum}FunctionExecutor.java` and the extension
  * families `siddhi-execution-{string,math,time,json,map,list,regex,
  * unitconversion}` (one ~60–150 LoC Java class per function).
  *
  * Everything maps to `org.apache.spark.sql.functions._` built-ins — fully
  * codegen'd Catalyst expressions inside WholeStageCodegen, zero UDFs. Each
  * query below exercises one family wide (many functions as columns over a
  * single scan) so the inventory row is covered by a hash-checked oracle.
  *
  * Scale notes: all are narrow (no shuffle) except the final presentation
  * orderBy required for oracle determinism; at 100 TB these run as a single
  * scan→project stage with column pruning to only the used input columns.
  */
object Functions {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** str: family — lower/upper/length/substr/trim/reverse/repeat/
    * regexp_replace/contains/concat/lpad/ascii. */
  def fnString(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      upper(substring(col("text"), 1, 10)).as("sub_upper"),
      lower(col("source")).as("src_lower"),
      length(col("text")).as("len"),
      reverse(substring(col("text"), 1, 8)).as("rev8"),
      repeat(col("lang"), 2).as("lang2"),
      trim(concat(lit(" "), col("source"), lit(" "))).as("src_trim"),
      regexp_replace(substring(col("text"), 1, 20), "a", "X").as("repl20"),
      (instr(col("text"), "spark") > 0).as("has_spark"),
      lpad(col("doc_id").cast("string"), 6, "0").as("id_pad"),
      ascii(substring(col("text"), 1, 1)).as("first_ascii")
    ).orderBy("doc_id")

  /** unitconversion: family (siddhi-execution-unitconversion) — pure
    * literal-factor arithmetic (the extension is a table of factors);
    * length/mass/duration/temperature shown, value interpreted in the
    * source unit. Bit-exact across engines (same literal ops). */
  def fnUnitConvert(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      round(col("value") * 1000, 6).as("km_to_m"),
      round(col("value") * 0.621371192, 6).as("km_to_mi"),
      round(col("value") * 1000000, 6).as("kg_to_mg"),
      round(col("value") * 2.20462262, 6).as("kg_to_lb"),
      round(col("value") * 3600000, 6).as("h_to_ms"),
      round(col("value") * 9 / 5 + 32, 6).as("c_to_f"),
      round((col("value") * 9 / 5 + 32 - 32) * 5 / 9, 6).as("f_roundtrip"))
      .orderBy("event_id")

  /** math: family — abs/ceil/floor/round/sqrt/exp/ln/log10/log2/pow/
    * signum/sin/radians + unitconversion (lit-factor arithmetic). */
  def fnMath(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      round(abs(col("value") - 100), 6).as("abs_v"),
      ceil(col("value")).as("ceil_v"),
      floor(col("value")).as("floor_v"),
      round(sqrt(abs(col("value"))), 6).as("sqrt_v"),
      round(exp(-col("value") / 100), 6).as("exp_v"),
      round(log(col("value") + 1), 6).as("ln_v"),
      round(log10(col("value") + 1), 6).as("log10_v"),
      round(log2(col("value") + 1), 6).as("log2_v"),
      round(pow(col("value") / 100, 2), 6).as("pow_v"),
      signum(col("value") - 100).as("sign_v"),
      round(sin(col("value") / 100), 6).as("sin_v"),
      round(radians(col("value")), 6).as("rad_v"),
      // unitconversion: (Siddhi unitconversion:kmTom etc.) — plain factors
      round(col("value") * 1000, 6).as("km_to_m"),
      round(col("value") * 0.001, 6).as("g_to_kg"),
      round(cbrt(col("value")), 6).as("cbrt_v"),
      round(degrees(col("value") / 100), 6).as("deg_v"),
      conv(col("event_id").cast("string"), 10, 8).as("oct_v"),
      col("value").isNaN.as("isnan_v")
    ).orderBy("event_id")

  /** time: family — date/dateFormat/year…second/isodow/dateAdd/dateDiff/
    * unix-millis extraction over the event-time column. */
  def fnTime(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      to_date(col("ts")).as("d"),
      date_format(col("ts"), "yyyy-MM-dd HH").as("fmt"),
      year(col("ts")).as("y"),
      month(col("ts")).as("mo"),
      dayofmonth(col("ts")).as("dom"),
      hour(col("ts")).as("h"),
      minute(col("ts")).as("mi"),
      second(col("ts")).as("sec"),
      (weekday(col("ts")) + 1).as("isodow"),
      date_add(to_date(col("ts")), 7).as("plus7"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .as("days_since"),
      unix_millis(col("ts")).as("ts_ms")
    ).orderBy("event_id")

  /** json: family — getString/getInt via path, typed from_json struct. */
  def fnJson(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("int").as("k_int"),
      from_json(col("props"), schema).getField("k").as("k_typed"),
      get_json_object(col("props"), "$.missing").isNull.as("missing_is_null"),
      length(col("props")).as("raw_len")
    ).orderBy("event_id")
  }

  /** ifThenElse / coalesce / default / convert / maximum / minimum /
    * instanceOf-style null checks (§2.8 core executors). */
  def fnConditional(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      when(col("value") > 100, "high")
        .when(col("value") > 50, "mid")
        .otherwise("low").as("band"),
      coalesce(nullif(col("event_type"), lit("error")), lit("was_error"))
        .as("type_or_default"),
      nullif(col("event_type"), lit("error")).isNull.as("is_err"),
      round(greatest(col("value"), lit(100.0)), 2).as("gmax"),
      round(least(col("value"), lit(100.0)), 2).as("lmin"),
      // convert/cast: double → int truncates toward zero in Spark
      expr("cast(value as int)").as("value_int"),
      col("value").cast("string").as("value_str")
    ).orderBy("event_id")

  /** regex: family — matches (rlike), group extract, extract-all count. */
  def fnRegex(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      col("text").rlike("spark\\s+\\w+\\s+join").as("matches_pat"),
      regexp_extract(col("text"), "(\\w+) join", 1).as("before_join"),
      size(expr("regexp_extract_all(text, 'join', 0)")).as("n_join"),
      regexp_extract(col("source"), "src(\\d+)", 1).cast("int").as("src_num")
    ).orderBy("doc_id")

  /** list: family — split/size/contains/distinct/sort/element_at/slice. */
  def fnArray(s: SparkSession, d: String): DataFrame = {
    val tokens = split(col("text"), " ")
    documents(s, d).select(
      col("doc_id"),
      size(tokens).as("n_tokens"),
      array_contains(tokens, "spark").as("has_spark"),
      size(array_distinct(tokens)).as("n_distinct"),
      element_at(array_sort(array_distinct(tokens)), 1).as("first_token"),
      array_join(slice(tokens, 1, 3), "_").as("first3"),
      element_at(tokens, -1).as("last_token")
    ).orderBy("doc_id")
  }

  /** map: family — create/get/containsKey/keys/size over a constructed map
    * (Siddhi map: fns operate on OBJECT attrs; here MapType is native). */
  def fnMap(s: SparkSession, d: String): DataFrame = {
    val m = map(
      lit("type"), col("event_type"),
      lit("k"), get_json_object(col("props"), "$.k"))
    events(s, d).select(
      col("event_id"),
      element_at(m, "type").as("m_type"),
      element_at(m, "k").cast("int").as("m_k"),
      map_contains_key(m, "type").as("has_type"),
      map_contains_key(m, "absent").as("has_absent"),
      size(m).as("m_size"),
      array_join(array_sort(map_keys(m)), ",").as("keys_sorted")
    ).orderBy("event_id")
  }

  /** json: mutation — setElement/removeElement/toObject via typed struct
    * rebuild (withField/dropFields), the engine's stance on JSON edits:
    * parse once, mutate the struct, only serialize at the edge. */
  def fnJsonMutate(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    events(s, d)
      .withColumn("obj", from_json(col("props"), schema)) // toObject
      .withColumn("obj2",
        col("obj").withField("k2", col("obj.k") * 2) // setElement
          .withField("tag", col("event_type")))
      .withColumn("obj3", col("obj2").dropFields("k")) // removeElement
      .select(
        col("event_id"),
        col("obj2.k").as("k"),
        col("obj2.k2").as("k2"),
        col("obj3.tag").as("tag"),
        col("obj3").getField("tag").isNotNull.as("has_tag"))
      .orderBy("event_id")
  }

  /** str: family, second batch — charAt/strcmp/hex(bin)/fillTemplate
    * (format)/translate (siddhi-execution-string remainder). */
  def fnString2(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      substring(col("text"), 3, 1).as("char_at_3"),
      when(col("lang") < col("source"), -1)
        .when(col("lang") > col("source"), 1)
        .otherwise(0).as("strcmp_ls"),
      hex(col("n_chars")).as("len_hex"),
      bin(col("n_chars")).as("len_bin"),
      format_string("%s-%d", col("source"), col("doc_id"))
        .as("filled_template"),
      translate(col("lang"), "en", "xy").as("lang_translated")
    ).orderBy("doc_id")

  /** geo: family (siddhi-execution-geo essentials) — haversine distance
    * and bounding-box membership over coordinates derived from the event
    * stream (pure trigonometric expressions, codegen'd). */
  def fnGeo(s: SparkSession, d: String): DataFrame = {
    val lat1 = (col("user_id") % 170 - 85).cast("double")
    val lon1 = (col("event_id") % 350 - 175).cast("double")
    val lat2 = lat1 + lit(1.5)
    val lon2 = lon1 + lit(2.0)
    val dist = lit(2.0) * lit(6371.0) * asin(sqrt(
      pow(sin(radians(lat2 - lat1) / 2), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) *
        pow(sin(radians(lon2 - lon1) / 2), 2)))
    events(s, d).select(
      col("event_id"),
      round(dist, 4).as("haversine_km"),
      (lat1.between(-45, 45) && lon1.between(-90, 90)).as("in_bbox"),
      // pol2Cart (core executor): r=value, theta=radians(user_id)
      round(col("value") * cos(radians(col("user_id"))), 6).as("cart_x"),
      round(col("value") * sin(radians(col("user_id"))), 6).as("cart_y")
    ).orderBy("event_id")
  }

  /** UUID()/currentTimeMillis()/eventTimestamp() — nondeterministic
    * scalars (rows-only check; no oracle can reproduce them). */
  def fnNondeterministic(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      expr("uuid()").as("event_uuid"),
      unix_millis(current_timestamp()).as("now_ms"),
      col("ts_ns").as("event_ts_ns") // eventTimestamp()
    ).orderBy("event_id")

  val queries: Map[String, Q] = Map(
    "fn_nondeterministic" -> (fnNondeterministic _),
    "fn_string2"     -> (fnString2 _),
    "fn_json_mutate" -> (fnJsonMutate _),
    "fn_geo"         -> (fnGeo _),
    "fn_string"      -> (fnString _),
    "fn_math"        -> (fnMath _),
    "fn_unitconvert" -> (fnUnitConvert _),
    "fn_time"        -> (fnTime _),
    "fn_json"        -> (fnJson _),
    "fn_conditional" -> (fnConditional _),
    "fn_regex"       -> (fnRegex _),
    "fn_array"       -> (fnArray _),
    "fn_map"         -> (fnMap _)
  )

  val oracle: Map[String, String] = Map(
    "fn_json_mutate" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k2,
        |  event_type AS tag,
        |  true AS has_tag
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_string2" ->
      """SELECT doc_id,
        |  substr(text, 3, 1) AS char_at_3,
        |  CASE WHEN lang < source THEN -1 WHEN lang > source THEN 1
        |    ELSE 0 END AS strcmp_ls,
        |  to_hex(n_chars) AS len_hex,
        |  bin(n_chars) AS len_bin,
        |  printf('%s-%d', source, doc_id) AS filled_template,
        |  translate(lang, 'en', 'xy') AS lang_translated
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_geo" ->
      """SELECT event_id,
        |  round(2.0 * 6371.0 * asin(sqrt(
        |    pow(sin(radians(1.5) / 2), 2) +
        |    cos(radians((user_id % 170 - 85)::DOUBLE)) *
        |    cos(radians((user_id % 170 - 85)::DOUBLE + 1.5)) *
        |    pow(sin(radians(2.0) / 2), 2))), 4) AS haversine_km,
        |  (user_id % 170 - 85) BETWEEN -45 AND 45
        |    AND (event_id % 350 - 175) BETWEEN -90 AND 90 AS in_bbox,
        |  round(value * cos(radians(user_id)), 6) AS cart_x,
        |  round(value * sin(radians(user_id)), 6) AS cart_y
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_string" ->
      """SELECT doc_id,
        |  upper(substr(text, 1, 10)) AS sub_upper,
        |  lower(source) AS src_lower,
        |  length(text) AS len,
        |  reverse(substr(text, 1, 8)) AS rev8,
        |  repeat(lang, 2) AS lang2,
        |  trim(' ' || source || ' ') AS src_trim,
        |  regexp_replace(substr(text, 1, 20), 'a', 'X', 'g') AS repl20,
        |  position('spark' IN text) > 0 AS has_spark,
        |  lpad(CAST(doc_id AS VARCHAR), 6, '0') AS id_pad,
        |  ascii(substr(text, 1, 1)) AS first_ascii
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_unitconvert" ->
      """SELECT event_id,
        |  round(value * 1000, 6) AS km_to_m,
        |  round(value * 0.621371192, 6) AS km_to_mi,
        |  round(value * 1000000, 6) AS kg_to_mg,
        |  round(value * 2.20462262, 6) AS kg_to_lb,
        |  round(value * 3600000, 6) AS h_to_ms,
        |  round(value * 9 / 5 + 32, 6) AS c_to_f,
        |  round((value * 9 / 5 + 32 - 32) * 5 / 9, 6) AS f_roundtrip
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_math" ->
      """SELECT event_id,
        |  round(abs(value - 100), 6) AS abs_v,
        |  CAST(ceil(value) AS BIGINT) AS ceil_v,
        |  CAST(floor(value) AS BIGINT) AS floor_v,
        |  round(sqrt(abs(value)), 6) AS sqrt_v,
        |  round(exp(-value / 100), 6) AS exp_v,
        |  round(ln(value + 1), 6) AS ln_v,
        |  round(log10(value + 1), 6) AS log10_v,
        |  round(log2(value + 1), 6) AS log2_v,
        |  round(pow(value / 100, 2), 6) AS pow_v,
        |  CAST(sign(value - 100) AS DOUBLE) AS sign_v,
        |  round(sin(value / 100), 6) AS sin_v,
        |  round(radians(value), 6) AS rad_v,
        |  round(value * 1000, 6) AS km_to_m,
        |  round(value * 0.001, 6) AS g_to_kg,
        |  round(cbrt(value), 6) AS cbrt_v,
        |  round(degrees(value / 100), 6) AS deg_v,
        |  to_base(event_id, 8) AS oct_v,
        |  isnan(value) AS isnan_v
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_time" ->
      """SELECT event_id,
        |  CAST(ts AS DATE) AS d,
        |  strftime(ts, '%Y-%m-%d %H') AS fmt,
        |  year(ts) AS y, month(ts) AS mo, dayofmonth(ts) AS dom,
        |  hour(ts) AS h, minute(ts) AS mi,
        |  CAST(floor(second(ts)) AS BIGINT) AS sec,
        |  isodow(ts) AS isodow,
        |  CAST(ts AS DATE) + 7 AS plus7,
        |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
        |  epoch_ms(ts) AS ts_ms
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
        |  json_extract_string(props, '$.missing') IS NULL AS missing_is_null,
        |  length(props) AS raw_len
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_conditional" ->
      """SELECT event_id,
        |  CASE WHEN value > 100 THEN 'high'
        |       WHEN value > 50 THEN 'mid' ELSE 'low' END AS band,
        |  coalesce(nullif(event_type, 'error'), 'was_error') AS type_or_default,
        |  nullif(event_type, 'error') IS NULL AS is_err,
        |  round(greatest(value, 100.0), 2) AS gmax,
        |  round(least(value, 100.0), 2) AS lmin,
        |  CAST(trunc(value) AS INTEGER) AS value_int,
        |  CAST(value AS VARCHAR) AS value_str
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_regex" ->
      """SELECT doc_id,
        |  regexp_matches(text, 'spark\s+\w+\s+join') AS matches_pat,
        |  coalesce(regexp_extract(text, '(\w+) join', 1), '') AS before_join,
        |  len(regexp_extract_all(text, 'join', 0)) AS n_join,
        |  CAST(regexp_extract(source, 'src(\d+)', 1) AS INTEGER) AS src_num
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |  len(str_split(text, ' ')) AS n_tokens,
        |  list_contains(str_split(text, ' '), 'spark') AS has_spark,
        |  len(list_distinct(str_split(text, ' '))) AS n_distinct,
        |  list_sort(list_distinct(str_split(text, ' ')))[1] AS first_token,
        |  array_to_string(str_split(text, ' ')[1:3], '_') AS first3,
        |  str_split(text, ' ')[-1] AS last_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        |  event_type AS m_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS m_k,
        |  true AS has_type,
        |  false AS has_absent,
        |  2 AS m_size,
        |  'k,type' AS keys_sorted
        |FROM events ORDER BY event_id""".stripMargin
  )
}
