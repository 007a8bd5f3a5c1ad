"""The SEC star build itself as a driver-checked query.

``q_fact_star_shape`` (relational.py) proves the fact PLAN SHAPE on
TPC-H tables; this module drives the ACTUAL pipeline — ``staging →
dimensions → build_fact`` (reference:
Airflow/masterfindata/models/Facts/fct_balanceSheet.sql) — end-to-end
under the driver's oracle gate. The raw SUB/TAG/NUM/PRE inputs are
synthesized deterministically from the driver's parquet tables
(supplier → filings, region → taxonomy tags, lineitem → numeric facts)
with pure Column expressions, so the DuckDB oracle replays the exact
same derivation plus the dbt-verbatim model SQL and hash-matches.

The synthesis deliberately exercises the pipeline's edge paths: null
address fields (staging COALESCE defaults), a null tlabel/doc (dim
coalesces), and the reference's (stmt, filed)-join fan-out wart in
``build_fact`` (kept for parity — see operators/facts.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import facts as FCT
from .common import require_sql_surgery, table

SEC_QUERIES: dict[str, object] = {}
SEC_ORACLES: dict[str, str] = {}

SENT = "_dbt_utils_surrogate_key_null_"


def synth_sec_raw(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Deterministic (sub, tag, num, pre) from supplier/region/lineitem."""
    supplier = table(spark, sf_dir, "supplier")
    region = table(spark, sf_dir, "region")
    lineitem = table(spark, sf_dir, "lineitem")

    sk = F.col("s_suppkey")
    sub = supplier.select(
        F.concat(F.lit("A-"), sk.cast("string")).alias("adsh"),
        sk.cast("long").alias("cik"),
        F.col("s_name").alias("name"),
        F.when(sk % 7 == 0, F.lit(None)).otherwise(F.lit("US")).alias("countryba"),
        F.lit("CA").alias("stprba"),
        F.lit("City").alias("cityba"),
        (F.lit(94000) + sk % 100).cast("string").alias("zipba"),
        F.concat(F.lit("Addr-"), F.col("s_nationkey").cast("string")).alias("bas1"),
        F.when(sk % 3 == 0, F.lit(None)).otherwise(F.lit("Suite 1")).alias("bas2"),
        F.lit(None).cast("string").alias("baph"),
        F.date_add(F.lit("2024-01-01").cast("date"), (sk % 60).cast("int")).alias(
            "filed"
        ),
        F.lit(None).cast("timestamp_ntz").alias("accepted"),
        F.concat(F.col("s_name"), F.lit("-2024q1.xml")).alias("instance"),
        # json_transform inputs (stg_financial_data): period NULL every
        # 5th filing exercises the handle_null_dates macro path
        F.when(sk % 5 == 0, F.lit(None))
        .otherwise(F.date_add(F.lit("2023-12-31").cast("date"), (sk % 4).cast("int")))
        .alias("period"),
        (F.lit(2023) + sk % 2).cast("int").alias("fy"),
        F.when(sk % 2 == 0, F.lit("Q1")).otherwise(F.lit("FY")).alias("fp"),
        (F.lit(3571) + sk % 10).cast("int").alias("sic"),
    )

    rk = F.col("r_regionkey")
    tag = region.select(
        F.concat(F.lit("T"), rk.cast("string")).alias("tag"),
        F.lit("v2024").alias("version"),
        F.when(rk == 0, F.lit(None))
        .otherwise(F.concat(F.lit("label "), F.col("r_name")))
        .alias("tlabel"),
        F.when(rk == 4, F.lit(None))
        .otherwise(F.concat(F.lit("doc "), F.col("r_name")))
        .alias("doc"),
    )

    num = lineitem.select(
        F.concat(F.lit("A-"), F.col("l_suppkey").cast("string")).alias("adsh"),
        F.concat(F.lit("T"), (F.col("l_partkey") % 5).cast("string")).alias("tag"),
        F.lit("v2024").alias("version"),
        F.col("l_shipdate").cast("date").alias("ddate"),
        (F.col("l_linenumber") % 4).cast("int").alias("qtrs"),
        F.lit("USD").alias("uom"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("value"),
        F.lit(None).cast("string").alias("footnote"),
    )

    pre = (
        num.select("adsh", "tag")
        .distinct()
        .select(
            "adsh",
            F.when(F.col("tag").isin("T0", "T1"), "BS")
            .when(F.col("tag").isin("T2", "T3"), "IS")
            .otherwise("CF")
            .alias("stmt"),
            "tag",
            F.lit("v2024").alias("version"),
            F.concat(F.lit("p-"), F.col("tag")).alias("plabel"),
        )
    )
    return sub, tag, num, pre


# DuckDB replay: the same synthesis + the dbt models verbatim
# (stg_* / dim_* SQL identical to tests/test_sec_pipeline.py's golden
# oracle, which transcribes the reference's model SQL; dim_filings uses
# the proven-identical distinct-pushdown form to keep the oracle fast).
_SEC_FACT_BS_SQL = f"""
WITH sub AS (
  SELECT 'A-' || CAST(s_suppkey AS VARCHAR) AS adsh,
         CAST(s_suppkey AS BIGINT) AS cik,
         s_name AS name,
         CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE 'US' END AS countryba,
         'CA' AS stprba, 'City' AS cityba,
         CAST(94000 + s_suppkey % 100 AS VARCHAR) AS zipba,
         'Addr-' || CAST(s_nationkey AS VARCHAR) AS bas1,
         CASE WHEN s_suppkey % 3 = 0 THEN NULL ELSE 'Suite 1' END AS bas2,
         DATE '2024-01-01' + CAST(s_suppkey % 60 AS INTEGER) AS filed,
         s_name || '-2024q1.xml' AS instance
  FROM supplier
),
tagt AS (
  SELECT 'T' || CAST(r_regionkey AS VARCHAR) AS tag, 'v2024' AS version,
         CASE WHEN r_regionkey = 4 THEN NULL ELSE 'doc ' || r_name END AS doc
  FROM region
),
num AS (
  SELECT 'A-' || CAST(l_suppkey AS VARCHAR) AS adsh,
         'T' || CAST(l_partkey % 5 AS VARCHAR) AS tag,
         'v2024' AS version, 'USD' AS uom,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS value
  FROM lineitem
),
pre AS (
  SELECT DISTINCT adsh,
         CASE WHEN tag IN ('T0','T1') THEN 'BS'
              WHEN tag IN ('T2','T3') THEN 'IS' ELSE 'CF' END AS stmt,
         tag, 'v2024' AS version
  FROM num
),
stg_sub AS (
  SELECT adsh, cik, name, filed, instance,
         COALESCE(countryba,'Unknown') AS countryba,
         COALESCE(stprba,'Unknown') AS stprba,
         COALESCE(zipba,'Unknown') AS zipba,
         COALESCE(bas1,'Unknown') AS bas1,
         COALESCE(bas2,'Does not exist or Unknown') AS bas2
  FROM sub
),
stg_num AS (
  SELECT adsh, tag, version, uom, value, version || '-' || tag AS version_tag
  FROM num
),
stg_tag AS (
  SELECT tag, version, doc, version || '-' || tag AS version_tag FROM tagt
),
stg_pre AS (
  SELECT adsh, stmt, tag, version, version || '-' || tag AS version_tag FROM pre
),
dim_address AS (
  SELECT MD5(CONCAT_WS('-',
          COALESCE(CAST(bas1 AS VARCHAR),'{SENT}'),
          COALESCE(CAST(bas2 AS VARCHAR),'{SENT}'),
          COALESCE(CAST(stprba AS VARCHAR),'{SENT}'),
          COALESCE(CAST(countryba AS VARCHAR),'{SENT}'),
          COALESCE(CAST(zipba AS VARCHAR),'{SENT}'))) AS comp_address_sk,
         name AS company_name
  FROM stg_sub
),
dim_company AS (
  SELECT DISTINCT
         MD5(CONCAT_WS('-',
          COALESCE(CAST(s.cik AS VARCHAR),'{SENT}'),
          COALESCE(CAST(a.company_name AS VARCHAR),'{SENT}'))) AS company_sk,
         s.cik, a.company_name
  FROM dim_address a JOIN stg_sub s ON a.company_name = s.name
),
dim_filings AS (
  SELECT DISTINCT
         MD5(CONCAT_WS('-',
          COALESCE(CAST(t.tag AS VARCHAR),'{SENT}'),
          COALESCE(CAST(t.version AS VARCHAR),'{SENT}'),
          COALESCE(CAST(p.stmt AS VARCHAR),'{SENT}'),
          COALESCE(CAST(n.uom AS VARCHAR),'{SENT}'),
          COALESCE(CAST(s.filed AS VARCHAR),'{SENT}'))) AS filings_sk,
         t.tag, t.version, p.stmt AS statement_type,
         s.filed AS filed_date, n.uom AS unit_of_measure
  FROM (SELECT DISTINCT version_tag, stmt, adsh FROM stg_pre) p
  JOIN (SELECT DISTINCT version_tag, tag, version FROM stg_tag) t
       ON p.version_tag = t.version_tag
  JOIN (SELECT DISTINCT version_tag, uom FROM stg_num) n
       ON n.version_tag = t.version_tag
  JOIN (SELECT DISTINCT adsh, filed FROM stg_sub) s ON s.adsh = p.adsh
),
spine AS (
  SELECT n.value, s.cik, s.filed AS filed_date, p.stmt
  FROM stg_num n
  JOIN stg_pre p ON n.adsh = p.adsh AND n.tag = p.tag
  JOIN stg_sub s ON n.adsh = s.adsh
  WHERE p.stmt = 'BS'
),
key_data AS (
  SELECT spine.value, dc.company_sk, df.filings_sk
  FROM spine
  LEFT JOIN dim_company dc ON spine.cik = dc.cik
  LEFT JOIN dim_filings df ON spine.stmt = df.statement_type
                          AND spine.filed_date = df.filed_date
  WHERE dc.company_sk IS NOT NULL AND df.filings_sk IS NOT NULL
)
SELECT CAST(ROUND(SUM(k.value), 2) AS DOUBLE) AS fct_value,
       dc.company_name,
       CAST(df.filed_date AS VARCHAR) AS filed_date,
       df.statement_type, df.tag, df.unit_of_measure, df.version
FROM key_data k
JOIN dim_company dc ON k.company_sk = dc.company_sk
JOIN dim_filings df ON k.filings_sk = df.filings_sk
GROUP BY dc.company_name, df.filed_date, df.statement_type, df.tag,
         df.unit_of_measure, df.version
"""


def q_sec_fact_bs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sub, tag, num, pre = synth_sec_raw(spark, sf_dir)
    inputs = FCT.build_fact_inputs(spark, sub, tag, num, pre, cache=True)
    fact = FCT.build_fact(inputs, "BS")
    return fact.select(
        F.col("fct_value").cast("double").alias("fct_value"),
        "company_name",
        F.col("filed_date").cast("string").alias("filed_date"),
        "statement_type",
        "tag",
        "unit_of_measure",
        "version",
    )


SEC_QUERIES["q_sec_fact_bs"] = q_sec_fact_bs
SEC_ORACLES["q_sec_fact_bs"] = _SEC_FACT_BS_SQL


# ---------------------------------------------------------------------------
# The reference's SECOND dbt project as a driver query:
# stg_financial_data → financial_statements_json (reference:
# Airflow/json_transform/models/staging/stg_financial_data.sql:1-67,
# models/json/financial_statements_json.sql:6-25). The nested per-filing
# document is exploded back to one row per financial_data entry WITH its
# array position, so the oracle checks the deterministic array order too:
# Spark's array_sort compares struct fields NULLS FIRST, hence the
# explicit NULLS FIRST on every ROW_NUMBER sort key below.
# ---------------------------------------------------------------------------
# Per-filing fact cap (VERDICT r8 #2): real SEC filings carry at most a
# few thousand facts, so 8000 is a no-op at every realistic scale
# (sf0.001–sf1 max out at 6000 facts/filing) — it exists so the
# UNREALISTIC synthetic sf10 replication (60k facts fanned into a fixed
# 1000 filings) can't build ~12 MB collect_list buffers and kill the
# executor. Applied identically on both engines: Spark filters with a
# row_number window BEFORE the groupBy (json_doc.financial_statements_json
# max_facts_per_doc), the oracle with QUALIFY over the same entry order,
# so the kept set is the sorted array's prefix on both sides.
MAX_FACTS_PER_DOC = 8000

_ENTRY_ORDER = ", ".join(
    f"{c} NULLS FIRST"
    for c in (
        "tag",
        "tag_label",
        "tag_description",
        "numeric_value",
        "unit_of_measure",
        "period_end_date",
        "quarters_duration",
        "statement_type",
        "presentation_label",
    )
)

_SEC_JSON_DOC_SQL = f"""
WITH sub AS (
  SELECT 'A-' || CAST(s_suppkey AS VARCHAR) AS adsh,
         CAST(s_suppkey AS BIGINT) AS cik,
         s_name AS name,
         DATE '2024-01-01' + CAST(s_suppkey % 60 AS INTEGER) AS filed,
         CAST(2023 + s_suppkey % 2 AS INTEGER) AS fy,
         CASE WHEN s_suppkey % 2 = 0 THEN 'Q1' ELSE 'FY' END AS fp,
         CAST(3571 + s_suppkey % 10 AS INTEGER) AS sic
  FROM supplier
),
tagt AS (
  SELECT 'T' || CAST(r_regionkey AS VARCHAR) AS tag, 'v2024' AS version,
         CASE WHEN r_regionkey = 0 THEN NULL ELSE 'label ' || r_name END AS tlabel,
         CASE WHEN r_regionkey = 4 THEN NULL ELSE 'doc ' || r_name END AS doc
  FROM region
),
num AS (
  SELECT 'A-' || CAST(l_suppkey AS VARCHAR) AS adsh,
         'T' || CAST(l_partkey % 5 AS VARCHAR) AS tag,
         'v2024' AS version,
         CAST(l_shipdate AS DATE) AS ddate,
         CAST(l_linenumber % 4 AS INTEGER) AS qtrs,
         'USD' AS uom,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS value
  FROM lineitem
),
pre AS (
  SELECT DISTINCT adsh,
         CASE WHEN tag IN ('T0','T1') THEN 'BS'
              WHEN tag IN ('T2','T3') THEN 'IS' ELSE 'CF' END AS stmt,
         tag, 'v2024' AS version, 'p-' || tag AS plabel
  FROM num
),
staged AS (
  SELECT s.adsh, s.cik, s.filed AS filing_date, s.fy AS fiscal_year,
         s.fp AS fiscal_period, s.name AS company_name, s.sic,
         n.tag, n.ddate AS period_end_date, n.qtrs AS quarters_duration,
         n.uom AS unit_of_measure, n.value AS numeric_value,
         t.tlabel AS tag_label, t.doc AS tag_description,
         p.stmt AS statement_type, p.plabel AS presentation_label
  FROM sub s
  LEFT JOIN num n ON s.adsh = n.adsh
  LEFT JOIN tagt t ON n.tag = t.tag AND n.version = t.version
  LEFT JOIN pre p ON n.adsh = p.adsh AND n.tag = p.tag
)
SELECT adsh AS filing_id, company_name,
       CAST(cik AS BIGINT) AS cik, CAST(sic AS BIGINT) AS sic,
       CAST(filing_date AS VARCHAR) AS filing_date,
       CAST(fiscal_year AS BIGINT) AS fiscal_year, fiscal_period,
       CAST(ROW_NUMBER() OVER (PARTITION BY adsh ORDER BY {_ENTRY_ORDER}) - 1
            AS BIGINT) AS entry_idx,
       -- MAX_FACTS_PER_DOC cap, same prefix-of-sorted-order as Spark's
       -- pre-groupBy row_number filter
       tag, tag_label, tag_description,
       CAST(numeric_value AS DOUBLE) AS value, unit_of_measure,
       CAST(period_end_date AS VARCHAR) AS period_end_date,
       CAST(quarters_duration AS BIGINT) AS quarters_duration,
       statement_type, presentation_label
FROM staged
QUALIFY ROW_NUMBER() OVER (PARTITION BY adsh ORDER BY {_ENTRY_ORDER})
        <= {MAX_FACTS_PER_DOC}
"""


def _sec_json_doc_build(
    spark: SparkSession, sf_dir: str, filing_sample: bool = False
) -> DataFrame:
    from ..operators import json_doc as JD

    sub, tag, num, pre = synth_sec_raw(spark, sf_dir)
    if filing_sample:
        sub = sub.where(
            F.substring(F.md5(F.col("adsh")), 1, 1).isin("0", "1", "2", "3")
        )
    staged = JD.stg_financial_data(sub, num, tag, pre)
    # Fused nest-then-explode (r11): this query's output is
    # financial_statements_json(...) POSEXPLODED straight back to rows,
    # so the collect_list aggregate, the array_sort and the generate are
    # a round-trip the plan can skip. Equivalence: the operator caps each
    # filing to the first MAX_FACTS_PER_DOC entries by row_number over
    # ``entry.asc()`` and array_sort uses the SAME struct comparator, so
    # posexplode's (entry_idx, e) is exactly (__rn - 1, entry) over the
    # kept rows — tied (= field-identical) structs occupy the same index
    # range either way, and identical rows are interchangeable within it.
    # Verified bit-identical on the full sf0.1 output (600k rows) and by
    # the DuckDB oracle hash; interleaved A/B: ~2x (the aggregate's
    # buffers and the dim-9-struct arrays drop out of the plan).
    # The cap/comparator is JD.capped_staged — the SAME definition
    # financial_statements_json itself uses (ADVICE r11: the previous
    # hand-copy of the entry struct and window here could silently
    # drift from the operator).
    capped = JD.capped_staged(staged, MAX_FACTS_PER_DOC)
    return capped.select(
        F.col("adsh").alias("filing_id"),
        F.col("company_name"),
        F.col("cik").cast("long").alias("cik"),
        F.col("sic").cast("long").alias("sic"),
        F.col("filing_date").cast("string").alias("filing_date"),
        F.col("fiscal_year").cast("long").alias("fiscal_year"),
        "fiscal_period",
        (F.col("__rn") - 1).cast("long").alias("entry_idx"),
        F.col("tag"),
        F.col("tag_label"),
        F.col("tag_description"),
        F.col("numeric_value").cast("double").alias("value"),
        F.col("unit_of_measure"),
        F.col("period_end_date").cast("string").alias("period_end_date"),
        F.col("quarters_duration").cast("long").alias("quarters_duration"),
        F.col("statement_type"),
        F.col("presentation_label"),
    )


def q_sec_json_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full per-filing JSON-document build (reference dbt project 2).

    sf10 harness bound: the engine side is verified at sf10 (8M rows,
    ~2 min with the MAX_FACTS_PER_DOC cap), but the ORACLE — a
    ROW_NUMBER window over the full 60M-row wide staged join — exceeds
    the DuckDB pool this box allows (16 GB OOM; larger caps hit the
    vm.max_map_count wall first, NOTES_r6 §13). The full query stays
    the contract at sf0.001–sf1 (hash-matched); sf10-scale cross-engine
    coverage is carried by q_sec_json_doc_sampled below."""
    return _sec_json_doc_build(spark, sf_dir)


def q_sec_json_doc_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sf10-scale verification arm of q_sec_json_doc: restrict to a
    deterministic md5 1/4 stratum of FILINGS (wide enough that even the 10-filing sf0.001 fixture keeps rows) (sub-side filter; the
    left joins preserve per-filing content exactly), so the oracle's
    window input is bounded while every stage — staging joins, null
    handling, the per-filing cap, deterministic array order, posexplode
    — is cross-engine hash-checked on the stratum."""
    return _sec_json_doc_build(spark, sf_dir, filing_sample=True)


_SEC_JSON_DOC_SAMPLED_SQL = _SEC_JSON_DOC_SQL.replace(
    "LEFT JOIN pre p ON n.adsh = p.adsh AND n.tag = p.tag\n)",
    "LEFT JOIN pre p ON n.adsh = p.adsh AND n.tag = p.tag\n"
    "  WHERE SUBSTR(MD5(s.adsh), 1, 1) IN ('0', '1', '2', '3')\n)",
)
_SEC_JSON_DOC_SAMPLED_SQL = require_sql_surgery(
    _SEC_JSON_DOC_SAMPLED_SQL, _SEC_JSON_DOC_SQL, "q_sec_json_doc_sampled",
    "SUBSTR(MD5(s.adsh), 1, 1) IN ('0', '1', '2', '3')",
)

SEC_QUERIES["q_sec_json_doc"] = q_sec_json_doc
SEC_ORACLES["q_sec_json_doc"] = _SEC_JSON_DOC_SQL
SEC_QUERIES["q_sec_json_doc_sampled"] = q_sec_json_doc_sampled
SEC_ORACLES["q_sec_json_doc_sampled"] = _SEC_JSON_DOC_SAMPLED_SQL
