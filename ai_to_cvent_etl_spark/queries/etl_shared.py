"""ETL pipeline operators (E1-E2): the reference system's core moves —
detect what changed between source and target, and compact an event stream
to the latest record per key before loading.

Scale notes:
  * E1 (snapshot diff) is ONE full-outer sort-merge/shuffle-hash join on the
    business key; both sides shuffle exactly once. At 100 TB, bucketing both
    snapshots on the key makes the diff shuffle-free.
  * E2 (latest-per-key) is the upsert-compaction every CDC load needs: one
    shuffle on the key; with AQE skew splitting for hot keys. At scale,
    prefer it over `dropDuplicates` (whose kept-row is partition-order
    dependent) — this form is deterministic by construction.
"""

# Shared constants/helpers split out of etl.py (r6: no
# source file over the 5k-line readability budget); query
# chunks import exactly what they reference.

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql.types import DecimalType
from ai_to_cvent_etl_spark.queries._util import dec2
from pyspark.sql import DataFrame, SparkSession

# ==== from analytics_r3c ===========================================

_PROFILE_COLS = [
    # (name, numeric-projection Spark, numeric-projection DuckDB)
    ("o_orderkey", "cast(o_orderkey as double)", "CAST(o_orderkey AS DOUBLE)"),
    ("o_custkey", "cast(o_custkey as double)", "CAST(o_custkey AS DOUBLE)"),
    ("o_totalprice", "cast(o_totalprice as double)", "CAST(o_totalprice AS DOUBLE)"),
    (
        "o_orderdate",
        "cast(datediff(cast(o_orderdate as date), date'1970-01-01') as double)",
        "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS DOUBLE)",
    ),
]

def _profile_oracle() -> str:
    branches = []
    for name, _, proj in _PROFILE_COLS:
        branches.append(
            f"""
            SELECT '{name}' AS col_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
                   MIN({proj}) AS min_v,
                   MAX({proj}) AS max_v
            FROM orders
            """
        )
    return " UNION ALL ".join(branches)

# ==== from analytics_r3f ===========================================

_COMPACT_TARGET = 3000  # rows per output file

# ==== from analytics_r3g ===========================================

_Z_BITS = 10          # 10 bits per dimension

_Z_FILE_SPAN = 4096   # Morton values per planned file

def _morton_expr(x: str, y: str, shift_fn) -> str:
    """Interleave the low _Z_BITS bits of x (odd positions) and y (even):
    classic Morton code as a pure shift/mask/add expression."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(shift_fn(f"(({x} >> {i}) & 1)", 2 * i + 1))
        terms.append(shift_fn(f"(({y} >> {i}) & 1)", 2 * i))
    return " + ".join(terms)

_X_SPARK = "cast(o_custkey % 1024 as bigint)"

_Y_SPARK = "cast(floor(o_totalprice / 1000) as bigint) % 1024"

_X_DUCK = "CAST(o_custkey % 1024 AS BIGINT)"

_Y_DUCK = "CAST(floor(o_totalprice / 1000) AS BIGINT) % 1024"

# ==== from analytics_r3k ===========================================

_MERGE_ORACLE = """
    WITH changes AS (
        SELECT o_orderkey AS key,
               CASE WHEN o_orderkey % 13 = 0 THEN 'U'
                    WHEN o_orderkey % 13 = 5 THEN 'D'
                    ELSE 'I' END AS op,
               o_orderkey + 100000000 AS new_key,
               o_totalprice + 10.0 AS new_price
        FROM orders
        WHERE o_orderkey % 13 IN (0, 5, 7)
    ),
    kept AS (
        SELECT t.o_orderkey,
               CASE WHEN c.op = 'U' THEN 'P' ELSE t.o_orderstatus END
                   AS o_orderstatus,
               CASE WHEN c.op = 'U' THEN c.new_price
                    ELSE t.o_totalprice END AS o_totalprice
        FROM orders t
        LEFT JOIN changes c ON c.key = t.o_orderkey AND c.op IN ('U', 'D')
        WHERE c.op IS NULL OR c.op <> 'D'
    ),
    merged AS (
        SELECT * FROM kept
        UNION ALL
        SELECT new_key, 'N', new_price FROM changes WHERE op = 'I'
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM merged
    GROUP BY o_orderstatus
"""

_K_ANON = 5

_KANON_ORACLE = f"""
    WITH grp AS (
        SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM customer GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(group_size) AS BIGINT) AS n FROM grp)
    SELECT g.nationkey, g.segment, g.group_size,
           CASE WHEN g.group_size < {_K_ANON} THEN 1 ELSE 0 END
               AS violates_k,
           1.0 / CAST(g.group_size AS DOUBLE) AS reid_risk,
           CAST(g.group_size AS DOUBLE) / CAST(t.n AS DOUBLE) AS share
    FROM grp g CROSS JOIN tot t
"""

# ==== from analytics_r3n ===========================================

_MERKLE_BUCKETS = 256

# ==== from analytics_r3r ===========================================

_H48_SPARK_DOC = (
    "cast(conv(substr(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint)"
)

_H48_DUCK_DOC = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)"
)

# ==== from analytics_r3w ===========================================

_WM_DELAY_US = 120_000_000   # 2-minute watermark

_WIN_US = 60_000_000         # 1-minute tumbling windows

# ==== from analytics_r4b ===========================================

_POLICY = [
    # (nationkey, allowed market segment)
    (0, "BUILDING"), (0, "MACHINERY"),
    (1, "AUTOMOBILE"),
    (2, "HOUSEHOLD"), (2, "FURNITURE"), (2, "BUILDING"),
    (3, "MACHINERY"),
]

# ==== from analytics_r4e ===========================================

_SHARD_BYTES = 20_000

# ==== from analytics_r4m ===========================================

_TTL_POLICY = [
    # (event_type, ttl_days) — retention policy as data
    ("view", 365),
    ("click", 548),
    ("error", 90),
    ("signup", 1825),
    ("purchase", 1825),
]

_AS_OF = "2001-06-01"

# ==== from analytics_r4p ===========================================

_KEEP_N = 3

# ==== forty-eighth wave (r4) ==================================================

_IPF_ROUNDS = 3

def _ipf_oracle() -> str:
    """Generate the IPF CTE chain; every marginal sum is quantized to
    exact micro-unit BIGINTs (TS21 device) so the cross-cell float sum
    is order-free on both engines."""
    ctes = [
        """c0 AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
                   1.0 AS w,
                   CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS nn
            FROM documents GROUP BY lang, source
        )"""
    ]
    prev = "c0"
    for r in range(_IPF_ROUNDS):
        ctes.append(
            f"""r{r} AS (
            SELECT lang, source, n, nn,
                   w * ((nn / 5.0) /
                        (SUM(CAST(FLOOR(w * n * 1e6) AS BIGINT))
                             OVER (PARTITION BY lang) / 1e6)) AS w
            FROM {prev}
        )"""
        )
        ctes.append(
            f"""s{r} AS (
            SELECT lang, source, n, nn,
                   w * ((nn / 20.0) /
                        (SUM(CAST(FLOOR(w * n * 1e6) AS BIGINT))
                             OVER (PARTITION BY source) / 1e6)) AS w
            FROM r{r}
        )"""
        )
        prev = f"s{r}"
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + f"""
        SELECT lang, source, n AS n_docs,
               ROUND(w, 6) AS weight,
               ROUND(w * n / nn, 6) AS weighted_share
        FROM {prev}"""
    )

_LDIV_L = 3  # required distinct sensitive values per equivalence class

_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("events", "user_id", "event_type"),
    ("customer", "c_nationkey", "c_mktsegment"),
)

_VOL_Z_MAX = 3.0       # robust-z beyond which a day's volume is anomalous

_MAD_SCALE = 1.4826    # MAD -> sigma under normality

_PK_CANDIDATES = (
    ("orders", "o_orderkey", None),
    ("orders", "o_custkey", None),
    ("lineitem", "l_orderkey", "l_linenumber"),
    ("lineitem", "l_orderkey", None),
    ("events", "event_id", None),
    ("customer", "c_custkey", None),
)

_BYTE_BUDGET = 3000   # chars per source stratum

_RANGE_BINS = 8

_KFOLD_K = 5

_BUCKET_TARGET_ROWS = 40000   # rows per bucket file target

# --- E46: t-closeness audit (privacy trio completion) -----------------------

_TCL_T = 0.35  # flag threshold: groups whose sensitive distribution is

# ---------------------------------------------------------------------------
# Wave 114 (r5): training-mix arithmetic — temperature resampling, epoch
# mixture solving, quality-gate funnel.
# ---------------------------------------------------------------------------

_TEMP_ALPHA = 0.3

_EPOCH_BUDGET_CHARS = 1_000_000

_EPOCH_WEIGHTS = (
    ("en", "0.40"), ("zh", "0.20"), ("de", "0.15"),
    ("fr", "0.15"), ("es", "0.10"),
)

_FUNNEL_STAGES = (
    ("s0_all", "TRUE"),
    ("s1_min_len", "n_chars >= 100"),
    ("s2_max_len", "n_chars >= 100 AND n_chars <= 500"),
    ("s3_lang", "n_chars >= 100 AND n_chars <= 500 AND lang <> 'zh'"),
    (
        "s4_content",
        "n_chars >= 100 AND n_chars <= 500 AND lang <> 'zh' "
        "AND text LIKE '%spark%'",
    ),
)

_RESERVOIR_K = 5

_FH_BUCKETS = 64

# ==== wave 137a: zone-map data-skipping audit ======================

_ZM_SHARD_DOCS = 50

_ZM_PREDS = [
    (1, 0, 200),
    (2, 200, 400),
    (3, 400, 800),
    (4, 800, 1600),
    (5, 0, 10**9),
]

# ==== wave 142b: columnar encoding advisor =========================

_ENC_COLS = ["l_partkey", "l_quantity", "l_returnflag", "l_tax"]

def _enc_surrogate_duck(c: str) -> str:
    if c == "l_returnflag":
        return "CAST(ascii(l_returnflag) AS BIGINT)"
    if c == "l_tax":
        return "CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)"
    return f"CAST({c} AS BIGINT)"

# ==== wave 150: end-to-end curation pipeline (marquee composite) ===

_CUR_LANGS = ("en", "de", "fr")

_CUR_MIN_CHARS = 60

_CUR_MIN_TOKENS = 8

_CUR_SHARD_BYTES = 20_000

# ==== wave 154b: shard-rebalance audit (mod vs ring) ===============

_RB_FROM = 8

_RB_TO = 10

_RB_VNODES = 64

def _ring_assign_duck(nshards: int, key: str) -> str:
    # virtual-node consistent hashing: the shard owning the vnode with
    # the smallest hash >= key-hash (wrap to global min).
    return f"""(
        SELECT v.shard FROM (
            SELECT CAST(s.range AS BIGINT) % {nshards} AS shard,
                   hash(CAST(s.range AS BIGINT)) AS vh
            FROM range({nshards} * {_RB_VNODES // 8}) s
        ) v
        WHERE v.vh >= hash({key})
        ORDER BY v.vh, v.shard LIMIT 1
    )"""

# ==== wave 157b: right-to-erasure impact analysis ==================

_ERASE_MOD = 50  # hash-sampled ~2% of customers

# ==== wave 161b: SLO error-budget burn =============================

_SLO_TARGET_Q4 = 9900  # 99.00% availability, in basis points

# ==== wave 178b: join-strategy advisor (E50) ========================

# (dim table, string columns, fixed numeric bytes/row) — widths follow
# Spark's in-memory estimates: int 4, bigint/double 8, plus 4 bytes of
# offset overhead per string. Facts only need row counts.
_JSA_DIMS = {
    "region": (["r_name"], 4),
    "nation": (["n_name"], 8),
    "customer": (["c_name", "c_mktsegment"], 20),
    "supplier": (["s_name"], 20),
    "part": (["p_name", "p_brand", "p_type"], 20),
}

_JSA_RELS = [
    ("lineitem", "part"),
    ("lineitem", "supplier"),
    ("orders", "customer"),
    ("customer", "nation"),
    ("supplier", "nation"),
    ("nation", "region"),
]

_JSA_BROADCAST_BYTES = 10 * 1024 * 1024   # spark.sql.autoBroadcastJoinThreshold

_JSA_HASH_RATIO = 16                      # build side must be 16x smaller

def _jsa_dim_sql(table: str) -> str:
    cols, fixed = _JSA_DIMS[table]
    lens = " + ".join(f"SUM(length({c}))" for c in cols)
    n_str = len(cols)
    return (
        f"SELECT '{table}' AS tname, CAST(COUNT(*) AS BIGINT) AS rows_,"
        f" CAST(({fixed} + {4 * n_str}) * COUNT(*) + {lens} AS BIGINT)"
        f" AS est_bytes FROM {table}"
    )

# ==== wave 186b: partition-grain evolution plan (E51) ===============

_PGE_GRAINS = ["day", "week", "month"]

def _pge_sql(grain: str) -> str:
    return f"""
        SELECT '{grain}' AS grain,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(r) AS BIGINT) AS total_rows,
               CAST(MAX(r) AS BIGINT) AS max_part_rows,
               CAST(SUM(CASE WHEN 4 * r * (SELECT COUNT(*) FROM g_{grain})
                                  < (SELECT SUM(r) FROM g_{grain})
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
               CASE
                 WHEN MAX(r) * COUNT(*) > 10 * SUM(r) THEN 'skewed'
                 WHEN 2 * SUM(CASE WHEN 4 * r * (SELECT COUNT(*)
                                       FROM g_{grain})
                                  < (SELECT SUM(r) FROM g_{grain})
                              THEN 1 ELSE 0 END) > COUNT(*)
                     THEN 'too_fine'
                 ELSE 'ok'
               END AS verdict
        FROM g_{grain}"""

# ==== wave 202a: watermark completeness curve (E55) =================

_WM_DELAYS_MIN = [15, 60, 360]   # candidate watermark delays (minutes)

# ==== wave 206a: storage tiering plan (E56) =========================

# $/GiB-month literals (S3 Standard / IA / Glacier-Instant shaped)
_TIER_RATES = {"hot": 0.023, "warm": 0.0125, "cold": 0.004}
