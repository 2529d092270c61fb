"""SURVEY §2.4 — aggregations (A1-A11).

Determinism strategy: money aggregates go through tight DECIMAL casts —
DECIMAL(12,2) for money, DECIMAL(4,2) for 2dp fractions — so products stay
well inside 38 digits of precision on BOTH engines (their decimal-widening
rules differ once a product overflows 38). Exact decimal sums are cast back
to DOUBLE for hash-stable output. Catalyst plans these as partial+final hash
aggregates (map-side combine), which is the shape that scales: the shuffle
carries one row per group per partition, not the fact table.
"""

# Shared constants/helpers split out of aggregates.py (r6: no
# source file over the 5k-line readability budget); query
# chunks import exactly what they reference.

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from ai_to_cvent_etl_spark.io import load_table, table_path
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window
from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import dec2
from ai_to_cvent_etl_spark.queries._util import ORACLE_MONEY_SUM
from ai_to_cvent_etl_spark.queries._util import ORACLE_DISC_PRICE, disc_price

def _money(c):  # exact for 2dp money columns (probed in FIXTURES.md)
    return c.cast(DecimalType(12, 2))

def _frac(c):  # exact for 2dp fractions like discount/tax
    return c.cast(DecimalType(4, 2))

_ENTROPY_TYPES = ["click", "error", "purchase", "signup", "view"]

def _entropy_expr_spark() -> str:
    # fixed left-to-right sum over the 5 known types => deterministic fold
    terms = " + ".join(
        f"(case when n_{t} = 0 then 0.0D else "
        f"-(cast(n_{t} as double) / n_total)"
        f" * log2(cast(n_{t} as double) / n_total) end)"
        for t in _ENTROPY_TYPES
    )
    return f"round({terms}, 4)"

def _entropy_expr_duck() -> str:
    terms = " + ".join(
        f"(CASE WHEN n_{t} = 0 THEN 0.0 ELSE "
        f"-(CAST(n_{t} AS DOUBLE) / n_total)"
        f" * log2(CAST(n_{t} AS DOUBLE) / n_total) END)"
        for t in _ENTROPY_TYPES
    )
    return f"ROUND({terms}, 4)"

# ==== from analytics_r3c ===========================================

_BASKET_MIN_CO = 10  # min co-occurrence count to report a pair

# ==== from analytics_r3f ===========================================

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

# exact cent integers: decimal-cast FIRST (2dp doubles can round a hair
# under the true cent value, so floor(x*100) on the raw double is wrong)
_Q_SPARK = "cast(cast({c} as decimal(18,2)) * 100 as bigint)"

_Q_DUCK = "CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT)"

def _corr_oracle() -> str:
    cols = _CORR_COLS
    qs = ", ".join(
        f"{_Q_DUCK.format(c=c)} AS q{i}" for i, c in enumerate(cols)
    )
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i in range(len(cols)):
        moments.append(f"CAST(SUM(q{i}) AS BIGINT) AS s{i}")
        for j in range(i, len(cols)):
            # DECIMAL(38,0), not HUGEINT: DuckDB aggregates SUM(HUGEINT)
            # in DOUBLE (order-dependent); SUM(DECIMAL(38,0)) stays exact.
            # The exact sum exceeds 2^53, and DuckDB's hugeint->double cast
            # is NOT correctly rounded (two-limb arithmetic) while Spark's
            # BigDecimal.doubleValue is — so both engines rebuild the
            # double from exact 32-bit halves with the IDENTICAL two-step
            # expression (hi*2^32 + lo: one rounding each, same sequence).
            pd = f"SUM(CAST(q{i} * q{j} AS DECIMAL(38,0)))"
            moments.append(
                f"CAST(CAST({pd} AS HUGEINT) // 4294967296 AS DOUBLE)"
                f" * 4294967296.0"
                f" + CAST(CAST({pd} AS HUGEINT) % 4294967296 AS DOUBLE)"
                f" AS p{i}{j}"
            )
    pair_rows = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            expr = (
                f"(CAST(n AS DOUBLE) * p{i}{j}"
                f" - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
                f" / (sqrt(CAST(n AS DOUBLE) * p{i}{i}"
                f"          - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
                f"    * sqrt(CAST(n AS DOUBLE) * p{j}{j}"
                f"           - CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE)))"
            )
            pair_rows.append(
                f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b, n,"
                f" {expr} AS pearson_r FROM m"
            )
    return (
        f"WITH q AS (SELECT {qs} FROM lineitem),"
        f" m AS MATERIALIZED (SELECT {', '.join(moments)} FROM q) "
        + " UNION ALL ".join(pair_rows)
    )

_KS_BIN = 1000  # price-bin width

_KS_A = "1-URGENT"

_KS_B = "5-LOW"

# ==== from analytics_r3g ===========================================

_T_A = "BUILDING"

_T_B = "MACHINERY"

_Q_BAL_SPARK = "cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint)"

_Q_BAL_DUCK = "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"

# ==== from analytics_r3k ===========================================

_HHI_ORACLE = """
    WITH rev AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(r) AS DOUBLE) AS tot,
               CAST(SUM(CAST(r AS DECIMAL(19,2)) * CAST(r AS DECIMAL(19,2)))
                    AS DOUBLE) AS sumsq
        FROM rev GROUP BY segment
    )
    SELECT segment, n_customers,
           tot AS total_revenue,
           CASE WHEN tot > 0 THEN ROUND(sumsq / (tot * tot), 6) END AS hhi
    FROM m
"""

# ==== from analytics_r3p ===========================================

_THEIL_QS = 1e6

# ==== from analytics_r3r ===========================================

_TE_M = 50.0

# ==== from analytics_r3y ===========================================

_Z = 1.96

# ==== from analytics_r4c ===========================================

_Z95 = 1.96

# ==== from analytics_r4f ===========================================

_ZA = 1.959963984540054  # z_{0.975}

_ZB = 0.8416212335729143  # z_{0.80}

_MDES = (1.0, 2.5, 5.0)  # minimum detectable effects, in k$ per customer

# ==== from analytics_r4h ===========================================

_H48_USER = (
    "cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10) as bigint)"
)

_H48_USER_DUCK = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)"
)

# ==== from analytics_r4j ===========================================

_BUDGET_CENTS = 1_000_000

# ==== forty-eighth wave (r4) ==================================================

_BH_ALPHA = 0.10

_LOGI = 1.702  # logistic approximation constant: Phi(z) ~ 1/(1+exp(-1.702 z))

# Poisson(1) CDF thresholds quantized against the 48-bit prime modulus
# p = 2^48 - 59: t_k = floor(P(Poisson(1) <= k) * p). A uniform draw
# u in [0, p) maps to weight w = #{k : u >= t_k} — an EXACT integer
# comparison chain, bit-identical on any engine with md5. One md5 per
# ROW yields two 48-bit seeds (a, c); replica b's draw is the affine
# u_b = (a + b*c) mod p — marginally uniform for every b and PAIRWISE
# independent across replicas (the map (a,c) -> (u_b, u_b') is linear
# with determinant b'-b, invertible mod the PRIME p), which is the
# independence the bootstrap variance needs — at 1/32nd of the hashing.
_POIS1_P = (1 << 48) - 59  # prime (Miller-Rabin verified)

_POIS1_T48 = (
    103548857136039,
    207097714272078,
    258872142840097,
    276130285696104,
    280444821410106,
    281307728552906,
    281451546410039,
    281472091818201,
)

_BOOT_B = 32

def _boot_w(u: str) -> str:
    return " + ".join(
        f"(CASE WHEN {u} >= {t} THEN 1 ELSE 0 END)" for t in _POIS1_T48
    )

_ECE_CAP = 50000  # cents cap: conf = min(cents, cap)/cap, bins = conf decile

_TOST_MARGIN = 500  # cents: equivalence margin ±5$ on the mean

_TOST_Z = 1.645     # one-sided 5% normal critical value

def _delta_arm_sql(arm: int) -> str:
    """Exact per-arm moment extraction for the delta-method CTE."""
    return f"""
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(n) AS BIGINT) AS sn,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(n * n) AS BIGINT) AS snn,
                   CAST(SUM(y * n) AS BIGINT) AS syn
            FROM u WHERE arm = {arm}"""

_PERM_B = 64  # permutation replicas (b=0 is the "observed" assignment)

_KW_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)

def _kw_pivot_cols_duck() -> str:
    return ", ".join(
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN r2 ELSE 0 END) AS BIGINT)"
        f" AS s_{i}"
        for i, p in enumerate(_KW_PRIORITIES)
    )

_CRC_W1 = ("2024-01-01", "2024-01-08")   # [start, end) capture window 1

_CRC_W2 = ("2024-01-15", "2024-01-22")   # [start, end) capture window 2

# Cohen's kappa price-bucket thresholds in cents: low < $50k, mid < $200k.
_KAPPA_T1 = 50_000_00

_KAPPA_T2 = 200_000_00

_KAPPA_CATS = ("low", "mid", "high")

def _kappa_bucket_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} < {_KAPPA_T1} THEN 'low' "
        f"WHEN {col} < {_KAPPA_T2} THEN 'mid' ELSE 'high' END"
    )

_TUKEY_Q_CRIT = 3.86   # studentized range q(k=5, df=inf, alpha=.05)

# Mantel-Haenszel strata: user activity tiers on fixed event-count cuts.
_MH_CUTS = (8, 12)   # tier 0: <8 events, tier 1: 8-12, tier 2: >12

def _mh_tier_sql(cnt: str) -> str:
    return (
        f"CASE WHEN {cnt} < {_MH_CUTS[0]} THEN 0 "
        f"WHEN {cnt} <= {_MH_CUTS[1]} THEN 1 ELSE 2 END"
    )

def _bf_fold_duck() -> str:
    """Left-fold of the five s_i^2/n_i terms, A66's explicit-nesting device."""
    t = "CAST(s_0 AS DOUBLE) * s_0 / n_0"
    for i in range(1, 5):
        t = f"({t} + CAST(s_{i} AS DOUBLE) * s_{i} / n_{i})"
    return t

_CRON_ITEMS_DUCK = (
    "CAST(l_quantity AS BIGINT) AS i1, "
    "CAST(round(l_discount * 100) AS BIGINT) AS i2, "
    "CAST(round(l_tax * 100) AS BIGINT) AS i3, "
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000"
    " AS i4"
)

def _dl_fold(expr_fmt: str) -> str:
    """Explicit left-nested 5-term fold over stratum indices (A66 device)."""
    t = expr_fmt.format(i=0)
    for i in range(1, 5):
        t = f"({t} + {expr_fmt.format(i=i)})"
    return t

_CHOW_SPLIT = "1998-06-01"   # tested break point (fixture midpoint)

def _chow_moments_duck(flt: str, sfx: str) -> str:
    return f"""
            SELECT CAST(COUNT(*) AS BIGINT) AS n_{sfx},
                   CAST(SUM(t) AS BIGINT) AS st_{sfx},
                   CAST(SUM(y) AS BIGINT) AS sy_{sfx},
                   CAST(SUM(t * t) AS BIGINT) AS stt_{sfx},
                   CAST(SUM(t * y) AS BIGINT) AS sty_{sfx},
                   CAST(SUM(y * y) AS BIGINT) AS syy_{sfx}
            FROM d WHERE {flt}"""

_CHOW_SSR_DUCK = (
    "((CAST(n_{s} AS DOUBLE) * CAST(syy_{s} AS DOUBLE)"
    "  - CAST(sy_{s} AS DOUBLE) * sy_{s})"
    " - (CAST(n_{s} AS DOUBLE) * sty_{s}"
    "    - CAST(st_{s} AS DOUBLE) * sy_{s})"
    "   * (CAST(n_{s} AS DOUBLE) * sty_{s}"
    "      - CAST(st_{s} AS DOUBLE) * sy_{s})"
    "   / (CAST(n_{s} AS DOUBLE) * stt_{s}"
    "      - CAST(st_{s} AS DOUBLE) * st_{s})) / n_{s}"
)

def _bartlett_fold(expr_fmt: str) -> str:
    t = expr_fmt.format(i=0)
    for i in range(1, 5):
        t = f"({t} + {expr_fmt.format(i=i)})"
    return t

_SPRT_P0 = 0.24   # null conversion rate (fulfilled-order share)

_SPRT_P1 = 0.27   # alternative worth detecting

_SPRT_CHECK = 500  # checkpoint every N observations

_HILL_K = 100   # top order statistics used

_DH_SEATS = 20

_PINBALL_TAUS = ("0.1", "0.5", "0.9")

_TRIM_FRAC_NUM, _TRIM_FRAC_DEN = 1, 10  # 10% per tail

# ==== wave 133: ordered-alternative trend test =====================

_JT_GROUPS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

def _jt_oracle() -> str:
    gs = _JT_GROUPS
    c_cols = ",\n                   ".join(
        f"CAST(COALESCE(SUM(CASE WHEN grp = '{g}' THEN c END), 0) "
        f"AS BIGINT) AS c{i}"
        for i, g in enumerate(gs)
    )
    cum_cols = ",\n                   ".join(
        f"SUM(c{i}) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING "
        f"AND CURRENT ROW) - c{i} AS less{i}"
        for i in range(len(gs))
    )
    contrib = " + ".join(
        f"c{j} * (2 * less{i} + c{i})"
        for j in range(len(gs))
        for i in range(j)
    )
    n_terms = " + ".join(f"n{i}" for i in range(len(gs)))
    nsq_terms = " + ".join(f"n{i} * n{i}" for i in range(len(gs)))
    nvar_terms = " + ".join(
        f"n{i} * n{i} * (2 * n{i} + 3)" for i in range(len(gs))
    )
    n_defs = ",\n                   ".join(
        f"CAST(SUM(c{i}) AS BIGINT) AS n{i}" for i in range(len(gs))
    )
    return f"""
        WITH vc AS (
            SELECT o_orderpriority AS grp,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1, 2
        ),
        val AS (
            SELECT v,
                   {c_cols}
            FROM vc GROUP BY v
        ),
        cum AS (
            SELECT *,
                   {cum_cols}
            FROM val
        ),
        tot AS (
            SELECT CAST(SUM({contrib}) AS BIGINT) AS j2,
                   {n_defs}
            FROM cum
        )
        SELECT CAST(j2 AS DOUBLE) / 2 AS jt_stat,
               CAST({n_terms} AS BIGINT) AS n_total,
               (CAST(({n_terms}) AS DOUBLE) * CAST(({n_terms}) AS DOUBLE)
                - CAST(({nsq_terms}) AS DOUBLE)) / 4 AS expected_jt,
               ROUND((CAST(j2 AS DOUBLE) / 2
                      - (CAST(({n_terms}) AS DOUBLE)
                         * CAST(({n_terms}) AS DOUBLE)
                         - CAST(({nsq_terms}) AS DOUBLE)) / 4)
                     / sqrt((CAST(({n_terms}) AS DOUBLE)
                             * CAST(({n_terms}) AS DOUBLE)
                             * (2 * CAST(({n_terms}) AS DOUBLE) + 3)
                             - CAST(({nvar_terms}) AS DOUBLE)) / 72),
                     6) AS z_score
        FROM tot
    """

_FLEISS_N = 4

# ==== wave 138: extreme-value return levels, bootstrap median ======

# Python-precomputed double literals (identical text in both engines):
# Euler-Mascheroni, sqrt(6)/pi, and the Gumbel reduced variates
# -ln(-ln(1-1/T)) for T = 10, 100.
_GUM_GAMMA = 0.5772156649015329

_GUM_SQRT6_PI = 0.779696801233676

_GUM_C10 = 2.2503673273124454

_GUM_C100 = 4.600149226776579

# ==== wave 140: causal-inference pair ==============================

_DID_CUT = "1998-01-01"

# ==== wave 141: conditional dependence pair ========================

_PCORR_COLS = ["l_quantity", "l_extendedprice", "l_discount"]

def _pcorr_oracle() -> str:
    cols = _PCORR_COLS
    qs = ", ".join(
        f"{_Q_DUCK.format(c=c)} AS q{i}" for i, c in enumerate(cols)
    )
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i in range(len(cols)):
        moments.append(f"CAST(SUM(q{i}) AS BIGINT) AS s{i}")
        for j in range(i, len(cols)):
            pd = f"SUM(CAST(q{i} * q{j} AS DECIMAL(38,0)))"
            moments.append(
                f"CAST(CAST({pd} AS HUGEINT) // 4294967296 AS DOUBLE)"
                f" * 4294967296.0"
                f" + CAST(CAST({pd} AS HUGEINT) % 4294967296 AS DOUBLE)"
                f" AS p{i}{j}"
            )

    def r(i, j):
        i, j = min(i, j), max(i, j)
        return (
            f"((CAST(n AS DOUBLE) * p{i}{j}"
            f" - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
            f" / (sqrt(CAST(n AS DOUBLE) * p{i}{i}"
            f"          - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
            f"    * sqrt(CAST(n AS DOUBLE) * p{j}{j}"
            f"           - CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE))))"
        )

    rows = []
    for x, y, z in [(0, 1, 2), (0, 2, 1), (1, 2, 0)]:
        rows.append(
            f"SELECT '{cols[x]}' AS col_x, '{cols[y]}' AS col_y,"
            f" '{cols[z]}' AS control, n,"
            f" ROUND({r(x, y)}, 6) AS r_xy,"
            f" ROUND(({r(x, y)} - {r(x, z)} * {r(z, y)})"
            f" / sqrt((1 - {r(x, z)} * {r(x, z)})"
            f"        * (1 - {r(z, y)} * {r(z, y)})), 6) AS r_partial"
            f" FROM m"
        )
    return (
        f"WITH q AS (SELECT {qs} FROM lineitem),"
        f" m AS MATERIALIZED (SELECT {', '.join(moments)} FROM q) "
        + " UNION ALL ".join(rows)
    )

# ==== wave 149a: restricted mean survival time =====================

_RMST_TAU = 60

# floor(ln(0.5) * 1e12): S(t) <= 0.5 iff the quantized log-sum is <=
# this integer — the median-survival compare never touches a float.
_LN_HALF_Q12 = -693147180560

# ==== wave 155a: index numbers =====================================

_IDX_Y0, _IDX_Y1 = 1996, 1999

# ==== wave 183b: geometric median (unrolled Weiszfeld) ==============

_GM_D = (
    "sqrt((CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx)"
    " + (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my))"
)

_GM_STEP = f"""(
            SELECT CAST(SUM(CAST(floor(1000000.0 * x
                        / GREATEST({_GM_D}, 1e-9)) AS BIGINT))
                        AS BIGINT) AS sxw,
                   CAST(SUM(CAST(floor(1000000.0 * y
                        / GREATEST({_GM_D}, 1e-9)) AS BIGINT))
                        AS BIGINT) AS syw,
                   CAST(SUM(CAST(floor(1e12
                        / GREATEST({_GM_D}, 1e-9)) AS BIGINT))
                        AS BIGINT) AS sw,
                   CAST(SUM(CAST(floor({_GM_D}) AS BIGINT)) AS BIGINT)
                       AS sd
            FROM pts CROSS JOIN {{c}}
        )"""

# ==== wave 190b: Nemenyi post-hoc critical differences ==============

# studentized range q(0.05, k=5, inf df) / sqrt(2)
_NEM_Q5 = 3.858 / 1.4142135623730951
