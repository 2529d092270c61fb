"""Time-series resampling / decay operators (r3).

  TS1 q_ts_resample_ohlc — 15-minute OHLC bars per event type: the classic
                           downsampling operator (open/high/low/close).
  TS2 q_ts_ewma           — exponentially weighted moving average over the
                            last 10 events per user (decay 1/2).
  TS3 q_ts_decay_sum      — half-life-decayed lifetime value per user
                            (weight halves every 14 days).

Determinism notes (SURVEY §5.3):
  * TS2/TS3 use decay factor 1/2 so every weight is an exact power of two:
    `v * 2^-k` only shifts the exponent — no rounding — making per-row
    products bit-identical across engines without trusting libm `pow`/`exp`
    (whose last-ulp behavior differs between JVM and C). TS3 goes further
    and builds the weight from an integer bit-shift.
  * TS3 quantizes per-row products with floor(x * 1e8) (floor is exactly
    defined on both engines; round() half-up vs half-even is not) and sums
    the resulting integers in DECIMAL — exact, associative,
    order-insensitive, so the result is stable under any partitioning.
  * TS1's open/close use min_by/max_by (arg_min/arg_max) on a
    zero-padded (unix_micros, event_id) string key — DuckDB 1.0 cannot
    order arg_min by a struct, and a padded string totally orders the same
    way on both engines.

Scale notes:
  * TS1/TS3 are single keyed aggregations (one shuffle, map-side partial).
  * TS2 is one window sort per user partition with a bounded 10-row frame —
    constant state per row.
"""

# Shared constants/helpers split out of timeseries.py (r6: no
# source file over the 5k-line readability budget); query
# chunks import exactly what they reference.

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from ai_to_cvent_etl_spark.queries._util import dec2
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# zero-padded total-order key over (unix_micros, event_id): cross-engine
# comparable as a plain VARCHAR
_KEY_SPARK = (
    "concat(lpad(cast(unix_micros(ts) as string), 20, '0'), '|',"
    " lpad(cast(event_id as string), 10, '0'))"
)

_KEY_DUCK = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||"
    " lpad(CAST(event_id AS VARCHAR), 10, '0')"
)

# ==== from analytics_r3b ===========================================

_Z_FRAME = 20  # trailing frame size (rows)

_Z_MIN_N = 10  # minimum observations before scoring

_Z_T = 2.5     # |z| threshold

_TS5_MIN_VALUE = 250.0  # rare high-value slice => genuinely sparse series

# ==== from analytics_r3d ===========================================

_WAU_DAYS = 7

# ==== from analytics_r3k ===========================================

_ROLLCORR_ORACLE = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders GROUP BY 1
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM bounds
    ),
    filled AS (
        SELECT s.day,
               COALESCE(d.x, 0) AS x,
               CAST(COALESCE(d.y, 0) AS DECIMAL(19,2)) AS y
        FROM spine s LEFT JOIN daily d ON s.day = d.day
    ),
    mom AS (
        SELECT day,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(19,2)) * y) OVER w AS DOUBLE)
                   AS sxy,
               CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
               CAST(SUM(y * y) OVER w AS DOUBLE) AS syy
        FROM filled
        WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           CASE WHEN (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
                THEN ROUND(
                     (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
           END AS rolling_corr
    FROM mom
    WHERE n = 14
"""

# ==== from analytics_r3m ===========================================

_CP_MINSEG = 7

# ==== from analytics_r3n ===========================================

_TS12_HALF = 14  # centered window: 14 before + current + 14 after

_TS12_QS = 1e4

# ==== from analytics_r3r ===========================================

_FC_LAG = 7

# ==== from analytics_r3x ===========================================

_TS15_HALF = 14

# ==== from analytics_r3z ===========================================

_TS16_HALF = 14

_TS16_K = 5.0  # MAD multiplier

# ==== from analytics_r4k ===========================================

# dow (0=Mon..6=Sun) -> calendar days until the 5th business day
_BD5 = [(0, 7), (1, 7), (2, 7), (3, 7), (4, 7), (5, 6), (6, 5)]

# ==== from analytics_r4o ===========================================

_TW_SESS_US = 300_000_000  # 5-minute sessions (W27's interval model)

# ==== from analytics_r4q ===========================================

_PERIODS = (7, 14, 30)

_PI2 = 6.283185307179586

# ==== forty-eighth wave (r4) ==================================================

_HURST_NS = (8, 16, 32)  # R/S window sizes (hours); 720 hourly buckets total

_HOLT_A = 0.3  # level smoothing

_HOLT_B = 0.1  # trend smoothing

_PE_MIN_WINDOWS = 10

_XCORR_A = "view"       # leading series

_XCORR_B = "purchase"   # lagged series

_XCORR_MAX_LAG = 3

_ES_WINDOW = 3   # event-study window: relative days -3..+3

_ACF_MAX_LAG = 7

_PACF_R_DUCK = (
    "(CAST(n_{l} AS DOUBLE) * sxy_{l}"
    " - CAST(sx_{l} AS DOUBLE) * sy_{l})"
    " / sqrt((CAST(n_{l} AS DOUBLE) * sxx_{l}"
    "         - CAST(sx_{l} AS DOUBLE) * sx_{l})"
    "        * (CAST(n_{l} AS DOUBLE) * syy_{l}"
    "           - CAST(sy_{l} AS DOUBLE) * sy_{l}))"
)

_CROSTON_MAX_PART = 50

_LB_MAX_LAG = 7

def _se_fold(expr_fmt: str) -> str:
    t = expr_fmt.format(i=0)
    for i in range(1, len(_PERIODS)):
        t = f"({t} + {expr_fmt.format(i=i)})"
    return t

# --- TS42: Lo-MacKinlay variance-ratio test ---------------------------------

_VR_KS = (2, 5)

def _vr_oracle() -> str:
    per_k = []
    for k in _VR_KS:
        per_k.append(f"""
        SELECT {k} AS k, n_diffs,
               (SELECT COUNT(*) FROM ksum WHERE k = {k}) AS n_windows,
               ROUND(
                   ((SELECT CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE)
                                 * CAST(sm AS DOUBLE) / cnt
                     FROM kstat WHERE k = {k})
                    / ((SELECT cnt FROM kstat WHERE k = {k}) - 1))
                   / ({k} * var1), 6) AS variance_ratio
        FROM base
        """)
    union = " UNION ALL ".join(per_k)
    return f"""
        WITH daily AS (
            SELECT o_orderdate AS d,
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT)) AS cents
            FROM orders GROUP BY 1
        ),
        diffs AS (
            SELECT d, cents - lag(cents) OVER (ORDER BY d) AS x,
                   ROW_NUMBER() OVER (ORDER BY d) AS rn
            FROM daily
        ),
        dd AS (SELECT d, x, rn - 1 AS i FROM diffs WHERE x IS NOT NULL),
        ksum AS (
            SELECT k, i, SUM(x) OVER (PARTITION BY k ORDER BY i
                          ROWS BETWEEN k - 1 PRECEDING AND CURRENT ROW) AS y,
                   COUNT(*) OVER (PARTITION BY k ORDER BY i
                          ROWS BETWEEN k - 1 PRECEDING AND CURRENT ROW) AS w
            FROM dd CROSS JOIN (SELECT unnest([{', '.join(str(k) for k in _VR_KS)}]) AS k)
            QUALIFY w = k
        ),
        kstat AS (
            SELECT k,
                   SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS sq,
                   SUM(CAST(y AS HUGEINT)) AS sm,
                   COUNT(*) AS cnt
            FROM ksum GROUP BY k
        ),
        stat1 AS (
            SELECT SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sq1,
                   SUM(CAST(x AS HUGEINT)) AS sm1,
                   COUNT(*) AS cnt1
            FROM dd
        ),
        base AS (
            SELECT CAST(cnt1 AS BIGINT) AS n_diffs,
                   (CAST(sq1 AS DOUBLE)
                    - CAST(sm1 AS DOUBLE) * CAST(sm1 AS DOUBLE) / cnt1)
                   / (cnt1 - 1) AS var1
            FROM stat1
        )
        SELECT CAST(k AS BIGINT) AS k, n_diffs,
               CAST(n_windows AS BIGINT) AS n_windows, variance_ratio
        FROM ({union})
    """

# ---------------------------------------------------------------------------
# Wave 120 (r5): technical-analysis window trio — Bollinger, RSI, VWAP.
# ---------------------------------------------------------------------------

_BOLL_N = 20

_RSI_N = 14

_MP_M = 7  # subsequence length

_MP_TYPE = "click"

_SAX_SEG_DAYS = 5

_SAX_BP_LO, _SAX_BP_HI = -0.4307, 0.4307  # N(0,1) terciles

# ---------------------------------------------------------------------------
# Wave 132 (r5): oscillator pair — stochastic %K/%D and Aroon up/down.
# ---------------------------------------------------------------------------

_STO_N = 14

_STO_D = 3

_AROON_N = 10

# ---------------------------------------------------------------------------
# Wave 134b (r5): ulcer index — RMS drawdown.
# ---------------------------------------------------------------------------

_ULCER_N = 14

# ---------------------------------------------------------------------------
# Wave 143 (r5): interrupted time series + cross-sectional factor backtest.
# ---------------------------------------------------------------------------

_ITS_CUT_M = 36  # (1998 - 1995) * 12: months since 1995-01

# ---------------------------------------------------------------------------
# Wave 154a (r5): Haar wavelet energy decomposition.
# ---------------------------------------------------------------------------

_HAAR_N = 16  # last 16 days: 4 dyadic levels

def _haar_levels_sql() -> str:
    ctes = ["""
        daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS cents
            FROM events GROUP BY 1
        ),
        lvl0 AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i,
                   cents AS s
            FROM (
                SELECT d, cents,
                       ROW_NUMBER() OVER (ORDER BY d DESC) AS rdesc
                FROM daily
            ) WHERE rdesc <= 16
        )"""]
    rows = []
    for k in range(1, 5):
        ctes.append(f"""
        lvl{k} AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY grp) AS BIGINT) AS i,
                   ssum AS s, sdiff AS dd
            FROM (
                SELECT (i - 1) // 2 AS grp,
                       CAST(SUM(s) AS BIGINT) AS ssum,
                       CAST(SUM(CASE WHEN i % 2 = 1 THEN s
                                     ELSE -s END) AS BIGINT) AS sdiff
                FROM lvl{k - 1} GROUP BY (i - 1) // 2
            )
        )""")
        rows.append(
            f"SELECT CAST({k} AS BIGINT) AS level,"
            f" CAST(COUNT(*) AS BIGINT) AS n_coeffs,"
            f" CAST(SUM(dd * dd) AS BIGINT) AS raw_energy,"
            f" CAST(SUM(dd * dd) AS DOUBLE) / {2 ** k} AS energy"
            f" FROM lvl{k}"
        )
    return "WITH " + ",".join(ctes) + " " + " UNION ALL ".join(rows)

# ---------------------------------------------------------------------------
# Wave 160a (r5): relative-strength rotation quadrants.
# ---------------------------------------------------------------------------

_RRG_M = 79  # final month index of the 1995-2001 span (2001-08)

# ==== wave 184b: X-bar/R control chart (TS48) =======================

# Shewhart constants for subgroup size n = 5 (A2, D3, D4)
_XBR_A2 = 0.577

_XBR_D4 = 2.114

# ==== wave 187a: Rayleigh circular seasonality test (TS50) ==========

# cos/sin(2*pi*(m-1)/12) for month m = 1..12, written as shared literal
# constants so NO libm trig runs on either engine (last-ulp cos()
# differences between JVM and C would leak into the resultant).
_RAY_COS = [1.0, 0.8660254037844387, 0.5, 0.0, -0.5,
            -0.8660254037844387, -1.0, -0.8660254037844387, -0.5,
            0.0, 0.5, 0.8660254037844387]

_RAY_SIN = [0.0, 0.5, 0.8660254037844387, 1.0, 0.8660254037844387,
            0.5, 0.0, -0.5, -0.8660254037844387, -1.0,
            -0.8660254037844387, -0.5]

_RAY_COS_SQL = "[" + ", ".join(repr(v) for v in _RAY_COS) + "]"

_RAY_SIN_SQL = "[" + ", ".join(repr(v) for v in _RAY_SIN) + "]"

# ==== wave 191b: dyadic SES grid search (TS51) ======================

_SES_K = 12   # truncated-SES window (tail weight <= 2^-12 per alpha)

def _ses_fc_expr(m: int) -> str:
    """Truncated-SES forecast for dyadic alpha = (2^m - 1)/2^m.

    alpha*(1-alpha)^j = (2^m - 1) / 2^(m*(j+1)) — every weight is an
    integer over a power of two, so each term y*c/2^e is EXACT in
    IEEE doubles, and the fixed left-to-right chain (identical text
    on both engines) pins the remaining rounding order bit-for-bit.
    """
    # integer literals only: Spark parses a bare `3.0` as DECIMAL(2,1)
    # and would run the whole chain in decimal arithmetic while DuckDB
    # runs doubles — CAST(l AS DOUBLE) * int / int keeps both engines
    # in IEEE doubles with exact power-of-two divisions.
    c = 2 ** m - 1
    terms = [
        f"(CAST(l{j} AS DOUBLE) * {c} / {2 ** (m * (j + 1))})"
        for j in range(_SES_K)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out

# ==== wave 194b: Fano factor dispersion curve (TS52) ================

_FANO_WINDOWS = [1, 4, 24]   # hours

_FANO_SPAN_H = 720           # fixture event range: 30 days

# ==== wave 201a: dyadic MACD crossover census (TS54) ================

_MACD_K = 12   # truncation depth for both EMAs

def _macd_ema_expr(kind: str) -> str:
    """Truncated EMA as an exact fixed chain (TS51 device).

    fast:  alpha = 1/2  -> weight_j = 1/2^(j+1)
    slow:  alpha = 1/4  -> weight_j = 3^j/4^(j+1) (3^j exact int64)
    """
    terms = []
    for j in range(_MACD_K):
        if kind == "fast":
            terms.append(f"(CAST(l{j} AS DOUBLE) / {2 ** (j + 1)})")
        else:
            terms.append(
                f"(CAST(l{j} AS DOUBLE) * {3 ** j}"
                f" / {4 ** (j + 1)})"
            )
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out
