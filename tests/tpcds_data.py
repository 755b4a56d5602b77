"""Deterministic TPC-DS micro-data generator for execution-differential
testing (upgrades test_tpcds_planning.py's planning parity to actual
execution: the same rows are registered in Spark AND DuckDB and each
reference query's results are compared).

Design: every cell is a pure function of (table, column, row index) —
no RNG state, so both engines see byte-identical inputs on every run.
Semantic columns (surrogate keys, the calendar, and the predicate
columns the 99 queries actually filter on: d_year/d_moy, i_category,
ca_state, cd_gender, hd_buy_potential, …) get curated domains drawn
from the TPC-published value sets so a useful fraction of queries
returns rows; everything else falls back to type-generic values.
Referential integrity: each dimension's first *_sk column is the dense
primary key 1..N; every foreign key named `*_<dim>_sk` is mapped into
the referenced dimension's key range via a deterministic mix.
"""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import types as T

# Row counts: date_dim covers 1998-01-01 .. 2002-12-31 (the window the
# query constants live in); facts are larger than dims so joins fan out.
N_DATE = 1826
_FACTS = {
    "store_sales", "store_returns", "catalog_sales", "catalog_returns",
    "web_sales", "web_returns", "inventory",
}
_COUNTS = {
    "date_dim": N_DATE, "time_dim": 200, "item": 120, "customer": 100,
    "customer_address": 80, "customer_demographics": 80,
    "household_demographics": 40, "store": 12, "call_center": 6,
    "catalog_page": 20, "web_page": 12, "web_site": 6, "warehouse": 5,
    "promotion": 10, "ship_mode": 10, "reason": 10, "income_band": 20,
}


def n_rows(table: str) -> int:
    return _COUNTS.get(table, 400 if table in _FACTS else 30)


# FK target row counts by column suffix (longest suffix wins).
_FK = {
    "date_sk": N_DATE, "time_sk": 200, "item_sk": 120, "customer_sk": 100,
    "cdemo_sk": 80, "hdemo_sk": 40, "addr_sk": 80, "store_sk": 12,
    "call_center_sk": 6, "catalog_page_sk": 20, "web_page_sk": 12,
    "web_site_sk": 6, "site_sk": 6, "warehouse_sk": 5, "promo_sk": 10,
    "ship_mode_sk": 10, "mode_sk": 10, "reason_sk": 10, "income_band_sk": 20,
    "band_sk": 20,
}

_STATES = ["TN", "GA", "OH", "TX", "CA", "NY", "SC", "VA", "IL", "MI"]
_CATEGORIES = ["Books", "Children", "Electronics", "Home", "Jewelry",
               "Men", "Music", "Shoes", "Sports", "Women"]
_CLASSES = ["accessories", "classical", "fiction", "fragrances",
            "infants", "pants", "shirts", "computers"]
_COLORS = ["white", "blue", "red", "green", "black", "navy", "peach",
           "metallic", "burnished", "chiffon"]
_COUNTIES = ["Ziebach County", "Walker County", "Daviess County",
             "Barrow County", "Fairfield County"]
_BUY_POTENTIAL = [">10000", "5001-10000", "1001-5000", "501-1000",
                  "Unknown", "0-500"]
_EDUCATION = ["Primary", "Secondary", "College", "2 yr Degree",
              "4 yr Degree", "Advanced Degree", "Unknown"]
_MARITAL = ["M", "S", "D", "W", "U"]
_DAY_NAMES = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
              "Saturday", "Sunday"]
_STORE_NAMES = ["ought", "able", "pri", "ese", "anti", "cally", "ation",
                "eing", "n st", "bar"]


def _mix(col: str, i: int) -> int:
    """Deterministic column-salted mix (splitmix-style, no RNG state;
    crc32 not hash() — PYTHONHASHSEED must not change the data)."""
    import zlib

    h = (i + 1) * 0x9E3779B97F4A7C15 + zlib.crc32(col.encode()) * 0xBF58476D1CE4E5B9
    h ^= h >> 31
    h *= 0x94D049BB133111EB
    h &= (1 << 63) - 1
    return h ^ (h >> 29)


def _pool(col: str, i: int, pool: list[str]) -> str:
    return pool[_mix(col, i) % len(pool)]


_BASE_DATE = datetime.date(1998, 1, 1)
# TPC-DS date_dim julian-ish convention: d_date_sk 2450815 ≈ 1998-01-01.
SK0 = 2450815


def _date_dim_value(col: str, i: int, dt: T.DataType):
    d = _BASE_DATE + datetime.timedelta(days=i)
    q = (d.month - 1) // 3 + 1
    special = {
        "d_date_sk": SK0 + i,
        "d_date_id": f"AAAAAAAA{i:08d}",
        "d_date": d,
        "d_year": d.year,
        "d_moy": d.month,
        "d_dom": d.day,
        "d_qoy": q,
        "d_dow": d.weekday(),
        "d_day_name": _DAY_NAMES[d.weekday()],
        "d_month_seq": (d.year - 1900) * 12 + d.month - 1,
        "d_week_seq": (i + (d.year - 1998)) // 7 + 5270,
        "d_quarter_seq": (d.year - 1900) * 4 + q - 1,
        "d_quarter_name": f"{d.year}Q{q}",
        "d_fy_year": d.year,
        "d_fy_quarter_seq": (d.year - 1900) * 4 + q - 1,
        "d_fy_week_seq": (i + (d.year - 1998)) // 7 + 5270,
        "d_holiday": "Y" if (d.month, d.day) in ((12, 25), (7, 4)) else "N",
        "d_weekend": "Y" if d.weekday() >= 5 else "N",
        "d_following_holiday": "N",
        "d_first_dom": SK0 + i - d.day + 1,
        "d_last_dom": SK0 + i,
        "d_same_day_ly": SK0 + i - 365,
        "d_same_day_lq": SK0 + i - 91,
        "d_current_day": "N", "d_current_week": "N", "d_current_month": "N",
        "d_current_quarter": "N", "d_current_year": "N",
    }
    return special.get(col, _generic(col, i, dt))


# Per-column curated domains (the predicate columns of the 99 queries).
def _curated(table: str, col: str, i: int):
    c = {
        # item
        "i_item_id": f"AAAAAAAA{_mix(col, i) % 60:08d}",
        "i_category": _pool(col, i, _CATEGORIES),
        "i_class": _pool(col, i, _CLASSES),
        "i_brand": f"brand#{_mix(col, i) % 10 + 1}",
        "i_color": _pool(col, i, _COLORS),
        "i_manufact": f"manufact#{_mix(col, i) % 20 + 1}",
        "i_manufact_id": _mix(col, i) % 1000 + 1,
        "i_manager_id": _mix(col, i) % 100 + 1,
        "i_category_id": _mix(col, i) % 10 + 1,
        "i_class_id": _mix(col, i) % 16 + 1,
        "i_brand_id": _mix(col, i) % 1000 + 1001001,
        "i_size": _pool(col, i, ["small", "medium", "large", "extra large",
                                 "economy", "N/A", "petite"]),
        "i_units": _pool(col, i, ["Each", "Dozen", "Case", "Pallet"]),
        # customer_address / store / call center geography
        "ca_state": _pool(col, i, _STATES),
        "s_state": _pool(col, i, _STATES[:5]),
        "ca_county": _pool(col, i, _COUNTIES),
        "s_county": _pool(col, i, _COUNTIES),
        "cc_county": _pool(col, i, _COUNTIES),
        "ca_country": "United States",
        "ca_city": _pool(col, i, ["Midway", "Fairview", "Oakland",
                                  "Glendale", "Centerville", "Salem"]),
        "ca_zip": f"{_mix(col, i) % 100000:05d}",
        "ca_gmt_offset": decimal.Decimal(f"{-(_mix(col, i) % 4 + 5)}.00"),
        "ca_location_type": _pool(col, i, ["apartment", "condo", "single family"]),
        "s_gmt_offset": decimal.Decimal("-5.00"),
        "cc_gmt_offset": decimal.Decimal("-5.00"),
        "w_gmt_offset": decimal.Decimal("-5.00"),
        "s_store_name": _pool(col, i, _STORE_NAMES),
        "s_city": _pool(col, i, ["Midway", "Fairview"]),
        "s_number_employees": 200 + _mix(col, i) % 100,
        "s_market_id": _mix(col, i) % 10 + 1,
        "cc_class": _pool(col, i, ["small", "medium", "large"]),
        "cc_name": _pool(col, i, ["NY Metro", "Mid Atlantic", "North Midwest"]),
        # demographics
        "cd_gender": _pool(col, i, ["M", "F"]),
        "cd_marital_status": _pool(col, i, _MARITAL),
        "cd_education_status": _pool(col, i, _EDUCATION),
        "cd_purchase_estimate": (_mix(col, i) % 20 + 1) * 500,
        "cd_credit_rating": _pool(col, i, ["Low Risk", "Good", "High Risk", "Unknown"]),
        "cd_dep_count": _mix(col, i) % 10,
        "cd_dep_employed_count": _mix(col, i) % 7,
        "cd_dep_college_count": _mix(col, i) % 7,
        "hd_buy_potential": _pool(col, i, _BUY_POTENTIAL),
        "hd_dep_count": _mix(col, i) % 10,
        "hd_vehicle_count": _mix(col, i) % 5,
        "hd_income_band_sk": _mix(col, i) % 20 + 1,
        "ib_lower_bound": i * 10000,
        "ib_upper_bound": (i + 1) * 10000,
        # customer
        "c_customer_id": f"AAAAAAAA{i + 1:08d}",
        "c_preferred_cust_flag": _pool(col, i, ["Y", "N"]),
        "c_birth_month": _mix(col, i) % 12 + 1,
        "c_birth_year": 1920 + _mix(col, i) % 73,
        "c_birth_country": _pool(col, i, ["UNITED STATES", "CANADA", "MEXICO"]),
        "c_salutation": _pool(col, i, ["Mr.", "Mrs.", "Ms.", "Dr."]),
        "c_first_name": _pool(col, i, ["James", "Mary", "John", "Linda"]),
        "c_last_name": _pool(col, i, ["Smith", "Jones", "Brown", "White"]),
        # time_dim
        "t_hour": i % 24,
        "t_minute": (i * 7) % 60,
        "t_second": (i * 13) % 60,
        "t_time": (i % 24) * 3600 + ((i * 7) % 60) * 60,
        "t_am_pm": "AM" if i % 24 < 12 else "PM",
        "t_meal_time": _pool(col, i, ["breakfast", "lunch", "dinner"]),
        # promotion / ship mode / reason / web
        "p_channel_email": _pool(col, i, ["Y", "N"]),
        "p_channel_dmail": _pool(col, i, ["Y", "N"]),
        "p_channel_tv": _pool(col, i, ["Y", "N"]),
        "p_channel_event": _pool(col, i, ["Y", "N"]),
        "sm_type": _pool(col, i, ["EXPRESS", "OVERNIGHT", "TWO DAY", "REGULAR"]),
        "sm_carrier": _pool(col, i, ["UPS", "FEDEX", "DHL", "USPS"]),
        "r_reason_desc": _pool(col, i, ["reason 1", "reason 2", "reason 3"]),
        "wp_char_count": 2500 + _mix(col, i) % 3000,
        "web_name": _pool(col, i, ["site_0", "site_1", "site_2"]),
    }
    return c.get(col, None)


def _generic(col: str, i: int, dt: T.DataType):
    if isinstance(dt, T.IntegerType) or isinstance(dt, T.LongType):
        return _mix(col, i) % 100
    if isinstance(dt, T.DecimalType):
        q = decimal.Decimal(10) ** -dt.scale
        return (decimal.Decimal(_mix(col, i) % 10000) / 100).quantize(q)
    if isinstance(dt, T.DateType):
        return _BASE_DATE + datetime.timedelta(days=_mix(col, i) % N_DATE)
    return f"{col}_{_mix(col, i) % 25}"


def gen_value(table: str, col: str, i: int, dt: T.DataType):
    if table == "date_dim":
        return _date_dim_value(col, i, dt)
    if col.endswith("_sk") and isinstance(dt, T.StringType):
        # c_last_review_date_sk is Utf8 in the reference schema
        return str(SK0 + _mix(col, i) % N_DATE)
    # dense primary key: the table's own surrogate key column
    if col.endswith("_sk") and _is_pk(table, col):
        return i + 1
    if col.endswith("_sk"):
        for suffix, n in sorted(_FK.items(), key=lambda kv: -len(kv[0])):
            if col.endswith(suffix):
                if suffix == "date_sk":
                    return SK0 + _mix(col, i) % N_DATE
                return _mix(col, i) % n + 1
        return _mix(col, i) % 30 + 1
    cur = _curated(table, col, i)
    if cur is not None:
        return cur
    # fact measures: quantities small ints, money two-decimal
    return _generic(col, i, dt)


_PK = {
    "date_dim": "d_date_sk", "time_dim": "t_time_sk", "item": "i_item_sk",
    "customer": "c_customer_sk", "customer_address": "ca_address_sk",
    "customer_demographics": "cd_demo_sk",
    "household_demographics": "hd_demo_sk", "store": "s_store_sk",
    "call_center": "cc_call_center_sk", "catalog_page": "cp_catalog_page_sk",
    "web_page": "wp_web_page_sk", "web_site": "web_site_sk",
    "warehouse": "w_warehouse_sk", "promotion": "p_promo_sk",
    "ship_mode": "sm_ship_mode_sk", "reason": "r_reason_sk",
    "income_band": "ib_income_band_sk",
}


def _is_pk(table: str, col: str) -> bool:
    return _PK.get(table) == col


def gen_table(table: str, schema: T.StructType) -> list[tuple]:
    n = n_rows(table)
    return [
        tuple(gen_value(table, f.name, i, f.dataType) for f in schema.fields)
        for i in range(n)
    ]


def to_arrow(schema: T.StructType, rows: list[tuple]):
    """pyarrow table with types matching the Spark schema exactly, so
    DuckDB sees the same logical types Spark does."""
    import pyarrow as pa

    def pa_type(dt):
        if isinstance(dt, T.IntegerType):
            return pa.int32()
        if isinstance(dt, T.LongType):
            return pa.int64()
        if isinstance(dt, T.DecimalType):
            return pa.decimal128(dt.precision, dt.scale)
        if isinstance(dt, T.DateType):
            return pa.date32()
        return pa.string()

    arrow_schema = pa.schema(
        [(f.name, pa_type(f.dataType)) for f in schema.fields]
    )
    cols = list(zip(*rows)) if rows else [[] for _ in schema.fields]
    return pa.table(
        {f.name: pa.array(list(c), type=pa_type(f.dataType))
         for f, c in zip(schema.fields, cols)},
        schema=arrow_schema,
    )
