"""Deterministic raw-grid fixtures for the oracle-gated pipeline queries.

The six supplier pipelines ingest positional Excel grids (headers are DATA
— SURVEY §1.3), but the correctness gate only pre-registers the ten parquet
tables. So each q47+ query builds its raw grid as a PURE function of those
tables (item codes from ``part``, branch/store codes from ``nation``), runs
the real pipeline code (pipelines/batch.py clean_* + build_*), and the
DuckDB oracle recomputes the expected relational result straight from the
same tables. Every junk row/column the grids carry exists to exercise a
specific clean-step behavior (promotion, marker slicing, footer drop,
zero/NA item drop) — the oracles never see them, which is the point: the
pipeline must remove them to match.

All cell values are derived with small integer arithmetic (exact in both
engines); money cells are formatted ``$D.CC`` so ``parse_money`` and
``c/100.0`` agree to the ulp (IEEE division is correctly rounded).
"""

from __future__ import annotations

import pandas as pd

# mixed 2-digit / 3-digit branch codes (P15 branch fix exercised on the
# 2-digit half). k is the nation key the oracle re-derives them from.
def _branch(k: int) -> str:
    return str(10 + k) if k < 6 else str(400 + k)


def _items(sf_dir: str, limit: int) -> list[int]:
    pdf = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    return sorted(int(x) for x in pdf["p_partkey"] if int(x) <= limit)


def _grid(rows: list[list[str]]) -> pd.DataFrame:
    width = max(len(r) for r in rows)
    return pd.DataFrame([r + [""] * (width - len(r)) for r in rows])


# --------------------------------------------------------------------------
# 247 allocation (q47)
# --------------------------------------------------------------------------

def allocation_grid(sf_dir: str) -> pd.DataFrame:
    """Junk title row, header row 1 (Item# | Item Description | 12 branch
    cols | Total), two data rows per item, grand-total footer."""
    branches = [_branch(k) for k in range(12)]
    rows = [["ALLOCATION REPORT — WEEK 2"]]
    rows.append(["Item#", "Item Description"] + branches + ["Total"])
    for i in _items(sf_dir, 200):
        for r in (0, 1):
            cells = []
            for k in range(12):
                q = (i * 7 + k * 3 + r) % 13
                cells.append("" if q == 12 else str(q))
            rows.append([str(i), f"desc {i}"] + cells + ["999"])
    rows.append(["Grand Total", ""] + [""] * 12 + ["999999"])
    return _grid(rows)


ALLOCATION_ORACLE = """
    WITH items AS (SELECT p_partkey AS i FROM part WHERE p_partkey <= 200),
    branches AS (
      SELECT n_nationkey AS k,
             CASE WHEN n_nationkey < 6 THEN CAST(10 + n_nationkey AS VARCHAR)
                  ELSE CAST(400 + n_nationkey AS VARCHAR) END AS b
      FROM nation WHERE n_nationkey < 12),
    cells AS (
      SELECT i, b, CASE WHEN (i*7 + k*3 + r.r) % 13 = 12 THEN 0
                        ELSE (i*7 + k*3 + r.r) % 13 END AS q
      FROM items, branches, (SELECT unnest([0, 1]) AS r) r),
    agg AS (
      SELECT b, i, CAST(sum(q) AS BIGINT) AS distro
      FROM cells GROUP BY b, i HAVING sum(q) <> 0)
    SELECT CAST(CASE WHEN regexp_matches(b, '^\\d{2}$') THEN '1' || b ELSE b END AS INT) AS "Branch",
           CAST(i AS BIGINT)    AS "Item",
           ''                   AS "Description",
           distro               AS "Distro Size",
           81214                AS "Supplier On Record",
           DATE '2026-01-07'    AS "Expected Delivery Date",
           'P2E'                AS "WW Buyer",
           ''                   AS "Warehouse",
           ''                   AS "AdditionalXDCK",
           ''                   AS "AmountCode",
           CAST(NULL AS DOUBLE) AS "XDCK",
           ''                   AS "POSTXDCK",
           CAST(NULL AS DOUBLE) AS "FOB"
    FROM agg
"""


# --------------------------------------------------------------------------
# 247 price sheet (q48)
# --------------------------------------------------------------------------

PRICE_STORES = ["407", "436", "449", "452", "457", "453", "490"]


def pricesheet_grid(sf_dir: str) -> pd.DataFrame:
    """Header row 1 (Item# | Item Name | FOB | store cols incl. the 490
    remap and 457/453 exclusions), money-text cells with paren negatives,
    plus zero/NA item rows the clean step must drop."""
    rows = [["PRICE SHEET"]]
    rows.append(["Item#", "Item Name", "FOB"] + PRICE_STORES)
    for i in _items(sf_dir, 150):
        cells = []
        for k in range(len(PRICE_STORES)):
            c = (i * 31 + k * 17) % 997
            if c % 7 == 0:
                cells.append("")
            elif c % 11 == 0:
                cells.append(f"({c // 100}.{c % 100:02d})")
            else:
                cells.append(f"${c // 100}.{c % 100:02d}")
        rows.append([str(i), f"name {i}", f"{i}.99"] + cells)
    for junk in ("", "0", "nan"):
        rows.append([junk, "junk", "0"] + ["$1.00"] * len(PRICE_STORES))
    return _grid(rows)


PRICESHEET_ORACLE = """
    -- p_partkey = 0 exists in the grid but the clean step DROPS zero/NA
    -- item rows (pricesheet_tool.py:39-42) — mirror that here
    WITH items AS (SELECT p_partkey AS i FROM part
                   WHERE p_partkey <= 150 AND p_partkey <> 0),
    stores AS (SELECT * FROM (VALUES ('407',0),('436',1),('449',2),('452',3),
                                     ('457',4),('453',5),('490',6)) s(code, k)),
    cells AS (SELECT i, code, (i*31 + k*17) % 997 AS c FROM items, stores),
    keep AS (SELECT * FROM cells
             WHERE code NOT IN ('457','453') AND c % 7 <> 0)
    SELECT CASE WHEN code = '490' THEN '498' ELSE code END AS "Store#",
           CAST(i AS VARCHAR)                              AS "Item#",
           81214                                           AS "Vendor#",
           CASE WHEN c % 11 = 0 THEN -(c / 100.0) ELSE c / 100.0 END AS "Cost"
    FROM keep
"""


# --------------------------------------------------------------------------
# ACME / Phillips (q49 / q50)
# --------------------------------------------------------------------------

_ACME_DOCKS = [189, 436, 407, 499, 888]


def _acme_like_rows(sf_dir: str) -> list[tuple[int, int, str, str]]:
    out = []
    for i in _items(sf_dir, 150):
        d = _ACME_DOCKS[i % 5]
        b = str(10 + i % 80) if i % 3 == 0 else str(400 + i % 90)
        q = (i * 5 + d) % 9
        cell = "x" if q == 7 else str(q)
        out.append((i, d, b, cell))
    return out


def acme_grid(sf_dir: str) -> pd.DataFrame:
    """Header row 0 with TWO leading junk columns; dock/Branch/Item/Distro
    plus a trailing column the Distro-Size slice removes. Distro cells
    include non-numeric text (kept by the reference's ne(0) quirk)."""
    rows = [["j1", "j2", "dock", "Branch", "Item", "Distro Size", "cut me"]]
    for i, d, b, cell in _acme_like_rows(sf_dir):
        rows.append(["x", "y", str(d), b, str(i), cell, "zzz"])
    return _grid(rows)


def phillips_grid(sf_dir: str) -> pd.DataFrame:
    """Same shape with ONE leading junk column (phillips_tool.py:47-48)."""
    rows = [["j1", "dock", "Branch", "Item", "Distro Size", "cut me"]]
    for i, d, b, cell in _acme_like_rows(sf_dir):
        rows.append(["x", str(d), b, str(i), cell, "zzz"])
    return _grid(rows)


def _acme_like_oracle(docks: str, supplier: int, warehouse: str, extra: str) -> str:
    return f"""
    WITH rows_ AS (
      SELECT p_partkey AS i,
             CASE (p_partkey % 5) WHEN 0 THEN 189 WHEN 1 THEN 436
                  WHEN 2 THEN 407 WHEN 3 THEN 499 ELSE 888 END AS d,
             CASE WHEN p_partkey % 3 = 0 THEN CAST(10 + (p_partkey % 80) AS VARCHAR)
                  ELSE CAST(400 + (p_partkey % 90) AS VARCHAR) END AS b
      FROM part WHERE p_partkey <= 150),
    v AS (SELECT i, d, b, (i*5 + d) % 9 AS q FROM rows_),
    keep AS (SELECT * FROM v WHERE d IN ({docks}) AND q <> 0)
    SELECT CAST(CASE WHEN regexp_matches(b, '^\\d{{2}}$') THEN '1' || b ELSE b END AS INT) AS "Branch",
           CAST(i AS BIGINT) AS "Item",
           ''                AS "Description",
           CASE WHEN q = 7 THEN CAST(NULL AS BIGINT) ELSE CAST(q AS BIGINT) END AS "Distro Size",
           {supplier}        AS "Supplier On Record",
           DATE '2026-01-07' AS "Expected Delivery Date",
           'P20'             AS "WW Buyer",
           {warehouse}       AS "Warehouse",
           ''                AS "AdditionalXDCK",
           ''                AS "AmountCode",
           CAST(NULL AS DOUBLE) AS "XDCK",
           ''                AS "POSTXDCK",
           CAST(NULL AS DOUBLE) AS "FOB"{extra}
    FROM keep
"""


ACME_ORACLE = _acme_like_oracle("189, 436", 44602, "''", "")
PHILLIPS_ORACLE = _acme_like_oracle(
    "407", 53459, "CAST(d AS VARCHAR)",
    ',\n           CAST(NULL AS DOUBLE) AS "XdockCode"',
)


# --------------------------------------------------------------------------
# SouthernCross (q51)
# --------------------------------------------------------------------------

def southern_cross_grid(sf_dir: str) -> pd.DataFrame:
    """Header row 0; LOT#-and-right sliced off; cells exercise the per-cell
    coercion: 'na'→0, '9.0'→9, '5.50'→5.5 float, plus Item==0 row drops."""
    branches = [_branch(k) for k in range(12)]
    rows = [["Item", "Description"] + branches + ["LOT #", "junk"]]
    for i in _items(sf_dir, 150):
        for r in (0, 1):
            cells = []
            for k in range(12):
                v = (i * 7 + k * 3 + r * 2) % 11
                if v == 10:
                    cells.append("na")
                elif v == 9:
                    cells.append("9.0")
                elif v == 5:
                    cells.append("5.50")
                else:
                    cells.append(str(v))
            rows.append([str(i), f"d{i}"] + cells + ["L1", "zz"])
    rows.append(["0", "drop"] + ["1"] * 12 + ["L1", "zz"])
    rows.append(["", "drop"] + ["1"] * 12 + ["L1", "zz"])
    return _grid(rows)


SOUTHERN_CROSS_ORACLE = """
    -- p_partkey = 0 is dropped by the coercion's Item==0 rule
    -- (southern_cross_tool.py:103-112) — mirror that here
    WITH items AS (SELECT p_partkey AS i FROM part
                   WHERE p_partkey <= 150 AND p_partkey <> 0),
    branches AS (
      SELECT n_nationkey AS k,
             CASE WHEN n_nationkey < 6 THEN CAST(10 + n_nationkey AS VARCHAR)
                  ELSE CAST(400 + n_nationkey AS VARCHAR) END AS b
      FROM nation WHERE n_nationkey < 12),
    cells AS (
      SELECT i, b, (i*7 + k*3 + r.r*2) % 11 AS v
      FROM items, branches, (SELECT unnest([0, 1]) AS r) r),
    vals AS (
      SELECT i, b, CASE WHEN v = 10 THEN 0 WHEN v = 5 THEN 5.5 ELSE v END AS q
      FROM cells),
    agg AS (
      SELECT b, i, CAST(floor(sum(q)) AS BIGINT) AS distro
      FROM vals GROUP BY b, i HAVING sum(q) <> 0)
    SELECT CAST(CASE WHEN regexp_matches(b, '^\\d{2}$') THEN '1' || b ELSE b END AS INT) AS "Branch",
           CAST(i AS BIGINT)    AS "Item",
           ''                   AS "Description",
           distro               AS "Distro Size",
           80104                AS "Supplier On Record",
           DATE '2026-01-07'    AS "Expected Delivery Date",
           'P2M'                AS "WW Buyer",
           ''                   AS "Warehouse",
           ''                   AS "AdditionalXDCK",
           ''                   AS "AmountCode",
           CAST(NULL AS DOUBLE) AS "XDCK",
           ''                   AS "POSTXDCK",
           CAST(NULL AS DOUBLE) AS "FOB"
    FROM agg
"""


# --------------------------------------------------------------------------
# Flips big (q52)
# --------------------------------------------------------------------------

def _flip_store(k: int) -> str:
    return str(10 + k) if k < 3 else str(210 + k)


def big_flip_grid(sf_dir: str) -> pd.DataFrame:
    """The big-flip region: store Fob/Xdock block in rows 0-3 (cols E..),
    header row 4 with 3 positional junk columns, money-text cells, Lot #
    column, and a PO # marker column the elif-chain trims at."""
    stores = [_flip_store(k) for k in range(6)]
    fobs = [f"{k}.5" for k in range(6)]
    xdocks = [str(k) for k in range(6)]  # k=0 -> '0' -> zero→blank (J3)
    rows = [
        ["BIG FLIP", "", "", ""] + [""] * 6 + ["", ""],
        ["", "", "", "Fob"] + fobs + ["", ""],
        ["", "", "", ""] + [""] * 6 + ["", ""],
        ["", "", "", "Xdock"] + xdocks + ["", ""],
        ["Item", "j1", "j2", "j3"] + stores + ["Lot #", "PO #"],
    ]
    for i in _items(sf_dir, 60):
        for r in (0, 1):
            cells = []
            for k in range(6):
                m = (i * 13 + r * 5 + k * 7) % 23
                if m == 22:
                    cells.append("")
                elif m % 2 == 0:
                    cells.append(f"${m}.25")
                else:
                    cells.append(f"${m}.50")
            rows.append([str(i), "a", "b", "c"] + cells + [f"L-{100 + r}", ""])
    return _grid(rows)


BIG_FLIP_ORACLE = """
    WITH items AS (SELECT p_partkey AS i FROM part WHERE p_partkey <= 60),
    stores AS (
      SELECT k.k AS k,
             CASE WHEN k.k < 3 THEN CAST(10 + k.k AS VARCHAR)
                  ELSE CAST(210 + k.k AS VARCHAR) END AS b
      FROM (SELECT unnest(generate_series(0, 5)) AS k) k),
    cells AS (
      SELECT i, k, b, (i*13 + r.r*5 + k*7) % 23 AS m
      FROM items, stores, (SELECT unnest([0, 1]) AS r) r),
    keep AS (
      SELECT *, CASE WHEN m % 2 = 0 THEN m + 0.25 ELSE m + 0.5 END AS val
      FROM cells WHERE m <> 22)
    SELECT CAST(CASE WHEN regexp_matches(b, '^\\d{2}$') THEN '1' || b ELSE b END AS INT) AS "Branch",
           CAST(i AS BIGINT)       AS "Item",
           ''                      AS "Description",
           CAST(ceil(val) AS BIGINT) AS "Distro Size",
           20000                   AS "Supplier On Record",
           DATE '2026-01-07'       AS "Expected Delivery Date",
           'P20'                   AS "WW Buyer",
           ''                      AS "Warehouse",
           ''                      AS "AdditionalXDCK",
           'W'                     AS "AmountCode",
           CASE WHEN k = 0 THEN CAST(NULL AS DOUBLE) ELSE CAST(k AS DOUBLE) END AS "XDCK",
           ''                      AS "POSTXDCK",
           CAST(k + 0.5 AS DOUBLE) AS "FOB"
    FROM keep
"""


# --------------------------------------------------------------------------
# Flips baby (q53)
# --------------------------------------------------------------------------

BABY_STORES = ["30", "31", "32", "33", "34"]


def baby_flip_grid(sf_dir: str) -> pd.DataFrame:
    """Baby region: header row 0, Wgt column to drop, stores positionally
    between 'pack size' and 'Lot #' (U4), 'na' cells for the NA normalizer,
    two rows per item so the 5-key sum aggregates."""
    rows = [
        ["Item", "Code", "some description", "pack size", "Wgt"]
        + BABY_STORES
        + ["Lot #", "junk"]
    ]
    for i in _items(sf_dir, 40):
        for r in (0, 1):
            cells = []
            for k in range(len(BABY_STORES)):
                v = (i * 3 + k * 5 + r) % 7
                cells.append("na" if v == 6 else f"{v}.2")
            rows.append(
                [str(i), f"c{i}", f"D{i}", str((i % 5) + 1), "9"]
                + cells
                + [f"LT{i % 3}", "zz"]
            )
    return _grid(rows)


BABY_FLIP_ORACLE = """
    WITH items AS (SELECT p_partkey AS i FROM part WHERE p_partkey <= 40),
    stores AS (SELECT k.k AS k, CAST(30 + k.k AS VARCHAR) AS s
               FROM (SELECT unnest(generate_series(0, 4)) AS k) k),
    cells AS (
      SELECT i, k, s, (i*3 + k*5 + r.r) % 7 AS v
      FROM items, stores, (SELECT unnest([0, 1]) AS r) r),
    vals AS (
      SELECT i, k, s,
             CAST(sum(CASE WHEN v = 6 THEN 0 ELSE v + 1 END) AS BIGINT) AS value
      FROM cells GROUP BY i, k, s
      HAVING sum(CASE WHEN v = 6 THEN 0 ELSE v + 1 END) <> 0)
    SELECT CAST(s AS INT)                         AS "Store",
           'PO-' || CAST(7000 + k AS VARCHAR)     AS "PO #",
           '1/6/2026'                             AS "Invoice Date",
           'D' || CAST(i AS VARCHAR)              AS "DESC",
           value                                  AS "Value",
           'LT' || CAST(i % 3 AS VARCHAR)         AS "LOT#",
           CAST(value * ((i % 5) + 1) AS BIGINT)  AS "weight",
           CAST((i % 5) + 1 AS DOUBLE)            AS "pack size",
           'C' || CAST(k AS VARCHAR)              AS "carrier code"
    FROM vals
"""


# --------------------------------------------------------------------------
# Deterministic REAL media fixtures (q108/q109): encoded PNG / WAV bytes
# generated per documents row inside mapInPandas, so the decode queries
# exercise the actual codecs (operators/codecs.py) end-to-end and a DuckDB
# oracle can recompute every derived statistic analytically from doc_id.
# --------------------------------------------------------------------------

def media_png_frame(docs):
    """One real PNG per document: grayscale w=4+id%13, h=3+id%11, pixel
    raster (id*31 + i) % 256 — dims and every pixel are pure functions of
    doc_id, so the oracle derives them in SQL."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from etl_jetro_spark.operators.codecs import encode_png

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("content", BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 11
                a = (did * 31) % 256
                px = bytes((a + i) % 256 for i in range(w * h))
                rows.append({"media_id": did, "content": encode_png(w, h, px)})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(gen, schema)


def media_wav_frame(docs):
    """One real 16-bit PCM mono WAV per document: 8 kHz,
    n=50+id%100 samples, s_i = ((id*7919 + i*104729) % 65536) - 32768."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from etl_jetro_spark.operators.codecs import encode_wav

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("content", BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 50 + did % 100
                c = did * 7919
                samples = [((c + i * 104729) % 65536) - 32768 for i in range(n)]
                rows.append(
                    {"media_id": did, "content": encode_wav(8000, samples)}
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(gen, schema)


def media_image_frame(docs):
    """Mixed-format image blobs, one per document, format by doc_id % 3:
    0 -> grayscale PNG (w=4+id%13, h=3+id%11, px=(id*31+i)%256),
    1 -> 24-bpp BMP    (w=2+id%9,  h=2+id%7,  bytes=(id*17+i)%256 BGR),
    2 -> GIF89a shell  (w=1+id%200, h=1+id%100, header-only).
    Every byte is a pure function of doc_id, so the q128 oracle derives
    format, dims, and exact value statistics analytically."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from etl_jetro_spark.operators.codecs import (
        encode_bmp24,
        encode_gif_header,
        encode_png,
    )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("content", BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                m = did % 3
                if m == 0:
                    w, h = 4 + did % 13, 3 + did % 11
                    a = (did * 31) % 256
                    blob = encode_png(w, h, bytes((a + i) % 256 for i in range(w * h)))
                elif m == 1:
                    w, h = 2 + did % 9, 2 + did % 7
                    blob = encode_bmp24(
                        w, h, bytes(((did * 17) + i) % 256 for i in range(w * h * 3))
                    )
                else:
                    blob = encode_gif_header(1 + did % 200, 1 + did % 100)
                rows.append({"media_id": did, "content": blob})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(gen, schema)
