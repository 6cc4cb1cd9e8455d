"""C1-C7 — scalar function library (pure Column expressions).

Spectral index arithmetic (C1, menu at ``force/skel/TSA.prm:171-183``;
DSWI at ``force/skel/udf_block.py:52``), scale/round codecs (C2,
``udf_block.py:54``), normalizations (C3, ``config_hyperparameter.py:13-14``,
``pytorch/utils/Dataset.py:218-226``), date codecs (C4,
``udf_block.py:11-14``, ``pytorch/predict.py:400-415``), `doy mod 365` (C5),
argmax (C6, ``pytorch/predict.py:527-528``), string parsing (C7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPOCH = "1970-01-01"


# --- C1 spectral indices ----------------------------------------------------
# the reference spells these formulas out at dswi_harmonic_tsi.py:92-114
# (menu: TSA.prm:171-183); each is a two-line normalized-difference / ratio
# Column expression

def _nd(a: Column, b: Column) -> Column:
    """Normalized difference (a-b)/(a+b) — the common index shape."""
    return (a - b) / (a + b)


def ndvi(bnir: Column, red: Column) -> Column:
    """NDVI = (BNIR-RED)/(BNIR+RED) — dswi_harmonic_tsi.py:95-96."""
    return _nd(bnir, red)


def dswi(bnir: Column, green: Column, swir1: Column, red: Column) -> Column:
    """DSWI = (BNIR+GREEN)/(SWIR1+RED) — udf_block.py:52."""
    return (bnir + green) / (swir1 + red)


def evi(nir: Column, red: Column, blue: Column) -> Column:
    return 2.5 * (nir - red) / (nir + 6.0 * red - 7.5 * blue + 1.0)


def nbr(bnir: Column, swir2: Column) -> Column:
    """NBR = (BNIR-SWIR2)/(BNIR+SWIR2) — dswi_harmonic_tsi.py:92-93."""
    return _nd(bnir, swir2)


def ari(bnir: Column, green: Column, re1: Column) -> Column:
    """ARI = BNIR*((1/GREEN)-(1/RE1)) — dswi_harmonic_tsi.py:97-98."""
    return bnir * (1.0 / green - 1.0 / re1)


def cri(blue: Column, green: Column) -> Column:
    """CRI = (1/BLUE)-(1/GREEN) — dswi_harmonic_tsi.py:99-100."""
    return 1.0 / blue - 1.0 / green


def rendvi1(re1: Column, red: Column) -> Column:
    """RENDVI1 = (RE1-RED)/(RE1+RED) — dswi_harmonic_tsi.py:101-102."""
    return _nd(re1, red)


def rendvi2(re2: Column, red: Column) -> Column:
    """RENDVI2 = (RE2-RED)/(RE2+RED) — dswi_harmonic_tsi.py:103-104."""
    return _nd(re2, red)


def msi(swir1: Column, bnir: Column) -> Column:
    """MSI = SWIR1/BNIR — dswi_harmonic_tsi.py:107-108."""
    return swir1 / bnir


def ndwi(bnir: Column, swir1: Column) -> Column:
    """NDWI = (BNIR-SWIR1)/(BNIR+SWIR1) — dswi_harmonic_tsi.py:109-110
    (the Gao moisture variant the reference uses)."""
    return _nd(bnir, swir1)


def vmi(bnir: Column, swir2: Column) -> Column:
    """VMI = ((BNIR+0.1)-(SWIR2+0.02))/((BNIR+0.1)+(SWIR2+0.02)) —
    dswi_harmonic_tsi.py:111-112."""
    return _nd(bnir + 0.1, swir2 + 0.02)


def ccci(bnir: Column, re1: Column, red: Column) -> Column:
    """CCCI = NDRE/NDVI = ((BNIR-RE1)/(BNIR+RE1))/((BNIR-RED)/(BNIR+RED))
    — dswi_harmonic_tsi.py:113-114."""
    return _nd(bnir, re1) / _nd(bnir, red)


# --- C2/C3 scaling ------------------------------------------------------------

def scale_int16(v: Column, factor: int = 1000) -> Column:
    """np.round(v*factor) cast to smallint — udf_block.py:54. Half-EVEN
    (banker's) via rint, the same rule pack_tokens uses — numpy's np.round
    is half-even, so Spark's HALF_UP F.round would flip .5-on-even values
    (2.5 -> 3 instead of the reference's 2)."""
    return F.rint(v * factor).cast("smallint")


def feature_norm(v: Column) -> Column:
    """x * 1e-4 reflectance normalization (config_hyperparameter.py:13)."""
    return v * F.lit(1e-4)


def log_response(v: Column) -> Column:
    """log10(x+1) response scaling (Dataset.py:218-226)."""
    return F.log10(v + 1)


def unlog_response(v: Column) -> Column:
    """pow(10,x)-1 inverse (pytorch/predict.py:521-525)."""
    return F.pow(F.lit(10.0), v) - 1


# --- C4/C5 date codecs ---------------------------------------------------------

def day_to_date(day: Column | str) -> Column:
    col = F.col(day) if isinstance(day, str) else day
    return F.date_add(F.to_date(F.lit(EPOCH)), col.cast("int"))


def date_to_day(date: Column) -> Column:
    return F.datediff(date, F.to_date(F.lit(EPOCH)))


def yyyymmdd_to_date(key: Column) -> Column:
    return F.to_date(key.cast("string"), "yyyyMMdd")


def date_to_yyyymmdd(date: Column) -> Column:
    return F.date_format(date, "yyyyMMdd").cast("int")


def doy_since_start(date: Column, start: Column) -> Column:
    """W6: days since series start, 1-based (utils/class_run.py:172)."""
    return F.datediff(date, start) + 1


def doy_mod_365(doy: Column) -> Column:
    return F.pmod(doy, F.lit(365))


# --- C6 argmax ------------------------------------------------------------------

def argmax(arr: Column) -> Column:
    """0-based index of the max element (pytorch/predict.py:527-528)."""
    return F.array_position(arr, F.array_max(arr)) - 1


# --- C7 string parsing ------------------------------------------------------------

def year_from_name(name: Column) -> Column:
    # anchor to a plausible year: tile names carry 4-digit coordinates
    # (X0012_...) that a bare \d{4} would grab first
    return F.regexp_extract(name, r"((?:19|20)\d{2})", 1).cast("int")


def tile_coords(tile: Column) -> Column:
    """'X0012_Y0034' -> struct(x, y) (force_class_utils.py:253-255)."""
    return F.struct(
        F.regexp_extract(tile, r"X(\d+)", 1).cast("int").alias("x"),
        F.regexp_extract(tile, r"Y(\d+)", 1).cast("int").alias("y"),
    )


# --- W14 positional encodings (pytorch/models/transformer/Models.py:32-54) ---

def positional_encoding(doy: Column, dim_idx: int, d_model: int = 128) -> Column:
    """sin/cos positional encoding of a day-of-year position at channel
    dim_idx: sin for even channels, cos for odd, denominators 10000^(2i/d)."""
    angle = doy.cast("double") / F.pow(
        F.lit(10000.0), F.lit(2 * (dim_idx // 2) / d_model)
    )
    return F.sin(angle) if dim_idx % 2 == 0 else F.cos(angle)
