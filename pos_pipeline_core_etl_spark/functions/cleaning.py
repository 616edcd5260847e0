"""Scalar cleaning functions (reference parity: SURVEY §2.9).

Semantics re-expressed from the reference's pandas helpers
(``/root/reference/src/pos_core/etl/staging/cleaning_utils.py``):

- ``strip_invisibles``  (cleaning_utils.py:52-81): remove CR/TAB/NBSP/
  NNBSP/zero-width chars, collapse whitespace, trim.
- ``neutralize``        (cleaning_utils.py:84-108): formula-injection
  guard — prefix ``'`` when a cell starts with ``= + @ -``.
- ``to_float``          (cleaning_utils.py:111-197): locale-robust number
  parse (EU ``1.234,56`` vs US ``1,234.56``, parenthesised negatives,
  currency strip) — Arrow-vectorized pandas UDF, the one hot-path escape
  to Python this module allows.
- ``to_date_multi``     (cleaning_utils.py:225-258): multi-format date
  coercion via ``coalesce(to_date(...))`` — pure JVM.
- ``remove_accents``    (cleaning_utils.py:261-313): accent folding via a
  translate table — pure JVM (no UDF needed for Spanish text).

Everything except ``to_float`` stays inside whole-stage codegen.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# invisible-character stripping

# CR, TAB, NBSP (U+00A0), NNBSP (U+202F), zero-width (U+200B-D), BOM (U+FEFF)
_INVISIBLES = "[\\r\\t\\u00a0\\u202f\\u200b\\u200c\\u200d\\ufeff]"


def strip_invisibles(col: Column) -> Column:
    """Remove invisible unicode noise and collapse runs of whitespace."""
    c = F.regexp_replace(col, _INVISIBLES, " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def neutralize(col: Column) -> Column:
    """Prefix ``'`` when the value starts with a formula-injection char."""
    first = F.substring(col, 1, 1)
    return F.when(
        col.isNotNull() & first.isin("=", "+", "@", "-"),
        F.concat(F.lit("'"), col),
    ).otherwise(col)


# ---------------------------------------------------------------------------
# locale-robust number parsing

_CURRENCY_RE = re.compile(r"[^\d,.\-()]")


_PLAIN_FLOAT_RE = re.compile(r"[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?")


def _parse_locale_number(s: object) -> float | None:
    if s is None:
        return None
    text = str(s).strip()
    if not text:
        return None
    # canonical machine representations (incl. scientific notation) parse
    # directly; the locale heuristics below are for human-formatted cells
    if _PLAIN_FLOAT_RE.fullmatch(text):
        try:
            return float(text)
        except ValueError:  # pragma: no cover - fullmatch guarantees parse
            return None
    neg = False
    if text.startswith("(") and text.endswith(")"):
        neg = True
        text = text[1:-1]
    text = _CURRENCY_RE.sub("", text)
    if not text or text in {"-", ".", ","}:
        return None
    if text.startswith("-"):
        neg = True
        text = text[1:]
    if "-" in text:
        # any '-' surviving the leading-sign strip ('--5', '1-2') is garbage
        return None
    has_dot = "." in text
    has_comma = "," in text
    try:
        if has_dot and has_comma:
            # rightmost separator is the decimal point
            if text.rfind(",") > text.rfind("."):
                text = text.replace(".", "").replace(",", ".")
            else:
                text = text.replace(",", "")
        elif has_comma:
            # strict thousands grouping (cleaning_utils.py:178-183): only
            # 1,234[,567...] is thousands; anything else ('1234,567',
            # '12,3456') treats the comma as the decimal separator
            if re.fullmatch(r"\d{1,3}(?:,\d{3})+", text):
                text = text.replace(",", "")
            else:
                text = text.replace(",", ".")
        elif has_dot and text.count(".") > 1:
            # multiple dots: thousands only when the grouping is strict
            # (cleaning_utils.py:185-193); else fall through → float fails
            if re.fullmatch(r"\d{1,3}(?:\.\d{3})+", text):
                text = text.replace(".", "")
        value = float(text)
    except ValueError:
        return None
    return -value if neg else value


@F.pandas_udf(T.DoubleType())
def to_float(s: pd.Series) -> pd.Series:  # pragma: no cover - exercised via Spark
    """Vectorized locale-robust number parse (Arrow batches, not per-row)."""
    return s.map(_parse_locale_number).astype("float64")


def to_float_expr(col: Column) -> Column:
    """Pure-JVM fast path for the common subset of ``to_float``.

    Handles: currency symbols/spaces, parenthesised negatives, US
    ``1,234.56`` and EU ``1.234,56`` with both separators present, and a
    single comma decimal. Stays in codegen; use :func:`to_float` when the
    full pandas heuristic (ambiguous single-separator cases) is required.
    """
    s = F.trim(col.cast("string"))
    is_paren = s.rlike(r"^\(.*\)$")
    body = F.when(is_paren, F.regexp_replace(s, r"^\((.*)\)$", "$1")).otherwise(s)
    body = F.regexp_replace(body, r"[^\d,.\-]", "")
    eu = F.regexp_replace(F.regexp_replace(body, r"\.", ""), ",", ".")
    us = F.regexp_replace(body, ",", "")
    # both separators present → rightmost decides; comma-only → strict
    # thousands grouping (cleaning_utils.py:178-183) else comma is decimal
    comma_pos = F.length(body) - F.length(F.regexp_replace(body, r"^.*,", ""))
    dot_pos = F.length(body) - F.length(F.regexp_replace(body, r"^.*\.", ""))
    has_comma = body.contains(",")
    has_dot = body.contains(".")
    parsed = (
        F.when(has_comma & has_dot & (comma_pos > dot_pos), eu)
        .when(has_comma & has_dot, us)
        .when(has_comma & body.rlike(r"^-?\d{1,3}(,\d{3})+$"), us)
        .when(has_comma, eu)
        .when(body.rlike(r"^-?\d{1,3}(\.\d{3}){2,}$"), F.regexp_replace(body, r"\.", ""))
        .otherwise(body)
    ).try_cast("double")
    # malformed bodies ('--5', '1.2.3' non-grouped) cast to NULL, matching
    # the reference's float()-failure → None
    return F.when(is_paren, -parsed).otherwise(parsed)


def to_int_expr(col: Column) -> Column:
    """``round(to_float(x))`` → BIGINT, else NULL (reference
    ``cleaning_utils.py:200-222``). Python's ``round`` is half-to-even,
    so this is ``bround`` — NOT ``round`` (half-up) — over the locale
    parse; DuckDB twin is ``round_even``."""
    return F.bround(to_float_expr(col)).cast("long")


# ---------------------------------------------------------------------------
# dates

DATE_FORMATS = ("yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy", "dd-MM-yyyy")


def to_date_multi(col: Column, formats: tuple[str, ...] = DATE_FORMATS) -> Column:
    """Try each format in order; first success wins (reference order kept)."""
    attempts = [F.try_to_timestamp(col, F.lit(fmt)).cast("date") for fmt in formats]
    return F.coalesce(*attempts)


# ---------------------------------------------------------------------------
# accent folding (Spanish)

_ACCENT_SRC = "áéíóúüñÁÉÍÓÚÜÑàèìòùÀÈÌÒÙâêîôûÂÊÎÔÛ"


def _fold(ch: str) -> str:
    decomposed = unicodedata.normalize("NFD", ch)
    stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
    return stripped or ch


_ACCENT_DST = "".join(_fold(c) for c in _ACCENT_SRC)


def remove_accents_col(col: Column) -> Column:
    """Accent-strip via a translate table — JVM-side, no UDF."""
    return F.translate(col, _ACCENT_SRC, _ACCENT_DST)


def normalize_spanish_name(col: Column) -> Column:
    """Accent-strip + lower + collapse whitespace (cleaning_utils.py:261-313)."""
    c = remove_accents_col(col)
    c = F.lower(c)
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


# functions above are shipped to executors (pandas UDF) — serialize by value
from pos_pipeline_core_etl_spark.functions.serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
