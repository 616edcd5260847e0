"""Driver-side name utilities (SURVEY §2.9 — column/file naming).

Reference parity: ``to_snake`` (cleaning_utils.py:316-344), ``uniquify``
(cleaning_utils.py:347-367), ``slugify`` (etl/utils.py:408-435), plus
the accent/space normalization used for drop-list matching
(payments_cleaner.py:199-218). These shape COLUMN NAMES and file names
— always driver-side, never data-plane.
"""

from __future__ import annotations

import re
import unicodedata


def strip_accents(text: str) -> str:
    decomposed = unicodedata.normalize("NFKD", text)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


def to_snake(name: str) -> str:
    """Accent-strip + lower + non-word → space + spaces → underscore."""
    s = strip_accents(str(name)).lower()
    s = re.sub(r"[^\w\s]", " ", s)
    s = re.sub(r"\s+", "_", s.strip())
    return s


def uniquify(names: list[str]) -> list[str]:
    """Duplicate names → ``col``, ``col_2``, ``col_3`` (positional)."""
    seen: dict[str, int] = {}
    out = []
    for n in names:
        count = seen.get(n, 0)
        out.append(n if count == 0 else f"{n}_{count + 1}")
        seen[n] = count + 1
    return out


def slugify(text: str) -> str:
    """Filename-safe slug: NFKD, strip non-word, dashes."""
    s = strip_accents(str(text)).lower()
    s = re.sub(r"[^\w\s-]", "", s)
    s = re.sub(r"[\s_]+", "-", s.strip())
    return s.strip("-")


def normalize_for_match(name: str) -> str:
    """Accent/space-insensitive form used to match drop-lists."""
    return re.sub(r"\s+", " ", strip_accents(str(name)).lower()).strip()
