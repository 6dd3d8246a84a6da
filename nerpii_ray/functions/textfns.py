"""Vectorized text functions (SURVEY §2.2, §2.8).

Each function is a batch-level kernel (pyarrow.compute / pandas string
methods) intended for use inside ``Dataset.map_batches`` — never a
per-row Python loop in a hot stage.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from nerpii_ray.gazetteers import FIRST_NAME_GENDER

_WS_RE = re.compile(r"\s+")


def fill_null_strings(table: pa.Table, columns: list[str], filler: str = "?") -> pa.Table:
    """NaN fill for string columns before detection.

    Reference: object columns ``fillna(nan_filler)`` with default ``"?"``
    (``named_entity_recognizer.py:318-321``).
    """
    for col in columns:
        idx = table.schema.get_field_index(col)
        if idx >= 0:
            table = table.set_column(
                idx, col, pc.fill_null(table.column(col), filler)
            )
    return table


def split_name_batch(df: pd.DataFrame, column: str) -> pd.DataFrame:
    """Split a "First Last" column into ``first_name`` / ``last_name``.

    Reference semantics (``named_entity_recognizer.py:30-75``): nulls become
    ``"- -"``; whitespace split; single-token values padded with ``"-"``;
    only the first two tokens are kept (middle names dropped, ``:66-68``);
    the source column is dropped (``:73``).  The reference's positional
    Series assignment bug (``:70-71``, misaligns on a non-default index) is
    fixed here: assignment is index-aligned (documented divergence,
    FIXTURES.md "Known reference defects").
    """
    filled = df[column].fillna("- -").astype(str)
    parts = filled.str.split()
    df = df.drop(columns=[column])
    df["first_name"] = parts.str[0].fillna("-")
    df["last_name"] = parts.str[1].fillna("-")
    return df


def gender_of_first_names(names: pd.Series) -> pd.Series:
    """Gender enrichment (``named_entity_recognizer.py:203-231``).

    The reference uses gender_guesser; here a gazetteer lookup with the
    same output vocabulary (male / female / andy / unknown / "Nan value").
    Case-insensitive, as the reference constructs
    ``Detector(case_sensitive=False)`` (``:217``).
    """
    lut = {k.lower(): v for k, v in FIRST_NAME_GENDER.items()}
    out = names.str.lower().map(lut)
    out = out.where(~names.isna(), "Nan value")
    return out.fillna("unknown")


def normalize_surface(values: pd.Series) -> pd.Series:
    """Canonicalization key: casefold, strip, collapse whitespace."""
    return (
        values.astype(str).str.strip().str.replace(_WS_RE, " ", regex=True).str.lower()
    )


def normalize_surface_one(value: str) -> str:
    return _WS_RE.sub(" ", value.strip()).lower()


def token_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count per string; empty / null → 0.

    Matches SQL ``length(list_filter(regexp_split_to_array(text, '\\s+'),
    x -> x <> ''))``.
    """
    # count non-space runs: split on \s+ yields empty strings at the edges,
    # so count matches of \S+ instead.
    counts = pc.count_substring_regex(texts, pattern=r"\S+")
    return pc.fill_null(counts, 0)


def normalized_text(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """lower + collapse internal whitespace + strip, for fingerprints.

    Matches SQL ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``.
    """
    x = pc.replace_substring_regex(texts, pattern=r"\s+", replacement=" ")
    x = pc.utf8_trim_whitespace(x)
    return pc.utf8_lower(x)


def md5_of_strings(values: pd.Series) -> pd.Series:
    """Vectorized-enough md5 over a string Series (hashlib per value).

    md5 (not hash()) so DuckDB's ``md5()`` reproduces it exactly.
    """
    import hashlib

    return values.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def stable_hash64_np(values: pd.Series) -> np.ndarray:
    """Stable 64-bit content hash per string → uint64 ndarray."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
            for s in values.astype(str)
        ),
        dtype=np.uint64,
        count=len(values),
    )


def hash_split_labels(
    values: pd.Series,
    fractions: "list[tuple[str, float]]",
    salt: str = "split1",
) -> pd.Series:
    """Deterministic dataset-split assignment: each key draws a uniform
    integer in [0, 1e6) from md5("salt:key") (first 8 digest bytes
    big-endian — identical to SQL's
    ``CAST('0x' || substr(md5(...), 1, 16) AS UBIGINT) % 1000000``) and
    lands in the first split whose cumulative ppm threshold exceeds the
    draw; the LAST split takes the remainder.  Content-keyed, so the
    assignment is stable under retries, re-batching, resume, and adding
    new rows never reshuffles old ones — the train/val/test contract a
    training pipeline needs.

    ``fractions``: ordered [(label, fraction)] for every split BUT the
    remainder label, plus the remainder last with fraction None.
    """
    draws = (
        stable_hash64_np(salt + ":" + values.astype(str))
        % np.uint64(1_000_000)
    ).astype(np.int64)
    labels = np.full(len(values), fractions[-1][0], dtype=object)
    cum = 0
    for label, frac in fractions[:-1]:
        lo, cum = cum, cum + int(round(frac * 1_000_000))
        labels[(draws >= lo) & (draws < cum)] = label
    return pd.Series(labels, index=values.index, dtype="object")


_PHONETIC_TRANS = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"
)


def phonetic4(values: "pd.Series") -> "pd.Series":
    """Soundex-style 4-char phonetic code: first letter + the first 3
    consonant-class digits of the rest, adjacent equal digits collapsed
    BEFORE vowel removal, padded with '0'.  Variant note (stated, both
    sides replay it identically): H/W act as separators like vowels —
    classic American Soundex collapses same-code letters through H/W;
    this code does not.  Tokens are truncated to 40 chars so the SQL
    twin's 6-application pairwise replace chain provably reaches the
    fixed point (a run of length L collapses in ⌈log2 L⌉ passes).

    Deterministic and pure — the fuzzy-blocking key for entity
    resolution (group candidate names/tokens by code, verify inside
    blocks)."""
    import re as _re

    def code(t: str) -> str:
        t = t.upper()[:40]
        d = t.translate(_PHONETIC_TRANS)
        d = _re.sub(r"(.)\1+", r"\1", d)
        tail = d[1:].replace("0", "")
        return t[0] + (tail + "000")[:3]

    return values.map(code)
