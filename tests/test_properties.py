"""Property-based tests (hypothesis): invariants that goldens can't cover.

No Ray needed — these exercise the pure kernels (registry scan, oracle,
luhn, split_name, cascade, interval merging)."""

import re

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from nerpii_ray.config import EngineConfig
from nerpii_ray.functions.hashing import luhn_complete, luhn_valid
from nerpii_ray.functions.textfns import normalize_surface_one, split_name_batch
from nerpii_ray.oracle.reference_oracle import oracle_mentions
from nerpii_ray.stages.assign import cascade_assign
from nerpii_ray.state.registry import (
    PRESIDIO_STAGES,
    STAGE_MODEL_SPAN,
    RecognizerRegistry,
)
from nerpii_ray.gazetteers import (
    CITIES,
    FIRST_NAMES_FEMALE,
    FIRST_NAMES_MALE,
    LAST_NAMES,
    ORG_NAMES,
    STREET_NAMES,
    US_STATES,
)

_COMPILED = RecognizerRegistry().compile()


# --- building blocks for synthetic turn text ---
_PIECES = st.sampled_from(
    [f"{f} {l}" for f in (FIRST_NAMES_FEMALE[:8] + FIRST_NAMES_MALE[:8]) for l in LAST_NAMES[:4]]
    + CITIES[:10]
    + US_STATES[:10]
    + ORG_NAMES[:8]
    + [f"{n} {s} Street" for n in (12, 99) for s in STREET_NAMES[:4]]
    + ["john.doe@example.com", "(555) 123-4567", "865-50-6891", "2024-03-14",
       "https://www.example.org/x", "plain words here", "?", ""]
    # ADVICE r3: shapes for the four patterns the oracle initially lacked
    + ["912-78-1234", "912-45-6789",   # ITIN middle-group range vs plain SSN
       "AB1234563", "XY9871234",       # DEA checksum valid / invalid-consumed
       "AB1234567C",                   # IT driver licence shape
       luhn_complete("1234567890"),    # partita IVA, checksum-valid
       "12345678901"]                  # 11 digits, Luhn-invalid → bank fallback
    # round-4 pack: UK NHS / SG NRIC / AU TFN / AU ABN shapes
    + ["403 555 0000", "4035550000",   # NHS valid (spaced + contiguous)
       "123 456 7890",                 # NHS-shaped, invalid → phone fallback
       "1234567890",                   # contiguous invalid → bank fallback
       "S1234567D", "T1234567J",       # NRIC valid
       "S1234567A",                    # NRIC invalid → consumed
       "123456707", "123456789",       # TFN valid / invalid → bank
       "51824753556",                  # ABN valid, Luhn-invalid → AU_ABN
       "10000003946"]                  # ABN valid AND Luhn-valid → IT_VAT wins
    # round-4 second tier: AU Medicare/ACN, IN PAN/Aadhaar, ES/PL/FI
    + ["2123 45670 1",                 # Medicare valid, 4-5-1 display form
       "2123456700",                   # Medicare valid, contiguous (NHS chain)
       "3999 99999 9",                 # Medicare-shaped, checksum-invalid
       "010485766",                    # ACN valid (TFN-invalid 9-digit run)
       "44051401359", "44051401350",   # PESEL valid / invalid 11-digit
       "12345678Z", "12345678A",       # NIF valid / invalid letter
       "010190-123M", "010190-123X",   # HETU valid / invalid check char
       "ABCDE1234F",                   # PAN shape
       "234567890009", "234567890001"]  # Aadhaar Verhoeff valid / invalid
)


@st.composite
def turn_texts(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    glue = draw(st.sampled_from([" ", ", ", " and ", ". "]))
    return glue.join(draw(_PIECES) for _ in range(n))


@given(turn_texts())
@settings(max_examples=200, deadline=None)
def test_engine_scan_agrees_with_oracle(text):
    """The batched engine scan and the straight-line oracle must emit the
    same (entity, surface) mention multiset on any gazetteer-built text —
    the invariant behind the P/R gate."""
    out = _COMPILED.scan([text])
    node_stages = set(PRESIDIO_STAGES) | {STAGE_MODEL_SPAN}
    engine = sorted(
        (e, s)
        for e, s, stg in zip(out["entity"], out["surface"], out["stage"])
        if stg in node_stages
    )
    oracle = sorted((m["entity"], m["surface"]) for m in oracle_mentions(text))
    assert engine == oracle, f"text={text!r}\nengine={engine}\noracle={oracle}"


@given(st.text(alphabet="0123456789", min_size=12, max_size=18))
@settings(max_examples=100)
def test_luhn_complete_always_valid(digits):
    assert luhn_valid(luhn_complete(digits))


@given(st.lists(st.sampled_from(["Anna", "Maria Luisa", "X", ""]), min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_split_name_total(values):
    df = pd.DataFrame({"n": [v if v else None for v in values]})
    out = split_name_batch(df, "n")
    assert len(out) == len(values)
    assert out["first_name"].notna().all()
    assert out["last_name"].notna().all()
    for v, f in zip(values, out["first_name"]):
        if v:
            assert f == v.split()[0]
        else:
            assert f == "-"


@given(
    st.dictionaries(
        st.sampled_from(["PERSON", "LOCATION", "EMAIL_ADDRESS", "GPE"]),
        st.integers(min_value=1, max_value=50),
        min_size=1,
    ),
    st.integers(min_value=1, max_value=200),
)
@settings(max_examples=200)
def test_cascade_invariants(hist, n_rows):
    out = cascade_assign(hist, {}, n_rows, "some_column", EngineConfig())
    total = sum(hist.values())
    if out is not None:
        assert 0 < out["confidence_score"] <= 1.0
        assert out["entity"] in set(hist) | {"LOCATION"}
    if total > 0.3 * n_rows:
        assert out is not None  # the gate is the only way to None here
    # scaling every count by 4 never un-assigns or changes the winner
    if out is not None:
        out4 = cascade_assign(
            {k: v * 4 for k, v in hist.items()}, {}, n_rows, "some_column",
            EngineConfig(),
        )
        assert out4 is not None
        assert out4["entity"] == out["entity"]


@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60),
       st.integers(min_value=1, max_value=59))
@settings(max_examples=100, deadline=None)
def test_session_interval_merge_associative(ts, cut):
    """Sessionizing a split event set in two halves and merging must equal
    sessionizing the whole — the associativity the tree aggregate relies
    on (stages/window.py)."""
    gap = 100

    def sessions_direct(points):
        pts = sorted(points)
        n = 1
        for a, b in zip(pts, pts[1:]):
            if b - a > gap:
                n += 1
        return n

    def intervals(points):
        pts = sorted(points)
        out = []
        for p in pts:
            if out and p - out[-1][1] <= gap:
                out[-1] = (out[-1][0], max(out[-1][1], p))
            else:
                out.append((p, p))
        return out

    def merge(a, b):
        out = []
        for s, e in sorted(a + b):
            if out and s - out[-1][1] <= gap:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        return out

    cut = min(cut, len(ts))
    merged = merge(intervals(ts[:cut]), intervals(ts[cut:]))
    n_direct = sessions_direct(ts)
    assert len(merged) == n_direct


@given(st.text(max_size=50))
@settings(max_examples=100)
def test_normalize_idempotent(s):
    once = normalize_surface_one(s)
    assert normalize_surface_one(once) == once
