"""Pure-function tests (no Ray), mirroring the reference's unit tests for
``frequency`` / ``split_name`` / the ADDRESS deny list
(``tests/test_named_entity_recognizer.py:14-132, 158-167``)."""

import pandas as pd
import pyarrow as pa

from nerpii_ray.functions.hashing import (
    canonical_id,
    luhn_complete,
    luhn_valid,
    md5_hex,
    stable_hash64,
)
from nerpii_ray.functions.textfns import (
    fill_null_strings,
    gender_of_first_names,
    normalize_surface,
    normalized_text,
    split_name_batch,
    token_counts,
)
from nerpii_ray.gazetteers import STREET_WORDS


def test_split_name_golden():
    # reference golden: tests/test_named_entity_recognizer.py:158-167
    df = pd.DataFrame({"person": ["George Bush", None, "Hillary Clinton"]})
    out = split_name_batch(df, "person")
    assert "person" not in out.columns
    assert list(out["first_name"]) == ["George", "-", "Hillary"]
    assert list(out["last_name"]) == ["Bush", "-", "Clinton"]


def test_split_name_middle_names_dropped():
    # only first two tokens kept (named_entity_recognizer.py:66-68)
    df = pd.DataFrame({"n": ["Anna Maria Rossi", "Cher"]})
    out = split_name_batch(df, "n")
    assert list(out["first_name"]) == ["Anna", "Cher"]
    assert list(out["last_name"]) == ["Maria", "-"]


def test_split_name_nondefault_index_aligned():
    # engine fixes the reference's positional-assignment bug
    # (named_entity_recognizer.py:70-71; FIXTURES.md "Known reference defects")
    df = pd.DataFrame({"n": ["George Bush", "Hillary Clinton"]}, index=[7, 3])
    out = split_name_batch(df, "n")
    assert list(out["first_name"]) == ["George", "Hillary"]


def test_street_words_deny_list():
    # same 25-word semantic set as named_entity_recognizer.py:115-141
    assert len(STREET_WORDS) == 25
    for w in ("Street", "Via", "Piazza", "C/", "Blvd"):
        assert w in STREET_WORDS


def test_fill_null_strings():
    t = pa.table({"a": ["x", None, "y"], "b": [1, 2, 3]})
    out = fill_null_strings(t, ["a"], "?")
    assert out.column("a").to_pylist() == ["x", "?", "y"]


def test_gender_lookup():
    s = pd.Series(["Mary", "GEORGE", "Zorblax", None, "Andrea"])
    out = list(gender_of_first_names(s))
    assert out == ["female", "male", "unknown", "Nan value", "andy"]


def test_normalize_surface():
    s = pd.Series(["  George   BUSH ", "Acme\tCorp"])
    assert list(normalize_surface(s)) == ["george bush", "acme corp"]


def test_token_counts_and_normalized_text():
    arr = pa.array(["a b  c", "", None, " x "])
    assert token_counts(arr).to_pylist() == [3, 0, 0, 1]
    assert normalized_text(arr).to_pylist() == ["a b c", "", None, "x"]


def test_luhn():
    assert luhn_valid("4532015112830366")  # classic Luhn-valid test number
    assert not luhn_valid("4532015112830367")
    c = luhn_complete("453201511283036")
    assert luhn_valid(c)


def test_canonical_id_matches_sql_md5():
    # contract: substr(md5(entity || ':' || norm), 1, 16) — DuckDB-checkable
    assert canonical_id("PERSON", "george bush") == md5_hex("PERSON:george bush")[:16]
    assert len(canonical_id("X", "y")) == 16


def test_stable_hash64_is_stable():
    assert stable_hash64("abc") == stable_hash64("abc")
    assert stable_hash64("abc") != stable_hash64("abd")


def test_scan_survives_nul_bytes_in_text():
    """A NUL byte inside a text must not shift the batch-concatenation
    offsets (it is the internal row separator)."""
    from nerpii_ray.state.registry import RecognizerRegistry

    reg = RecognizerRegistry().compile()
    out = reg.scan(["evil\x00text with john.doe@example.com", "Chicago"])
    got = {(r, e, s) for r, e, s in zip(out["row"], out["entity"], out["surface"])
           if e in ("EMAIL_ADDRESS", "LOCATION")}
    assert (0, "EMAIL_ADDRESS", "john.doe@example.com") in got
    assert (1, "LOCATION", "Chicago") in got


def test_date_time_month_name_forms():
    """DATE_TIME breadth: ISO and slash forms plus the month-name forms
    Presidio covers ("March 5, 2024", "5 Mar 2024") — README.md:37
    supported entities."""
    from nerpii_ray.state.registry import RecognizerRegistry

    reg = RecognizerRegistry().compile()
    texts = [
        "due 2024-03-05 sharp",
        "due 3/5/2024 sharp",
        "due March 5, 2024 sharp",
        "due 5 Mar 2024 sharp",
        "due Sept. 12, 2024 sharp",
    ]
    out = reg.scan(texts)
    dates = {(r, s) for r, e, s in zip(out["row"], out["entity"], out["surface"])
             if e == "DATE_TIME"}
    assert dates == {
        (0, "2024-03-05"),
        (1, "3/5/2024"),
        (2, "March 5, 2024"),
        (3, "5 Mar 2024"),
        (4, "Sept. 12, 2024"),
    }


def test_trailing_url_does_not_swallow_next_text():
    """A URL at the very end of a text must stop at the text boundary —
    the batch scan joins texts on NUL, which is not \\s, so an unbounded
    [^\\s]* path charset would run the match into the next text (observed
    on the foia Website column: one URL mention per 25 cells)."""
    from nerpii_ray.state.registry import RecognizerRegistry

    reg = RecognizerRegistry().compile()
    out = reg.scan(
        ["see https://www.example.org/a/b", "https://www.other.net/x", "Chicago"]
    )
    urls = {(r, s) for r, e, s in zip(out["row"], out["entity"], out["surface"])
            if e == "URL"}
    assert urls == {
        (0, "https://www.example.org/a/b"),
        (1, "https://www.other.net/x"),
    }
    assert (2, "LOCATION", "Chicago") in set(
        zip(out["row"], out["entity"], out["surface"])
    )


def test_hash_split_labels():
    import pandas as pd
    import numpy as np
    from nerpii_ray.functions.textfns import hash_split_labels

    keys = pd.Series(range(2000)).astype(str)
    s = hash_split_labels(keys, [("test", 0.1), ("val", 0.1), ("train", None)])
    frac = s.value_counts(normalize=True)
    assert set(s.unique()) == {"train", "val", "test"}
    assert abs(frac["test"] - 0.1) < 0.03 and abs(frac["val"] - 0.1) < 0.03
    # stability: same key -> same split regardless of batch slicing
    s2 = hash_split_labels(keys.iloc[500:600], [("test", 0.1), ("val", 0.1), ("train", None)])
    assert (s2.to_numpy() == s.iloc[500:600].to_numpy()).all()
    # different salt reshuffles
    s3 = hash_split_labels(keys, [("test", 0.1), ("val", 0.1), ("train", None)], salt="other")
    assert (s3 != s).any()


def test_phonetic4():
    import pandas as pd
    from nerpii_ray.functions.textfns import phonetic4

    out = phonetic4(pd.Series(
        ["robert", "rupert", "smith", "smyth", "ashcraft", "tymczak", "pfister", "a"]
    ))
    # robert/rupert and smith/smyth must block together
    assert out[0] == out[1] == "R163"
    assert out[2] == out[3] == "S530"
    # H/W-as-separator variant (documented): ashcraft -> A226 (not A261)
    assert out[4] == "A226"
    assert out[6][0] == "P"
    # short token pads with zeros
    assert out[7] == "A000"
    # collapse happens before vowel removal: 'tymczak' -> T522 under this
    # variant (z,k same class collapse; y drops after)
    assert out[5] == "T522"
