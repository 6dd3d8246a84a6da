"""Italian-language detection parity (VERDICT r2 #4) — mirrors
``test_reference_csvs.py`` on a deterministic Italian PersonalInfo-style
fixture built from the engine's own IT pools (no external data).

Reference parity: ``named_entity_recognizer.py:338-341, 359-370`` swaps
the whole NLP stack to ``it_core_news_lg`` when ``lang == "it"``; here
the same knob widens the detection gazetteers to the EN∪IT surface
union (``gazetteers.detection_sets``), keeps the it manual-rule column
aliases (cap / carta credito), and reuses the multilingual gender map.
"""

import pandas as pd
import pytest

from nerpii_ray.config import EngineConfig
from nerpii_ray.functions.hashing import codice_fiscale_check_char
from nerpii_ray.functions.textfns import gender_of_first_names
from nerpii_ray.gazetteers import (
    IT_CITIES,
    IT_FIRST_NAMES_FEMALE,
    IT_FIRST_NAMES_MALE,
    IT_LAST_NAMES,
    IT_REGIONS,
    IT_STREET_NAMES,
    IT_STREET_PREFIXES,
    detection_sets,
)
from nerpii_ray.pipelines.profile import profile_table
from nerpii_ray.state.registry import RecognizerRegistry


def _cf(base15: str) -> str:
    return base15 + codice_fiscale_check_char(base15)


@pytest.fixture(scope="module")
def italian_table():
    """Deterministic 60-row Italian personal-info table from the IT
    synthesis pools (nome, cognome, citta, regione, indirizzo, cap,
    codice_fiscale, email, telefono)."""
    n = 60
    firsts = IT_FIRST_NAMES_FEMALE + IT_FIRST_NAMES_MALE
    rows = []
    for i in range(n):
        fst = firsts[(i * 7) % len(firsts)]
        lst = IT_LAST_NAMES[(i * 3) % len(IT_LAST_NAMES)]
        city = IT_CITIES[(i * 13) % len(IT_CITIES)]
        reg = IT_REGIONS[(i * 11) % len(IT_REGIONS)]
        street = (
            f"{IT_STREET_PREFIXES[i % 4]} "
            f"{IT_STREET_NAMES[i % len(IT_STREET_NAMES)]} {1 + i}"
        )
        surname_tok = lst.split()[-1]
        base = f"{surname_tok[:3].upper()}{fst[:3].upper()}8{i % 10:d}A{i % 28 + 1:02d}H50{i % 10:d}"
        rows.append(
            {
                "nome": fst,
                "cognome": lst.split()[-1],
                "citta": city,
                "regione": reg,
                "indirizzo": street,
                "cap": f"{10000 + i * 137:05d}",
                "codice_fiscale": _cf(base[:15]),
                "email": f"{fst.lower()}.{lst.split()[-1].lower()}@esempio.it",
                "telefono": f"+39 0{i % 10} {1000 + i:04d} {5000 + i:04d}",
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def italian_profile(italian_table):
    return profile_table(
        italian_table, config=EngineConfig(lang="it"), get_gender_option=False
    )


def test_detection_sets_union():
    it = detection_sets("it")
    en = detection_sets("en")
    # Italian surfaces present only under lang="it" (avoid crossover
    # names like Giulia/Rossi that the EN pools already contain)
    assert "Alessia" in it.first_names and "Alessia" not in en.first_names
    assert "Esposito" in it.last_names and "Esposito" not in en.last_names
    assert "Milano" in it.loc_unigrams and "Milano" not in en.loc_unigrams
    assert "Lombardia" in it.loc_unigrams
    assert {"Regno Unito", "Paesi Bassi"} <= it.loc_bigrams
    # the union keeps full English recall (it model still knows John Smith)
    assert en.first_names <= it.first_names
    assert en.loc_unigrams <= it.loc_unigrams
    # ambiguous sigle excluded; unambiguous ones kept
    assert "TO" not in it.state_abbr and "MI" in it.state_abbr


def test_detection_sets_rejects_unknown_lang():
    with pytest.raises(ValueError):
        detection_sets("de")


def test_it_scan_free_text():
    reg = RecognizerRegistry(lang="it").compile()
    out = reg.scan(
        ["Il cliente Marco Rossi abita a Milano, regione Lombardia",
         "Sede nel Regno Unito, città di Città di Castello"]
    )
    got = {(r, e, s) for r, e, s in zip(out["row"], out["entity"], out["surface"])
           if not e.startswith(("B-", "I-"))}
    assert (0, "PERSON", "Marco Rossi") in got
    assert (0, "LOCATION", "Milano") in got
    assert (0, "LOCATION", "Lombardia") in got
    assert (1, "LOCATION", "Regno Unito") in got


def test_en_scan_bit_stable_on_italian_text():
    """lang='en' (the default) must NOT see the Italian-only surfaces —
    guarantees every pre-lang English result is unchanged."""
    reg = RecognizerRegistry().compile()
    out = reg.scan(["Marco Rossi abita a Milano, regione Lombardia"])
    ents = set(zip(out["entity"], out["surface"]))
    assert ("LOCATION", "Milano") not in ents
    assert ("LOCATION", "Lombardia") not in ents
    # Marco/Rossi happen to be in the EN pools already (common crossover)
    assert ("PERSON", "Marco Rossi") in ents


def test_accented_tokens_only_in_it_mode():
    it = RecognizerRegistry(lang="it").compile()
    # "Società" must come out as ONE token (accented class), so the org
    # keyword matches; under lang="en" the token regex splits at "à"
    out = it.scan(["La Società Acme ha sede a Genova"])
    assert ("ORGANIZATION", "Società Acme") in set(
        zip(out["entity"], out["surface"])
    )


def test_italian_profile_assignments(italian_profile):
    prof = italian_profile
    expected = {
        "nome": "PERSON",
        "cognome": "PERSON",
        "citta": "LOCATION",
        "regione": "LOCATION",
        "indirizzo": "ADDRESS",
        "email": "EMAIL_ADDRESS",
        "telefono": "PHONE_NUMBER",
        "codice_fiscale": "IT_FISCAL_CODE",
    }
    for col, ent in expected.items():
        assert prof[col] is not None, f"{col} unassigned: {prof}"
        assert prof[col]["entity"] == ent, (col, prof[col])
    # the it manual-rule alias assigns ZIPCODE to "cap"
    # (``named_entity_recognizer.py`` manual rules; stages/assign.py)
    assert prof["cap"] is not None and prof["cap"]["entity"] == "ZIPCODE"
    assert prof["cap"]["confidence_score"] == 1.0


def test_italian_profile_under_english_misses_localities(italian_table):
    """Control: the same table under lang='en' must under-detect the
    Italian-only localities — proves the knob changes behaviour."""
    prof = profile_table(italian_table, config=EngineConfig(lang="en"))
    assert prof["regione"] is None or prof["regione"]["entity"] != "LOCATION"


def test_italian_gender_enrichment():
    s = pd.Series(["Giulia", "Marco", "Andrea", "Salvatore", None, "zzz"])
    got = gender_of_first_names(s).tolist()
    assert got == ["female", "male", "andy", "male", "Nan value", "unknown"]
