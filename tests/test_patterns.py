"""Golden tests for the round-3 widened pattern catalog (VERDICT r2 #3):
IBAN_CODE (mod-97), IT_FISCAL_CODE (check-char table), CRYPTO,
US_PASSPORT, US_DRIVER_LICENSE, US_BANK_NUMBER — engine scan, validator
math, and engine≡oracle agreement.  Pure kernels, no Ray.

Reference parity: nerpii inherits every Presidio recognizer
(``/root/reference/README.md:37`` links Presidio's supported-entities
list); these are the finance/identity members of that list.
"""

import pandas as pd
import pytest

from nerpii_ray.functions.hashing import (
    codice_fiscale_check_char,
    codice_fiscale_valid,
    iban_valid,
)
from nerpii_ray.oracle.reference_oracle import oracle_mentions
from nerpii_ray.state.registry import RecognizerRegistry

_REG = RecognizerRegistry().compile()


def _scan_one(text):
    out = _REG.scan([text])
    return [
        (e, s, round(sc, 3))
        for e, s, sc in zip(out["entity"], out["surface"], out["score"])
    ]


# ------------------------------------------------------------ validators
def test_iban_mod97():
    # well-known published sample IBANs — all checksum-valid
    for good in (
        "DE44500105175407324931",
        "GB82WEST12345698765432",
        "FR1420041010050500013M02606",
        "IT60X0542811101000000123456",
    ):
        assert iban_valid(good), good
    assert not iban_valid("DE44500105175407324932")  # one digit off
    assert not iban_valid("DE4450010517")  # too short
    assert not iban_valid("1234500105175407324931")  # no country code


def test_codice_fiscale_check_char():
    # canonical example: Mario Rossi, born 01/01/1980, Roma (H501)
    assert codice_fiscale_check_char("RSSMRA80A01H501") == "U"
    assert codice_fiscale_valid("RSSMRA80A01H501U")
    assert not codice_fiscale_valid("RSSMRA80A01H501Z")


# ------------------------------------------------------------ engine scan
def test_iban_detected_only_when_checksum_valid():
    got = _scan_one("wire to DE44500105175407324931 today")
    assert ("IBAN_CODE", "DE44500105175407324931", 1.0) in got
    # invalid checksum: span consumed, nothing emitted, and the digits
    # inside must NOT surface as US_BANK_NUMBER
    got = _scan_one("wire to DE44500105175407324932 today")
    assert not any(e == "IBAN_CODE" for e, _, _ in got)
    assert not any(e == "US_BANK_NUMBER" for e, _, _ in got)


def test_fiscal_code_score_reflects_checksum():
    got = _scan_one("CF RSSMRA80A01H501U registrato")
    assert ("IT_FISCAL_CODE", "RSSMRA80A01H501U", 1.0) in got
    got = _scan_one("CF RSSMRA80A01H501Z registrato")  # shape ok, check bad
    assert ("IT_FISCAL_CODE", "RSSMRA80A01H501Z", 0.5) in got


def test_crypto_passport_license_bank():
    got = _scan_one("send 1 BTC to 1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2 now")
    assert ("CRYPTO", "1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2", 1.0) in got
    got = _scan_one("bech32 bc1qar0srrr7xfkvy5l643lydnw9re59gtzzwf5mdq ok")
    assert any(e == "CRYPTO" for e, _, _ in got)
    assert _scan_one("passport K12345678 expires")[0][:2] == (
        "US_PASSPORT", "K12345678",
    )
    assert _scan_one("license D1234567 suspended")[0][:2] == (
        "US_DRIVER_LICENSE", "D1234567",
    )
    got = _scan_one("account 123456789012 closed")
    assert ("US_BANK_NUMBER", "123456789012", 0.3) in got


def test_bank_number_does_not_eat_credit_cards_or_dates():
    # 16-digit Luhn-valid card stays CREDIT_CARD (earlier alternation)
    got = _scan_one("card 4111111111111111 on file")
    assert any(e == "CREDIT_CARD" for e, _, _ in got)
    assert not any(e == "US_BANK_NUMBER" for e, _, _ in got)
    # ISO dates keep matching DATE_TIME, not bank fragments
    got = _scan_one("due 2024-03-14 maybe")
    assert [e for e, _, _ in got] == ["DATE_TIME"]


@pytest.mark.parametrize(
    "text",
    [
        "wire DE44500105175407324931 and card 4111111111111111",
        "bad DE44500105175407324932 then K12345678",
        "CF RSSMRA80A01H501U, license D1234567, acct 12345678",
        "pay 1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2 by March 5, 2024",
        "Anna Rossi works at Acme Corp in Rome, IBAN IT60X0542811101000000123456",
    ],
)
def test_engine_matches_oracle_on_new_entities(text):
    out = _REG.scan([text])
    got = sorted(zip(out["entity"], out["surface"], out["start"]))
    want = sorted(
        (m["entity"], m["surface"], m["start"])
        for m in oracle_mentions(text)
        if m["entity"] not in ("B-ORG", "I-ORG")
    )
    # engine emits model-stage B-*/I-* rows the oracle folds into spans;
    # compare the span-level mention sets
    got = [g for g in got if not g[0].startswith(("B-", "I-"))]
    assert got == want


# -------------------------------------------- round-3 late catalog widening
def test_itin_wins_over_ssn_shape():
    # 9XX with IRS middle ranges → ITIN; ordinary SSN stays SSN
    got = _scan_one("ITIN 912-83-1234 vs SSN 123-45-6789")
    assert ("US_ITIN", "912-83-1234", 0.85) in got
    assert ("US_SSN", "123-45-6789", 0.85) in got
    assert not any(e == "US_SSN" and s == "912-83-1234" for e, s, _ in got)
    # middle group 89/93 is NOT a valid ITIN range → plain SSN shape
    got2 = _scan_one("call 989-89-1234")
    assert any(e == "US_SSN" and s == "989-89-1234" for e, s, _ in got2)


def test_dea_medical_license_checksum_gates_entity():
    from nerpii_ray.functions.hashing import dea_complete, dea_valid

    good = dea_complete("AB123456")  # AB1234563
    assert dea_valid(good)
    got = _scan_one(f"prescriber DEA {good} on file")
    assert ("MEDICAL_LICENSE", good, 1.0) in got
    # wrong check digit: no MEDICAL_LICENSE (and no fallback entity)
    bad = good[:-1] + str((int(good[-1]) + 1) % 10)
    got2 = _scan_one(f"prescriber DEA {bad} on file")
    assert not any(e == "MEDICAL_LICENSE" for e, _, _ in got2)


def test_it_vat_luhn_with_bank_fallback():
    from nerpii_ray.functions.hashing import luhn_complete

    good = luhn_complete("0074321505")  # 11-digit checksum-valid P.IVA
    got = _scan_one(f"partita IVA {good} registered")
    assert ("IT_VAT_CODE", good, 1.0) in got
    # checksum-failing 11 digits → weak US_BANK_NUMBER fallback
    bad = good[:-1] + str((int(good[-1]) + 1) % 10)
    got2 = _scan_one(f"account {bad} on record")
    assert ("US_BANK_NUMBER", bad, 0.3) in got2
    assert not any(e == "IT_VAT_CODE" for e, _, _ in got2)


def test_it_driver_license_shape():
    got = _scan_one("patente MI1234567X rilasciata nel 2019")
    assert ("IT_DRIVER_LICENSE", "MI1234567X", 0.3) in got


def test_uk_sg_au_pack_golden():
    """Round-4 country packs (UK_NHS, SG_NRIC, AU_TFN, AU_ABN): checksum
    validators plus the full combined-scan precedence, including the
    three-way 11-digit chain (Luhn → IT_VAT, mod-89 → AU_ABN, else weak
    bank number) and the NHS spaced-form phone fallback."""
    from nerpii_ray.functions.hashing import (
        abn_valid, nhs_valid, nric_valid, tfn_valid,
    )
    from nerpii_ray.state.registry import RecognizerRegistry

    assert nhs_valid("403 555 0000") and nhs_valid("4035550000")
    assert not nhs_valid("1234567890")
    assert tfn_valid("123456707") and not tfn_valid("123456789")
    assert abn_valid("51824753556") and not abn_valid("51824753557")
    assert nric_valid("S1234567D") and nric_valid("G1234567X")
    assert not nric_valid("S1234567D".replace("D", "B"))

    reg = RecognizerRegistry(
        add_addresses_recognizer=False,
        enable_gazetteers=False,
        enable_model_labels=False,
    ).compile()
    cases = {
        "nhs 403 555 0000 here": [("UK_NHS", "403 555 0000", 1.0)],
        "call 123 456 7890 now": [("PHONE_NUMBER", "123 456 7890", 0.75)],
        "acct 1234567890 ok": [("US_BANK_NUMBER", "1234567890", 0.3)],
        "id S1234567D ok": [("SG_NRIC", "S1234567D", 1.0)],
        "id S1234567B ok": [],  # invalid NRIC consumes its span
        "tfn 123456707 ok": [("AU_TFN", "123456707", 1.0)],
        "abn 51824753556 ok": [("AU_ABN", "51824753556", 1.0)],
        "vat 10000003946 ok": [("IT_VAT_CODE", "10000003946", 1.0)],
        "run 12345678901 ok": [("US_BANK_NUMBER", "12345678901", 0.3)],
    }
    for text, want in cases.items():
        out = reg.scan([text])
        got = list(zip(out["entity"], out["surface"], out["score"]))
        assert got == want, (text, got, want)


def test_second_tier_pack_golden():
    """Round-4 second tier (AU_MEDICARE/ACN, IN_PAN/AADHAAR, ES_NIF,
    PL_PESEL, FI_HETU): checksums plus combined-scan precedence — the
    9/10/11/12-digit runs resolve through their validator chains."""
    from nerpii_ray.functions.hashing import (
        acn_valid, hetu_valid, medicare_valid, nif_valid, pesel_valid,
        verhoeff_valid,
    )
    from nerpii_ray.state.registry import RecognizerRegistry

    assert medicare_valid("2123456700") and medicare_valid("2123 45670 1")
    assert not medicare_valid("3999999999")
    assert acn_valid("010485766") and not acn_valid("010485767")
    assert pesel_valid("44051401359") and not pesel_valid("44051401350")
    assert nif_valid("12345678Z") and not nif_valid("12345678A")
    assert hetu_valid("010190-123M") and not hetu_valid("010190-123X")
    assert verhoeff_valid("234567890009") and verhoeff_valid("2363")
    assert not verhoeff_valid("234567890001")

    reg = RecognizerRegistry(
        add_addresses_recognizer=False,
        enable_gazetteers=False,
        enable_model_labels=False,
    ).compile()
    cases = {
        "card 2123 45670 1 x": [("AU_MEDICARE", "2123 45670 1", 1.0)],
        "card 2123456700 x": [("AU_MEDICARE", "2123456700", 1.0)],
        "card 3999 99999 9 x": [],  # invalid spaced Medicare consumed
        "acn 010485766 x": [("AU_ACN", "010485766", 1.0)],
        "id 44051401359 x": [("PL_PESEL", "44051401359", 1.0)],
        "dni 12345678Z x": [("ES_NIF", "12345678Z", 1.0)],
        "dni 12345678A x": [],  # invalid NIF letter consumed
        "hetu 010190-123M x": [("FI_HETU", "010190-123M", 1.0)],
        "pan ABCDE1234F x": [("IN_PAN", "ABCDE1234F", 0.85)],
        "uid 234567890009 x": [("IN_AADHAAR", "234567890009", 1.0)],
        "uid 234567890001 x": [("US_BANK_NUMBER", "234567890001", 0.3)],
    }
    for text, want in cases.items():
        out = reg.scan([text])
        got = list(zip(out["entity"], out["surface"], out["score"]))
        assert got == want, (text, got, want)
