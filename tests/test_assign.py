"""Golden tests for the assignment cascade, ported from the reference's
unit tests (``tests/test_named_entity_recognizer.py:203-309``) to grouped-
histogram form, plus the end-to-end profile parity test on the F-A fixture."""

import pandas as pd
import pytest

from nerpii_ray.config import EngineConfig
from nerpii_ray.pipelines.profile import profile_table
from nerpii_ray.stages.assign import cascade_assign


def _c(p=None, m=None, n=0, name="col"):
    return cascade_assign(p or {}, m or {}, n, name, EngineConfig())


class TestCascadeRules:
    def test_support_gate(self):
        # 30% gate: len(entities_list) > 0.3*n (named_entity_recognizer.py:449)
        assert _c(p={"PERSON": 2}, n=3, name="person") == {
            "entity": "PERSON",
            "confidence_score": 1.0,
        }
        # exactly at the gate → not assigned (strict >)
        assert _c(p={"PERSON": 3}, n=10, name="person") is None
        assert _c(p={}, n=3, name="university") is None

    def test_location_override(self):
        # golden: city 3/3 LOCATION → {LOCATION, 1.0}
        # (tests/test_named_entity_recognizer.py:218-231)
        assert _c(p={"LOCATION": 3}, n=3, name="city") == {
            "entity": "LOCATION",
            "confidence_score": 1.0,
        }
        # mixed labels, LOCATION minority but > 0.1 → LOCATION wins over mode
        out = _c(p={"LOCATION": 2, "PERSON": 8}, n=10, name="birthplace")
        assert out == {"entity": "LOCATION", "confidence_score": 0.2}

    def test_location_override_skips_name_columns(self):
        # "name" in column name blocks the override
        # (named_entity_recognizer.py:468)
        out = _c(p={"LOCATION": 2, "PERSON": 8}, n=10, name="first_name")
        assert out["entity"] == "PERSON"
        assert out["confidence_score"] == 0.8

    def test_location_below_threshold_falls_to_mode(self):
        # negative case: GPE labels, no LOCATION → majority vote
        # (tests/test_named_entity_recognizer.py:233-251)
        out = _c(p={"GPE": 2}, n=3, name="state")
        assert out == {"entity": "GPE", "confidence_score": 1.0}

    def test_majority_vote_and_score(self):
        # golden: email {EMAIL_ADDRESS, 1.0} etc.
        # (tests/test_named_entity_recognizer.py:254-265)
        assert _c(p={"EMAIL_ADDRESS": 3}, n=3, name="email") == {
            "entity": "EMAIL_ADDRESS",
            "confidence_score": 1.0,
        }
        out = _c(p={"PERSON": 5, "DATE_TIME": 2}, n=10, name="who")
        assert out == {"entity": "PERSON", "confidence_score": 5 / 7}

    def test_manual_zipcode(self):
        # golden: zipcode column → {ZIPCODE, 1.0} regardless of content
        # (tests/test_named_entity_recognizer.py:300-309)
        assert _c(n=3, name="zipcode") == {"entity": "ZIPCODE", "confidence_score": 1.0}
        assert _c(n=3, name="Postal Code") == {
            "entity": "ZIPCODE",
            "confidence_score": 1.0,
        }
        assert _c(n=3, name="cap") == {"entity": "ZIPCODE", "confidence_score": 1.0}

    def test_manual_credit_card(self):
        assert _c(n=3, name="credit card number") == {
            "entity": "CREDIT_CARD_NUMBER",
            "confidence_score": 1.0,
        }
        assert _c(n=3, name="carta di credito") == {
            "entity": "CREDIT_CARD_NUMBER",
            "confidence_score": 1.0,
        }

    def test_manual_overwrites_presidio(self):
        # manual runs after presidio and overwrites
        # (named_entity_recognizer.py:26-27; README:49-55)
        out = _c(p={"DATE_TIME": 3}, n=3, name="zip")
        assert out == {"entity": "ZIPCODE", "confidence_score": 1.0}

    def test_model_org_rule(self):
        # golden: B-ORG freq 6/9 → {ORGANIZATION, 0.666…}
        # (tests/test_named_entity_recognizer.py:272-297)
        out = _c(m={"B-ORG": 6, "I-ORG": 3}, n=3, name="university")
        assert out["entity"] == "ORGANIZATION"
        assert out["confidence_score"] == pytest.approx(2 / 3)

    def test_model_only_fills_unassigned(self):
        out = _c(p={"PERSON": 3}, m={"B-ORG": 9}, n=3, name="person")
        assert out["entity"] == "PERSON"

    def test_model_below_threshold(self):
        out = _c(m={"B-ORG": 1, "I-ORG": 9}, n=3, name="university")
        assert out is None


@pytest.fixture
def fixture_fa():
    # F-A: the reference's NER conformance fixture
    # (tests/test_named_entity_recognizer.py:135-150)
    return pd.DataFrame(
        {
            "email": ["John@email.com.", "Snow@email.com", "frank@email.com"],
            "city": ["New York", "Chicago", "Phoenix"],
            "state": ["Washington", "Florida", "Texas"],
            "university": [
                "University of London",
                "University of Georgia",
                "University of California",
            ],
            "person": ["George Bush", None, "Hillary Clinton"],
            "zipcode": ["10145", "N11RG", "56178"],
        }
    )


def test_profile_parity_fixture_fa(fixture_fa):
    """End-to-end profile on F-A reproduces the reference's final
    dict_global_entities (presidio → manual → model), combining the goldens
    at tests/test_named_entity_recognizer.py:254-265, 272-297, 300-309."""
    out = profile_table(fixture_fa)
    assert out["email"] == {"entity": "EMAIL_ADDRESS", "confidence_score": 1.0}
    assert out["city"] == {"entity": "LOCATION", "confidence_score": 1.0}
    assert out["state"] == {"entity": "LOCATION", "confidence_score": 1.0}
    assert out["person"] == {"entity": "PERSON", "confidence_score": 1.0}
    assert out["zipcode"] == {"entity": "ZIPCODE", "confidence_score": 1.0}
    # university: None after presidio, ORGANIZATION after the model stage
    assert out["university"]["entity"] == "ORGANIZATION"
    assert out["university"]["confidence_score"] > 0.3


def test_italian_branch_parity():
    """The reference's Italian branches (it_add_address_entity deny list
    incl. Via/Corso/Piazza/Calle, named_entity_recognizer.py:150-200;
    carta+credito manual rule, :547-555) work through the same engine
    config — Italian names/cities are in the gazetteers."""
    df = pd.DataFrame(
        {
            "nome": ["Marco Rossi", "Giulia Bianchi", "Luca Ferrari"],
            "indirizzo": ["Via Roma 1", "Corso Garibaldi 22", "Piazza Duomo 3"],
            "citta": ["Milan", "Rome", "Turin"],
            "carta di credito": ["1111-2222", "3333-4444", "5555-6666"],
        }
    )
    out = profile_table(df, EngineConfig(lang="it"))
    assert out["nome"] == {"entity": "PERSON", "confidence_score": 1.0}
    assert out["indirizzo"]["entity"] == "ADDRESS"
    assert out["citta"] == {"entity": "LOCATION", "confidence_score": 1.0}
    assert out["carta di credito"] == {
        "entity": "CREDIT_CARD_NUMBER",
        "confidence_score": 1.0,
    }
