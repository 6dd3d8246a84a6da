"""Deterministic pseudonym providers — the Faker analogue (SURVEY §2.5).

The reference synthesizes replacement PII with Faker's process-global RNG
(``faker_generator.py:120-596``), which is nondeterministic and gives the
same surface different pseudonyms on every call.  The engine derives each
pseudonym from a seed hashed off the *normalized surface form* (and
entity kind), so:

* the same input value maps to the same pseudonym everywhere in the
  dataset and across retries / resumed runs (what makes the
  canonicalization shuffle idempotent), and
* first/last-name/email stay consistent per person: the email provider is
  ``first.last@domain`` built from the same person's generated name parts,
  reproducing the reference's row-consistency join
  (``faker_generator.py:342-353``).
"""

from __future__ import annotations

import random
from typing import Optional

from nerpii_ray.functions.hashing import luhn_complete, seed_for
from nerpii_ray.gazetteers import (
    CITIES,
    COUNTRIES,
    EMAIL_DOMAINS,
    FIRST_NAMES_FEMALE,
    FIRST_NAMES_MALE,
    IT_CITIES,
    IT_COUNTRIES,
    IT_EMAIL_DOMAINS,
    IT_FIRST_NAMES_FEMALE,
    IT_FIRST_NAMES_MALE,
    IT_LAST_NAMES,
    IT_PROVINCE_ABBR,
    IT_REGIONS,
    IT_STREET_NAMES,
    IT_STREET_PREFIXES,
    LAST_NAMES,
    STREET_NAMES,
    TLDS,
    URL_WORDS,
    US_STATE_ABBR,
    US_STATES,
)

_FIRST_ALL = sorted(set(FIRST_NAMES_FEMALE) | set(FIRST_NAMES_MALE))
_IT_FIRST_ALL = sorted(set(IT_FIRST_NAMES_FEMALE) | set(IT_FIRST_NAMES_MALE))

# Locale switch: the reference constructs Faker(["it_IT"]) when
# lang == "it" (faker_generator.py:84-87), which swaps EVERY provider's
# vocabulary; lang="it" here does the same with the IT_* pools, and
# zipcode mirrors the postcode() branch (:476-513).


def _rng(kind: str, key: str) -> random.Random:
    return random.Random(seed_for(kind, key))


def street_address(key: str, lang: str = "en") -> str:
    # faker.street_address() analogue (faker_generator.py:141)
    r = _rng("street_address", key)
    if lang == "it":
        # Italian order: street type first, house number last (Via Roma 15)
        return f"{r.choice(IT_STREET_PREFIXES)} {r.choice(IT_STREET_NAMES)} {r.randint(1, 199)}"
    return f"{r.randint(1, 9999)} {r.choice(STREET_NAMES)} {r.choice(['Street', 'Avenue', 'Road', 'Lane'])}"


def phone_number(key: str, lang: str = "en") -> str:
    r = _rng("phone_number", key)
    if lang == "it":
        return f"+39 3{r.randint(10, 99)} {r.randint(100, 999)} {r.randint(1000, 9999)}"
    return f"({r.randint(200, 989)}) {r.randint(200, 989)}-{r.randint(1000, 9999)}"


def first_name(key: str, gender: Optional[str] = None, lang: str = "en") -> str:
    # gender-consistent branch (faker_generator.py:198-263): female /
    # mostly_female → female pool, male / mostly_male → male pool,
    # unknown / andy → either
    r = _rng("first_name", key)
    if gender in ("female", "mostly_female"):
        return r.choice(IT_FIRST_NAMES_FEMALE if lang == "it" else FIRST_NAMES_FEMALE)
    if gender in ("male", "mostly_male"):
        return r.choice(IT_FIRST_NAMES_MALE if lang == "it" else FIRST_NAMES_MALE)
    return r.choice(_IT_FIRST_ALL if lang == "it" else _FIRST_ALL)


def last_name(key: str, lang: str = "en") -> str:
    return _rng("last_name", key).choice(IT_LAST_NAMES if lang == "it" else LAST_NAMES)


def email_address(
    key: str,
    first: Optional[str] = None,
    last: Optional[str] = None,
    lang: str = "en",
) -> str:
    # first.last@free_email_domain (faker_generator.py:342-353); the name
    # parts default to this key's own generated names so person↔email stay
    # linked when callers pass the person's key
    first = first or first_name(key, lang=lang)
    last = last or last_name(key, lang=lang)
    domain = _rng("email_domain", key).choice(
        IT_EMAIL_DOMAINS if lang == "it" else EMAIL_DOMAINS
    )
    local = f"{first.lower()}.{last.lower()}".replace(" ", "")
    return f"{local}@{domain}"


def city(key: str, lang: str = "en") -> str:
    return _rng("city", key).choice(IT_CITIES if lang == "it" else CITIES)


def state(key: str, abbr: bool = False, lang: str = "en") -> str:
    # 2-char values get abbreviations (format sniff, faker_generator.py:412)
    r = _rng("state", key)
    if lang == "it":
        return r.choice(IT_PROVINCE_ABBR) if abbr else r.choice(IT_REGIONS)
    return r.choice(US_STATE_ABBR) if abbr else r.choice(US_STATES)


def url(key: str, lang: str = "en") -> str:
    r = _rng("url", key)
    tld = "it" if lang == "it" else r.choice(TLDS)
    return f"https://www.{r.choice(URL_WORDS)}{r.randint(1, 99)}.{tld}/"


def zipcode(key: str, lang: str = "en") -> str:
    r = _rng("zipcode", key)
    if lang == "it":
        # CAP: 5 digits, leading zeros legal (faker it_IT postcode())
        return f"{r.randint(10, 98168):05d}"
    return f"{r.randint(10000, 99999)}"


def credit_card_number(key: str, lang: str = "en") -> str:
    r = _rng("credit_card", key)
    return luhn_complete("4" + "".join(str(r.randint(0, 9)) for _ in range(14)))


def ssn(key: str, lang: str = "en") -> str:
    r = _rng("ssn", key)
    if lang == "it":
        # codice-fiscale-shaped (faker it_IT ssn()): 6 letters, 2 digits,
        # 1 letter, 2 digits, 1 letter, 3 digits, 1 letter
        cons = "BCDFGLMNPRST"
        month = "ABCDEHLMPRST"
        return (
            "".join(r.choice(cons) for _ in range(6))
            + f"{r.randint(50, 99)}"
            + r.choice(month)
            + f"{r.randint(1, 28):02d}"
            + r.choice("AFHL")
            + f"{r.randint(100, 999)}"
            + r.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
        )
    return f"{r.randint(100, 899)}-{r.randint(10, 99)}-{r.randint(1000, 9999)}"


def country(key: str, lang: str = "en") -> str:
    return _rng("country", key).choice(IT_COUNTRIES if lang == "it" else COUNTRIES)


def person_name(key: str, gender: Optional[str] = None, lang: str = "en") -> str:
    return f"{first_name(key, gender, lang=lang)} {last_name(key, lang=lang)}"


#: entity type → provider used when pseudonymizing canonical nodes
PROVIDER_BY_ENTITY = {
    "ADDRESS": street_address,
    "PHONE_NUMBER": phone_number,
    "PERSON": person_name,
    "EMAIL_ADDRESS": email_address,
    "LOCATION": city,
    "URL": url,
    "ZIPCODE": zipcode,
    "CREDIT_CARD": credit_card_number,
    "CREDIT_CARD_NUMBER": credit_card_number,
    "US_SSN": ssn,
    "ORGANIZATION": lambda k: f"{_rng('org', k).choice(URL_WORDS).title()} {_rng('org2', k).choice(['Corp', 'LLC', 'Group', 'Inc'])}",
    "DATE_TIME": lambda k: f"2024-{_rng('date', k).randint(1, 12):02d}-{_rng('date2', k).randint(1, 28):02d}",
}


def pseudonym_for(entity_type: str, norm_surface: str) -> str:
    """Deterministic pseudonym for a canonical node; identity for entity
    types with no provider (ACTOR, TOOL, IP_ADDRESS, ...)."""
    provider = PROVIDER_BY_ENTITY.get(entity_type)
    if provider is None:
        return norm_surface
    return provider(norm_surface)
