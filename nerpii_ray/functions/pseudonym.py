"""Deterministic pseudonym providers — the Faker analogue (SURVEY §2.5).

The reference synthesizes replacement PII with Faker's process-global RNG
(``faker_generator.py:120-596``), which is nondeterministic and gives the
same surface different pseudonyms on every call.  The engine derives each
pseudonym from *md5-lane draws* off the normalized surface form: draw
``i`` for provider ``kind`` over key ``k`` is the first 8 digest bytes of
``md5("{kind}:{k}:{i}")`` as a big-endian uint64.  So:

* the same input value maps to the same pseudonym everywhere in the
  dataset and across retries / resumed runs (what makes the
  canonicalization shuffle idempotent),
* first/last-name/email stay consistent per person: the email provider is
  ``first.last@domain`` built from the same person's generated name parts,
  reproducing the reference's row-consistency join
  (``faker_generator.py:342-353``), and
* every draw is exactly replayable in SQL —
  ``CAST(('0x' || substr(md5(kind || ':' || key || ':' || lane), 1, 16))
  AS UBIGINT)`` — which is what lets the full ``kg_nodes`` table
  (pseudonyms included) carry a DuckDB hash oracle
  (pipelines/queries.kg_nodes_sql_for).  Round 4 used a Mersenne-Twister
  RNG seeded from the same hash; round 5 swapped it for direct lane
  draws precisely to make the providers SQL-expressible (VERDICT r4 #3).
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

from nerpii_ray.functions.hashing import luhn_complete
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

STREET_SUFFIXES = ["Street", "Avenue", "Road", "Lane"]
ORG_SUFFIXES = ["Corp", "LLC", "Group", "Inc"]

# Locale switch: the reference constructs Faker(["it_IT"]) when
# lang == "it" (faker_generator.py:84-87), which swaps EVERY provider's
# vocabulary; lang="it" here does the same with the IT_* pools, and
# zipcode mirrors the postcode() branch (:476-513).


def _draw(kind: str, key: str, lane: int) -> int:
    """64-bit uniform draw for lane ``lane`` of provider ``kind`` over
    ``key``: first 8 md5 digest bytes, big-endian — bit-identical to
    SQL's ``CAST(('0x' || substr(md5(kind||':'||key||':'||lane), 1, 16))
    AS UBIGINT)``."""
    return int.from_bytes(
        hashlib.md5(f"{kind}:{key}:{lane}".encode("utf-8")).digest()[:8], "big"
    )


def _pick(pool: Sequence[str], kind: str, key: str, lane: int) -> str:
    return pool[_draw(kind, key, lane) % len(pool)]


def _rint(a: int, b: int, kind: str, key: str, lane: int) -> int:
    """Uniform integer in [a, b] (modulo bias ≤ 2^-50 for these ranges)."""
    return a + _draw(kind, key, lane) % (b - a + 1)


def street_address(key: str, lang: str = "en") -> str:
    # faker.street_address() analogue (faker_generator.py:141)
    if lang == "it":
        # Italian order: street type first, house number last (Via Roma 15)
        return (
            f"{_pick(IT_STREET_PREFIXES, 'street_address', key, 0)} "
            f"{_pick(IT_STREET_NAMES, 'street_address', key, 1)} "
            f"{_rint(1, 199, 'street_address', key, 2)}"
        )
    return (
        f"{_rint(1, 9999, 'street_address', key, 0)} "
        f"{_pick(STREET_NAMES, 'street_address', key, 1)} "
        f"{_pick(STREET_SUFFIXES, 'street_address', key, 2)}"
    )


def phone_number(key: str, lang: str = "en") -> str:
    if lang == "it":
        return (
            f"+39 3{_rint(10, 99, 'phone_number', key, 0)} "
            f"{_rint(100, 999, 'phone_number', key, 1)} "
            f"{_rint(1000, 9999, 'phone_number', key, 2)}"
        )
    return (
        f"({_rint(200, 989, 'phone_number', key, 0)}) "
        f"{_rint(200, 989, 'phone_number', key, 1)}-"
        f"{_rint(1000, 9999, 'phone_number', key, 2)}"
    )


def first_name(key: str, gender: Optional[str] = None, lang: str = "en") -> str:
    # gender-consistent branch (faker_generator.py:198-263): female /
    # mostly_female → female pool, male / mostly_male → male pool,
    # unknown / andy → either
    if gender in ("female", "mostly_female"):
        pool = IT_FIRST_NAMES_FEMALE if lang == "it" else FIRST_NAMES_FEMALE
    elif gender in ("male", "mostly_male"):
        pool = IT_FIRST_NAMES_MALE if lang == "it" else FIRST_NAMES_MALE
    else:
        pool = _IT_FIRST_ALL if lang == "it" else _FIRST_ALL
    return _pick(pool, "first_name", key, 0)


def last_name(key: str, lang: str = "en") -> str:
    return _pick(IT_LAST_NAMES if lang == "it" else LAST_NAMES,
                 "last_name", key, 0)


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
    domain = _pick(
        IT_EMAIL_DOMAINS if lang == "it" else EMAIL_DOMAINS,
        "email_domain", key, 0,
    )
    local = f"{first.lower()}.{last.lower()}".replace(" ", "")
    return f"{local}@{domain}"


def city(key: str, lang: str = "en") -> str:
    return _pick(IT_CITIES if lang == "it" else CITIES, "city", key, 0)


def state(key: str, abbr: bool = False, lang: str = "en") -> str:
    # 2-char values get abbreviations (format sniff, faker_generator.py:412)
    if lang == "it":
        pool = IT_PROVINCE_ABBR if abbr else IT_REGIONS
    else:
        pool = US_STATE_ABBR if abbr else US_STATES
    return _pick(pool, "state", key, 0)


def url(key: str, lang: str = "en") -> str:
    tld = "it" if lang == "it" else _pick(TLDS, "url", key, 0)
    return (
        f"https://www.{_pick(URL_WORDS, 'url', key, 1)}"
        f"{_rint(1, 99, 'url', key, 2)}.{tld}/"
    )


def zipcode(key: str, lang: str = "en") -> str:
    if lang == "it":
        # CAP: 5 digits, leading zeros legal (faker it_IT postcode())
        return f"{_rint(10, 98168, 'zipcode', key, 0):05d}"
    return f"{_rint(10000, 99999, 'zipcode', key, 0)}"


def credit_card_number(key: str, lang: str = "en") -> str:
    digits = "".join(
        str(_rint(0, 9, "credit_card", key, i)) for i in range(14)
    )
    return luhn_complete("4" + digits)


def ssn(key: str, lang: str = "en") -> str:
    if lang == "it":
        # codice-fiscale-shaped (faker it_IT ssn()): 6 letters, 2 digits,
        # 1 letter, 2 digits, 1 letter, 3 digits, 1 letter
        cons = "BCDFGLMNPRST"
        month = "ABCDEHLMPRST"
        return (
            "".join(_pick(cons, "ssn", key, i) for i in range(6))
            + f"{_rint(50, 99, 'ssn', key, 6)}"
            + _pick(month, "ssn", key, 7)
            + f"{_rint(1, 28, 'ssn', key, 8):02d}"
            + _pick("AFHL", "ssn", key, 9)
            + f"{_rint(100, 999, 'ssn', key, 10)}"
            + _pick("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "ssn", key, 11)
        )
    return (
        f"{_rint(100, 899, 'ssn', key, 0)}-"
        f"{_rint(10, 99, 'ssn', key, 1)}-"
        f"{_rint(1000, 9999, 'ssn', key, 2)}"
    )


def country(key: str, lang: str = "en") -> str:
    return _pick(IT_COUNTRIES if lang == "it" else COUNTRIES,
                 "country", key, 0)


def person_name(key: str, gender: Optional[str] = None, lang: str = "en") -> str:
    return f"{first_name(key, gender, lang=lang)} {last_name(key, lang=lang)}"


def organization(key: str, lang: str = "en") -> str:
    word = _pick(URL_WORDS, "org", key, 0)
    return f"{word.title()} {_pick(ORG_SUFFIXES, 'org', key, 1)}"


def date_time(key: str, lang: str = "en") -> str:
    return (
        f"2024-{_rint(1, 12, 'date', key, 0):02d}"
        f"-{_rint(1, 28, 'date', key, 1):02d}"
    )


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
    "ORGANIZATION": organization,
    "DATE_TIME": date_time,
}


def pseudonym_for(entity_type: str, norm_surface: str) -> str:
    """Deterministic pseudonym for a canonical node; identity for entity
    types with no provider (ACTOR, TOOL, IP_ADDRESS, ...)."""
    provider = PROVIDER_BY_ENTITY.get(entity_type)
    if provider is None:
        return norm_surface
    return provider(norm_surface)
