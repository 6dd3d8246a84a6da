"""Deterministic hashing primitives.

The reference relies on Faker's process-global RNG, which makes output
nondeterministic and retry-unsafe (``faker_generator.py`` throughout;
SURVEY §4 "Determinism").  The engine instead derives every ID, salt and
pseudonym from content hashes, so Ray task retries and resumed runs
produce byte-identical output.

``md5`` is used (not Python's salted ``hash()``) because it is stable
across processes *and* reproducible in DuckDB (``md5(...)``), which lets
the driver's SQL oracle check canonical IDs value-for-value.
"""

from __future__ import annotations

import hashlib


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def canonical_id(entity_type: str, norm_surface: str) -> str:
    """Deterministic canonical node ID (uuid5-style, SURVEY §7 step 6).

    Equivalent SQL: ``substr(md5(entity_type || ':' || norm_surface), 1, 16)``.
    """
    return md5_hex(f"{entity_type}:{norm_surface}")[:16]


def stable_hash64(s: str) -> int:
    """Stable non-cryptographic-use 64-bit hash (first 8 md5 bytes)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def seed_for(kind: str, key: str) -> int:
    """RNG seed for a deterministic pseudonym provider draw."""
    return stable_hash64(f"{kind}:{key}")


def luhn_checksum(digits: str) -> int:
    """Luhn mod-10 checksum of a digit string (rightmost = check digit)."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10


def luhn_valid(digits: str) -> bool:
    return len(digits) >= 2 and luhn_checksum(digits) == 0


def luhn_complete(partial: str) -> str:
    """Append the check digit that makes ``partial`` Luhn-valid."""
    check = (10 - luhn_checksum(partial + "0")) % 10
    return partial + str(check)
