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


def iban_numeric(s: str) -> str:
    """IBAN → its mod-97 numeric string (ISO 13616: move the first 4
    chars to the end, then A→10 … Z→35).  Exposed separately so the SQL
    oracle can replay validation with the same rearrangement."""
    r = s[4:] + s[:4]
    out = []
    for ch in r:
        if "0" <= ch <= "9":
            out.append(ch)
        elif "A" <= ch <= "Z":
            out.append(str(ord(ch) - 55))
        else:
            return ""
    return "".join(out)


def iban_valid(s: str) -> bool:
    """Generic ISO-13616 IBAN checksum (mod 97 == 1).  The Presidio
    recognizer the reference inherits (README.md:37 supported-entities
    list) additionally validates per-country BBAN lengths; this engine
    validates the universal checksum, which every real IBAN passes and
    random digit strings fail with P≈1/97."""
    s = s.replace(" ", "")
    if not (15 <= len(s) <= 34):
        return False
    if not (s[:2].isalpha() and s[:2].isupper() and s[2:4].isdigit()):
        return False
    num = iban_numeric(s)
    return bool(num) and int(num) % 97 == 1


#: codice-fiscale check-character tables (standard odd/even maps)
_CF_ODD = {
    "0": 1, "1": 0, "2": 5, "3": 7, "4": 9, "5": 13, "6": 15, "7": 17,
    "8": 19, "9": 21, "A": 1, "B": 0, "C": 5, "D": 7, "E": 9, "F": 13,
    "G": 15, "H": 17, "I": 19, "J": 21, "K": 2, "L": 4, "M": 18, "N": 20,
    "O": 11, "P": 3, "Q": 6, "R": 8, "S": 12, "T": 14, "U": 16, "V": 10,
    "W": 22, "X": 25, "Y": 24, "Z": 23,
}


def codice_fiscale_check_char(first15: str) -> str:
    """Check character of an Italian codice fiscale (16th char): odd
    1-indexed positions via the official odd table, even positions via
    ordinal value, sum mod 26 → letter."""
    total = 0
    for i, ch in enumerate(first15):
        if i % 2 == 0:  # 1-indexed odd position
            total += _CF_ODD[ch]
        else:
            total += int(ch) if ch.isdigit() else ord(ch) - 65
    return chr(65 + total % 26)


def codice_fiscale_valid(s: str) -> bool:
    s = s.upper()
    return len(s) == 16 and s[15] == codice_fiscale_check_char(s[:15])


def dea_valid(s: str) -> bool:
    """DEA registrant-number checksum (the MEDICAL_LICENSE recognizer in
    Presidio's supported-entities list the reference inherits,
    README.md:37): two letters + seven digits, where the 7th digit is
    the units digit of (d1+d3+d5) + 2·(d2+d4+d6)."""
    s = s.upper()
    d = s[2:]
    if len(s) != 9 or not (s[:2].isalpha() and d.isdigit()):
        return False
    total = (
        int(d[0]) + int(d[2]) + int(d[4])
        + 2 * (int(d[1]) + int(d[3]) + int(d[5]))
    )
    return total % 10 == int(d[6])


def dea_complete(prefix_and_six: str) -> str:
    """Append the DEA check digit (test/fixture helper)."""
    d = prefix_and_six[2:]
    total = (
        int(d[0]) + int(d[2]) + int(d[4])
        + 2 * (int(d[1]) + int(d[3]) + int(d[5]))
    )
    return prefix_and_six + str(total % 10)


def nhs_valid(s: str) -> bool:
    """UK NHS number checksum (Presidio's NhsRecognizer, inherited by
    the reference via README.md:37): 10 digits, weights 10..2 over the
    first nine, check digit = 11 − (sum mod 11) with 11→0 and 10 =
    never-valid.  Accepts the spaced display form ``123 456 7890``."""
    d = s.replace(" ", "")
    if len(d) != 10 or not d.isdigit():
        return False
    total = sum(int(c) * w for c, w in zip(d[:9], range(10, 1, -1)))
    check = 11 - (total % 11)
    if check == 11:
        check = 0
    return check != 10 and check == int(d[9])


def tfn_valid(s: str) -> bool:
    """Australian Tax File Number checksum (Presidio's AU pack): nine
    digits whose (1,4,3,7,5,8,6,9,10)-weighted sum is ≡ 0 (mod 11)."""
    if len(s) != 9 or not s.isdigit():
        return False
    weights = (1, 4, 3, 7, 5, 8, 6, 9, 10)
    return sum(int(c) * w for c, w in zip(s, weights)) % 11 == 0


def abn_valid(s: str) -> bool:
    """Australian Business Number checksum (Presidio's AU pack): eleven
    digits, subtract 1 from the first, then the
    (10,1,3,5,7,9,11,13,15,17,19)-weighted sum must be ≡ 0 (mod 89)."""
    if len(s) != 11 or not s.isdigit():
        return False
    weights = (10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19)
    total = sum(int(c) * w for c, w in zip(s, weights)) - 10
    return total % 89 == 0


_NRIC_TABLE_ST = "JZIHGFEDCBA"
_NRIC_TABLE_FG = "XWUTRQPNMLK"


def nric_valid(s: str) -> bool:
    """Singapore NRIC/FIN checksum (Presidio's SgFinRecognizer): series
    letter S/T/F/G + seven digits + check letter; digits fold with
    weights (2,7,6,5,4,3,2), T/G series add 4, and the mod-11 result
    indexes a per-series letter table."""
    if len(s) != 9 or s[0] not in "STFG" or not s[1:8].isdigit():
        return False
    weights = (2, 7, 6, 5, 4, 3, 2)
    total = sum(int(c) * w for c, w in zip(s[1:8], weights))
    if s[0] in "TG":
        total += 4
    table = _NRIC_TABLE_ST if s[0] in "ST" else _NRIC_TABLE_FG
    return s[8] == table[total % 11]


def medicare_valid(s: str) -> bool:
    """Australian Medicare number checksum (Presidio's AU pack): 10
    digits (optionally displayed 4-5-1), first digit 2–6, and the 9th
    digit is the (1,3,7,9,1,3,7,9)-weighted sum of the first eight,
    mod 10.  The 10th digit is the card issue number — not checked."""
    d = s.replace(" ", "")
    if len(d) != 10 or not d.isdigit() or d[0] not in "23456":
        return False
    weights = (1, 3, 7, 9, 1, 3, 7, 9)
    return sum(int(c) * w for c, w in zip(d[:8], weights)) % 10 == int(d[8])


def acn_valid(s: str) -> bool:
    """Australian Company Number checksum (Presidio's AU pack): nine
    digits; complement of the (8,7,6,5,4,3,2,1)-weighted sum of the
    first eight, mod 10, equals the 9th."""
    if len(s) != 9 or not s.isdigit():
        return False
    weights = (8, 7, 6, 5, 4, 3, 2, 1)
    total = sum(int(c) * w for c, w in zip(s[:8], weights))
    return (10 - total % 10) % 10 == int(s[8])


def pesel_valid(s: str) -> bool:
    """Polish PESEL checksum (Presidio's PL pack): eleven digits;
    complement of the (1,3,7,9,1,3,7,9,1,3)-weighted sum of the first
    ten, mod 10, equals the 11th."""
    if len(s) != 11 or not s.isdigit():
        return False
    weights = (1, 3, 7, 9, 1, 3, 7, 9, 1, 3)
    total = sum(int(c) * w for c, w in zip(s[:10], weights))
    return (10 - total % 10) % 10 == int(s[10])


_NIF_LETTERS = "TRWAGMYFPDXBNJZSQVHLCKE"


def nif_valid(s: str) -> bool:
    """Spanish NIF/DNI check letter (Presidio's ES pack): eight digits
    whose value mod 23 indexes the official letter table."""
    if len(s) != 9 or not s[:8].isdigit():
        return False
    return s[8] == _NIF_LETTERS[int(s[:8]) % 23]


_HETU_CHARS = "0123456789ABCDEFHJKLMNPRSTUVWXY"


def hetu_valid(s: str) -> bool:
    """Finnish HETU (henkilötunnus) check character (Presidio's FI
    pack): ddmmyy, century separator (- + or A), 3-digit individual
    number; the 9-digit number ddmmyynnn mod 31 indexes the official
    character table."""
    if len(s) != 11 or s[6] not in "-+A":
        return False
    digits = s[:6] + s[7:10]
    if not digits.isdigit():
        return False
    return s[10] == _HETU_CHARS[int(digits) % 31]


#: Verhoeff dihedral-group multiplication and permutation tables
#: (public-domain algorithm; the Aadhaar check digit scheme)
_VERHOEFF_D = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9),
    (1, 2, 3, 4, 0, 6, 7, 8, 9, 5),
    (2, 3, 4, 0, 1, 7, 8, 9, 5, 6),
    (3, 4, 0, 1, 2, 8, 9, 5, 6, 7),
    (4, 0, 1, 2, 3, 9, 5, 6, 7, 8),
    (5, 9, 8, 7, 6, 0, 4, 3, 2, 1),
    (6, 5, 9, 8, 7, 1, 0, 4, 3, 2),
    (7, 6, 5, 9, 8, 2, 1, 0, 4, 3),
    (8, 7, 6, 5, 9, 3, 2, 1, 0, 4),
    (9, 8, 7, 6, 5, 4, 3, 2, 1, 0),
)
_VERHOEFF_P = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9),
    (1, 5, 7, 6, 2, 8, 3, 0, 9, 4),
    (5, 8, 0, 3, 7, 9, 6, 1, 4, 2),
    (8, 9, 1, 6, 0, 4, 3, 5, 2, 7),
    (9, 4, 5, 3, 1, 2, 6, 8, 7, 0),
    (4, 2, 8, 6, 5, 7, 3, 9, 0, 1),
    (2, 7, 9, 3, 8, 0, 6, 4, 1, 5),
    (7, 0, 4, 6, 9, 1, 3, 2, 5, 8),
)


def verhoeff_valid(s: str) -> bool:
    """Verhoeff checksum over a decimal string (the Aadhaar scheme,
    Presidio's IN pack): fold digits right-to-left through the dihedral
    D5 multiplication table under the 8-cycle permutation; valid iff
    the fold lands on 0."""
    if not s.isdigit():
        return False
    c = 0
    for i, ch in enumerate(reversed(s)):
        c = _VERHOEFF_D[c][_VERHOEFF_P[i % 8][int(ch)]]
    return c == 0
