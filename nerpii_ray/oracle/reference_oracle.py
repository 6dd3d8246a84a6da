"""Reference-semantics oracle: a tiny, single-process, straight-line
implementation of the recognizer + triple rules (SURVEY §7).

This is the P/R ≥ 0.95 comparison target from ``BASELINE.json``.  It is
deliberately written as naive per-row Python — separate code from the Ray
engine's batched scan — so the two implementations can disagree
meaningfully.  It shares only the gazetteer *data* (the behavioural spec)
and the published ID contract ``substr(md5(type ':' norm), 1, 16)``.

Never import engine stage code here.
"""

from __future__ import annotations

import hashlib
import re

from nerpii_ray.gazetteers import (
    FIRST_NAMES,
    LAST_NAME_SET,
    LOCATIONS,
    ORG_KEYWORDS,
    STREET_WORDS,
    US_STATE_ABBR_SAFE,
)

def _oracle_iban_ok(s: str) -> bool:
    """Independent ISO-13616 check: streaming mod-97 fold (the engine
    converts to one big int; same math, different algorithm)."""
    s = s.replace(" ", "")
    if not (15 <= len(s) <= 34 and s[:2].isalpha() and s[2:4].isdigit()):
        return False
    r = 0
    for ch in s[4:] + s[:4]:
        if ch.isdigit():
            r = (r * 10 + ord(ch) - 48) % 97
        elif "A" <= ch <= "Z":
            r = (r * 100 + ord(ch) - 55) % 97
        else:
            return False
    return r == 1


_ORACLE_CF_ODD_DIGIT = (1, 0, 5, 7, 9, 13, 15, 17, 19, 21)
_ORACLE_CF_ODD_AZ = (1, 0, 5, 7, 9, 13, 15, 17, 19, 21, 2, 4, 18, 20, 11,
                     3, 6, 8, 12, 14, 16, 10, 22, 25, 24, 23)


def _oracle_cf_ok(s: str) -> bool:
    if len(s) != 16:
        return False
    total = 0
    for i, ch in enumerate(s[:15]):
        if i % 2 == 0:  # odd 1-indexed position
            total += (
                _ORACLE_CF_ODD_DIGIT[ord(ch) - 48]
                if ch.isdigit()
                else _ORACLE_CF_ODD_AZ[ord(ch) - 65]
            )
        else:
            total += (ord(ch) - 48) if ch.isdigit() else (ord(ch) - 65)
    return s[15] == chr(65 + total % 26)


def _oracle_dea_ok(s: str) -> bool:
    """Independent DEA registrant checksum: zip-weighted (1,2,1,2,1,2)
    digit fold (the engine sums odd/even position groups; same rule,
    different arithmetic shape)."""
    d = s[2:]
    if len(s) != 9 or not (s[:2].isalpha() and d.isdigit()):
        return False
    total = sum(int(c) * w for c, w in zip(d[:6], (1, 2, 1, 2, 1, 2)))
    return total % 10 == int(d[6])


def _oracle_nhs_ok(s: str) -> bool:
    """Independent NHS mod-11: valid iff weighted-sum residue ≠ 1 and
    (sum + check digit) ≡ 0 (mod 11) — algebraically the same rule as
    the engine's 11−(sum%11) construction, differently shaped."""
    d = s.replace(" ", "")
    if len(d) != 10 or not d.isdigit():
        return False
    total = sum((10 - i) * int(c) for i, c in enumerate(d[:9]))
    return total % 11 != 1 and (total + int(d[9])) % 11 == 0


def _oracle_tfn_ok(s: str) -> bool:
    if len(s) != 9 or not s.isdigit():
        return False
    total = 0
    for c, w in zip(reversed(s), (10, 9, 6, 8, 5, 7, 3, 4, 1)):
        total += int(c) * w
    return total % 11 == 0


def _oracle_abn_ok(s: str) -> bool:
    """Independent ABN mod-89: fold without the subtract-1 step —
    (weighted sum − 10) ≡ 0 (mod 89) is the same rule."""
    if len(s) != 11 or not s.isdigit():
        return False
    total = sum(
        int(c) * w
        for c, w in zip(s, (10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19))
    )
    return (total - 10) % 89 == 0


def _oracle_nric_ok(s: str) -> bool:
    if len(s) != 9 or s[0] not in "STFG" or not s[1:8].isdigit():
        return False
    total = sum(int(c) * w for c, w in zip(s[1:8], (2, 7, 6, 5, 4, 3, 2)))
    total += 4 if s[0] in "TG" else 0
    table = "JZIHGFEDCBA" if s[0] in "ST" else "XWUTRQPNMLK"
    return s[8] == table[total % 11]


def _oracle_medicare_ok(s: str) -> bool:
    d = s.replace(" ", "")
    if len(d) != 10 or not d.isdigit() or d[0] not in "23456":
        return False
    total = 0
    for c, w in zip(reversed(d[:8]), (9, 7, 3, 1, 9, 7, 3, 1)):
        total += int(c) * w
    return total % 10 == int(d[8])


def _oracle_acn_ok(s: str) -> bool:
    if len(s) != 9 or not s.isdigit():
        return False
    total = sum(int(c) * (8 - i) for i, c in enumerate(s[:8]))
    return (total + int(s[8])) % 10 == 0


def _oracle_pesel_ok(s: str) -> bool:
    if len(s) != 11 or not s.isdigit():
        return False
    total = sum(
        int(c) * w
        for c, w in zip(s[:10], (1, 3, 7, 9, 1, 3, 7, 9, 1, 3))
    )
    return (total + int(s[10])) % 10 == 0


def _oracle_nif_ok(s: str) -> bool:
    if len(s) != 9 or not s[:8].isdigit():
        return False
    return s[8] == "TRWAGMYFPDXBNJZSQVHLCKE"[int(s[:8]) % 23]


def _oracle_hetu_ok(s: str) -> bool:
    if len(s) != 11 or s[6] not in "-+A":
        return False
    digits = s[:6] + s[7:10]
    if not digits.isdigit():
        return False
    return s[10] == "0123456789ABCDEFHJKLMNPRSTUVWXY"[int(digits) % 31]


# Verhoeff tables as row strings (same public algorithm, string-indexed
# rather than the engine's tuple-of-tuples)
_ORACLE_VH_D = (
    "0123456789", "1234067895", "2340178956", "3401289567", "4012395678",
    "5987604321", "6598710432", "7659821043", "8765932104", "9876543210",
)
_ORACLE_VH_P = (
    "0123456789", "1576283094", "5803796142", "8916043527",
    "9453126870", "4286573901", "2793806415", "7046913258",
)


def _oracle_verhoeff_ok(s: str) -> bool:
    if not s.isdigit():
        return False
    c = 0
    for i, ch in enumerate(reversed(s)):
        c = int(_ORACLE_VH_D[c][int(_ORACLE_VH_P[i % 8][int(ch)])])
    return c == 0


def _oracle_mod10_ok(s: str) -> bool:
    """Independent Luhn for the 11-digit partita IVA: double every
    second digit from the right via divmod carry-fold (no length gate —
    the pattern fixes the shape)."""
    total = 0
    for i, ch in enumerate(reversed(s)):
        v = int(ch)
        if i % 2 == 1:
            v = sum(divmod(2 * v, 10))
        total += v
    return total % 10 == 0


_PATTERNS = [
    # (entity, regex, score) in engine priority order
    ("EMAIL_ADDRESS", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", 1.0),
    ("URL", r"(?:https?://|www\.)[A-Za-z0-9.\-]+\.[A-Za-z]{2,}(?:/[^\s]*)?", 0.85),
    ("IP_ADDRESS", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", 0.6),
    # ITIN before SSN: more specific entity wins at the same position
    ("US_ITIN", r"\b9\d{2}-(?:7\d|8[0-8]|9[0-2]|9[4-9])-\d{4}\b", 0.85),
    ("US_SSN", r"\b\d{3}-\d{2}-\d{4}\b", 0.85),
    ("CREDIT_CARD", r"\b\d(?:[ \-]?\d){12,18}\b", 1.0),
    ("IBAN_CODE", r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b", 1.0),
    ("IT_FISCAL_CODE", r"\b[A-Z]{6}\d{2}[ABCDEHLMPRST]\d{2}[A-Z]\d{3}[A-Z]\b", 1.0),
    ("CRYPTO", r"\b(?:[13][a-km-zA-HJ-NP-Z1-9]{25,33}|bc1[a-z0-9]{25,39})\b", 1.0),
    ("MEDICAL_LICENSE", r"\b[ABCDEFGHJKLMPRSTUX][A-Z]\d{7}\b", 1.0),
    ("SG_NRIC", r"\b[STFG]\d{7}[A-Z]\b", 1.0),
    ("ES_NIF", r"\b\d{8}[A-Z]\b", 1.0),
    ("FI_HETU", r"\b\d{6}[-+A]\d{3}[0-9A-Y]\b", 1.0),
    ("IN_PAN", r"\b[A-Z]{5}\d{4}[A-Z]\b", 0.85),
    ("IT_DRIVER_LICENSE", r"\b[A-Z]{2}\d{7}[A-Z]\b", 0.3),
    ("US_PASSPORT", r"\b[A-Z]\d{8}\b", 0.4),
    ("US_DRIVER_LICENSE", r"\b[A-Z]\d{7}\b", 0.3),
    ("IT_VAT_CODE", r"\b\d{11}\b", 1.0),
    ("AU_MEDICARE", r"\b[2-6]\d{3} \d{5} \d\b", 1.0),
    ("UK_NHS", r"\b\d{3} ?\d{3} ?\d{4}\b", 1.0),
    ("AU_TFN", r"\b\d{9}\b", 1.0),
    ("IN_AADHAAR", r"\b[2-9]\d{11}\b", 1.0),
    ("US_BANK_NUMBER", r"\b\d{8,12}\b", 0.3),
    (
        "DATE_TIME",
        r"\b\d{4}-\d{2}-\d{2}\b|\b\d{1,2}/\d{1,2}/\d{2,4}\b"
        r"|\b(?:January|February|March|April|May|June|July|August|September"
        r"|October|November|December|Jan|Feb|Mar|Apr|Jun|Jul|Aug|Sept|Sep"
        r"|Oct|Nov|Dec)\.? \d{1,2},? \d{4}\b"
        r"|\b\d{1,2} (?:January|February|March|April|May|June|July|August"
        r"|September|October|November|December|Jan|Feb|Mar|Apr|Jun|Jul|Aug"
        r"|Sept|Sep|Oct|Nov|Dec)\.?,? \d{4}\b",
        0.6,
    ),
    (
        "PHONE_NUMBER",
        r"(?<![\w(])(?:(?:\+\d{1,3}[-.\s]?)?(?:\(\d{2,4}\)[-.\s]?)?\d{3,4}[-.\s]\d{3,4}"
        r"(?:[-.\s]\d{3,4})?|\(\d{2,4}\)[-.\s]?\d{3,4}[-.\s]\d{3,4})\b",
        0.75,
    ),
]
_COMPILED = [(e, re.compile(p), s) for e, p, s in _PATTERNS]

_DENY = sorted((w for w in STREET_WORDS if w != "C/"), key=len, reverse=True)
_DENY_RE = re.compile(
    r"(?<![A-Za-z0-9])(?:" + "|".join(re.escape(w) for w in _DENY) + r")(?![A-Za-z0-9])|C/"
)
_TOK_RE = re.compile(r"[A-Za-z][A-Za-z'\-/]*")
_MULTIWORD_LOCS = sorted(
    (loc for loc in LOCATIONS if " " in loc), key=lambda s: -len(s)
)
_ORG_LEFT_STOP = {"The", "A", "An", "In", "On", "At", "My", "Our", "Your"}


def _luhn_ok(s: str) -> bool:
    digits = [int(c) for c in s if c.isdigit()]
    if not 13 <= len(digits) <= 19:
        return False
    total, flip = 0, False
    for d in reversed(digits):
        if flip:
            d *= 2
            if d > 9:
                d -= 9
        total += d
        flip = not flip
    return total % 10 == 0


def node_id(entity: str, surface: str) -> str:
    norm = re.sub(r"\s+", " ", surface.strip()).lower()
    return hashlib.md5(f"{entity}:{norm}".encode()).hexdigest()[:16]


def oracle_mentions(text: str | None) -> list[dict]:
    """All node-bearing mentions of one turn, naive implementation."""
    if not text:
        return []
    found: list[dict] = []
    taken: list[tuple] = []  # claimed pattern spans (incl. invalid IBANs)
    emitted_spans: list[tuple] = []  # spans that emitted a mention — the
    # engine suppresses gazetteer/org hits only inside THESE

    # pattern recognizers: greedy by (start, priority) over the FULL
    # (overlapping) candidate set — equivalent to the engine's single
    # left-to-right alternation scan.  Plain ``finditer`` would be
    # wrong here: its non-overlapping semantics can consume a long
    # early candidate (e.g. a spaced CREDIT_CARD span bridging two
    # number groups) that the greedy selection then SKIPS for overlap,
    # hiding the later same-pattern match the engine's rescan finds.
    cands = []
    for prio, (ent, rx, score) in enumerate(_COMPILED):
        pos = 0
        while True:
            m = rx.search(text, pos)
            if not m:
                break
            cands.append((m.start(), prio, m.end(), ent, score, m.group(0)))
            pos = m.start() + 1
    cands.sort()
    for start, prio, end, ent, score, surf in cands:
        if any(not (end <= s or start >= e) for s, e in taken):
            continue
        emit = True
        if ent == "CREDIT_CARD":
            if not _luhn_ok(surf):
                ent, score = "PHONE_NUMBER", 0.4
        elif ent == "IBAN_CODE":
            # invalid checksum: the engine's alternation still CONSUMES
            # the span (no emission, no re-matching inside it)
            emit = _oracle_iban_ok(surf)
        elif ent == "MEDICAL_LICENSE":
            # DEA checksum, no fallback entity: invalid consumes the span
            emit = _oracle_dea_ok(surf)
        elif ent == "SG_NRIC":
            emit = _oracle_nric_ok(surf)
        elif ent == "ES_NIF":
            emit = _oracle_nif_ok(surf)
        elif ent == "FI_HETU":
            emit = _oracle_hetu_ok(surf)
        elif ent == "IT_VAT_CODE":
            # one 11-digit shape, three checksummed identities, then
            # the weak bank-number catch-all
            if not _oracle_mod10_ok(surf):
                if _oracle_abn_ok(surf):
                    ent, score = "AU_ABN", 1.0
                elif _oracle_pesel_ok(surf):
                    ent, score = "PL_PESEL", 1.0
                else:
                    ent, score = "US_BANK_NUMBER", 0.3
        elif ent == "AU_MEDICARE":
            emit = _oracle_medicare_ok(surf)
        elif ent == "UK_NHS":
            if not _oracle_nhs_ok(surf):
                if " " not in surf and _oracle_medicare_ok(surf):
                    ent, score = "AU_MEDICARE", 1.0
                elif " " in surf:
                    ent, score = "PHONE_NUMBER", 0.75
                else:
                    ent, score = "US_BANK_NUMBER", 0.3
        elif ent == "AU_TFN":
            if not _oracle_tfn_ok(surf):
                if _oracle_acn_ok(surf):
                    ent, score = "AU_ACN", 1.0
                else:
                    ent, score = "US_BANK_NUMBER", 0.3
        elif ent == "IN_AADHAAR":
            if not _oracle_verhoeff_ok(surf):
                ent, score = "US_BANK_NUMBER", 0.3
        elif ent == "IT_FISCAL_CODE":
            if not _oracle_cf_ok(surf):
                score = 0.5  # shape-valid, checksum failed
        taken.append((start, end))
        if emit:
            emitted_spans.append((start, end))
            found.append(
                dict(entity=ent, surface=surf, start=start, end=end, score=score)
            )

    # ADDRESS deny list (may overlap pattern spans, as in the engine)
    for m in _DENY_RE.finditer(text):
        found.append(
            dict(entity="ADDRESS", surface=m.group(0), start=m.start(),
                 end=m.end(), score=1.0)
        )

    # organizations: keyword + left/right title-case extension
    toks = [(m.group(0), m.start(), m.end()) for m in _TOK_RE.finditer(text)]
    org_token_idx: set[int] = set()
    org_spans: list[tuple] = []
    i = 0
    while i < len(toks):
        w = toks[i][0]
        inside_pattern = any(s <= toks[i][1] < e for s, e in emitted_spans)
        if w in ORG_KEYWORDS and i not in org_token_idx and not inside_pattern:
            lo = i
            while (
                lo - 1 >= 0
                and toks[lo - 1][0][0].isupper()
                and toks[lo - 1][0] not in _ORG_LEFT_STOP
                and toks[lo - 1][0] not in ORG_KEYWORDS
                and lo - 1 not in org_token_idx
                and i - (lo - 1) <= 2
            ):
                lo -= 1
            hi = i
            if i + 1 < len(toks) and toks[i + 1][0] == "of":
                k = i + 2
                while k < len(toks) and toks[k][0][0].isupper():
                    k += 1
                if k > i + 2:
                    hi = k - 1
            while hi + 1 < len(toks) and toks[hi + 1][0] in ORG_KEYWORDS:
                hi += 1
            org_token_idx.update(range(lo, hi + 1))
            org_spans.append((lo, hi))
            i = hi + 1
        else:
            i += 1
    for lo, hi in org_spans:
        s, e = toks[lo][1], toks[hi][2]
        found.append(
            dict(entity="ORGANIZATION", surface=text[s:e], start=s, end=e, score=0.8)
        )

    # locations (longest multiword first, then unigrams) and persons
    consumed: set[int] = set()
    for i, (w, s, e) in enumerate(toks):
        if i in consumed or i in org_token_idx:
            continue
        if any(ps <= s < pe for ps, pe in emitted_spans):
            continue
        matched = False
        for loc in _MULTIWORD_LOCS:
            words = loc.split(" ")
            if w != words[0]:
                continue
            js = list(range(i, i + len(words)))
            if js[-1] < len(toks) and all(
                toks[j][0] == words[j - i] and j not in org_token_idx for j in js
            ):
                found.append(
                    dict(entity="LOCATION", surface=loc, start=s,
                         end=toks[js[-1]][2], score=0.85)
                )
                consumed.update(js)
                matched = True
                break
        if matched:
            continue
        nxt = toks[i + 1][0] if i + 1 < len(toks) and (i + 1) not in org_token_idx else None
        if w in FIRST_NAMES:
            if nxt and nxt[0].isupper() and (nxt in LAST_NAME_SET or nxt in FIRST_NAMES):
                found.append(
                    dict(entity="PERSON", surface=f"{w} {nxt}", start=s,
                         end=toks[i + 1][2], score=0.85)
                )
                consumed.update({i, i + 1})
            else:
                found.append(dict(entity="PERSON", surface=w, start=s, end=e, score=0.75))
                consumed.add(i)
        elif w in LOCATIONS:
            found.append(dict(entity="LOCATION", surface=w, start=s, end=e, score=0.8))
            consumed.add(i)
        elif w in US_STATE_ABBR_SAFE and w.isupper():
            found.append(dict(entity="LOCATION", surface=w, start=s, end=e, score=0.7))
            consumed.add(i)
        elif w in LAST_NAME_SET and w[0].isupper():
            found.append(dict(entity="PERSON", surface=w, start=s, end=e, score=0.7))
            consumed.add(i)
    return found


def oracle_triples(rows: list[dict]) -> set[tuple]:
    """Turn rows → {(subj_id, pred, obj_id, conv_id, turn_idx)}."""
    triples: set[tuple] = set()
    for row in rows:
        conv, turn = row["conv_id"], int(row["turn_idx"])
        actor = hashlib.md5(
            f"ACTOR:{conv}:{row['role']}".encode()
        ).hexdigest()[:16]
        tool = row.get("tool")
        if tool is not None and tool != "none":
            tnode = hashlib.md5(f"TOOL:{tool}".encode()).hexdigest()[:16]
            triples.add((actor, "used_tool", tnode, conv, turn))
        ms = oracle_mentions(row.get("text"))
        for m in ms:
            triples.add((actor, "mentions", node_id(m["entity"], m["surface"]), conv, turn))
            if tool == "send_email" and m["entity"] == "EMAIL_ADDRESS":
                triples.add(
                    (actor, "sent_email_to", node_id(m["entity"], m["surface"]), conv, turn)
                )
        by_entity: dict[str, dict] = {}
        for m in sorted(ms, key=lambda m: (m["start"], m["surface"])):
            by_entity.setdefault(m["entity"], m)
        person = by_entity.get("PERSON")
        if person:
            pid = node_id("PERSON", person["surface"])
            org = by_entity.get("ORGANIZATION")
            if org:
                triples.add(
                    (pid, "works_for", node_id("ORGANIZATION", org["surface"]), conv, turn)
                )
            loc = by_entity.get("LOCATION")
            if loc:
                triples.add(
                    (pid, "located_in", node_id("LOCATION", loc["surface"]), conv, turn)
                )
    return triples
