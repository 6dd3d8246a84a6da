"""Recognizer registry — the from-scratch analogue of nerpii's detector stack.

The reference wires three detector families into one analysis pass:

* Presidio pattern recognizers (EMAIL / PHONE / URL / SSN / CREDIT_CARD /
  DATE_TIME / IP, ``named_entity_recognizer.py:343-385``),
* a custom deny-list ADDRESS recognizer over 25 street words
  (``named_entity_recognizer.py:97-147``),
* spaCy NER for PERSON / LOCATION (via Presidio's NLP engine) and a
  HuggingFace BERT model for ORGANIZATION token labels
  (``named_entity_recognizer.py:387-405, 491-503``).

None of those libraries exist in this environment, so this module
re-implements the *semantics* from scratch (SURVEY.md §7): compiled regex
pattern recognizers, the street-word deny list, and gazetteer + title-case
heuristics for PERSON / LOCATION / ORGANIZATION.

Performance design: a batch of N turn texts is scanned as ONE concatenated
string ("\\x00"-joined) with a single combined-regex ``finditer`` pass plus a
single token-scan pass; global offsets are mapped back to rows with
``np.searchsorted``.  This keeps per-row Python overhead out of the hot
path — the per-batch cost is two C-level regex scans + dict lookups per
token.  The registry is compiled ONCE per recognizer actor
(``RecognizerActor.__init__``), mirroring the reference's one-time engine
construction.

Mention-priority policy ("first result per cell",
``named_entity_recognizer.py:442-446``): the primary mention of a turn is
the one with the highest score, ties broken by earliest start then entity
name.  Gazetteer mentions contained inside a pattern span (e.g. the
first-name token of an email local part) or inside an ORGANIZATION span
(e.g. "London" in "University of London") are suppressed, matching the
behaviour of the reference's NLP stack.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from nerpii_ray.functions.hashing import (
    abn_valid,
    acn_valid,
    codice_fiscale_valid,
    dea_valid,
    hetu_valid,
    iban_valid,
    luhn_valid,
    medicare_valid,
    nhs_valid,
    nif_valid,
    nric_valid,
    pesel_valid,
    tfn_valid,
    verhoeff_valid,
)
from nerpii_ray.gazetteers import STREET_WORDS, detection_sets

#: stage tags on emitted mentions
STAGE_PATTERN = "pattern"      # regex pattern recognizers (Presidio analogue)
STAGE_DENY = "deny"            # ADDRESS deny list
STAGE_GAZETTEER = "gazetteer"  # PERSON / LOCATION (spaCy analogue)
STAGE_MODEL = "model"          # BERT-style token labels (B-ORG / I-ORG / ...)
STAGE_MODEL_SPAN = "model_span"  # whole ORGANIZATION spans for triples

#: stages whose mentions feed the Presidio-analogue assignment cascade
PRESIDIO_STAGES = (STAGE_PATTERN, STAGE_DENY, STAGE_GAZETTEER)

_SEP = "\x00"
_TOKEN_RE = re.compile(r"[A-Za-z][A-Za-z'\-/]*")
#: lang="it" tokens include accented Latin-1 letters (città, Società) —
#: kept separate so English scans stay bit-identical to pre-lang output
_TOKEN_RE_ACCENTED = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ][A-Za-zÀ-ÖØ-öø-ÿ'\-/]*")
_ORG_LEFT_STOP = {"The", "A", "An", "In", "On", "At", "My", "Our", "Your",
                  "Il", "La", "Lo", "Un", "Una", "Di", "Da", "Del", "Della"}


@dataclass
class PatternSpec:
    """One regex pattern recognizer (Presidio PatternRecognizer analogue).

    Constraint: the pattern must never match a NUL byte (``\\x00``) — the
    batch scan joins texts on NUL, so a pattern that can cross it (e.g.
    an unbounded ``[^\\s]*``) would merge mentions across texts.  Use
    ``[^\\s\\x00]`` style negations in user-added patterns."""

    entity: str
    pattern: str
    score: float
    #: optional post-match validator on the matched surface (e.g. Luhn)
    validator: Optional[Callable[[str], bool]] = None
    #: entity to re-try on validator failure (CREDIT_CARD → PHONE_NUMBER)
    fallback_entity: Optional[str] = None
    fallback_score: float = 0.0
    #: ordered CHAIN of (entity, score, validator-or-None) tried on
    #: primary-validator failure — the first entry whose validator
    #: passes (None = unconditional) wins; none passing = consume the
    #: span with no emission.  Supersedes fallback_entity when set —
    #: needed where one surface shape carries several checksummed
    #: identities (an 11-digit run is IT_VAT by Luhn, else AU_ABN by
    #: mod-89, else a weak bank number).
    fallbacks: Optional[List[tuple]] = None

    def fallback_chain(self) -> List[tuple]:
        if self.fallbacks is not None:
            return self.fallbacks
        if self.fallback_entity is not None:
            return [(self.fallback_entity, self.fallback_score, None)]
        return []


_PHONE_PATTERN = (
    r"(?:\+\d{1,3}[-.\s]?)?(?:\(\d{2,4}\)[-.\s]?)?\d{3,4}[-.\s]\d{3,4}"
    r"(?:[-.\s]\d{3,4})?|\(\d{2,4}\)[-.\s]?\d{3,4}[-.\s]\d{3,4}"
)

#: month-name alternation for DATE_TIME, factored by first letter so the
#: combined scan regex fails fast at non-month positions (a flat
#: 24-branch alternation measurably slows the whole-batch scan); greedy
#: optional suffixes make "Sept"/"September" beat "Sep"
_MONTHS = (
    "J(?:an(?:uary)?|un(?:e)?|ul(?:y)?)|Feb(?:ruary)?|Ma(?:r(?:ch)?|y)"
    "|A(?:pr(?:il)?|ug(?:ust)?)|Sept?(?:ember)?|Oct(?:ober)?"
    "|Nov(?:ember)?|Dec(?:ember)?"
)

#: DATE_TIME surface forms: ISO, slash, "March 5, 2024", "5 Mar 2024" —
#: Presidio's date recognition covers the month-name forms real
#: transcripts hit constantly (README.md:37 supported entities)
_DATE_PATTERN = (
    r"\b\d{4}-\d{2}-\d{2}\b"
    r"|\b\d{1,2}/\d{1,2}/\d{2,4}\b"
    rf"|\b(?:{_MONTHS})\.? \d{{1,2}},? \d{{4}}\b"
    rf"|\b\d{{1,2}} (?:{_MONTHS})\.?,? \d{{4}}\b"
)


def default_pattern_specs() -> List[PatternSpec]:
    """Built-in pattern recognizers, ordered by priority (first match wins
    at a given position in the combined alternation)."""
    return [
        PatternSpec(
            "EMAIL_ADDRESS",
            r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
            1.0,
        ),
        PatternSpec(
            "URL",
            # \x00 excluded from the path charset: the batch scan joins
            # texts on NUL, and NUL is not \s — an unbounded [^\s]* would
            # run a trailing URL straight through the separator and
            # swallow the following texts into one mention
            r"(?:https?://|www\.)[A-Za-z0-9.\-]+\.[A-Za-z]{2,}(?:/[^\s\x00]*)?",
            0.85,
        ),
        PatternSpec("IP_ADDRESS", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", 0.6),
        # ITIN is a shape-subset of SSN (starts with 9, middle group in
        # the IRS 70-88/90-92/94-99 ranges) — listed BEFORE US_SSN so the
        # more specific entity wins at the same position
        PatternSpec(
            "US_ITIN",
            r"\b9\d{2}-(?:7\d|8[0-8]|9[0-2]|9[4-9])-\d{4}\b",
            0.85,
        ),
        PatternSpec("US_SSN", r"\b\d{3}-\d{2}-\d{4}\b", 0.85),
        PatternSpec(
            "CREDIT_CARD",
            r"\b\d(?:[ \-]?\d){12,18}\b",
            1.0,
            validator=lambda s: luhn_valid(re.sub(r"\D", "", s))
            and 13 <= len(re.sub(r"\D", "", s)) <= 19,
            fallback_entity="PHONE_NUMBER",
            fallback_score=0.4,
        ),
        # --- wider Presidio catalog (reference inherits every recognizer
        # Presidio ships, README.md:37; these are the finance/identity
        # recognizers a user profiling such tables hits first) ---
        PatternSpec(
            "IBAN_CODE",
            # 2-letter country + 2 check digits + 11-30 alnum BBAN; the
            # ISO-13616 mod-97 checksum is the validator (random strings
            # of this shape fail with P≈96/97, so no fallback entity)
            r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b",
            1.0,
            validator=lambda s: iban_valid(s),
        ),
        PatternSpec(
            "IT_FISCAL_CODE",
            # 6 consonant-ish letters, YY, month letter, DD, place code,
            # check char — Presidio's IT pack shape; the official check-
            # character table is the validator.  Shape-valid codes with a
            # wrong check char (e.g. transcription typos) keep the entity
            # at reduced score instead of vanishing, mirroring Presidio's
            # score-boost-on-validation behaviour.
            r"\b[A-Z]{6}\d{2}[ABCDEHLMPRST]\d{2}[A-Z]\d{3}[A-Z]\b",
            1.0,
            validator=lambda s: codice_fiscale_valid(s),
            fallback_entity="IT_FISCAL_CODE",
            fallback_score=0.5,
        ),
        PatternSpec(
            "CRYPTO",
            # BTC P2PKH/P2SH (base58, no 0OIl) and bech32 — Presidio's
            # CryptoRecognizer pattern family
            r"\b(?:[13][a-km-zA-HJ-NP-Z1-9]{25,33}|bc1[a-z0-9]{25,39})\b",
            1.0,
        ),
        PatternSpec(
            # DEA registrant number (Presidio's MedicalLicenseRecognizer):
            # registrant-type letter + initial letter + 7 digits with the
            # DEA checksum as validator — random letter+digit runs fail
            # with P=9/10, so no fallback entity
            "MEDICAL_LICENSE",
            r"\b[ABCDEFGHJKLMPRSTUX][A-Z]\d{7}\b",
            1.0,
            validator=lambda s: dea_valid(s),
        ),
        PatternSpec(
            # Singapore NRIC/FIN (Presidio's SgFinRecognizer): series
            # letter + 7 digits + mod-11 check letter from a per-series
            # table.  Random shapes pass with P≈1/11 against the right
            # table — no fallback; an invalid code consumes its span.
            "SG_NRIC",
            r"\b[STFG]\d{7}[A-Z]\b",
            1.0,
            validator=lambda s: nric_valid(s),
        ),
        PatternSpec(
            # Spanish NIF/DNI (Presidio's ES pack): 8 digits + the
            # mod-23 table letter; invalid letters consume the span
            "ES_NIF",
            r"\b\d{8}[A-Z]\b",
            1.0,
            validator=lambda s: nif_valid(s),
        ),
        PatternSpec(
            # Finnish HETU (Presidio's FI pack): ddmmyy + century
            # separator + nnn + mod-31 check character
            "FI_HETU",
            r"\b\d{6}[-+A]\d{3}[0-9A-Y]\b",
            1.0,
            validator=lambda s: hetu_valid(s),
        ),
        # Indian PAN (Presidio's IN pack): 5 letters, 4 digits, 1
        # letter — structured shape, no public checksum
        PatternSpec("IN_PAN", r"\b[A-Z]{5}\d{4}[A-Z]\b", 0.85),
        # Presidio IT-pack driver licence shape (2 letters, 7 digits,
        # 1 letter); shape-only like the US variants, weak score
        PatternSpec("IT_DRIVER_LICENSE", r"\b[A-Z]{2}\d{7}[A-Z]\b", 0.3),
        PatternSpec("US_PASSPORT", r"\b[A-Z]\d{8}\b", 0.4),
        PatternSpec("US_DRIVER_LICENSE", r"\b[A-Z]\d{7}\b", 0.3),
        PatternSpec(
            # partita IVA: 11 digits whose check digit IS the Luhn rule;
            # listed before US_BANK_NUMBER (its shape superset) — a
            # checksum-failing 11-digit run falls back to the weak bank-
            # number entity instead of vanishing
            "IT_VAT_CODE",
            r"\b\d{11}\b",
            1.0,
            validator=lambda s: luhn_valid(s),
            # one 11-digit shape, three checksummed identities: Luhn →
            # IT VAT; else the AU ABN mod-89 rule (Presidio's AU pack);
            # else the weak bank-number catch-all
            fallbacks=[
                ("AU_ABN", 1.0, lambda s: abn_valid(s)),
                ("PL_PESEL", 1.0, lambda s: pesel_valid(s)),
                ("US_BANK_NUMBER", 0.3, None),
            ],
        ),
        PatternSpec(
            # Australian Medicare in the official 4-5-1 display form
            # (Presidio's AU pack); contiguous 10-digit Medicare numbers
            # arrive through UK_NHS's fallback chain instead
            "AU_MEDICARE",
            r"\b[2-6]\d{3} \d{5} \d\b",
            1.0,
            validator=lambda s: medicare_valid(s),
        ),
        PatternSpec(
            # UK NHS number (Presidio's NhsRecognizer): 10 digits in the
            # official spaced display form or contiguous; mod-11 check.
            # Deliberately NOT the dashed form — ddd-ddd-dddd is a US
            # phone convention and stays PHONE_NUMBER.  On checksum
            # failure a spaced surface falls back to PHONE_NUMBER
            # (what the pre-NHS catalog emitted for it) and a
            # contiguous one to the weak bank number.
            "UK_NHS",
            r"\b\d{3} ?\d{3} ?\d{4}\b",
            1.0,
            validator=lambda s: nhs_valid(s),
            fallbacks=[
                # a contiguous 10-digit run failing NHS may still be a
                # checksum-valid Medicare number
                ("AU_MEDICARE", 1.0,
                 lambda s: " " not in s and medicare_valid(s)),
                ("US_BANK_NUMBER", 0.3, lambda s: " " not in s),
                ("PHONE_NUMBER", 0.75, None),
            ],
        ),
        PatternSpec(
            # Australian TFN (Presidio's AU pack): nine digits, weighted
            # mod-11; a failing run is just a weak bank number
            "AU_TFN",
            r"\b\d{9}\b",
            1.0,
            validator=lambda s: tfn_valid(s),
            # one 9-digit shape, two checksummed identities
            fallbacks=[
                ("AU_ACN", 1.0, lambda s: acn_valid(s)),
                ("US_BANK_NUMBER", 0.3, None),
            ],
        ),
        PatternSpec(
            # Indian Aadhaar (Presidio's IN pack): 12 digits starting
            # 2-9, Verhoeff checksum; a failing run is a weak bank
            # number like any other digit run
            "IN_AADHAAR",
            r"\b[2-9]\d{11}\b",
            1.0,
            validator=lambda s: verhoeff_valid(s),
            fallback_entity="US_BANK_NUMBER",
            fallback_score=0.3,
        ),
        # bare 8-12 digit runs: deliberately AFTER (and disjoint from)
        # CREDIT_CARD's 13-19 digit range; weak score like Presidio's
        PatternSpec("US_BANK_NUMBER", r"\b\d{8,12}\b", 0.3),
        PatternSpec("DATE_TIME", _DATE_PATTERN, 0.6),
        PatternSpec("PHONE_NUMBER", r"(?<![\w(])" + _PHONE_PATTERN + r"\b", 0.75),
    ]


@dataclass
class RecognizerRegistry:
    """User-extensible recognizer configuration (the engine analogue of
    Presidio's ``registry.add_recognizer`` plugin surface,
    ``named_entity_recognizer.py:374, 383`` and SURVEY §2.10)."""

    patterns: List[PatternSpec] = field(default_factory=default_pattern_specs)
    #: detection language — "it" widens the gazetteers to the EN∪IT
    #: surface union (the reference's model swap to it_core_news_lg,
    #: ``named_entity_recognizer.py:338-341``, re-expressed as vocabulary)
    lang: str = "en"
    #: ADDRESS deny list; ``additional_addresses`` hook appends here
    #: (``named_entity_recognizer.py:106-107, 142``)
    address_words: List[str] = field(default_factory=lambda: list(STREET_WORDS))
    add_addresses_recognizer: bool = True
    enable_gazetteers: bool = True
    enable_model_labels: bool = True
    #: cell mode (profile pipeline): each text is one table CELL, as in the
    #: reference's ``analyze_dict`` per-cell analysis.  A cell that matched
    #: nothing else but is one or two TitleCase tokens is emitted as a
    #: low-score PERSON candidate — the stand-in for spaCy's statistical
    #: PERSON recognition of names outside any gazetteer ("Lenna
    #: Paprocki").  Never enabled for free-text transcript scanning.
    cell_mode: bool = False

    def add_pattern(self, spec: PatternSpec) -> "RecognizerRegistry":
        self.patterns.append(spec)
        return self

    def add_addresses(self, words: Sequence[str]) -> "RecognizerRegistry":
        self.address_words.extend(words)
        return self

    def compile(self) -> "CompiledRegistry":
        return CompiledRegistry(self)


class CompiledRegistry:
    """Compiled scan state: built once per actor, applied per batch."""

    def __init__(self, reg: RecognizerRegistry):
        self.spec_by_group: Dict[str, PatternSpec] = {}
        parts = []
        for i, spec in enumerate(reg.patterns):
            gname = f"R{i}"
            self.spec_by_group[gname] = spec
            parts.append(f"(?P<{gname}>{spec.pattern})")
        self.combined = re.compile("|".join(parts)) if parts else None

        self.deny_re = None
        if reg.add_addresses_recognizer and reg.address_words:
            words = sorted(
                (w for w in reg.address_words if w != "C/"),
                key=len,
                reverse=True,
            )
            alts = "|".join(re.escape(w) for w in words)
            pat = rf"(?<![A-Za-z0-9])(?:{alts})(?![A-Za-z0-9])"
            if "C/" in reg.address_words:
                pat += r"|C/"
            self.deny_re = re.compile(pat)

        self.enable_gazetteers = reg.enable_gazetteers
        self.enable_model_labels = reg.enable_model_labels
        self.cell_mode = reg.cell_mode
        sets = detection_sets(reg.lang)
        self.first_names = sets.first_names
        self.last_name_set = sets.last_names
        self.loc_unigrams = sets.loc_unigrams
        self.state_abbr = sets.state_abbr
        self.org_keywords = sets.org_keywords
        self.org_extend_right = reg.lang == "it"
        if reg.lang == "it":
            self.token_re = _TOKEN_RE_ACCENTED
            self.cell_person_re = re.compile(
                r"^[A-ZÀ-Ö][a-zà-öø-ÿ]+(?:[ \-'][A-ZÀ-Ö][a-zà-öø-ÿ]+)?$"
            )
        else:
            self.token_re = _TOKEN_RE
            self.cell_person_re = re.compile(
                r"^[A-Z][a-z]+(?:[ \-'][A-Z][a-z]+)?$"
            )
        # multi-word locations keyed by first token; values are tuples of the
        # remaining tokens, longest first (so "Salt Lake City" wins over a
        # hypothetical "Salt Lake")
        self.loc_bigram_first: Dict[str, List[tuple]] = {}
        for bg in sets.loc_bigrams:
            words = bg.split(" ")
            self.loc_bigram_first.setdefault(words[0], []).append(tuple(words[1:]))
        for k in self.loc_bigram_first:
            self.loc_bigram_first[k].sort(key=len, reverse=True)
        # union of every gazetteer first-token vocabulary: the token scan
        # tests membership ONCE per token and skips everything else —
        # ~80 % of tokens are in no gazetteer, and testing them against
        # pattern spans / neighbors dominated the scan loop
        self.interest = (
            set(self.loc_bigram_first)
            | self.first_names
            | self.loc_unigrams
            | set(self.state_abbr)
            | self.last_name_set
        )

    # ------------------------------------------------------------------
    def scan(self, texts: Sequence[Optional[str]]) -> Dict[str, list]:
        """Scan a batch of texts; return mention struct-of-lists.

        Keys: row, entity, surface, start, end, score, stage, is_primary.
        """
        # the separator must never occur inside a text, or every later
        # offset→row mapping shifts; NUL bytes are garbage in transcripts
        # anyway, so replace rather than reject
        safe = [
            "" if t is None else (t.replace(_SEP, " ") if _SEP in t else t)
            for t in texts
        ]
        joined = _SEP.join(safe)
        lens = np.fromiter((len(t) + 1 for t in safe), dtype=np.int64, count=len(safe))
        row_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))

        rows: List[int] = []
        entities: List[str] = []
        surfaces: List[str] = []
        starts: List[int] = []
        ends: List[int] = []
        scores: List[float] = []
        stages: List[str] = []

        def row_of(gpos: int) -> int:
            return int(np.searchsorted(row_starts, gpos, side="right") - 1)

        def emit(r, ent, surf, s, e, sc, stage):
            rows.append(r)
            entities.append(ent)
            surfaces.append(surf)
            starts.append(s)
            ends.append(e)
            scores.append(sc)
            stages.append(stage)

        # pattern spans per row, for suppression of nested gazetteer hits
        pattern_spans: Dict[int, List[tuple]] = {}

        # -- pass 1: combined pattern regex over the whole batch --
        if self.combined is not None:
            for m in self.combined.finditer(joined):
                gname = m.lastgroup
                spec = self.spec_by_group[gname]
                surf = m.group(0)
                ent, sc = spec.entity, spec.score
                if spec.validator is not None and not spec.validator(surf):
                    for f_ent, f_sc, f_val in spec.fallback_chain():
                        if f_val is None or f_val(surf):
                            ent, sc = f_ent, f_sc
                            break
                    else:
                        continue  # span consumed, nothing emitted
                r = row_of(m.start())
                ls = m.start() - int(row_starts[r])
                emit(r, ent, surf, ls, ls + len(surf), sc, STAGE_PATTERN)
                pattern_spans.setdefault(r, []).append((ls, ls + len(surf)))

        # -- pass 2: ADDRESS deny list --
        if self.deny_re is not None:
            for m in self.deny_re.finditer(joined):
                r = row_of(m.start())
                ls = m.start() - int(row_starts[r])
                surf = m.group(0)
                emit(r, "ADDRESS", surf, ls, ls + len(surf), 1.0, STAGE_DENY)

        # -- pass 3: token scan → gazetteer + model labels --
        if self.enable_gazetteers or self.enable_model_labels:
            self._token_scan(joined, row_starts, pattern_spans, emit, row_of)

        # -- pass 4 (cell mode only): TitleCase-cell PERSON fallback --
        if self.cell_mode:
            matched_rows = set(rows)
            for r, t in enumerate(safe):
                if r in matched_rows or not t:
                    continue
                cell = t.strip()
                if self.cell_person_re.match(cell):
                    s = t.find(cell)
                    emit(r, "PERSON", cell, s, s + len(cell), 0.5,
                         STAGE_GAZETTEER)

        is_primary = self._mark_primary(rows, entities, starts, scores, stages)
        # order mentions by (row, start): the scan passes emit per-STAGE
        # (all pattern hits, then deny, then org, then gazetteer), which
        # would scatter one turn's mentions across the output — and any
        # later re-batching could then split a turn between batches,
        # breaking per-turn co-occurrence rules (works_for / located_in)
        if rows:
            order = np.lexsort((starts, rows))
            take = order.tolist()
            rows = [rows[i] for i in take]
            entities = [entities[i] for i in take]
            surfaces = [surfaces[i] for i in take]
            starts = [starts[i] for i in take]
            ends = [ends[i] for i in take]
            scores = [scores[i] for i in take]
            stages = [stages[i] for i in take]
            is_primary = [is_primary[i] for i in take]
        return {
            "row": rows,
            "entity": entities,
            "surface": surfaces,
            "start": starts,
            "end": ends,
            "score": scores,
            "stage": stages,
            "is_primary": is_primary,
        }

    # ------------------------------------------------------------------
    def _token_scan(self, joined, row_starts, pattern_spans, emit, row_of):
        toks = [(m.group(0), m.start()) for m in self.token_re.finditer(joined)]
        n = len(toks)
        # ONE vectorized searchsorted for every token (a per-token Python
        # call here was ~30% of scan time)
        if n:
            positions = np.fromiter((p for _, p in toks), dtype=np.int64, count=n)
            tok_row = (
                np.searchsorted(row_starts, positions, side="right") - 1
            ).tolist()
        else:
            tok_row = []

        def inside_pattern(i: int) -> bool:
            r = tok_row[i]
            spans = pattern_spans.get(r)
            if not spans:
                return False
            ls = toks[i][1] - int(row_starts[r])
            return any(s <= ls < e for s, e in spans)

        # 3a: ORGANIZATION spans around org keywords (BERT-stage analogue)
        in_org = [False] * n
        org_spans: List[tuple] = []  # (first_tok_idx, last_tok_idx)
        i = 0
        while i < n:
            word, _ = toks[i]
            if word in self.org_keywords and not in_org[i] and not inside_pattern(i):
                r = tok_row[i]
                lo = i
                # extend left over adjacent TitleCase tokens in the same row
                while (
                    lo - 1 >= 0
                    and tok_row[lo - 1] == r
                    and toks[lo - 1][0][0].isupper()
                    and toks[lo - 1][0] not in _ORG_LEFT_STOP
                    and toks[lo - 1][0] not in self.org_keywords
                    and not in_org[lo - 1]
                    and i - (lo - 1) <= 2
                ):
                    lo -= 1
                hi = i
                # extend right over "of <TitleCase>+"
                j = i + 1
                if j < n and tok_row[j] == r and toks[j][0] == "of":
                    k = j + 1
                    while k < n and tok_row[k] == r and toks[k][0][0].isupper():
                        k += 1
                    if k > j + 1:
                        hi = k - 1
                # or directly adjacent org keywords ("Cyberdyne Systems Corp")
                while (
                    hi + 1 < n
                    and tok_row[hi + 1] == r
                    and toks[hi + 1][0] in self.org_keywords
                ):
                    hi += 1
                # Italian orgs lead with the keyword ("Banca Intesa SpA",
                # "Società Acme"): in it mode also extend right over
                # adjacent TitleCase tokens / further keywords
                if self.org_extend_right:
                    while (
                        hi + 1 < n
                        and tok_row[hi + 1] == r
                        and hi - i < 3
                        and toks[hi + 1][0][0].isupper()
                        and toks[hi + 1][0] not in _ORG_LEFT_STOP
                    ):
                        hi += 1
                for t in range(lo, hi + 1):
                    in_org[t] = True
                org_spans.append((lo, hi))
                i = hi + 1
            else:
                i += 1

        for lo, hi in org_spans:
            r = tok_row[lo]
            gstart = toks[lo][1]
            gend = toks[hi][1] + len(toks[hi][0])
            ls = gstart - int(row_starts[r])
            surf = joined[gstart:gend]
            if self.enable_model_labels:
                pos = ls
                for t in range(lo, hi + 1):
                    tls = toks[t][1] - int(row_starts[r])
                    label = "B-ORG" if t == lo else "I-ORG"
                    emit(r, label, toks[t][0], tls, tls + len(toks[t][0]), 0.8,
                         STAGE_MODEL)
                emit(r, "ORGANIZATION", surf, ls, ls + (gend - gstart), 0.8,
                     STAGE_MODEL_SPAN)

        if not self.enable_gazetteers:
            return

        # 3b: LOCATION bigrams/unigrams and PERSON names
        consumed = [False] * n
        interest = self.interest
        for i in range(n):
            word, gpos = toks[i]
            if word not in interest:
                # no gazetteer starts with this token — every branch
                # below would fall through; skip the span/neighbor work
                continue
            if consumed[i] or in_org[i] or inside_pattern(i):
                continue
            r = tok_row[i]
            ls = gpos - int(row_starts[r])
            nxt = None
            if i + 1 < n and tok_row[i + 1] == r and not in_org[i + 1]:
                nxt = toks[i + 1][0]
            # multi-word location ("New York", "Rhode Island", "Salt Lake City")
            rests = self.loc_bigram_first.get(word)
            matched_rest = None
            if rests is not None:
                for rest in rests:
                    k = len(rest)
                    if i + k < n and all(
                        tok_row[i + j + 1] == r
                        and not in_org[i + j + 1]
                        and toks[i + j + 1][0] == rest[j]
                        for j in range(k)
                    ):
                        matched_rest = rest
                        break
            if matched_rest is not None:
                k = len(matched_rest)
                gend = toks[i + k][1] + len(toks[i + k][0])
                surf = joined[gpos:gend]
                emit(r, "LOCATION", surf, ls, ls + len(surf), 0.85,
                     STAGE_GAZETTEER)
                if self.enable_model_labels:
                    emit(r, "B-LOC", word, ls, ls + len(word), 0.85, STAGE_MODEL)
                for j in range(k + 1):
                    consumed[i + j] = True
                continue
            if word in self.first_names:
                if nxt is not None and nxt[0].isupper() and (
                    nxt in self.last_name_set or nxt in self.first_names
                ):
                    gend = toks[i + 1][1] + len(nxt)
                    surf = joined[gpos:gend]
                    emit(r, "PERSON", surf, ls, ls + len(surf), 0.85,
                         STAGE_GAZETTEER)
                    if self.enable_model_labels:
                        emit(r, "B-PER", word, ls, ls + len(word), 0.85,
                             STAGE_MODEL)
                    consumed[i] = consumed[i + 1] = True
                else:
                    emit(r, "PERSON", word, ls, ls + len(word), 0.75,
                         STAGE_GAZETTEER)
                    if self.enable_model_labels:
                        emit(r, "B-PER", word, ls, ls + len(word), 0.75,
                             STAGE_MODEL)
                    consumed[i] = True
                continue
            if word in self.loc_unigrams:
                emit(r, "LOCATION", word, ls, ls + len(word), 0.8,
                     STAGE_GAZETTEER)
                if self.enable_model_labels:
                    emit(r, "B-LOC", word, ls, ls + len(word), 0.8, STAGE_MODEL)
                consumed[i] = True
                continue
            if word in self.state_abbr and word.isupper():
                emit(r, "LOCATION", word, ls, ls + len(word), 0.7,
                     STAGE_GAZETTEER)
                if self.enable_model_labels:
                    emit(r, "B-LOC", word, ls, ls + len(word), 0.7, STAGE_MODEL)
                consumed[i] = True
                continue
            if word in self.last_name_set and word[0].isupper():
                emit(r, "PERSON", word, ls, ls + len(word), 0.7,
                     STAGE_GAZETTEER)
                if self.enable_model_labels:
                    emit(r, "B-PER", word, ls, ls + len(word), 0.7, STAGE_MODEL)
                consumed[i] = True

    # ------------------------------------------------------------------
    @staticmethod
    def _mark_primary(rows, entities, starts, scores, stages) -> List[bool]:
        """Primary = top-ranked presidio-stage mention per row
        (``named_entity_recognizer.py:442-446``): max score, then earliest
        start, then entity name."""
        best: Dict[int, tuple] = {}
        for i in range(len(rows)):
            if stages[i] not in PRESIDIO_STAGES:
                continue
            key = (-scores[i], starts[i], entities[i])
            r = rows[i]
            if r not in best or key < best[r][0]:
                best[r] = (key, i)
        winners = {i for _, i in best.values()}
        return [i in winners for i in range(len(rows))]
