"""Transcript redaction: rewrite turn text with PII mentions replaced.

The engine analogue of running nerpii's detect→synthesize loop over free
text instead of columns: a single stateful pass that scans each turn with
the compiled registry and splices replacements into the text.  Two modes:

* ``pseudonym`` — deterministic Faker-style surrogates
  (``functions/pseudonym.py``): the same surface gets the same surrogate
  everywhere in the corpus, preserving entity co-reference across turns
  (what makes redacted transcripts still usable as training data);
* ``tag`` — typed placeholders ``[ENTITY_TYPE]`` (classic scrubbing).

Single-pass design: no join of a mentions table back onto turns — the
scan and the splice happen in the same actor, so redaction costs one read
and zero shuffles at any scale.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from nerpii_ray.config import EngineConfig
from nerpii_ray.functions.pseudonym import pseudonym_for
from nerpii_ray.functions.textfns import normalize_surface_one
from nerpii_ray.state.registry import (
    PRESIDIO_STAGES,
    STAGE_MODEL_SPAN,
    RecognizerRegistry,
)

_REPLACE_STAGES = set(PRESIDIO_STAGES) | {STAGE_MODEL_SPAN}


def replacement_for(entity: str, surface: str, mode: str) -> str:
    if mode == "tag":
        return f"[{entity}]"
    return pseudonym_for(entity, normalize_surface_one(surface))


def compute_redactions(scan_out: dict, texts: list, mode: str) -> list:
    """Scan output + original texts → redacted texts (one per input row).

    Shared by the standalone redactor and the fused KG+redaction scan:
    group replacement spans per row, prefer higher-score spans on
    overlap (EMAIL over the PERSON token inside it), splice right-to-
    left so offsets stay valid."""
    spans_by_row: dict[int, list] = {}
    for i in range(len(scan_out["row"])):
        if scan_out["stage"][i] not in _REPLACE_STAGES:
            continue
        spans_by_row.setdefault(scan_out["row"][i], []).append(
            (
                -scan_out["score"][i],
                scan_out["start"][i],
                scan_out["end"][i],
                scan_out["entity"][i],
                scan_out["surface"][i],
            )
        )

    new_texts = list(texts)
    for r, spans in spans_by_row.items():
        text = texts[r]
        if text is None:
            continue
        spans.sort()  # score desc, then start
        accepted: list = []
        for _, s, e, ent, surf in spans:
            if any(
                not (e <= as_ or s >= ae)
                for as_, ae in ((a[0], a[1]) for a in accepted)
            ):
                continue
            accepted.append((s, e, ent, surf))
        # splice right-to-left so offsets stay valid
        for s, e, ent, surf in sorted(accepted, reverse=True):
            text = text[:s] + replacement_for(ent, surf, mode) + text[e:]
        new_texts[r] = text
    return new_texts


class RedactorActor:
    """map_batches callable: registry compiled once per actor."""

    def __init__(
        self,
        registry: Optional[RecognizerRegistry] = None,
        config: Optional[EngineConfig] = None,
        text_col: str = "text",
        mode: str = "pseudonym",
    ):
        cfg = config or EngineConfig()
        if registry is None:
            registry = RecognizerRegistry(
                add_addresses_recognizer=cfg.add_addresses_recognizer,
                lang=cfg.lang,
            )
            if cfg.additional_addresses:
                registry.add_addresses(cfg.additional_addresses)
        self.compiled = registry.compile()
        self.text_col = text_col
        if mode not in ("pseudonym", "tag"):
            raise ValueError(f"unknown redaction mode: {mode}")
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        out = self.compiled.scan(texts)
        new_texts = compute_redactions(out, texts, self.mode)
        idx = batch.schema.get_field_index(self.text_col)
        return batch.set_column(
            idx, self.text_col, pa.array(new_texts, pa.string())
        )


#: per-worker redactor cache, token-keyed like recognize._REC_CACHE
#: (ctor args unhashable by value; one token per stage; construction
#: deterministic, so tasks stay idempotent)
_RED_CACHE: dict = {}


def _redact_batch(batch: pa.Table, *, token: str, ctor: dict) -> pa.Table:
    red = _RED_CACHE.get(token)
    if red is None:
        if len(_RED_CACHE) >= 8:
            _RED_CACHE.pop(next(iter(_RED_CACHE)))
        red = _RED_CACHE.setdefault(token, RedactorActor(**ctor))
    return red(batch)


def redact_transcripts(
    turns_ds,
    config: Optional[EngineConfig] = None,
    registry: Optional[RecognizerRegistry] = None,
    mode: str = "pseudonym",
    text_col: str = "text",
):
    """Dataset of turns → same schema with ``text`` redacted.  Task pool
    + per-worker cached redactor: no actor spin-up, elastic width."""
    import uuid

    cfg = config or EngineConfig()
    return turns_ds.map_batches(
        _redact_batch,
        fn_kwargs=dict(
            token=uuid.uuid4().hex,
            ctor=dict(registry=registry, config=cfg, text_col=text_col, mode=mode),
        ),
        batch_format="pyarrow",
        batch_size=cfg.recognizer_batch_size,
        num_cpus=1,
        zero_copy_batch=True,
    )
