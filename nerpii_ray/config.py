"""Engine configuration.

Mirrors the reference's constructor knobs
(``named_entity_recognizer.py:282-289``: ``data_sample``, ``nan_filler``,
``lang``, ``get_gender_option``; ``:345-346``: ``add_addresses_recognizer``,
``additional_addresses``; ``:524``: ``zipcode`` / ``credit_card`` manual-rule
toggles; ``faker_generator.py:53-57``: ``lang``, ``generation_mark``) plus the
Ray-side execution knobs the reference has no equivalent of.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class EngineConfig:
    # --- nerpii-parity semantics knobs ---
    lang: str = "en"
    nan_filler: str = "?"
    #: support gate: a group gets an entity only if more than this fraction of
    #: its rows carry at least one mention (``named_entity_recognizer.py:449``)
    support_gate: float = 0.3
    #: LOCATION override threshold (``named_entity_recognizer.py:465-469``)
    location_threshold: float = 0.1
    #: model B-ORG threshold (``named_entity_recognizer.py:516-517``)
    org_threshold: float = 0.1
    #: synthesis confidence gate (``faker_generator.py:105``)
    synth_confidence_gate: float = 0.3
    add_addresses_recognizer: bool = True
    additional_addresses: List[str] = field(default_factory=list)
    manual_zipcode_rule: bool = True
    manual_credit_card_rule: bool = True
    generation_mark: Optional[str] = None

    # --- Ray execution knobs (no reference equivalent) ---
    #: rows per batch for the recognizer actor pool
    recognizer_batch_size: int = 4096
    #: actor pool size for the recognizer stage; None → stateless tasks
    recognizer_concurrency: int = 4
    #: autoscaling pool minimum — raise for benchmarks so ramp-up latency
    #: doesn't serialize the first blocks; keep 1 for small ad-hoc runs
    recognizer_min_concurrency: int = 1
    #: salting factor for hot canonical surfaces (top-k census, SURVEY §4)
    hot_surface_salt: int = 16
    #: batch size for stateless transform stages
    batch_size: int = 8192
