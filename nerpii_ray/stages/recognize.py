"""Mention-detection stage: the Ray Data analogue of nerpii's analyzer pass.

Reference flow: ``BatchAnalyzerEngine.analyze_dict`` runs every recognizer
over every cell of every object column in one Python process
(``named_entity_recognizer.py:407-430``).  Here the same semantics run as a
task-pool ``map_batches`` stage with a per-worker recognizer cache: the
registry (regexes, gazetteers, deny list) is compiled once per worker
process — mirroring the one-time engine construction at
``named_entity_recognizer.py:343-385`` — and each call scans a zero-copy
Arrow batch of turns into an exploded *mentions* table.

Output schema (mention rows):
  <key columns passed through> + group_key:string, entity:string,
  surface:string, start:int32, end:int32, score:float, stage:string,
  is_primary:bool, cnt:int32

``stage`` ∈ {pattern, deny, gazetteer, model, model_span, count}.  Rows with
``stage == "count"`` are per-(group, batch) row-count partials
(entity="__ROWS__", cnt=k): they let the downstream assignment aggregate
compute nerpii's 30 % support gate without a second pass over the input.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from nerpii_ray.config import EngineConfig
from nerpii_ray.state.registry import RecognizerRegistry

ROWS_LABEL = "__ROWS__"
#: fused-redaction row markers (one row per turn when emit_redacted set)
REDACTED_LABEL = "__REDACTED__"
STAGE_REDACTED = "redacted"


class RecognizerActor:
    """Callable class for ``map_batches(RecognizerActor, concurrency=N)``.

    Parameters
    ----------
    text_col : column holding the text to scan (transcript ``text``).
    key_cols : columns passed through onto every mention row
        (e.g. ``("conv_id", "turn_idx", "role", "tool")``).
    group_col : column to use as the grouping key directly (documents mode:
        ``source``); mutually exclusive with ``group_from``.
    group_from : build ``group_key`` as ``role:tool`` from these two columns
        (transcript mode; nulls in the second become ``"none"``).
    """

    def __init__(
        self,
        registry: Optional[RecognizerRegistry] = None,
        config: Optional[EngineConfig] = None,
        text_col: str = "text",
        key_cols: Sequence[str] = ("conv_id", "turn_idx", "role", "tool"),
        group_col: Optional[str] = None,
        group_from: Optional[Sequence[str]] = ("role", "tool"),
        emit_group_counts: bool = True,
        attach_ids: bool = False,
        emit_redacted: Optional[str] = None,
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
        self.key_cols = list(key_cols)
        self.group_col = group_col
        self.group_from = list(group_from) if group_from else None
        self.emit_group_counts = emit_group_counts
        #: fuse canonicalization into the scan: norm_surface/node_id
        #: computed here so no separate (CPU-starved) task stage is needed
        #: while the actor pool holds the cluster's slots
        self.attach_ids = attach_ids
        #: fused redaction ("pseudonym" | "tag" | None): the SAME scan
        #: that feeds the KG also emits one redacted-text row per turn —
        #: the privacy-preserving corpus and the graph cost ONE read of
        #: the input instead of two full scans
        self.emit_redacted = emit_redacted
        if attach_ids:
            import re as _re

            self._ws_re = _re.compile(r"\s+")
            self._id_cache: dict = {}

    def _group_keys(self, batch: pa.Table) -> pa.Array:
        if self.group_col is not None:
            return pc.cast(
                pc.fill_null(batch.column(self.group_col), "none"), pa.string()
            )
        a = pc.fill_null(pc.cast(batch.column(self.group_from[0]), pa.string()), "none")
        b = pc.fill_null(pc.cast(batch.column(self.group_from[1]), pa.string()), "none")
        return pc.binary_join_element_wise(a, b, ":")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        out = self.compiled.scan(texts)
        group_keys = self._group_keys(batch)

        rows = out["row"]
        idx = pa.array(rows, type=pa.int64())
        cols: dict[str, pa.Array] = {}
        for k in self.key_cols:
            cols[k] = batch.column(k).take(idx)
        cols["group_key"] = group_keys.take(idx)
        cols["entity"] = pa.array(out["entity"], type=pa.string())
        cols["surface"] = pa.array(out["surface"], type=pa.string())
        cols["start"] = pa.array(out["start"], type=pa.int32())
        cols["end"] = pa.array(out["end"], type=pa.int32())
        cols["score"] = pa.array(out["score"], type=pa.float64())
        cols["stage"] = pa.array(out["stage"], type=pa.string())
        cols["is_primary"] = pa.array(out["is_primary"], type=pa.bool_())
        cols["cnt"] = pa.array([1] * len(rows), type=pa.int64())
        if self.attach_ids:
            from nerpii_ray.functions.hashing import md5_hex
            from nerpii_ray.state.registry import PRESIDIO_STAGES, STAGE_MODEL_SPAN

            node_stages = set(PRESIDIO_STAGES) | {STAGE_MODEL_SPAN}
            norms: list = []
            ids: list = []
            cache = self._id_cache
            for stage, surf, ent in zip(out["stage"], out["surface"], out["entity"]):
                if stage not in node_stages:
                    norms.append(None)
                    ids.append(None)
                    continue
                key = (ent, surf)
                hit = cache.get(key)
                if hit is None:
                    norm = self._ws_re.sub(" ", surf.strip()).lower()
                    hit = (norm, md5_hex(f"{ent}:{norm}")[:16])
                    if len(cache) < 2_000_000:  # bound actor memory
                        cache[key] = hit
                norms.append(hit[0])
                ids.append(hit[1])
            cols["norm_surface"] = pa.array(norms, type=pa.string())
            cols["node_id"] = pa.array(ids, type=pa.string())
            # bandwidth diet for the materialized intermediate: surface is
            # redundant with norm_surface and end is unused downstream —
            # together the two biggest string columns in the KG path
            del cols["surface"]
            del cols["end"]
            # low-cardinality strings dictionary-encode ~10x smaller in
            # the object store (single node shares DRAM bandwidth; copies
            # are the scaling ceiling)
            for c in ("entity", "stage", "group_key", *self.key_cols):
                if c in cols and c not in ("conv_id", "turn_idx", "doc_id", "row_idx"):
                    arr = cols[c]
                    if pa.types.is_string(
                        arr.type if isinstance(arr, pa.Array) else arr.type
                    ):
                        cols[c] = pc.dictionary_encode(arr)
        mentions = pa.table(cols)
        parts = [mentions]

        if self.emit_redacted is not None:
            from nerpii_ray.stages.redact import compute_redactions

            new_texts = compute_redactions(out, texts, self.emit_redacted)
            m = len(texts)
            rcols: dict[str, pa.Array] = {}
            for k in self.key_cols:
                rcols[k] = batch.column(k)
            rcols["group_key"] = group_keys
            rcols["entity"] = pa.array([REDACTED_LABEL] * m, type=pa.string())
            rcols["surface"] = pa.array(new_texts, type=pa.string())
            rcols["start"] = pa.array([0] * m, type=pa.int32())
            rcols["end"] = pa.array([0] * m, type=pa.int32())
            rcols["score"] = pa.array([0.0] * m, type=pa.float64())
            rcols["stage"] = pa.array([STAGE_REDACTED] * m, type=pa.string())
            rcols["is_primary"] = pa.array([False] * m, type=pa.bool_())
            rcols["cnt"] = pa.array([1] * m, type=pa.int64())
            if self.attach_ids:
                # the diet drops `surface`; the redacted text rides
                # norm_surface (node_id stays null so every KG consumer
                # filters these rows out untouched)
                rcols["norm_surface"] = rcols.pop("surface")
                rcols["node_id"] = pa.array([None] * m, type=pa.string())
                del rcols["end"]
                for c in ("entity", "stage", "group_key", *self.key_cols):
                    if c in rcols and c not in ("conv_id", "turn_idx", "doc_id", "row_idx"):
                        arr = rcols[c]
                        if isinstance(arr, pa.ChunkedArray):
                            arr = arr.combine_chunks()
                        if pa.types.is_string(arr.type):
                            rcols[c] = pc.dictionary_encode(arr)
            parts.append(pa.table(rcols))

        if not self.emit_group_counts:
            return (
                parts[0]
                if len(parts) == 1
                else pa.concat_tables(parts, promote_options="default")
            )

        # per-(group, batch) row-count partial rows
        vc = group_keys.value_counts()
        gk = vc.field("values")
        n = vc.field("counts")
        # key columns for count rows carry the group's first-seen row values
        first_idx = pc.index_in(gk, group_keys)
        ccols: dict[str, pa.Array] = {}
        for k in self.key_cols:
            ccols[k] = batch.column(k).take(first_idx)
        m = len(gk)
        ccols["group_key"] = pc.cast(gk, pa.string())
        ccols["entity"] = pa.array([ROWS_LABEL] * m, type=pa.string())
        ccols["surface"] = pa.array([""] * m, type=pa.string())
        ccols["start"] = pa.array([0] * m, type=pa.int32())
        ccols["end"] = pa.array([0] * m, type=pa.int32())
        ccols["score"] = pa.array([0.0] * m, type=pa.float64())
        ccols["stage"] = pa.array(["count"] * m, type=pa.string())
        ccols["is_primary"] = pa.array([False] * m, type=pa.bool_())
        ccols["cnt"] = pc.cast(n, pa.int64())
        if self.attach_ids:
            ccols["norm_surface"] = pa.array([None] * m, type=pa.string())
            ccols["node_id"] = pa.array([None] * m, type=pa.string())
            del ccols["surface"]
            del ccols["end"]
            for c in ("entity", "stage", "group_key", *self.key_cols):
                if c in ccols and c not in ("conv_id", "turn_idx", "doc_id", "row_idx"):
                    arr = ccols[c]
                    if pa.types.is_string(arr.type):
                        ccols[c] = pc.dictionary_encode(arr)
        counts = pa.table(ccols)
        parts.append(counts)
        return pa.concat_tables(parts, promote_options="default")


#: per-worker recognizer cache, keyed by a driver-minted stage token.
#: RecognizerActor's ctor args (registry/config objects) aren't hashable
#: by value, but every task of ONE stage shares the same kwargs — so the
#: driver stamps the stage with a token and each worker constructs the
#: recognizer once per stage.  Construction is deterministic from the
#: kwargs (registry compile is ~2 ms) and the _id_cache is a pure memo,
#: so tasks stay idempotent; Ray puts the fn_kwargs closure in the
#: object store once, not per task.
_REC_CACHE: dict = {}


def _recognize_batch(batch: pa.Table, *, token: str, ctor: dict) -> pa.Table:
    rec = _REC_CACHE.get(token)
    if rec is None:
        if len(_REC_CACHE) >= 8:  # bound: id-caches can reach ~100 MB each
            _REC_CACHE.pop(next(iter(_REC_CACHE)))
        rec = _REC_CACHE.setdefault(token, RecognizerActor(**ctor))
    return rec(batch)


def recognize_mentions(
    ds,
    config: Optional[EngineConfig] = None,
    registry: Optional[RecognizerRegistry] = None,
    text_col: str = "text",
    key_cols: Sequence[str] = ("conv_id", "turn_idx", "role", "tool"),
    group_col: Optional[str] = None,
    group_from: Optional[Sequence[str]] = ("role", "tool"),
    emit_group_counts: bool = True,
    attach_ids: bool = False,
    emit_redacted: Optional[str] = None,
):
    """Attach the recognizer stage to a Dataset of turns/documents.

    Task pool + per-worker cached recognizer (see stages/taskcache.py for
    the rationale): setup-once-per-worker semantics with zero actor
    spin-up and elastic width — the old autoscaling actor pool paid a
    serialized ramp of process starts at the head of every flagship run
    and pinned its width below cluster scale."""
    import uuid

    cfg = config or EngineConfig()
    ctor = dict(
        registry=registry,
        config=cfg,
        text_col=text_col,
        key_cols=key_cols,
        group_col=group_col,
        group_from=group_from,
        emit_group_counts=emit_group_counts,
        attach_ids=attach_ids,
        emit_redacted=emit_redacted,
    )
    return ds.map_batches(
        _recognize_batch,
        fn_kwargs=dict(token=uuid.uuid4().hex, ctor=ctor),
        batch_format="pyarrow",
        batch_size=cfg.recognizer_batch_size,
        num_cpus=1,
        zero_copy_batch=True,
    )
