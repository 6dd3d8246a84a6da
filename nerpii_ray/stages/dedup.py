"""Deduplication operators (training-data pipeline ops):

* exact: content hash → hash-partitioned group → keep first (min id);
* MinHash + LSH near-dup: shingle → minhash signature → banded bucket
  groupby → candidate pairs → signature-estimated Jaccard verify;
* SimHash: 64-bit weighted token hash per doc (Hamming-near dup key);
* n-gram Jaccard pairs within buckets (exact verify for small groups);
* embedding cosine near-dup within buckets.

Scale notes (SURVEY §4): every op pre-aggregates / locally dedups inside
``map_batches`` before its groupby, so shuffles move combiner output, not
raw rows.  Candidate verification uses the minhash signatures themselves
(no second pass over text).  Bucket-bounded ops (``ngram``, ``embedding``)
state their partitioning assumption in the docstring.
"""

from __future__ import annotations

import hashlib
import logging
import math
import re

import numpy as np
import pandas as pd

from nerpii_ray.functions.textfns import md5_of_strings, stable_hash64_np
from nerpii_ray.stages.colocate import keyed_partition_apply

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\w+")
_LOG = logging.getLogger("nerpii_ray.dedup")


# ---------------------------------------------------------------- exact
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", **tree_kwargs):
    """Exact dedup: keep the row with the smallest id per distinct
    normalized content.  Returns (id, fp) pairs of the KEPT rows.

    Hash-partition + per-group first (SURVEY §2.7): the shuffle key is a
    16-byte digest, never the document text.  The finish is cardinality-
    aware (stages/agg.py): past the root threshold the distinct
    fingerprints stay partitioned across exchange actors instead of
    coalescing into one block — at the 100-TB design point that root
    would hold one row per distinct document.  ``tree_kwargs`` pass
    through to ``tree_dedup`` (e.g. ``root_threshold``).
    """

    from nerpii_ray.stages.agg import tree_dedup

    def fp_batch(b: pd.DataFrame) -> pd.DataFrame:
        norm = (
            b[text_col].fillna("").str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
        )
        out = pd.DataFrame({id_col: b[id_col], "fp": md5_of_strings(norm)})
        # local combiner: one candidate per fingerprint per batch
        return out.sort_values(id_col).drop_duplicates("fp")

    return tree_dedup(
        ds, keys=["fp"], partial_fn=fp_batch, keep_min=id_col, **tree_kwargs
    )


# ------------------------------------------------------------- minhash
#: fixed odd mixing coefficients for the rolling shingle hash
_SHINGLE_COEF = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63], dtype=np.uint64
)


class MinHasher:
    """Actor-pool minhash signatures: permutation coefficients drawn once
    per actor from a fixed seed (deterministic across the fleet).

    Shingle hashing is fully vectorized: each DISTINCT token is hashed
    once per actor (md5-derived, cached), and a word-k-shingle's hash is
    a fixed-coefficient polynomial over its token IDs computed with one
    numpy sliding-window multiply-add (uint64 wraparound is deterministic)
    — no per-shingle digest calls.
    """

    def __init__(self, text_col="text", id_col="doc_id", num_perm=64,
                 shingle_k=3, seed=97):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.shingle_k = num_perm, shingle_k
        self._tok_ids: dict = {}

    def _token_id(self, tok: str) -> int:
        v = self._tok_ids.get(tok)
        if v is None:
            v = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            if len(self._tok_ids) < 4_000_000:  # bound actor memory
                self._tok_ids[tok] = v
        return v

    def _batch_sigs(self, texts: list) -> tuple:
        """Vectorized signatures for a batch of texts.

        Returns ``(doc_idx, sigs)``: the ascending positions of the
        non-empty texts and their ``(n, num_perm)`` signature matrix,
        bit-identical to ``signature()`` per doc (pinned by
        ``test_banded_vectorized_matches_scalar``).  The per-token work is
        one ``pd.factorize`` (C hash table) + md5 only per DISTINCT new
        token; shingle hashes come from ONE global sliding window over the
        concatenated token-id array with windows that straddle doc
        boundaries masked out; per-doc shingle dedup is a lexsort
        first-of-run; the perm × shingle min is one ``minimum.reduceat``.
        No per-token or per-shingle Python in the loop — this is the
        per-core inner kernel of the corpus-wide dedup scan.
        """
        tok_lists = [_TOKEN_RE.findall(t.lower()) for t in texts]
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        keep = np.flatnonzero(lens > 0)
        if len(keep) == 0:
            return keep, np.empty((0, self.num_perm), dtype=np.uint64)
        import itertools

        flat = np.array(
            list(itertools.chain.from_iterable(tok_lists)), dtype=object
        )
        codes, uniques = pd.factorize(flat, sort=False)
        uniq_ids = np.fromiter(
            (self._token_id(u) for u in uniques), dtype=np.uint64,
            count=len(uniques),
        )
        flat_ids = uniq_ids[codes]
        k = self.shingle_k
        off = np.concatenate(([0], np.cumsum(lens)))
        h_parts: list = []
        d_parts: list = []
        big = np.flatnonzero(lens >= k)
        if len(big):
            nwin = lens[big] - k + 1
            total = int(nwin.sum())
            # segmented arange: window starts for every big doc at once
            seg0 = np.concatenate(([0], np.cumsum(nwin)[:-1]))
            starts = (
                np.repeat(off[big], nwin)
                + np.arange(total)
                - np.repeat(seg0, nwin)
            )
            win = np.lib.stride_tricks.sliding_window_view(flat_ids, k)[starts]
            with np.errstate(over="ignore"):
                h = (win * _SHINGLE_COEF[:k][None, :]).sum(
                    axis=1, dtype=np.uint64
                ) % _MERSENNE
            h_parts.append(h)
            d_parts.append(np.repeat(big, nwin))
        for d in np.flatnonzero((lens > 0) & (lens < k)):
            # short doc (< k tokens): exactly one window of its own length
            ids = flat_ids[off[d] : off[d + 1]]
            with np.errstate(over="ignore"):
                # keep the 1-element ARRAY: a numpy uint64 SCALAR % a
                # Python int silently promotes to float64 (array % int
                # stays uint64), which would corrupt the hash
                hv = (ids * _SHINGLE_COEF[: len(ids)]).sum(
                    dtype=np.uint64, keepdims=True
                ) % _MERSENNE
            h_parts.append(hv)
            d_parts.append(np.array([d], dtype=np.int64))
        h_all = np.concatenate(h_parts)
        d_all = np.concatenate(d_parts)
        order = np.lexsort((h_all, d_all))
        hs, dg = h_all[order], d_all[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (dg[1:] != dg[:-1]) | (hs[1:] != hs[:-1])
        hu, du = hs[first], dg[first]
        seg = np.flatnonzero(np.concatenate(([True], du[1:] != du[:-1])))
        # Per-permutation loop over REUSED small buffers instead of one
        # (num_perm × n_shingles) matrix: the big matrix costs ~3 s of
        # fresh-page allocation per worker at 64 perms × 260k shingles,
        # the loop is pure cache-resident compute.  Permute only the
        # GLOBALLY distinct hashes (repetitive corpora collapse by 100×)
        # and gather per-doc values by inverse code.
        guniq, ginv = np.unique(hu, return_inverse=True)
        n_docs = len(seg)
        sigs = np.empty((n_docs, self.num_perm), dtype=np.uint64)
        mers = np.uint64(_MERSENNE)
        with np.errstate(over="ignore"):
            for p in range(self.num_perm):
                pv = (self.a[p] * guniq + self.b[p]) % mers
                sigs[:, p] = np.minimum.reduceat(pv[ginv], seg)
        return du[seg], sigs

    def _shingle_hashes(self, text: str) -> np.ndarray:
        toks = _TOKEN_RE.findall(text.lower())
        if not toks:
            return np.empty(0, dtype=np.uint64)
        ids = np.fromiter(
            (self._token_id(t) for t in toks), dtype=np.uint64, count=len(toks)
        )
        k = min(self.shingle_k, len(ids))
        windows = np.lib.stride_tricks.sliding_window_view(ids, k)
        with np.errstate(over="ignore"):
            h = (windows * _SHINGLE_COEF[:k][None, :]).sum(
                axis=1, dtype=np.uint64
            ) % _MERSENNE
        return np.unique(h)

    def _sig_from_hashes(self, h: np.ndarray) -> np.ndarray:
        # (perm × shingle) affine hash, min over shingles
        with np.errstate(over="ignore"):
            m = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
        return m.min(axis=1)

    def signature(self, text: str) -> np.ndarray:
        h = self._shingle_hashes(text or "")
        if len(h) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        return self._sig_from_hashes(h)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("").tolist()
        kept, sigs = self._batch_sigs(texts)
        full = np.full((len(texts), self.num_perm), _MERSENNE, dtype=np.uint64)
        if len(kept):
            full[kept] = sigs  # empty docs keep the all-sentinel signature
        return pd.DataFrame({self.id_col: batch[self.id_col].to_numpy(),
                             "sig": list(full)})

    def banded(self, batch: pd.DataFrame, bands: int) -> pd.DataFrame:
        """One-pass banded output: per doc, ``bands`` LIGHT rows
        (band, band_hash, id — no signature payload) plus one signature
        row (band = -1, sig bytes) for verification at the pairing root.
        Carrying the 512-byte signature once instead of ``bands`` times
        cuts the exchange volume ~an order of magnitude.

        Empty docs are skipped entirely: the all-sentinel signature would
        bucket every empty doc together and pair them at est_jaccard 1.0,
        and an empty doc has no content to be a near-dup of.
        """
        rpb = self.num_perm // bands
        all_ids = batch[self.id_col].to_numpy()
        kept, sigs = self._batch_sigs(batch[self.text_col].fillna("").tolist())
        n = len(kept)
        if n == 0:
            return pd.DataFrame(
                {"band": np.array([], dtype=np.int32),
                 "band_hash": pd.Series([], dtype=object),
                 self.id_col: np.array([], dtype=all_ids.dtype),
                 "sig": pd.Series([], dtype=object)}
            )
        ids = all_ids[kept]
        # Band hash over a canonical STRING encoding of the slice
        # (comma-joined lowercase hex) rather than raw bytes: any
        # injective encoding gives identical buckets, and the string form
        # is SQL-replayable (DuckDB md5 takes VARCHAR only), which is what
        # lets doc_minhash_pairs_small oracle the band/bucket/verify path.
        # plain listcomps beat np.char here: np.char.mod/add are
        # per-element Python loops with extra ufunc overhead
        flat_hex = ["%x" % v for v in sigs.ravel()]
        np_ = self.num_perm
        md5 = hashlib.md5
        hash_cols = np.empty((bands, n), dtype=object)
        for band in range(bands):
            lo = band * rpb
            hash_cols[band] = [
                md5(",".join(flat_hex[i * np_ + lo : i * np_ + lo + rpb]).encode())
                .hexdigest()[:16]
                for i in range(n)
            ]
        # doc-major light rows (bands per doc), then one sig row per doc;
        # downstream consumers filter on band >= 0 / == -1, order is free
        light_band = np.tile(np.arange(bands, dtype=np.int32), n)
        light_hash = hash_cols.T.ravel()
        light_id = np.repeat(ids, bands)
        return pd.DataFrame(
            {"band": np.concatenate((light_band, np.full(n, -1, dtype=np.int32))),
             "band_hash": np.concatenate((light_hash, np.full(n, "", dtype=object))),
             self.id_col: np.concatenate((light_id, ids)),
             "sig": [b""] * (n * bands) + [s.tobytes() for s in sigs]}
        )


class _BandedMinHasher(MinHasher):
    """MinHasher variant whose __call__ emits the banded layout directly
    (see ``MinHasher.banded``) — one pass, no ndarray columns."""

    def __init__(self, bands: int = 16, **kwargs):
        super().__init__(**kwargs)
        self.bands = bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return self.banded(batch, self.bands)


#: per-worker-process hasher cache for the TASK-pool scan: constructing a
#: MinHasher is cheap (one RandomState draw) but its token-id cache is
#: valuable across batches.  Keying by the full parameter tuple keeps
#: concurrent queries with different parameters isolated.  A task pool
#: (plain map_batches) reuses Ray's prestarted worker processes, so the
#: scan pays ZERO actor spin-up while keeping the setup-once-per-worker
#: property the actor form had (state is a pure memo — tasks stay
#: idempotent and retry-safe).
_MH_CACHE: dict = {}


def _banded_scan_batch(batch: pd.DataFrame, *, text_col: str, id_col: str,
                       num_perm: int, shingle_k: int, bands: int,
                       seed: int = 97) -> pd.DataFrame:
    key = (text_col, id_col, num_perm, shingle_k, bands, seed)
    mh = _MH_CACHE.get(key)
    if mh is None:
        mh = _MH_CACHE.setdefault(
            key,
            _BandedMinHasher(text_col=text_col, id_col=id_col,
                             num_perm=num_perm, shingle_k=shingle_k,
                             bands=bands, seed=seed),
        )
    return mh(batch)


def _bucket_truncation_stats(sizes: np.ndarray, max_bucket: int) -> tuple:
    """(buckets truncated, candidate pairs dropped) for bucket ``sizes``
    capped at ``max_bucket``: each hot bucket loses C(n,2) − C(cap,2)."""
    hot = sizes[sizes > max_bucket].astype("int64")
    dropped = int((hot * (hot - 1) // 2 - max_bucket * (max_bucket - 1) // 2).sum())
    return len(hot), dropped


def _bucket_candidate_pairs(df: pd.DataFrame, id_col: str, max_bucket: int) -> pd.DataFrame:
    """Within-bucket candidate pairing for the LSH table (band, band_hash,
    id).  Buckets larger than ``max_bucket`` keep their smallest ids; the
    dropped-pair count is LOGGED, never silently swallowed (engine rule:
    no silent caps)."""
    out = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )
    if df.empty:
        return out
    sizes = df.groupby(["band", "band_hash"], sort=False)["band"].transform("size")
    multi = df[sizes > 1]
    if multi.empty:
        return out
    trunc_buckets, trunc_pairs = _bucket_truncation_stats(
        multi.groupby(["band", "band_hash"], sort=False).size().to_numpy(), max_bucket
    )
    if trunc_buckets:
        _LOG.warning(
            "minhash_lsh_pairs: truncated %d hot bucket(s) at max_bucket=%d "
            "— %d candidate pair(s) dropped (raise max_bucket to keep them)",
            trunc_buckets, max_bucket, trunc_pairs,
        )
    ia: list = []
    ib: list = []
    for _, g in multi.groupby(["band", "band_hash"], sort=False):
        ids = np.sort(g[id_col].to_numpy())[:max_bucket]
        iu, ju = np.triu_indices(len(ids), k=1)
        ia.append(ids[iu])
        ib.append(ids[ju])
    return pd.DataFrame(
        {"id_a": np.concatenate(ia).astype("int64"),
         "id_b": np.concatenate(ib).astype("int64")}
    ).drop_duplicates()


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 64,
):
    """Near-duplicate pairs via MinHash+LSH, in two key-partitioned
    phases (no single-node coalesce anywhere):

    1. CANDIDATES — the light (band, band_hash, id) rows go through the
       hash-actor exchange keyed on (band, band_hash); each actor owns a
       key range and emits all within-bucket pairs at finish.  Buckets
       larger than ``max_bucket`` are truncated (smallest ids kept) to
       bound the quadratic blowup.
    2. VERIFY — estimated Jaccard = minhash-signature agreement, fetched
       only for candidate docs (candidate volume ≈ output volume); the
       512-byte signatures never ride the band shuffle and the text is
       never read twice.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated.
    """
    import ray
    import ray.data as rd

    from nerpii_ray.stages.exchange import hash_exchange_aggregate

    # ONE pass over text: banded layout (bands light rows + one signature
    # row per doc — metadata only, never text), pinned so the candidate
    # phase and the verify phase don't re-run the minhash scan.  Plain
    # task pool + per-worker cached hasher (see _MH_CACHE): same
    # setup-once-per-worker property as an actor pool, none of the
    # spin-up latency, and elastic width at cluster scale.
    banded = ds.map_batches(
        _banded_scan_batch,
        fn_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm,
            shingle_k=shingle_k, bands=bands,
        ),
        batch_format="pandas",
        batch_size=2048,  # bundle oversplit input blocks into real batches
    ).materialize()

    empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "est_jaccard": pd.Series(dtype="float64")}
    )

    # Phase 1 — CANDIDATES: key-partitioned exchange on (band, band_hash).
    # Every bucket's members meet on exactly one aggregator actor (per-
    # actor memory = its share of the docs × bands key table, scaled by
    # the actor count), and pairing runs once per actor at finish.  Only
    # the ~40-byte light rows move — signatures stay out of this shuffle.
    def light_rows(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["band"] >= 0, ["band", "band_hash", id_col]]

    def cand_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return _bucket_candidate_pairs(df, id_col, max_bucket)

    # Cardinality-aware pairing root (same policy as stages/agg.py):
    # a small key table pairs in ONE task — actor fleets cost more to
    # spawn than the whole exchange at this size — while a large one
    # goes through the keyed actor exchange so no single node ever holds
    # the docs × bands table.  banded is materialized → count is free.
    from nerpii_ray.stages.agg import ROOT_THRESHOLD_DEFAULT

    n_light = banded.count()
    lights = banded.map_batches(light_rows, batch_format="pandas")
    if n_light <= ROOT_THRESHOLD_DEFAULT:
        # SMALL path: the whole banded table (light rows AND signatures)
        # is bounded by the threshold, so ONE block fetch of the already-
        # materialized dataset replaces three extra Dataset executions
        # (repartition→pair, then a sig-fetch scan) — at this size the
        # fixed per-execution cost dwarfs the pairing compute itself
        bdf = banded.to_pandas()
        cand = cand_pairs(bdf.loc[bdf["band"] >= 0, ["band", "band_hash", id_col]])
        if cand.empty:
            return rd.from_pandas(empty)
        # the same pair can surface from several bands → dedup (the
        # candidate table is near-dup-rate-sized, i.e. output-sized)
        cand = cand.drop_duplicates().reset_index(drop=True)
        sig_rows = bdf.loc[bdf["band"] == -1, [id_col, "sig"]]
        sig_of = dict(zip(sig_rows[id_col], sig_rows["sig"]))
        sig_a = np.stack(
            [np.frombuffer(sig_of[i], dtype=np.uint64) for i in cand["id_a"]]
        )
        sig_b = np.stack(
            [np.frombuffer(sig_of[i], dtype=np.uint64) for i in cand["id_b"]]
        )
        est = (sig_a == sig_b).mean(axis=1)
        keep = est >= threshold
        out = pd.DataFrame(
            {"id_a": cand.loc[keep, "id_a"].to_numpy(),
             "id_b": cand.loc[keep, "id_b"].to_numpy(),
             "est_jaccard": est[keep].astype("float64")}
        )
        return rd.from_pandas(out if len(out) else empty)

    # SCALE path: candidates AND verification stay key-partitioned on
    # actor exchanges end-to-end — the driver never holds the candidate
    # table, an id set, or any signature (the r2 VERDICT's last
    # output-sized driver touchpoint).  Three exchanges, all over
    # output- or metadata-sized rows:
    #   E1 (band, band_hash):  light rows → within-bucket pairing
    #   E2 (jid):              pair halves ⋈ signatures (each pair sends
    #                          one half to id_a's owner, one to id_b's)
    #   E3 (id_a, id_b):       the two signature-carrying halves meet →
    #                          dedup across bands → agreement → threshold
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # one bucket actor per ~1M key rows, capped at cluster width
    num_buckets = int(min(max(8, ncpu), max(2, n_light // 1_000_000 + 1)))
    cand_ds = hash_exchange_aggregate(
        lights,
        partial_fn=lambda b: b,
        merge_fn=lambda df: df,
        keys=["band", "band_hash"],
        num_buckets=num_buckets,
        finish_fn=cand_pairs,
        as_dataset=True,
    )

    def mk_halves(b: pd.DataFrame) -> pd.DataFrame:
        # two join rows per candidate pair, keyed by the doc whose
        # signature each half must pick up; sig placeholder is b"" (not
        # None) so the union with the signature rows keeps one Arrow
        # binary type across blocks
        h = pd.concat(
            [b.assign(jid=b["id_a"]), b.assign(jid=b["id_b"])],
            ignore_index=True,
        )
        h["sig"] = b""
        return h[["jid", "id_a", "id_b", "sig"]]

    def mk_sig_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = b.loc[b["band"] == -1, [id_col, "sig"]]
        return pd.DataFrame(
            {"jid": s[id_col].astype("int64"),
             "id_a": np.int64(-1), "id_b": np.int64(-1), "sig": s["sig"]}
        )

    def attach_sig(df: pd.DataFrame) -> pd.DataFrame:
        # per jid-bucket: stick each doc's signature onto the pair halves
        # that need it; signatures of docs in no candidate pair die here
        sigs = df.loc[df["id_a"] < 0, ["jid", "sig"]]
        halves = df.loc[df["id_a"] >= 0, ["jid", "id_a", "id_b"]]
        m = halves.merge(sigs, on="jid", how="inner")
        return m[["jid", "id_a", "id_b", "sig"]]

    def score_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        a = (
            df.loc[df["jid"] == df["id_a"], ["id_a", "id_b", "sig"]]
            .drop_duplicates(["id_a", "id_b"])
        )
        b = (
            df.loc[df["jid"] == df["id_b"], ["id_a", "id_b", "sig"]]
            .drop_duplicates(["id_a", "id_b"])
        )
        m = a.merge(b, on=["id_a", "id_b"], suffixes=("_a", "_b"))
        if m.empty:
            return empty.copy()
        sig_a = np.stack([np.frombuffer(s, dtype=np.uint64) for s in m["sig_a"]])
        sig_b = np.stack([np.frombuffer(s, dtype=np.uint64) for s in m["sig_b"]])
        est = (sig_a == sig_b).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame(
            {"id_a": m.loc[keep, "id_a"].to_numpy().astype("int64"),
             "id_b": m.loc[keep, "id_b"].to_numpy().astype("int64"),
             "est_jaccard": est[keep].astype("float64")}
        )

    sig_ds = banded.map_batches(mk_sig_rows, batch_format="pandas")
    halves_ds = cand_ds.map_batches(mk_halves, batch_format="pandas")
    joined = hash_exchange_aggregate(
        sig_ds.union(halves_ds),
        partial_fn=lambda b: b,
        merge_fn=lambda df: df,
        keys=["jid"],
        num_buckets=num_buckets,
        finish_fn=attach_sig,
        as_dataset=True,
    )
    scored = hash_exchange_aggregate(
        joined,
        partial_fn=lambda b: b,
        merge_fn=lambda df: df,
        keys=["id_a", "id_b"],
        num_buckets=num_buckets,
        finish_fn=score_pairs,
        as_dataset=True,
    )
    # normalize per-bucket block schemas (empty buckets) to the result
    # schema; the verified-pair table is output-sized by definition
    return scored.map_batches(
        lambda b: b[["id_a", "id_b", "est_jaccard"]].astype(
            {"id_a": "int64", "id_b": "int64", "est_jaccard": "float64"}
        )
        if len(b)
        else empty.copy(),
        batch_format="pandas",
    )


# ------------------------------------------------------------- simhash
def add_simhash(batch: pd.DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> pd.DataFrame:
    """64-bit SimHash per document (token-hash bit-vote).  Near-dups share
    small Hamming distance; pairing = group on rotated prefixes or band
    tables downstream.

    Vectorized across the WHOLE batch: tokenization is the only per-doc
    Python step; the (doc, token)→count table, the 64 bit-votes (one
    ``bincount`` scatter per bit — C-speed, O(pairs) memory) and the
    bit-assembly are batch-wide array ops.  Bit-identical to the naive
    per-doc reference: vote = Σ count·(2·bit−1), sim bit set where
    vote > 0, tokenless docs → 0 (pinned by the doc_simhash SQL replay).
    """
    ids = batch[id_col].to_numpy()
    n = len(ids)
    doc_of, toks = [], []
    for i, text in enumerate(batch[text_col].fillna("")):
        tt = _TOKEN_RE.findall(text.lower())
        if tt:
            doc_of.append(np.full(len(tt), i, dtype=np.int64))
            toks.extend(tt)
    sims = np.zeros(n, dtype=np.uint64)
    if toks:
        pairs = pd.DataFrame({"d": np.concatenate(doc_of), "t": toks})
        cnt = pairs.groupby(["d", "t"], sort=False).size()
        d = cnt.index.get_level_values(0).to_numpy()
        c = cnt.to_numpy().astype(np.int64)
        hs = stable_hash64_np(pd.Series(cnt.index.get_level_values(1)))
        for b in range(64):
            bit = ((hs >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            votes = np.bincount(d, weights=(2 * bit - 1) * c, minlength=n)
            # float64 bincount is exact here (integer-valued, |votes| ≪ 2^53)
            sims |= (votes > 0).astype(np.uint64) << np.uint64(b)
    return pd.DataFrame({id_col: ids, "simhash": sims})


# ------------------------------------------------- n-gram Jaccard pairs
def _per_bucket_kernel(pairs, bucket_col: str, out_dtypes: dict):
    """Lift a single-bucket pair kernel to the multi-key frames that
    ``keyed_partition_apply`` delivers (several complete buckets per
    partition, possibly empty).  ``observed=True``: a dict-encoded
    bucket column must not explode into the cartesian category set."""

    def kernel(frame: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in out_dtypes.items()}
        )
        if not len(frame):
            return empty
        parts = [
            p
            for _, g in frame.groupby(bucket_col, observed=True, sort=False)
            if len(p := pairs(g))
        ]
        if not parts:
            return empty
        return pd.concat(parts, ignore_index=True).astype(out_dtypes)

    return kernel


def ngram_jaccard_pairs(
    ds,
    bucket_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 512,
):
    """Exact word-n-gram Jaccard pairs within buckets.

    Partitioning assumption: near-duplicates share ``bucket_col`` (e.g.
    source/lang); cross-bucket duplicates are invisible by design — use
    minhash_lsh_pairs for unbucketed discovery.

    Physical plan: ``keyed_partition_apply`` on ``bucket_col`` — one
    task under the root threshold, keyed actor exchange past it (the
    sort-based ``Dataset.groupby`` this replaced spent 4–8 s of fixed
    shuffle latency at ANY size; colocate.py:15).
    """

    def shingles(x) -> frozenset:
        toks = _TOKEN_RE.findall(str(x).lower())
        if not toks:
            # empty/whitespace-only doc → empty set, NOT {''}: two empty
            # docs must not read as jaccard-1.0 duplicates
            return frozenset()
        return frozenset(
            " ".join(toks[i : i + n]) for i in range(max(1, len(toks) - n + 1))
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(max_bucket)
        sets = [shingles(x) for x in g[text_col].fillna("")]
        ids = g[id_col].to_numpy()
        ia, ib, js = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = sets[i], sets[j]
                if not a or not b:
                    continue
                jac = len(a & b) / len(a | b)
                if jac >= threshold:
                    ia.append(ids[i])
                    ib.append(ids[j])
                    # half-away rounding, matching SQL ROUND (Python's
                    # round() is half-even and would diverge on exact .5)
                    js.append(math.floor(jac * 1e6 + 0.5) / 1e6)
        return pd.DataFrame({"id_a": ia, "id_b": ib, "jaccard": js})

    return keyed_partition_apply(
        ds,
        [bucket_col],
        _per_bucket_kernel(
            pairs, bucket_col, {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
        ),
    )


# ------------------------------------- SRP-LSH embedding near-dup (unbucketed)
_SRP_PLANES: dict = {}


def _srp_planes(nbits: int, dim: int) -> np.ndarray:
    """Deterministic ±1 (Rademacher) hyperplanes: sign of plane p at
    1-based coordinate c is the parity of the first hex digit of
    ``md5("srp:{p}:{c}")`` — closed-form, so the SQL twin derives the
    SAME planes from DuckDB's own md5() with zero literals shipped.
    Memoized per worker (nbits × dim md5 calls, ~2 ms)."""
    key = (nbits, dim)
    if key not in _SRP_PLANES:
        h = np.empty((nbits, dim), dtype=np.int64)
        for p in range(nbits):
            for c in range(dim):
                d = hashlib.md5(f"srp:{p}:{c + 1}".encode()).hexdigest()[0]
                h[p, c] = 1 if int(d, 16) % 2 else -1
        _SRP_PLANES[key] = h
    return _SRP_PLANES[key]


def srp_dup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nbits: int = 32,
    band_bits: int = 8,
    threshold: float = 0.35,
    max_bucket: int = 8192,
):
    """UNBUCKETED embedding near-duplicate pairs via signed-random-
    projection LSH (Charikar, STOC'02): no upstream cluster/bucket
    column required, unlike ``embedding_dup_pairs``.

    Exactness discipline (what makes this hash-oracle-able): embeddings
    are fixed-pointed as ``floor(v * 2^20)`` int64 (scaling by a power
    of two is exact in doubles, and FLOOR has no rounding mode to
    diverge on); every dot product and squared norm stays in exact
    int64; the single double division ``d / (sqrt(nn_a) * sqrt(nn_b))``
    is the last step — IEEE sqrt/multiply/divide are deterministic, so
    the SQL twin reproduces the value bit-for-bit.  The twin replays
    the SKETCH itself (planes from md5, identical banding), so the
    check is exact even though LSH recall is approximate — the
    ``doc_minhash_pairs_small`` trick.

    Physical plan (one data pass + result-sized exchanges):
      1. one embedding pass → ``nbits/band_bits`` band rows per vector
         (band, 8-bit value, id, int64 vector + norm ride);
      2. pair inside each (band, value) bucket on the co-location
         primitive — integer Gram matmul per bucket, verify cosine ≥
         threshold immediately so only RESULT pairs leave the bucket;
      3. cross-band dedup of (id_a, id_b) on the cardinality-aware tree
         (a pair can collide in up to ``nbits/band_bits`` bands; the
         verified cos_sim is identical in each, so keep-first is safe).
    Buckets past ``max_bucket`` keep their smallest ids and log the
    drop (no silent caps).
    """
    from nerpii_ray.stages.agg import tree_dedup
    from nerpii_ray.stages.colocate import keyed_partition_apply

    if nbits % band_bits:
        raise ValueError("nbits must be a multiple of band_bits")
    num_bands = nbits // band_bits
    weights = (1 << np.arange(band_bits)).astype(np.int64)

    def band_rows(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "band": pd.Series(dtype="int64"),
                    "val": pd.Series(dtype="int64"),
                    id_col: pd.Series(dtype="int64"),
                    "e_int": pd.Series(dtype="object"),
                    "nn": pd.Series(dtype="int64"),
                }
            )
        e = np.stack(
            [np.asarray(v, dtype=np.float64) for v in b[vec_col]]
        )
        e_int = np.floor(e * 1048576.0).astype(np.int64)
        planes = _srp_planes(nbits, e_int.shape[1])
        bits = (e_int @ planes.T >= 0).astype(np.int64)
        nn = (e_int * e_int).sum(axis=1)
        ids = b[id_col].to_numpy()
        parts = []
        for band in range(num_bands):
            val = bits[:, band * band_bits : (band + 1) * band_bits] @ weights
            parts.append(
                pd.DataFrame(
                    {
                        "band": np.int64(band),
                        "val": val,
                        id_col: ids,
                        "e_int": list(e_int),
                        "nn": nn,
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def pair_buckets(frame: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        if not len(frame):
            return empty
        out = []
        for _, g in frame.groupby(["band", "val"], sort=False, observed=True):
            if len(g) < 2:
                continue
            if len(g) > max_bucket:
                _LOG.warning(
                    "srp_dup_pairs: bucket %s has %d rows; keeping the "
                    "%d smallest ids",
                    g.iloc[0][["band", "val"]].tolist(), len(g), max_bucket,
                )
            g = g.sort_values(id_col).head(max_bucket)
            m = np.stack(list(g["e_int"]))
            dots = m @ m.T
            rn = np.sqrt(g["nn"].to_numpy(dtype=np.float64))
            iu, ju = np.triu_indices(len(g), k=1)
            cos = dots[iu, ju] / (rn[iu] * rn[ju])
            hit = cos >= threshold
            if not hit.any():
                continue
            ids = g[id_col].to_numpy()
            out.append(
                pd.DataFrame(
                    {
                        "id_a": ids[iu[hit]].astype("int64"),
                        "id_b": ids[ju[hit]].astype("int64"),
                        # half-away ROUND(x, 6), matching the SQL twin
                        "cos_sim": np.floor(cos[hit] * 1e6 + 0.5) / 1e6,
                    }
                )
            )
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    bands = ds.map_batches(band_rows, batch_format="pandas")
    pairs = keyed_partition_apply(bands, ["band", "val"], pair_buckets)
    return tree_dedup(pairs, ["id_a", "id_b"])


# --------------------------------------------- embedding-cosine near-dup
def embedding_dup_pairs(
    ds,
    bucket_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    max_bucket: int = 8192,
):
    """Embedding near-duplicate pairs: cosine ≥ threshold within buckets.

    Partitioning assumption: duplicates share ``bucket_col`` (cluster id /
    LSH bucket produced upstream).  One matmul per bucket, float64.
    Returns (id_a, id_b, cos_sim) with id_a < id_b.

    Physical plan: ``keyed_partition_apply`` on ``bucket_col`` (one task
    small / keyed exchange large) — not the sort-based
    ``Dataset.groupby``, whose fixed shuffle latency is seconds at any
    size (colocate.py:15).
    """

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(max_bucket)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ m.T
        ids = g[id_col].to_numpy()
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[hit]].astype("int64"),
                "id_b": ids[ju[hit]].astype("int64"),
                "cos_sim": np.round(sims[iu, ju][hit], 6).astype("float64"),
            }
        )

    return keyed_partition_apply(
        ds,
        [bucket_col],
        _per_bucket_kernel(
            pairs, bucket_col, {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
        ),
    )


def simhash_dup_pairs(
    ds,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 1024,
    num_buckets: int = 256,
):
    """SimHash near-duplicate PAIRS: every (id_a < id_b) whose 64-bit
    SimHash signatures differ in at most ``max_hamming`` bits, with the
    Hamming distance.  SQL twin: all-pairs
    ``bit_count(xor(a.sim, b.sim)) <= h`` over the ``doc_simhash``
    signature CTE — exact, because the banding below is LOSSLESS for
    ``max_hamming < 4`` (pigeonhole: ≤3 flipped bits cannot touch all
    four 16-bit bands, so every qualifying pair shares at least one
    band verbatim).

    Physical plan (same cardinality-aware shape as the minhash path —
    crucially NOT ``Dataset.groupby``: the sort-based shuffle costs
    seconds of fixed latency for kilobytes of band rows, and one task
    per (band, value) would be up to 4×65536 tiny groups):
      1. one text pass → (id, simhash) signatures, materialized;
      2. 4 light band rows per doc (band, 16-bit value, id, sig ride) —
         ~32-byte rows, never text;
      3. SMALL (≤ root threshold band rows): pair in ONE task from the
         already-materialized signatures — at this size per-execution
         fixed costs dwarf the pairing compute.  SCALE: the keyed actor
         exchange on (band, value); each actor pairs its key range at
         finish, so no node ever holds the full band table;
      4. per-bucket: singleton prefilter, then vectorized XOR-popcount
         per (band, value) group, pairs ≤ max_hamming.  Buckets past
         ``max_bucket`` keep their smallest ids and LOG the dropped
         count (no silent caps);
      5. pairs dedup (a pair can share several bands) through the
         cardinality-aware tree.
    """
    if not 0 <= max_hamming < 4:
        raise ValueError(
            "simhash_dup_pairs: 16-bit banding is lossless only for "
            f"max_hamming in 0..3, got {max_hamming}"
        )
    import ray
    import ray.data as rd

    from nerpii_ray.stages.agg import ROOT_THRESHOLD_DEFAULT, tree_dedup
    from nerpii_ray.stages.exchange import hash_exchange_aggregate

    sigs = ds.map_batches(
        lambda b: add_simhash(b, text_col=text_col, id_col=id_col),
        batch_format="pandas",
        batch_size=2048,
    ).materialize()

    def band_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        bands = np.repeat(np.arange(4, dtype=np.int64), n)
        sims = np.tile(b["simhash"].to_numpy().astype(np.uint64), 4)
        return pd.DataFrame(
            {
                "band": bands,
                "bval": ((sims >> (bands.astype(np.uint64) * np.uint64(16)))
                         & np.uint64(0xFFFF)).astype("int64"),
                "id": np.tile(b[id_col].to_numpy(), 4),
                "sig": sims,
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # singletons can't pair — drop them before the per-group loop
        # (with random 16-bit band values almost every group is one)
        g = g[g.groupby(["band", "bval"])["id"].transform("size") >= 2]
        parts = [
            _simhash_pair_bucket(sub, max_hamming, max_bucket)
            for _, sub in g.groupby(["band", "bval"], sort=False)
        ]
        if not parts:
            return _simhash_pair_bucket(g.head(0), max_hamming, max_bucket)
        return pd.concat(parts, ignore_index=True)

    n_band = 4 * sigs.count()
    if n_band <= ROOT_THRESHOLD_DEFAULT:
        pairs = bucket_pairs(band_rows(sigs.to_pandas()))
        pairs = (
            pairs.sort_values(["id_a", "id_b"], kind="stable")
            .drop_duplicates(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        return rd.from_pandas(pairs)

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    num_ex = int(min(max(8, ncpu), max(2, n_band // 1_000_000 + 1)))
    pairs = hash_exchange_aggregate(
        sigs.map_batches(band_rows, batch_format="pandas"),
        partial_fn=lambda b: b,
        merge_fn=lambda df: df,
        keys=["band", "bval"],
        num_buckets=num_ex,
        finish_fn=bucket_pairs,
        as_dataset=True,
    )
    return tree_dedup(pairs, keys=["id_a", "id_b"])


#: per-byte popcount table (uint8 → number of set bits)
_POPCOUNT_LUT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.uint8)


def _simhash_pair_bucket(
    g: pd.DataFrame, max_hamming: int, max_bucket: int
) -> pd.DataFrame:
    """One (band, band-value) bucket: vectorized XOR-popcount over the
    bucket's signatures, pairs ≤ max_hamming.  Hot buckets keep their
    smallest ids and LOG the dropped-pair count (no silent caps)."""
    empty = pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "hamming": pd.Series(dtype="int64"),
        }
    )
    if len(g) < 2:
        return empty
    g = g.sort_values("id", kind="stable")
    if len(g) > max_bucket:
        _LOG.warning(
            "simhash_dup_pairs: truncated bucket (band=%s bval=%s) "
            "from %d to %d ids — %d candidate pairs dropped",
            g["band"].iloc[0], g["bval"].iloc[0], len(g), max_bucket,
            len(g) * (len(g) - 1) // 2 - max_bucket * (max_bucket - 1) // 2,
        )
        g = g.head(max_bucket)
    sig = g["sig"].to_numpy().astype(np.uint64)
    ids = g["id"].to_numpy()
    x = sig[:, None] ^ sig[None, :]
    # byte-LUT popcount: n²×8 uint8 workspace instead of the n²×64 int64
    # a bit-slice reduction would need (537 MB at the 1024 cap)
    xb = x.view(np.uint8).reshape(len(g), len(g), 8)
    ham = _POPCOUNT_LUT[xb].sum(axis=-1, dtype=np.int64)
    ia, ib = np.triu_indices(len(g), k=1)
    keep = ham[ia, ib] <= max_hamming
    return pd.DataFrame(
        {
            "id_a": ids[ia[keep]],
            "id_b": ids[ib[keep]],
            "hamming": ham[ia[keep], ib[keep]],
        }
    )


def connected_components(
    edges_ds,
    a_col: str = "id_a",
    b_col: str = "id_b",
    _stats: Optional[dict] = None,
):
    """Connected components over an undirected edge list — the
    CLUSTERING step of near-duplicate dedup (minhash/simhash emit PAIRS;
    keeping one doc per duplicate *group* needs the transitive closure).
    Returns one row per node that appears in an edge:
    ``(node, component)`` with component = the smallest node id in the
    node's component (so ``node == component`` picks the canonical
    survivor).

    Cardinality-aware, like every other root in this engine:

    * SMALL edge lists (≤ root threshold — near-dup pair tables are
      output-sized, so this is the common case): one task runs a classic
      path-compressing union-find — exact, O(E α(E)).
    * LARGE: alternating large-star / small-star contraction (Kiveris et
      al., "Connected Components in MapReduce and Beyond", SoCC'14)
      entirely on Datasets — each phase co-locates the directed edge
      list by source node (ONE keyed actor exchange, ``path="exchange"``
      so the stream is never pinned to count it) and a vectorized pandas
      kernel re-attaches each node's neighbors directly to its minimum
      neighbor.  Components contract to stars centered at their minimum
      id in O(log n)-ish rounds even on pathological chains (measured:
      15 rounds on a 10k-node path; hash-min label propagation needs
      O(diameter) = 10k).  The edge ROW COUNT is invariant per phase
      (large-star emits exactly one row per undirected edge, small-star
      one per input row), so no per-round dedup shuffle is needed.
      Convergence is detected from the per-phase ``mv`` (moved) column
      summed to a driver scalar; the edge table itself stays
      distributed.  Skew note: a component minimum with millions of
      direct children lands in one bucket at the final rounds — same
      co-location contract as every keyed op here (salt upstream if one
      KEY exceeds a worker's heap).
    """
    import ray.data as rd

    from nerpii_ray.stages.agg import ROOT_THRESHOLD_DEFAULT, grouped_sum, tree_aggregate

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()

    empty = pd.DataFrame(
        {"node": pd.Series(dtype="int64"),
         "component": pd.Series(dtype="int64")}
    )
    if n_edges == 0:
        return rd.from_pandas(empty)

    if n_edges <= ROOT_THRESHOLD_DEFAULT:
        e = edges_ds.to_pandas()
        parent: dict = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(e[a_col].astype("int64"), e[b_col].astype("int64")):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # union by label value: smaller id becomes the root, so
                # the final label IS the component minimum
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = np.unique(
            np.concatenate([e[a_col].to_numpy(), e[b_col].to_numpy()])
        ).astype("int64")
        comp = np.fromiter((find(int(v)) for v in nodes), dtype="int64",
                           count=len(nodes))
        return rd.from_pandas(pd.DataFrame({"node": nodes, "component": comp}))

    # SCALE path: alternating large-star / small-star contraction
    from nerpii_ray.stages.colocate import keyed_partition_apply

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        a = b[a_col].to_numpy().astype("int64")
        c = b[b_col].to_numpy().astype("int64")
        u, v = np.maximum(a, c), np.minimum(a, c)
        keep = u != v
        return pd.DataFrame({"u": u[keep], "v": v[keep]})

    def selfloop_labels(b: pd.DataFrame) -> pd.DataFrame:
        # nodes whose edge is a self-loop get the candidate label
        # (node, node); min-merged with the star labels below this is a
        # no-op for nodes that also have real edges (their component min
        # ≤ node) and emits the singleton the small union-find path
        # emits (ADVICE r4: the two paths diverged on self-loop-only
        # nodes).
        a = b[a_col].to_numpy().astype("int64")
        c = b[b_col].to_numpy().astype("int64")
        loops = np.unique(a[a == c])
        return pd.DataFrame({"u": loops, "v": loops})

    def large_star_kernel(df: pd.DataFrame) -> pd.DataFrame:
        """Per co-located node group (columns node, nbr — BOTH edge
        directions present): attach every larger neighbor directly to
        m = min(neighbors ∪ self).  mv=1 marks rows whose target moved
        (m ≠ node) — the convergence signal."""
        if df.empty:
            return pd.DataFrame(
                {"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64"),
                 "mv": pd.Series(dtype="int64")}
            )
        g = df.groupby("node", sort=False, observed=True)["nbr"].min()
        node = df["node"].to_numpy()
        m = np.minimum(df["node"].map(g).to_numpy(), node)
        big = df["nbr"].to_numpy() > node
        return pd.DataFrame(
            {"u": df["nbr"].to_numpy()[big], "v": m[big],
             "mv": (m[big] != node[big]).astype("int64")}
        )

    def small_star_kernel(df: pd.DataFrame) -> pd.DataFrame:
        """Per co-located node group (columns u, v with u > v): attach
        every smaller neighbor (and u itself) to m = min of u's smaller
        neighbors."""
        if df.empty:
            return pd.DataFrame(
                {"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64"),
                 "mv": pd.Series(dtype="int64")}
            )
        g = df.groupby("u", sort=False, observed=True)["v"].min()
        m = df["u"].map(g).to_numpy()
        u, v = df["u"].to_numpy(), df["v"].to_numpy()
        root = v == m
        return pd.DataFrame(
            {"u": np.where(root, u, v), "v": m,
             "mv": (~root).astype("int64")}
        )

    def to_directed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.concatenate([b["u"].to_numpy(), b["v"].to_numpy()]),
             "nbr": np.concatenate([b["v"].to_numpy(), b["u"].to_numpy()])}
        )

    edges = edges_ds.map_batches(canon, batch_format="pandas").materialize()
    max_rounds = 100
    converged = False
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        both = edges.map_batches(to_directed, batch_format="pandas")
        lg = keyed_partition_apply(
            both, ["node"], large_star_kernel, path="exchange"
        ).materialize()
        large_moves = lg.sum("mv") or 0
        sm = keyed_partition_apply(
            lg.drop_columns(["mv"]), ["u"], small_star_kernel, path="exchange"
        ).materialize()
        small_moves = sm.sum("mv") or 0
        edges = sm.drop_columns(["mv"]).map_batches(
            lambda b: b, batch_format="pandas", batch_size=None
        ).materialize()
        if large_moves == 0 and small_moves == 0:
            converged = True
            break
    if _stats is not None:
        _stats["rounds"] = rounds
    if not converged:
        # no-silent-caps: wrong labels must never leave this function
        raise RuntimeError(
            f"connected_components: star contraction did not converge in "
            f"{max_rounds} rounds — component structure far exceeds the "
            f"O(log n) design envelope; raise max_rounds explicitly"
        )

    # fixpoint edges are stars (u → component-min v); every original
    # node appears exactly once as a u (non-root) or as a v (root)
    def star_labels(b: pd.DataFrame) -> pd.DataFrame:
        roots = np.unique(b["v"].to_numpy())
        return pd.DataFrame(
            {"node": np.concatenate([b["u"].to_numpy(), roots]),
             "component": np.concatenate([b["v"].to_numpy(), roots])}
        )

    def min_merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("node", sort=False, observed=True)["component"]
            .min()
            .reset_index()
        )

    labeled = edges.union(
        edges_ds.map_batches(selfloop_labels, batch_format="pandas")
    )
    return tree_aggregate(
        labeled, star_labels, min_merge, keys=["node"]
    ).map_batches(lambda b: b, batch_format="pandas", batch_size=None)


class _FetchedBroadcast:
    """``worker_cached`` holder: ray.get a broadcast ObjectRef exactly
    once per worker process (the ref is the cache key)."""

    def __init__(self, ref):
        import ray

        self.value = ray.get(ref)


def ngram_decontaminate(
    train_ds,
    bench_ds,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Benchmark DECONTAMINATION — the training-data hygiene step that
    drops documents overlapping an evaluation set: flag every training
    document sharing at least one word-``k``-gram with any benchmark
    document.  (The reference has no analogue; this is a first-class
    LLM-pipeline operator, cf. GPT-3 appendix C / Dodge et al. 2021's
    n-gram contamination checks.)

    Plan: ONE pass over the benchmark side builds its distinct k-gram
    md5 set (per-batch distinct → dedup tree), which is collected and
    broadcast via ``ray.put`` — benchmark suites are eval-sized (MBs),
    never corpus-sized, so the broadcast is the right shape at 100 TB;
    for a pathologically large benchmark swap the exact set for
    ``stages/joins.build_bloom`` + exact verify of the maybes.  ONE pass
    over the training side then counts, per document, gram positions
    whose md5 lands in the set — embarrassingly parallel, no shuffle
    anywhere.  Grams are ``\\x1f``-joined lowercase ``\\w+`` tokens and
    md5 is the gram key so a DuckDB twin can replay the check exactly
    (md5-per-gram is the accepted cost of hash-oracle parity; the
    per-doc gram loop is bounded by token count, same as the tokenizer
    itself).

    Output: one row per CONTAMINATED training doc —
    ``(id_col, n_hits, n_distinct_hits)`` = total / distinct
    contaminated gram positions.
    """
    import ray

    from nerpii_ray.stages.agg import tree_dedup

    def bench_grams(b: pd.DataFrame) -> pd.DataFrame:
        out = set()
        for t in b[text_col]:
            toks = _TOKEN_RE.findall(str(t).lower()) if t is not None else []
            for i in range(len(toks) - k + 1):
                out.add(
                    hashlib.md5(
                        "\x1f".join(toks[i:i + k]).encode("utf-8")
                    ).digest()
                )
        return pd.DataFrame({"g": pd.Series(sorted(out), dtype="object")})

    # distinct gram digests; benchmark-sized by assumption, so the
    # non-adaptive tree (one root block) is the right finish before the
    # driver-side collect + broadcast
    bench_pdf = tree_dedup(
        bench_ds, ["g"], partial_fn=bench_grams, adaptive=False
    ).to_pandas()
    bench_ref = ray.put(frozenset(bench_pdf["g"].tolist()))

    def count_hits(b: pd.DataFrame, *, bench) -> pd.DataFrame:
        if isinstance(bench, ray.ObjectRef):
            # deserialize once per worker, not once per batch
            from nerpii_ray.stages.taskcache import worker_cached

            bench = worker_cached(_FetchedBroadcast, ref=bench).value
        ids, n_hits, n_dist = [], [], []
        for did, t in zip(b[id_col], b[text_col]):
            toks = _TOKEN_RE.findall(str(t).lower()) if t is not None else []
            hits, dist = 0, set()
            for i in range(len(toks) - k + 1):
                d = hashlib.md5(
                    "\x1f".join(toks[i:i + k]).encode("utf-8")
                ).digest()
                if d in bench:
                    hits += 1
                    dist.add(d)
            if hits:
                ids.append(did)
                n_hits.append(hits)
                n_dist.append(len(dist))
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "n_hits": pd.Series(n_hits, dtype="int64"),
                "n_distinct_hits": pd.Series(n_dist, dtype="int64"),
            }
        )

    return train_ds.map_batches(
        count_hits,
        fn_kwargs=dict(bench=bench_ref),
        batch_format="pandas",
        batch_size=4096,
    )


def ngram_novelty(
    docs_ds,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Corpus n-gram NOVELTY: attribute every distinct word-``k``-gram
    to the document with the smallest id containing it, then score each
    document by how much of it is first-seen — ``n_novel / n_grams`` in
    integer basis points.  The repeated-content complement of pairwise
    near-dup detection: a doc stitched from earlier docs scores ~0 even
    when no single source is similar enough to pair with it.

    Plan: one text pass emits each doc's DISTINCT gram md5s (a doc's
    text lives in one row, so per-doc distinct counts are exact within
    the batch — no tree needed for ``n_grams``); the gram → min-doc
    attribution is the one data-sized keyed aggregate (cardinality-aware
    tree → keyed exchange past the root threshold); the two doc-keyed
    counts (distinct grams from the pair stream, won grams from the
    attribution) union into ONE grouped sum — same key space, so no
    join is needed to stitch them.  No broadcast of anything
    data-sized.
    """
    from nerpii_ray.stages.agg import grouped_sum, tree_aggregate

    def pairs_fn(b: pd.DataFrame) -> pd.DataFrame:
        """per-doc DISTINCT (doc, gram-md5) rows"""
        ids, grams = [], []
        for did, t in zip(b[id_col], b[text_col]):
            toks = _TOKEN_RE.findall(str(t).lower()) if t is not None else []
            g = {
                hashlib.md5(
                    "\x1f".join(toks[i:i + k]).encode("utf-8")
                ).digest()
                for i in range(len(toks) - k + 1)
            }
            if g:
                ids.extend([did] * len(g))
                grams.extend(sorted(g))
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "g": pd.Series(grams, dtype="object"),
            }
        )

    # Materialized because TWO consumers branch off it (n_grams and the
    # gram→min-doc attribution); lazy re-execution would tokenize and
    # md5 every gram twice.  Rows are ~24 bytes (int64 + 16-byte md5) —
    # object-store-resident/spillable, never driver-sized.
    pairs = docs_ds.map_batches(pairs_fn, batch_format="pandas",
                                batch_size=4096).materialize()

    def min_doc(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("g", sort=False, observed=True)[id_col]
            .min()
            .reset_index()
        )

    firsts = tree_aggregate(pairs, min_doc, min_doc, keys=["g"])

    # Both per-doc counts (distinct grams, won grams) are doc-keyed
    # grouped SUMS — union the two count streams and settle them in ONE
    # tree instead of two grouped_sums stitched by a hash join (the join
    # added two more keyed executions for what a shared key space does
    # for free; left-join semantics are preserved because every doc
    # with grams contributes n_grams rows, and a doc that wins nothing
    # simply sums n_novel to 0).
    def count_cols(novel_flag: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            one = np.ones(len(b), dtype="int64")
            return pd.DataFrame(
                {id_col: b[id_col].astype("int64"),
                 "n_grams": one * (1 - novel_flag),
                 "n_novel": one * novel_flag}
            )
        return fn

    counts = grouped_sum(
        pairs.map_batches(count_cols(0), batch_format="pandas").union(
            firsts.map_batches(count_cols(1), batch_format="pandas")
        ),
        [id_col], ["n_grams", "n_novel"],
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        ng = b["n_grams"].to_numpy(dtype=np.int64)
        nv = b["n_novel"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: b[id_col].astype("int64"),
                "n_grams": ng,
                "n_novel": nv,
                "novelty_bp": nv * 10000 // ng,
            }
        )

    return counts.map_batches(finish, batch_format="pandas")


def span_dedup(
    docs_ds,
    span_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    root_threshold: int | None = None,
):
    """Exact SPAN dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499 — the suffix-array
    substring dedup re-expressed over fixed non-overlapping token
    spans): each doc splits into consecutive ``span_tokens``-token
    spans; every DISTINCT span (md5 key) is attributed to its
    lexicographically-smallest containing (doc, pos); each doc is
    reassembled from only the spans it wins.  Unlike whole-doc exact
    dedup this removes repeated CONTENT inside otherwise-unique
    documents — boilerplate, licenses, navigation chrome.

    Plan: one text pass explodes (doc, pos, span, key) rows [pinned —
    two consumers]; the key → argmin attribution is the one data-sized
    keyed aggregate (``tree_dedup`` carrying the span text, keyed
    exchange past the root threshold); per-doc totals and kept counts
    union into ONE grouped-sum tree (the ``ngram_novelty`` fusion);
    winners co-locate by doc for the ordered reassembly; a doc-keyed
    hash join stitches counts to text — every post-explode row is
    span-sized, nothing driver-sized.

    Returns (id_col, n_spans:int64, n_kept:int64, clean_text:str);
    docs whose every span is owned elsewhere keep n_kept=0 and empty
    text.  Spans-per-doc must stay below 2^20 (the argmin ordinal is
    ``doc_id * 2^20 + pos``) — 8M tokens/doc at the default width.
    """
    from nerpii_ray.stages.agg import grouped_sum, tree_dedup
    from nerpii_ray.stages.colocate import keyed_partition_apply
    from nerpii_ray.stages.joins import partitioned_hash_join

    _POS_BITS = 20

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, poss, spans = [], [], []
        for did, t in zip(b[id_col], b[text_col]):
            toks = _TOKEN_RE.findall(str(t).lower()) if t is not None else []
            if not toks:
                continue
            n = (len(toks) + span_tokens - 1) // span_tokens
            if n >= (1 << _POS_BITS):
                raise ValueError(
                    f"span_dedup: doc {did} has {n} spans ≥ 2^{_POS_BITS}"
                )
            ids.extend([did] * n)
            poss.extend(range(1, n + 1))
            spans.extend(
                " ".join(toks[i * span_tokens:(i + 1) * span_tokens])
                for i in range(n)
            )
        out = pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "pos": pd.Series(poss, dtype="int64"),
                "span": pd.Series(spans, dtype="object"),
            }
        )
        out["key"] = md5_of_strings(out["span"])
        return out

    exploded = docs_ds.map_batches(
        explode, batch_format="pandas", batch_size=4096
    ).materialize()

    def win_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_ord"] = (
            b[id_col].to_numpy(np.int64) * (1 << _POS_BITS)
            + b["pos"].to_numpy(np.int64)
        )
        return b.sort_values("_ord", kind="stable").drop_duplicates("key")

    winners = tree_dedup(
        exploded, keys=["key"], partial_fn=win_partial, keep_min="_ord",
        root_threshold=root_threshold,
    ).materialize()

    def count_cols(kept_flag: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            one = np.ones(len(b), dtype="int64")
            return pd.DataFrame(
                {id_col: b[id_col].astype("int64"),
                 "n_spans": one * (1 - kept_flag),
                 "n_kept": one * kept_flag}
            )
        return fn

    counts = grouped_sum(
        exploded.map_batches(count_cols(0), batch_format="pandas").union(
            winners.map_batches(count_cols(1), batch_format="pandas")
        ),
        [id_col], ["n_spans", "n_kept"],
    )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 "clean_text": pd.Series(dtype="object")}
            )
        g = g.sort_values([id_col, "pos"], kind="stable")
        agg = g.groupby(id_col, sort=False)["span"].agg(" ".join)
        return pd.DataFrame(
            {id_col: agg.index.to_numpy(np.int64),
             "clean_text": agg.to_numpy()}
        )

    assembled = keyed_partition_apply(winners, [id_col], assemble)
    out = partitioned_hash_join(counts, assembled, on=[id_col], how="left")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: b[id_col].astype("int64"),
                "n_spans": b["n_spans"].astype("int64"),
                "n_kept": b["n_kept"].astype("int64"),
                "clean_text": b["clean_text"].fillna("").astype("object"),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def token_ed1_pairs(
    docs_ds,
    text_col: str = "text",
    num_buckets: int | None = None,
    path: str = "auto",
):
    """All DISTINCT token pairs at Levenshtein distance exactly 1 —
    fuzzy vocabulary self-join via DELETION NEIGHBORHOODS (the FastSS
    construction): each length-L token meets its candidates through L+1
    keyed buckets instead of a vocab² scan.

    Two words are at distance 1 iff (a) equal length and they share the
    deletion variant at the SAME position (one substitution — the
    shared variant pins the differing index), or (b) lengths differ by
    1 and the shorter IS a deletion variant of the longer.  Both cases
    are exact by construction, so NO verification pass is needed and
    the SQL twin is the plain ``levenshtein(a, b) = 1`` vocabulary
    cross join.

    Plan: tokenize inside the scan → distinct-token tree → one
    map_batches emits per token its self row (bucket = token, pos −1)
    and its L deletion-variant rows (bucket = variant; substitutions
    keyed by position, insertions/deletions by −1) → ONE keyed
    co-location pairs within buckets → distinct-pair tree.  Bucket
    sizes are alphabet-bounded in practice (a bucket holds words one
    edit from one specific string); row expansion is O(L) per token.
    """
    from nerpii_ray.stages.agg import tree_dedup
    from nerpii_ray.stages.colocate import keyed_partition_apply

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        parts = b[text_col].fillna("").str.split()
        flat = [t for lst in parts for t in lst]
        return pd.DataFrame({"tok": pd.Series(flat, dtype="object")}
                            ).drop_duplicates()

    vocab = tree_dedup(
        docs_ds.map_batches(toks, batch_format="pandas"), ["tok"]
    )

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        keys, poss, tks, roles = [], [], [], []
        for t in b["tok"]:
            keys.append(t); poss.append(-1); tks.append(t); roles.append(0)
            for i in range(len(t)):
                keys.append(t[:i] + t[i + 1:])
                poss.append(i); tks.append(t); roles.append(1)
        # substitution candidates meet at (variant, i); ins/del
        # candidates meet the shorter token's SELF row at (variant, −1)
        df = pd.DataFrame(
            {
                "key": pd.Series(keys, dtype="object"),
                "pos": pd.Series(poss, dtype="int64"),
                "tok": pd.Series(tks, dtype="object"),
                "role": pd.Series(roles, dtype="int64"),
            }
        )
        sub = df[df["pos"] >= 0].copy()
        ind = df.copy()
        ind["pos"] = np.int64(-1)
        return pd.concat([sub, ind], ignore_index=True).drop_duplicates()

    cand = vocab.map_batches(expand, batch_format="pandas")

    def pair_kernel(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "tok_a": pd.Series(dtype="object"),
                "tok_b": pd.Series(dtype="object"),
            }
        )
        if g.empty:
            return empty
        m = g.merge(g, on=["key", "pos"], suffixes=("_x", "_y"))
        # (variant, i≥0): two same-position deletions = one substitution;
        # (variant, −1): a self row × a deletion row = one ins/del
        sub = (
            (m["pos"] >= 0)
            & (m["role_x"] == 1) & (m["role_y"] == 1)
            & (m["tok_x"] < m["tok_y"])
        )
        ind = (
            (m["pos"] < 0)
            & (m["role_x"] == 0) & (m["role_y"] == 1)
            & (m["tok_x"] != m["tok_y"])
        )
        p = m[sub | ind]
        if p.empty:
            return empty
        return pd.DataFrame(
            {
                "tok_a": np.minimum(p["tok_x"], p["tok_y"]),
                "tok_b": np.maximum(p["tok_x"], p["tok_y"]),
            }
        ).drop_duplicates()

    pairs = keyed_partition_apply(
        cand, ["key", "pos"], pair_kernel, num_buckets, path
    )
    return tree_dedup(pairs, ["tok_a", "tok_b"])


def levenshtein_np(a: pd.Series, b: pd.Series, cap: int = 40) -> np.ndarray:
    """Exact Levenshtein distance for P string pairs at once: the
    classic DP with BOTH loops over character positions (≤ cap² scalar
    iterations) and every cell update a numpy op across all P pairs —
    no per-pair Python.  Strings are truncated at ``cap`` chars
    (callers bound tokens upstream)."""
    a = a.fillna("").str.slice(0, cap)
    b = b.fillna("").str.slice(0, cap)
    la = a.str.len().to_numpy(np.int64)
    lb = b.str.len().to_numpy(np.int64)
    P = len(a)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    La, Lb = int(la.max(initial=0)), int(lb.max(initial=0))
    A = np.zeros((P, La), dtype=np.uint32)
    B = np.zeros((P, Lb), dtype=np.uint32)
    for i, s in enumerate(a.to_numpy()):
        A[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for i, s in enumerate(b.to_numpy()):
        B[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    res = np.where(la == 0, lb, -1)
    prev = np.broadcast_to(
        np.arange(Lb + 1, dtype=np.int64), (P, Lb + 1)
    ).copy()
    cur = np.empty_like(prev)
    for i in range(1, La + 1):
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, Lb + 1):
            sub = prev[:, j - 1] + (ai != B[:, j - 1])
            np.minimum(sub, prev[:, j] + 1, out=sub)
            np.minimum(sub, cur[:, j - 1] + 1, out=sub)
            cur[:, j] = sub
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev, cur = cur, prev
    return res.astype(np.int64)


def token_edk_pairs(
    docs_ds,
    text_col: str = "text",
    k: int = 2,
    num_buckets: int | None = None,
    path: str = "auto",
    hot_key_budget: int | None = None,
    tokenize: bool = True,
):
    """All DISTINCT token pairs at Levenshtein distance 1..k — the
    general-radius fuzzy vocabulary self-join behind typo-tolerant
    entity blocking (``token_ed1_pairs`` is the verify-free k=1
    special case).

    FastSS with verification: if lev(a, b) = d ≤ k, walking any optimal
    alignment and deleting, on each side, the characters touched by an
    edit leaves a COMMON string reachable by ≤ d deletions from both —
    so every true pair meets in at least one shared member of the
    up-to-k deletion neighborhoods, and the neighborhood join is a
    candidate SUPERSET.  A vectorized exact-DP pass
    (``levenshtein_np``) then keeps the true pairs; no recall loss, no
    vocab² scan.

    Plan: tokenize in the scan → distinct-token tree → one map_batches
    expands each length-L token into its ≤ Σᵢ₌₀ᵏ C(L,i) distinct
    deletion variants → ONE keyed co-location on the variant string
    pairs within buckets → distinct-pair tree → verify map.  Row
    expansion is O(L^k) per VOCAB entry (not per corpus row); bucket
    size is data-dependent — a hot variant (e.g. near-identical serial
    numbers) concentrates candidates, the standard keyed-op contract
    (pass ``hot_key_budget`` to fail loudly past a per-bucket row
    budget)."""
    from itertools import combinations

    from nerpii_ray.stages.agg import tree_dedup

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        if tokenize:
            parts = b[text_col].fillna("").str.split()
            flat = [t for lst in parts for t in lst]
        else:
            # whole-value mode: each (possibly space-bearing) string IS
            # the unit — full-surface fuzzy joins for entity resolution
            flat = [t for t in b[text_col].fillna("") if t]
        return pd.DataFrame(
            {"tok": pd.Series(flat, dtype="object")}
        ).drop_duplicates()

    vocab = tree_dedup(
        docs_ds.map_batches(toks, batch_format="pandas"), ["tok"]
    )

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        keys: list = []
        tks: list = []
        for t in b["tok"]:
            t = t[:40]
            variants = {t}
            idx = range(len(t))
            for d in range(1, k + 1):
                for dels in combinations(idx, d):
                    s = t
                    for p in sorted(dels, reverse=True):
                        s = s[:p] + s[p + 1:]
                    variants.add(s)
            keys.extend(variants)
            tks.extend([t] * len(variants))
        return pd.DataFrame(
            {
                "key": pd.Series(keys, dtype="object"),
                "tok": pd.Series(tks, dtype="object"),
            }
        )

    cand = vocab.map_batches(expand, batch_format="pandas", batch_size=4096)

    def pair_kernel(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "tok_a": pd.Series(dtype="object"),
                "tok_b": pd.Series(dtype="object"),
            }
        )
        if g.empty:
            return empty
        m = g.merge(g, on="key", suffixes=("_x", "_y"))
        m = m[m["tok_x"] < m["tok_y"]]
        if m.empty:
            return empty
        return pd.DataFrame(
            {"tok_a": m["tok_x"].to_numpy(), "tok_b": m["tok_y"].to_numpy()}
        ).drop_duplicates()

    pairs = tree_dedup(
        keyed_partition_apply(
            cand, ["key"], pair_kernel, num_buckets, path,
            hot_key_budget=hot_key_budget,
        ),
        ["tok_a", "tok_b"],
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame(
                {
                    "tok_a": pd.Series(dtype="object"),
                    "tok_b": pd.Series(dtype="object"),
                    "dist": pd.Series(dtype="int64"),
                }
            )
        d = levenshtein_np(b["tok_a"], b["tok_b"])
        out = b.assign(dist=d)
        return out[(out["dist"] >= 1) & (out["dist"] <= k)].reset_index(
            drop=True
        )

    return pairs.map_batches(verify, batch_format="pandas")


# ------------------------------------------- exact set-similarity self-join
def prefix_filter_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    max_bucket: int = 4096,
):
    """EXACT token-set Jaccard pairs ≥ ``threshold`` via the AllPairs
    prefix filter (Bayardo, Ma & Srikant, WWW'07) — the exact
    complement to ``minhash_lsh_pairs`` (approximate) and
    ``ngram_jaccard_pairs`` (bucketed): no bucket column, no recall
    loss, never all-pairs.

    Prefix filter: fix any global total order on tokens; a pair with
    J ≥ θ MUST share a token inside each side's first
    ``n − ⌈θn⌉ + 1`` tokens (if all |∩| ≥ ⌈θ·n⌉ common tokens sat in
    the ⌈θn⌉−1 suffix, there'd be too few slots), so only PREFIX
    tokens are indexed and everything else never shuffles.  The order
    here is the md5-64 token hash itself — universal, known to every
    worker with NO df census pass and NO vocabulary broadcast
    (df-ascending ordering shrinks buckets further at the cost of one
    census + a keyed join; swap in when token skew demands it).
    ⌈θn⌉ is computed in exact integer arithmetic (θ as ppm rational),
    so float rounding can never shorten a prefix and break recall.

    Physical plan (one text pass + three keyed exchanges — the
    ``minhash_lsh_pairs`` shape):
      1. scan: per doc, the distinct-token int64 hash array, sorted —
         prefix rows (tok, doc, n) plus ONE set row carrying the full
         sorted array as bytes (the exact-verify analog of a minhash
         signature);
      2. E1 (tok): within-bucket pairing + the length filter
         ``min·10⁶ ≥ ppm·max`` (J ≥ θ ⇒ θ·max ≤ min), buckets past
         ``max_bucket`` keep smallest ids and LOG the drop;
      3. E2 (jid) / E3 (id_a, id_b): each pair half picks up its doc's
         set bytes, halves meet, cross-token dedup, exact
         ``np.intersect1d`` — J = |∩|/|∪| ≥ θ.  Small inputs take the
         one-task root path.

    Returns (id_a, id_b, jaccard) with id_a < id_b; jaccard rounded
    half-away to 1e-6 AFTER the threshold test, both replayed exactly
    by the brute-force SQL twin (same md5 token hashes, same one
    double division).
    """
    import ray
    import ray.data as rd

    from nerpii_ray.stages.agg import ROOT_THRESHOLD_DEFAULT
    from nerpii_ray.stages.exchange import hash_exchange_aggregate

    tn = int(round(threshold * 1_000_000))
    td = 1_000_000

    empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "jaccard": pd.Series(dtype="float64")}
    )

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        ids, tsets = [], []
        for did, t in zip(b[id_col], b[text_col]):
            toks = (
                set(_TOKEN_RE.findall(str(t).lower()))
                if t is not None else set()
            )
            if toks:
                ids.append(int(did))
                tsets.append(toks)
        cols = {
            "k": pd.Series(dtype="int64"), "tok": pd.Series(dtype="int64"),
            "doc": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64"),
            "setb": pd.Series(dtype="object"),
        }
        if not ids:
            out = pd.DataFrame(cols)
            out["setb"] = out["setb"].astype(object)
            return out
        vocab = sorted(set().union(*tsets))
        hs = stable_hash64_np(pd.Series(vocab)).view(np.int64)
        hmap = dict(zip(vocab, hs))
        ks, toks_c, docs_c, ns_c, setb_c = [], [], [], [], []
        for did, toks in zip(ids, tsets):
            th = np.sort(np.fromiter(
                (hmap[t] for t in toks), dtype=np.int64, count=len(toks)
            ))
            n = len(th)
            p = n - ((tn * n + td - 1) // td) + 1
            for v in th[:p]:
                ks.append(0); toks_c.append(int(v))
                docs_c.append(did); ns_c.append(n); setb_c.append(b"")
            ks.append(1); toks_c.append(0)
            docs_c.append(did); ns_c.append(n); setb_c.append(th.tobytes())
        return pd.DataFrame(
            {"k": pd.Series(ks, dtype="int64"),
             "tok": pd.Series(toks_c, dtype="int64"),
             "doc": pd.Series(docs_c, dtype="int64"),
             "n": pd.Series(ns_c, dtype="int64"),
             "setb": pd.Series(setb_c, dtype="object")}
        )

    scanned = ds.map_batches(
        scan, batch_format="pandas", batch_size=2048
    ).materialize()

    def cand_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"),
             "id_b": pd.Series(dtype="int64")}
        )
        if df.empty:
            return out
        sizes = df.groupby("tok", sort=False)["tok"].transform("size")
        multi = df[sizes > 1]
        if multi.empty:
            return out
        trunc_buckets, trunc_pairs = _bucket_truncation_stats(
            multi.groupby("tok", sort=False).size().to_numpy(), max_bucket
        )
        if trunc_buckets:
            _LOG.warning(
                "prefix_filter_jaccard_pairs: truncated %d hot bucket(s) "
                "at max_bucket=%d — %d candidate pair(s) dropped (raise "
                "max_bucket, or switch to df-ascending token order)",
                trunc_buckets, max_bucket, trunc_pairs,
            )
        ia, ib = [], []
        for _, g in multi.groupby("tok", sort=False):
            g = g.sort_values("doc").head(max_bucket)
            ids = g["doc"].to_numpy()
            ns = g["n"].to_numpy()
            iu, ju = np.triu_indices(len(ids), k=1)
            mn = np.minimum(ns[iu], ns[ju])
            mx = np.maximum(ns[iu], ns[ju])
            keep = mn * td >= tn * mx
            ia.append(ids[iu][keep])
            ib.append(ids[ju][keep])
        if not ia:
            return out
        return pd.DataFrame(
            {"id_a": np.concatenate(ia).astype("int64"),
             "id_b": np.concatenate(ib).astype("int64")}
        ).drop_duplicates()

    def exact_jaccard(sa: bytes, sb: bytes) -> float:
        a = np.frombuffer(sa, dtype=np.int64)
        b = np.frombuffer(sb, dtype=np.int64)
        inter = np.intersect1d(a, b, assume_unique=True).size
        return inter / (a.size + b.size - inter)

    def finalize(cand: pd.DataFrame, set_of) -> pd.DataFrame:
        if cand.empty:
            return empty.copy()
        jac = np.array(
            [exact_jaccard(set_of(a), set_of(b))
             for a, b in zip(cand["id_a"], cand["id_b"])]
        )
        keep = jac >= threshold
        return pd.DataFrame(
            {"id_a": cand.loc[keep, "id_a"].to_numpy().astype("int64"),
             "id_b": cand.loc[keep, "id_b"].to_numpy().astype("int64"),
             "jaccard": [math.floor(j * 1e6 + 0.5) / 1e6 for j in jac[keep]]}
        ).astype({"jaccard": "float64"})

    n_rows = scanned.count()
    if n_rows <= ROOT_THRESHOLD_DEFAULT:
        sdf = scanned.to_pandas()
        cand = cand_pairs(sdf.loc[sdf["k"] == 0, ["tok", "doc", "n"]])
        sets = sdf.loc[sdf["k"] == 1, ["doc", "setb"]]
        set_map = dict(zip(sets["doc"], sets["setb"]))
        out = finalize(cand, set_map.__getitem__)
        return rd.from_pandas(out if len(out) else empty)

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    num_buckets = int(min(max(8, ncpu), max(2, n_rows // 1_000_000 + 1)))
    prefix_rows = scanned.map_batches(
        lambda b: b.loc[b["k"] == 0, ["tok", "doc", "n"]],
        batch_format="pandas",
    )
    cand_ds = hash_exchange_aggregate(
        prefix_rows,
        partial_fn=lambda b: b,
        merge_fn=lambda df: df,
        keys=["tok"],
        num_buckets=num_buckets,
        finish_fn=cand_pairs,
        as_dataset=True,
    )

    def mk_halves(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.concat(
            [b.assign(jid=b["id_a"]), b.assign(jid=b["id_b"])],
            ignore_index=True,
        )
        h["setb"] = b""
        return h[["jid", "id_a", "id_b", "setb"]]

    def mk_set_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = b.loc[b["k"] == 1, ["doc", "setb"]]
        return pd.DataFrame(
            {"jid": s["doc"].astype("int64"),
             "id_a": np.int64(-1), "id_b": np.int64(-1), "setb": s["setb"]}
        )

    def attach_set(df: pd.DataFrame) -> pd.DataFrame:
        sets = df.loc[df["id_a"] < 0, ["jid", "setb"]]
        halves = df.loc[df["id_a"] >= 0, ["jid", "id_a", "id_b"]]
        m = halves.merge(sets, on="jid", how="inner")
        return m[["jid", "id_a", "id_b", "setb"]]

    def score_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        a = (
            df.loc[df["jid"] == df["id_a"], ["id_a", "id_b", "setb"]]
            .drop_duplicates(["id_a", "id_b"])
        )
        b = (
            df.loc[df["jid"] == df["id_b"], ["id_a", "id_b", "setb"]]
            .drop_duplicates(["id_a", "id_b"])
        )
        m = a.merge(b, on=["id_a", "id_b"], suffixes=("_a", "_b"))
        if m.empty:
            return empty.copy()
        cand = m[["id_a", "id_b"]].reset_index(drop=True)
        jac = np.array(
            [exact_jaccard(sa, sb) for sa, sb in zip(m["setb_a"], m["setb_b"])]
        )
        keep = jac >= threshold
        return pd.DataFrame(
            {"id_a": cand.loc[keep, "id_a"].to_numpy().astype("int64"),
             "id_b": cand.loc[keep, "id_b"].to_numpy().astype("int64"),
             "jaccard": [math.floor(j * 1e6 + 0.5) / 1e6 for j in jac[keep]]}
        ).astype({"jaccard": "float64"})

    set_ds = scanned.map_batches(mk_set_rows, batch_format="pandas")
    halves_ds = cand_ds.map_batches(mk_halves, batch_format="pandas")
    joined = hash_exchange_aggregate(
        set_ds.union(halves_ds),
        partial_fn=lambda b: b,
        merge_fn=lambda df: df,
        keys=["jid"],
        num_buckets=num_buckets,
        finish_fn=attach_set,
        as_dataset=True,
    )
    scored = hash_exchange_aggregate(
        joined,
        partial_fn=lambda b: b,
        merge_fn=lambda df: df,
        keys=["id_a", "id_b"],
        num_buckets=num_buckets,
        finish_fn=score_pairs,
        as_dataset=True,
    )
    return scored.map_batches(
        lambda b: b[["id_a", "id_b", "jaccard"]].astype(
            {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
        )
        if len(b)
        else empty.copy(),
        batch_format="pandas",
    )
