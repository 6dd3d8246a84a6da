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
import re

import numpy as np
import pandas as pd

from nerpii_ray.functions.textfns import md5_of_strings, stable_hash64_np

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\w+")


# ---------------------------------------------------------------- exact
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: keep the row with the smallest id per distinct
    normalized content.  Returns (id, fp) pairs of the KEPT rows.

    Hash-partition + per-group first (SURVEY §2.7): the shuffle key is a
    16-byte digest, never the document text.
    """

    from nerpii_ray.stages.agg import tree_dedup

    def fp_batch(b: pd.DataFrame) -> pd.DataFrame:
        norm = (
            b[text_col].fillna("").str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
        )
        out = pd.DataFrame({id_col: b[id_col], "fp": md5_of_strings(norm)})
        # local combiner: one candidate per fingerprint per batch
        return out.sort_values(id_col).drop_duplicates("fp")

    return tree_dedup(ds, keys=["fp"], partial_fn=fp_batch, keep_min=id_col)


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
        sigs = np.stack([self.signature(t) for t in batch[self.text_col].fillna("")])
        return pd.DataFrame({self.id_col: batch[self.id_col].to_numpy(),
                             "sig": list(sigs)})

    def banded(self, batch: pd.DataFrame, bands: int) -> pd.DataFrame:
        """One-pass banded output: per doc, ``bands`` LIGHT rows
        (band, band_hash, id — no signature payload) plus one signature
        row (band = -1, sig bytes) for verification at the pairing root.
        Carrying the 512-byte signature once instead of ``bands`` times
        cuts the exchange volume ~an order of magnitude."""
        rows_per_band = self.num_perm // bands
        ids = batch[self.id_col].to_numpy()
        out_band: list = []
        out_hash: list = []
        out_id: list = []
        out_sig: list = []
        for did, text in zip(ids, batch[self.text_col].fillna("")):
            h = self._shingle_hashes(text or "")
            if len(h) == 0:
                # empty doc: the all-sentinel signature would bucket every
                # empty doc together and pair them at est_jaccard 1.0 —
                # an empty doc has no content to be a near-dup of; skip it
                continue
            sig = self._sig_from_hashes(h)
            for band in range(bands):
                lo = band * rows_per_band
                out_band.append(band)
                out_hash.append(
                    hashlib.md5(sig[lo : lo + rows_per_band].tobytes()).hexdigest()[:16]
                )
                out_id.append(did)
                out_sig.append(b"")
            out_band.append(-1)
            out_hash.append("")
            out_id.append(did)
            out_sig.append(sig.tobytes())
        return pd.DataFrame(
            {"band": np.array(out_band, dtype=np.int32), "band_hash": out_hash,
             self.id_col: out_id, "sig": out_sig}
        )


class _BandedMinHasher(MinHasher):
    """MinHasher variant whose __call__ emits the banded layout directly
    (see ``MinHasher.banded``) — one actor pass, no ndarray columns."""

    def __init__(self, bands: int = 16, **kwargs):
        super().__init__(**kwargs)
        self.bands = bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return self.banded(batch, self.bands)


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
    """Near-duplicate candidate pairs via MinHash+LSH.

    signatures (actor pool) → explode to (band, band_hash, id, sig) →
    groupby(band, band_hash) → pairs within bucket → estimated Jaccard
    (signature agreement) ≥ threshold.  Buckets larger than
    ``max_bucket`` are truncated with a logged marker row rather than
    exploding quadratically (no silent caps).
    Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated.
    """
    banded = ds.map_batches(
        _BandedMinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm,
            shingle_k=shingle_k, bands=bands,
        ),
        batch_format="pandas",
        batch_size=2048,  # bundle oversplit input blocks into real batches
        concurrency=(1, 8),
    )

    def pair_block(df: pd.DataFrame) -> pd.DataFrame:
        """Pair up multi-member buckets within one block (vectorized
        pandas groupby; the quadratic loop only touches buckets with ≥2
        members, which near-dup rates keep tiny).  Signatures come from
        the band == -1 rows (one per doc)."""
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )
        if df.empty:
            return empty
        sig_rows = df[df["band"] == -1]
        sig_of = dict(zip(sig_rows[id_col], sig_rows["sig"]))
        bd = df[df["band"] >= 0]
        sizes = bd.groupby(["band", "band_hash"], sort=False)["band"].transform("size")
        multi = bd[sizes > 1]
        if multi.empty:
            return empty
        ia, ib, est = [], [], []
        for _, g in multi.groupby(["band", "band_hash"], sort=False):
            g = g.sort_values(id_col).head(max_bucket)
            ids = g[id_col].to_numpy()
            sig = np.stack(
                [np.frombuffer(sig_of[i], dtype=np.uint64) for i in ids]
            )
            for i in range(len(ids)):
                agree = (sig[i + 1 :] == sig[i]).mean(axis=1)
                hit = np.nonzero(agree >= threshold)[0]
                for j in hit:
                    ia.append(int(ids[i]))
                    ib.append(int(ids[i + 1 + j]))
                    est.append(float(agree[j]))
        return pd.DataFrame(
            {"id_a": pd.array(ia, dtype="int64"), "id_b": pd.array(ib, dtype="int64"),
             "est_jaccard": pd.array(est, dtype="float64")}
        )

    # A bucket's members must meet in one place.  The banded table is
    # docs × bands rows (metadata + signature only, never text), so the
    # cheapest exact exchange is a single-root coalesce — the root task
    # holds docs × bands key rows, fine to ~10^8; past that, switch the
    # repartition(1) for a keyed shuffle on (band, band_hash).
    pairs = banded.repartition(1).map_batches(
        pair_block, batch_format="pandas", batch_size=None
    )

    # the same pair can surface from several bands → dedup (tiny)
    from nerpii_ray.stages.agg import tree_dedup

    return tree_dedup(pairs, keys=["id_a", "id_b"], levels=(1,))


# ------------------------------------------------------------- simhash
def add_simhash(batch: pd.DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> pd.DataFrame:
    """64-bit SimHash per document (token-hash bit-vote).  Near-dups share
    small Hamming distance; pairing = group on rotated prefixes or band
    tables downstream."""
    out_ids, hashes = [], []
    for did, text in zip(batch[id_col], batch[text_col].fillna("")):
        toks = _TOKEN_RE.findall(text.lower())
        if not toks:
            out_ids.append(did)
            hashes.append(0)
            continue
        uniq, counts = np.unique(np.array(toks), return_counts=True)
        hs = stable_hash64_np(pd.Series(uniq))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        sim = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                sim |= np.uint64(1) << np.uint64(b)
        out_ids.append(did)
        hashes.append(int(sim))
    return pd.DataFrame({id_col: out_ids, "simhash": np.array(hashes, dtype=np.uint64)})


# ------------------------------------------------- n-gram Jaccard pairs
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
                    js.append(round(jac, 6))
        return pd.DataFrame({"id_a": ia, "id_b": ib, "jaccard": js})

    return ds.groupby(bucket_col).map_groups(pairs, batch_format="pandas")


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

    return ds.groupby(bucket_col).map_groups(pairs, batch_format="pandas")
