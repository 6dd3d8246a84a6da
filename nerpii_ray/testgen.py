"""Deterministic synthetic transcript generator (FIXTURES.md F-E).

Produces the engine's input contract exactly (``BASELINE.json``
``input_hint``): Parquet of multi-turn conversation / agent transcripts
with columns ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``.

Every turn's text is templated from the gazetteers in
:mod:`nerpii_ray.gazetteers`, so detection ground truth is exact and the
reference-semantics oracle can score P/R deterministically.  Seeding is
per-conversation (``Random(seed * 1_000_003 + conv_index)``) so output is
byte-identical regardless of chunking or parallelism.

Includes, per FIXTURES.md: null texts, ``"?"`` filler turns, a
deliberately hot entity surface (``Acme Corp``, ~10 % of entity-bearing
turns — for skew/salting tests), and conversations long enough to span
multiple Parquet row groups.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

from nerpii_ray.functions.hashing import luhn_complete
from nerpii_ray.gazetteers import (
    CITIES,
    COUNTRIES,
    EMAIL_DOMAINS,
    FIRST_NAMES_FEMALE,
    FIRST_NAMES_MALE,
    LAST_NAMES,
    ORG_NAMES,
    STREET_NAMES,
    US_STATES,
)

HOT_ORG = "Acme Corp"
TOOLS = ["send_email", "crm_lookup", "calendar", "none"]
ROLES = ["user", "assistant", "system", "tool"]

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_BASE_TS = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def _person(rng: random.Random) -> str:
    first = rng.choice(
        FIRST_NAMES_FEMALE if rng.random() < 0.5 else FIRST_NAMES_MALE
    )
    return f"{first} {rng.choice(LAST_NAMES)}"


def _email(rng: random.Random, person: Optional[str] = None) -> str:
    person = person or _person(rng)
    first, last = person.split(" ", 1)
    return f"{first.lower()}.{last.lower()}@{rng.choice(EMAIL_DOMAINS)}"


def _phone(rng: random.Random) -> str:
    return f"({rng.randint(200, 989)}) {rng.randint(200, 989)}-{rng.randint(1000, 9999)}"


def _ssn(rng: random.Random) -> str:
    return f"{rng.randint(100, 899)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}"


def _credit_card(rng: random.Random) -> str:
    return luhn_complete("4" + "".join(str(rng.randint(0, 9)) for _ in range(14)))


def _org(rng: random.Random) -> str:
    # hot surface: ~10% of org draws are the same organization
    return HOT_ORG if rng.random() < 0.10 else rng.choice(ORG_NAMES)


def _address(rng: random.Random) -> str:
    return f"{rng.randint(1, 999)} {rng.choice(STREET_NAMES)} Street"


_MONTH_NAMES = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]
_MONTH_ABBR = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct",
    "Nov", "Dec",
]


def _date(rng: random.Random) -> str:
    m, d = rng.randint(1, 12), rng.randint(1, 28)
    form = rng.randint(0, 3)
    if form == 0:
        return f"2024-{m:02d}-{d:02d}"
    if form == 1:
        return f"{m}/{d}/2024"
    if form == 2:
        # "March 5, 2024" — the Presidio-breadth month-name form
        return f"{_MONTH_NAMES[m - 1]} {d}, 2024"
    return f"{d} {_MONTH_ABBR[m - 1]} 2024"


def _turn_text(rng: random.Random, role: str, tool: str) -> str:
    kind = rng.randint(0, 9)
    if kind == 0:
        p = _person(rng)
        return f"Hi, I'm {p}. You can reach me at {_email(rng, p)} or {_phone(rng)}."
    if kind == 1:
        return f"Noted. Your address is {_address(rng)}."
    if kind == 2:
        return f"{_person(rng)} works for {_org(rng)} and lives in {rng.choice(CITIES)}."
    if kind == 3 and role == "tool":
        return f"Record: name={_person(rng)}; ssn={_ssn(rng)}; card={_credit_card(rng)}."
    if kind == 4 and tool == "send_email":
        return f"Email sent to {_email(rng)} about the meeting in {rng.choice(US_STATES)}."
    if kind == 5:
        return f"Scheduled for {_date(rng)} in {rng.choice(COUNTRIES)}."
    if kind == 6:
        return "That sounds great, thanks!"
    if kind == 7:
        return "?"
    if kind == 8:
        return f"{_person(rng)} visited {rng.choice(CITIES)} with {_person(rng)}."
    return f"Please follow up with {_org(rng)} at {_email(rng)}."


def generate_conversation(conv_index: int, seed: int = 42) -> list[dict]:
    """One conversation as a list of row dicts, deterministically seeded."""
    rng = random.Random(seed * 1_000_003 + conv_index)
    conv_id = f"conv-{seed}-{conv_index:08d}"
    n_turns = rng.randint(4, 40)
    ts = _BASE_TS + conv_index * 3_600_000_000
    rows = []
    for turn_idx in range(n_turns):
        role = "user" if turn_idx % 2 == 0 else "assistant"
        if rng.random() < 0.08:
            role = rng.choice(("system", "tool"))
        tool = rng.choice(TOOLS) if role in ("assistant", "tool") else "none"
        if rng.random() < 0.02:
            text = None  # null text turns (FIXTURES.md F-E)
        else:
            text = _turn_text(rng, role, tool)
        ts += rng.randint(1_000_000, 120_000_000)
        rows.append(
            dict(
                conv_id=conv_id,
                turn_idx=turn_idx,
                role=role,
                text=text,
                tool=tool,
                ts=ts,
            )
        )
    return rows


def generate_table(n_convs: int, seed: int = 42, first_conv: int = 0) -> pa.Table:
    rows = []
    for c in range(first_conv, first_conv + n_convs):
        rows.extend(generate_conversation(c, seed))
    cols = {k: [r[k] for r in rows] for k in ("conv_id", "turn_idx", "role", "text", "tool")}
    cols["ts"] = [r["ts"] for r in rows]
    arrays = [
        pa.array(cols["conv_id"], pa.string()),
        pa.array(cols["turn_idx"], pa.int32()),
        pa.array(cols["role"], pa.string()),
        pa.array(cols["text"], pa.string()),
        pa.array(cols["tool"], pa.string()),
        pa.array(cols["ts"], pa.timestamp("us")),
    ]
    return pa.Table.from_arrays(arrays, schema=SCHEMA)


def _write_shard(out_dir: str, shard: int, lo: int, n: int, seed: int) -> None:
    table = generate_table(n, seed=seed, first_conv=lo)
    pq.write_table(
        table, os.path.join(out_dir, f"part-{shard:05d}.parquet"),
        row_group_size=4096,
    )


def write_transcripts(
    out_dir: str, n_convs: int, seed: int = 42, convs_per_file: int = 2000
) -> str:
    """Write transcripts partitioned so one conversation never spans files
    (the ordering invariant's layout precondition, SURVEY §4).  Skips work
    if the directory is already complete (_SUCCESS marker).

    Per-conversation seeding makes shards independent, so when a Ray
    session is already up (bench), shards generate as parallel Ray tasks —
    output is byte-identical either way.
    """
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    shards = [
        (i, lo, min(convs_per_file, n_convs - lo))
        for i, lo in enumerate(range(0, n_convs, convs_per_file))
    ]
    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(shards) > 4
    except ImportError:
        pass
    if use_ray:
        import ray

        task = ray.remote(num_cpus=1)(_write_shard)
        ray.get(
            [task.remote(out_dir, i, lo, n, seed) for i, lo, n in shards]
        )
    else:
        for i, lo, n in shards:
            _write_shard(out_dir, i, lo, n, seed)
    with open(marker, "w") as f:
        f.write(f"n_convs={n_convs} seed={seed}\n")
    return out_dir


#: bump when _turn_text / providers change — the cache marker is keyed by
#: (sf, seed) only, so a generator change must invalidate old /tmp dirs
_GEN_VERSION = 2


def transcripts_for_sf(sf: float, base_dir: str = "/tmp/nerpii_ray_transcripts",
                       seed: int = 42) -> str:
    """sf-scaled cached transcript dir: sf=0.001 → 100 convs (~2.2k turns),
    sf=0.1 → 10k convs (~220k turns)."""
    n_convs = max(10, int(round(sf * 100_000)))
    out = os.path.join(base_dir, f"sf{sf}-seed{seed}-v{_GEN_VERSION}")
    return write_transcripts(out, n_convs, seed=seed)
