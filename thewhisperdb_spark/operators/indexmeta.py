"""Single-writer claim protocol for persisted-index meta sentinels.

Both persisted indexes (LSH, ``operators/dedup.py``; IVF,
``operators/vectors.py``) bracket every mutation with a meta sentinel so a
crash mid-mutation leaves an index that loudly fails the read gate
(``format_version -1``) instead of one that silently serves a torn state.
The claim protocol layered on top enforces the single-writer contract
WITHOUT blocking readers for the whole mutation:

1. ``claim_sentinel``: the writer re-stamps meta with the CURRENT valid
   version plus a unique ``writer_token`` and verifies the readback. The
   version stays valid, so probes keep serving the last stamped state
   while the writer computes its delta (anti-joins, signatures, cell
   assignment) — the long phase of every append.
2. The writer computes the delta UNDER the claim (at-rest reads resolve
   post-claim, so every committed prior mutation is observed).
3. ``verify_claim``: immediately before the first data write, the writer
   re-reads meta and confirms the token is still its own. A second writer
   that claimed in the meantime (or finished a whole mutation — its final
   stamp clears the token) is detected here; the loser raises having
   written NOTHING.
4. The writer stamps ``-1`` (in-progress), performs the state-mutating
   writes, and stamps the real version last. Only THIS window — the data
   writes themselves — blocks readers; a crash inside it leaves the loud
   ``-1``, a crash before it leaves a valid, servable index.

Failure discipline: if the delta computation raises while the writer
still holds the claim, ``release_claim`` re-stamps the valid version
(clearing the token) ONLY if the token is still this writer's — never
stomping a newer claimant.

Race analysis (writers A, B):
- A claims, B claims (overwrites token), A verifies-or-re-verifies ->
  sees B's token -> raises before touching data; B proceeds alone.
- A claims and is inside the -1 data-write window when B arrives: B's
  up-front version gate sees ``-1`` and raises.
- B claims after A's final stamp: B's claim reads a state that already
  contains A's rows — the retry lands as the intended no-op.

The residual race is the claim-write/verify-read window (two writers
whose overwrites of the one-file meta parquet physically interleave can
corrupt it) — on an object store without atomic rename that window cannot
be closed from here, but a corrupted meta also fails the gate loudly,
which is the contract: concurrent writers are an OPERATOR ERROR this
protocol detects and refuses, not a supported topology.
"""

from __future__ import annotations

import uuid
from typing import Callable


class ClaimLostError(ValueError):
    """Another writer claimed the index after this writer's claim; this
    writer has written NOTHING and must not re-stamp the sentinel."""


def _read_meta(spark, meta_dir: str):
    """(format_version, writer_token) of the current sentinel."""
    try:
        rows = spark.read.parquet(meta_dir).collect()
        if not rows:
            return None, None
        d = rows[0].asDict()
        return d.get("format_version"), d.get("writer_token")
    except Exception as e:  # torn meta from physically interleaved writes
        raise ValueError(
            f"index meta at {meta_dir} is unreadable under a writer claim "
            "— a concurrent writer interleaved with this one; re-stamp via "
            "a rebuild and serialize writers (single-writer contract)"
        ) from e


def _read_token(spark, meta_dir: str):
    return _read_meta(spark, meta_dir)[1]


def claim_sentinel(spark, meta_dir: str,
                   write_meta: Callable[..., None],
                   version: int) -> str:
    """Claim ``meta_dir`` for this writer: re-stamp it with the CURRENT
    valid ``version`` plus a unique token and verify the readback. Readers
    gating on ``format_version`` are unaffected — the index keeps serving
    its last stamped state. ``write_meta(version, token)`` must persist
    both fields. Returns the token (pass it to ``verify_claim`` /
    ``release_claim``); raises ``ValueError`` if another writer's token
    (or a torn meta) is observed — in which case THIS writer has written
    nothing yet and the index data is untouched.

    The claim NEVER overwrites an in-progress ``-1`` sentinel: another
    writer is inside (or crashed inside) its data-write bracket, and
    re-stamping a valid version over it would unblind readers onto a torn
    state — the exact silent corruption the bracket exists to make loud.
    A FOREIGN token under a VALID version is claimed over, deliberately:
    it is either a writer still in its (side-effect-free) delta phase —
    which will lose its own ``verify_claim`` having written nothing — or
    the leftover of a writer that crashed mid-compute, which must not
    deadlock the index forever. The pre-write read shrinks but cannot
    close the read/write race window on a non-atomic store; that residual
    is the documented operator-error regime."""
    pre_ver, _ = _read_meta(spark, meta_dir)
    if pre_ver == -1:
        raise ValueError(
            f"index at {meta_dir} is inside another writer's data-write "
            "bracket (format_version -1): claiming over it would unblind "
            "readers onto a possibly-torn state; wait for the writer or "
            "rebuild if it crashed")
    token = uuid.uuid4().hex
    write_meta(version, token)
    seen = _read_token(spark, meta_dir)
    if seen != token:
        raise ClaimLostError(
            f"index at {meta_dir} was claimed by another writer "
            "(single-writer contract): this mutation wrote nothing; retry "
            "after the other writer finishes, or serialize appends "
            "through one scheduler")
    return token


def verify_claim(spark, meta_dir: str, token: str) -> None:
    """Re-verify ownership immediately before the first state-mutating
    write: the delta-computation window ran with the version gate OPEN
    (readers served), so a second writer could have claimed — or even
    completed a whole mutation (its final stamp clears the token) — in
    the meantime. Raises ``ClaimLostError`` if the token is no longer
    this writer's; nothing has been written and the sentinel must be
    left alone (it belongs to the new claimant)."""
    seen = _read_token(spark, meta_dir)
    if seen != token:
        raise ClaimLostError(
            f"index at {meta_dir} was claimed by another writer while "
            "this mutation computed its delta (single-writer contract): "
            "this mutation wrote nothing; retry after the other writer "
            "finishes")


def release_claim(spark, meta_dir: str, write_meta: Callable[..., None],
                  token: str, version: int) -> None:
    """Release a claim after a failed delta computation: re-stamp the
    valid ``version`` (clearing the token) only if the token read back is
    still this writer's. BEST-EFFORT: the read-then-write pair is not
    atomic, so a claimant landing inside that window can still be
    stomped — it then fails its own ``verify_claim`` loudly having
    written nothing (abort, not corruption), the same residual-race
    regime as the claim write/readback itself. Swallows readback errors
    (a torn meta already fails the gate loudly; releasing is best-effort
    cleanup on an error path)."""
    try:
        seen = _read_token(spark, meta_dir)
    except ValueError:
        return
    if seen == token:
        write_meta(version)
