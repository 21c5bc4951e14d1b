"""Single-writer claim protocol for persisted-index meta sentinels.

Both persisted indexes (LSH, ``operators/dedup.py``; IVF,
``operators/vectors.py``) bracket every mutation with a meta sentinel:
invalidate first (``format_version -1``), write the data, stamp the real
version last — so a crash mid-mutation leaves an index that loudly fails
the read gate instead of one that silently serves a torn state. That
bracket made torn writes DETECTABLE but left the single-writer contract as
prose: two concurrent appenders could both pass the gate, both anti-join
the same pre-append state, and double-write.

``claim_sentinel`` turns the existing sentinel into a best-effort
compare-and-swap claim: each writer invalidates meta with a UNIQUE token,
reads it back, and proceeds only if the token it sees is its own. With two
racing writers A and B:

- A claims (token_a), B claims (token_b, overwriting), A verifies -> sees
  token_b -> raises BEFORE touching data; B verifies -> sees token_b ->
  proceeds alone.
- A claims and is mid-write when B arrives: B's initial gate read sees
  ``-1`` and raises (the pre-existing in-progress check).

The residual race is the claim-write/verify-read window (two writers whose
overwrites of the one-file meta parquet physically interleave can corrupt
it) — on an object store without atomic rename that window cannot be
closed from here, but a corrupted meta also fails the gate loudly, which
is the contract: concurrent writers are an OPERATOR ERROR this protocol
detects and refuses, not a supported topology. Probes racing a claim
window fail the same gate (see the append docstrings for the documented
probe/append exclusion).
"""

from __future__ import annotations

import uuid
from typing import Callable


def claim_sentinel(spark, meta_dir: str,
                   write_meta: Callable[..., None]) -> None:
    """Claim ``meta_dir`` for this writer: invalidate with a unique token
    and verify the readback. ``write_meta(version, token)`` must persist
    both fields; raises ``ValueError`` if another writer's token (or a
    torn meta) is observed — in which case THIS writer has written
    nothing yet and the index data is untouched."""
    token = uuid.uuid4().hex
    write_meta(-1, token)
    try:
        rows = spark.read.parquet(meta_dir).collect()
        seen = rows[0].asDict().get("writer_token") if rows else None
    except Exception as e:  # torn meta from physically interleaved writes
        raise ValueError(
            f"index meta at {meta_dir} is unreadable after claiming it — "
            "a concurrent writer interleaved with this one; re-stamp via "
            "a rebuild and serialize writers (single-writer contract)"
        ) from e
    if seen != token:
        raise ValueError(
            f"index at {meta_dir} was claimed by another writer "
            "(single-writer contract): this mutation wrote nothing; retry "
            "after the other writer finishes, or serialize appends "
            "through one scheduler")
