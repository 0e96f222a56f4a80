"""Shared replay-safety helper for the foreachBatch state machines.

The three ingest loops (lsh_ingest, decontam_ingest, simhash_ingest)
persist per-batch state under ``{state_root}/{store}/b{bid}`` and rely
on the same replay invariants: (i) every write is mode=overwrite into
its own batch-id subdir, (ii) a batch reads only STRICTLY-earlier
batches' state, (iii) the per-batch derivation is deterministic. This
module owns (ii): the numeric strictly-before filter — a crash-replay
(state written, checkpoint commit missing) must see exactly the
pre-batch state, and batch ids parse numerically because a
lexicographic sort mis-orders b10 before b2.
"""

from __future__ import annotations

import glob


def prior_batch_dirs(state_root: str, store: str, bid: int) -> list[str]:
    """``{state_root}/{store}/b*`` dirs from batches strictly before
    ``bid``, in numeric batch order. Non-numeric ``b*`` entries (an
    operator's ``b3.bak`` copy, editor droppings) are ignored rather
    than killing the stream with a ValueError inside foreachBatch."""
    numbered = sorted(
        (int(suffix), d)
        for d in glob.glob(f"{state_root}/{store}/b*")
        if (suffix := d.rsplit("/b", 1)[1]).isdigit()
    )
    return [d for n, d in numbered if n < bid]
