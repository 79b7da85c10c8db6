"""Run metrics for filtering stages — "no silent caps" (VERDICT r03
#8): any stage that removes rows can report how many it removed.

A filter stage in a streaming pipeline cannot return its drop count in
band (the rows are gone), and re-running the pipeline just to count is
a second full pass. :class:`DropCounter` is the standard Ray pattern
instead: one tiny named-state actor; filter tasks fire-and-forget an
increment per batch (one small RPC per ~batch_size rows — invisible
next to the filter work itself), and the driver reads the totals after
the consuming action. Counts are exact because every dropped row is
counted exactly once by whichever task dropped it.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class DropCounter:
    """Per-key dropped-row totals. ``num_cpus=0``: bookkeeping must
    never hold a CPU slot a worker could use."""

    def __init__(self):
        self._counts: dict[str, int] = {}

    def add(self, key: str, n: int) -> None:
        self._counts[key] = self._counts.get(key, 0) + int(n)

    def get(self) -> dict[str, int]:
        return dict(self._counts)


def add_dropped(counter, key: str, n: int) -> None:
    """Fire-and-forget increment (no-op for n == 0 or counter=None)."""
    if counter is not None and n:
        counter.add.remote(key, int(n))
