"""Prefetching sample loader.

Greenfield runtime component: the reference loads every sample inline on
the evaluation thread (`src/evaluation_framework.py:542`), serializing
JPEG decode + LiDAR file IO with the pipeline.  ``PrefetchLoader`` keeps a
small thread pool decoding the next samples while the device works on the
current one — host IO rides under device compute.
"""

from __future__ import annotations

import concurrent.futures as cf
from collections import OrderedDict
from typing import Dict, Iterable, Iterator, List


class PrefetchLoader:
    """Wraps any loader exposing ``load_sample(token)``.

    ``schedule(tokens)`` declares the upcoming access order;
    ``load_sample(token)`` then returns the (possibly already-decoded)
    sample and tops the pipeline back up.
    """

    def __init__(self, loader, num_workers: int = 2, depth: int = 2):
        self.loader = loader
        self.depth = depth
        self._pool = cf.ThreadPoolExecutor(max_workers=num_workers,
                                           thread_name_prefix="msc-prefetch")
        self._pending: "OrderedDict[str, cf.Future]" = OrderedDict()
        self._queue: List[str] = []

    # passthroughs
    def __getattr__(self, name):
        return getattr(self.loader, name)

    def schedule(self, tokens: Iterable[str]):
        self._queue = list(tokens)
        self._top_up()

    def _top_up(self):
        while self._queue and len(self._pending) < self.depth:
            token = self._queue.pop(0)
            if token not in self._pending:
                self._pending[token] = self._pool.submit(
                    self.loader.load_sample, token)

    def load_sample(self, token: str) -> Dict:
        fut = self._pending.pop(token, None)
        self._top_up()
        if fut is not None:
            return fut.result()
        return self.loader.load_sample(token)

    def iter_samples(self, tokens: List[str]) -> Iterator[Dict]:
        self.schedule(tokens)
        for token in tokens:
            yield self.load_sample(token)

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
