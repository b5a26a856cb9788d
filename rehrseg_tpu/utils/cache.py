"""Small LRU-bounded mapping for id-keyed jit caches.

The sliding-window / SR inference jits key on a model-fn object, so those
objects must be stable across calls (recompilation is minutes through the
remote-compile tunnel). Keying on ``id(model)`` requires pinning the model
object for the lifetime of the entry — otherwise a GC'd model's id could
alias a NEW model onto stale compiled forwards. An unbounded pin leaks
compiled programs in long-lived serving processes, so this cache evicts
least-recently-used entries past ``maxsize``: an evicted model's reused id
is then a plain cache miss (correct, just recompiles).
"""

from __future__ import annotations

from collections import OrderedDict


class BoundedCache:
    """dict-like LRU cache: get/contains refresh recency; insertion past
    ``maxsize`` evicts the least recently used entry."""

    def __init__(self, maxsize: int = 8):
        if maxsize < 1:
            raise ValueError("maxsize must be >= 1")
        self.maxsize = maxsize
        self._d: OrderedDict = OrderedDict()

    def __contains__(self, key) -> bool:
        if key in self._d:
            self._d.move_to_end(key)
            return True
        return False

    def __getitem__(self, key):
        val = self._d[key]
        self._d.move_to_end(key)
        return val

    def __setitem__(self, key, value) -> None:
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def __len__(self) -> int:
        return len(self._d)

    def clear(self) -> None:
        self._d.clear()
