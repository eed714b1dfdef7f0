"""Watched-attribute lifecycle (SURVEY.md §2 A14 management surface).

Reference semantics (`/root/reference/internal/storage/memory/store.go:
1092-1160`):

* at most ``MAX_WATCHED`` keys may be *active* at once — watching past the
  cap raises;
* watching an already-tracked key is idempotent (re-activates, never
  resets collected data);
* unwatching deactivates but PRESERVES the key's collected values (they
  stay visible in the value explorer); unwatching an unknown key raises.

This is driver-side control state (a handful of strings), not data-path
state — the data path stays :func:`..operators.aggregate.watched_values`,
which takes ``registry.active()`` as its key list.
"""

from __future__ import annotations

MAX_WATCHED = 10


class WatchedKeys:
    """In-memory watched-key registry with the reference's cap semantics."""

    def __init__(self, max_watched: int = MAX_WATCHED) -> None:
        self.max_watched = max_watched
        self._keys: dict[str, bool] = {}  # key -> active

    def watch(self, key: str) -> None:
        if not key:
            raise ValueError("attribute key cannot be empty")
        if key in self._keys:
            self._keys[key] = True  # idempotent re-activate
            return
        active_count = sum(1 for a in self._keys.values() if a)
        if active_count >= self.max_watched:
            raise RuntimeError(
                f"maximum watched fields limit ({self.max_watched}) reached"
            )
        self._keys[key] = True

    def unwatch(self, key: str) -> None:
        if not key:
            raise ValueError("attribute key cannot be empty")
        if key not in self._keys:
            raise KeyError(key)
        self._keys[key] = False  # deactivate, preserve collected values

    def active(self) -> tuple[str, ...]:
        return tuple(sorted(k for k, a in self._keys.items() if a))

    def all(self) -> tuple[str, ...]:
        return tuple(sorted(self._keys))
