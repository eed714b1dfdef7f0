"""Drain log-template miner (fidelity mode).

An original implementation of the Drain algorithm (He et al., "Drain: An
Online Log Parsing Approach with Fixed Depth Tree", ICWS 2017), matching the
*behavioral* contract of the reference's miner
(`/root/reference/pkg/autotemplate/miner.go` — routing by token count then
leading tokens, wildcard descent, similarity threshold with per-position
equality, in-place generalization, LRU-bounded clusters) without porting its
code. Used by ``operators/templates.drain_templates`` inside a grouped-map
pandas UDF; input is sorted per group so results are deterministic despite
Drain's arrival-order sensitivity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

WILDCARD = "<*>"


@dataclass
class _Cluster:
    template: list[str]
    count: int = 0
    example: str = ""
    last_used: int = 0


@dataclass
class DrainConfig:
    max_depth: int = 4  # levels of token routing below the length bucket
    sim_threshold: float = 0.5
    max_children: int = 100
    max_clusters: int = 1000


class DrainMiner:
    """Fixed-depth tree: level 1 routes by token count, levels 2..max_depth
    route by the leading tokens (with a wildcard child once a node has
    max_children distinct values, and always for variable-looking tokens);
    leaves hold template clusters."""

    def __init__(self, config: DrainConfig | None = None) -> None:
        self.cfg = config or DrainConfig()
        self._root: dict = {}
        self._clusters: list[_Cluster] = []
        self._clock = 0

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _looks_variable(token: str) -> bool:
        return any(c.isdigit() for c in token)

    def _leaf_for(self, tokens: list[str], create: bool) -> list | None:
        node = self._root
        # L1: token count; L2: first token (wildcard for variable-looking
        # tokens); L3+: wildcard descent — classic Drain routing.
        keys = [str(len(tokens))]
        if self.cfg.max_depth >= 2 and tokens:
            t = tokens[0]
            keys.append(WILDCARD if self._looks_variable(t) else t)
        for _ in range(2, min(self.cfg.max_depth, len(tokens))):
            keys.append(WILDCARD)
        for i, key in enumerate(keys):
            is_last = i == len(keys) - 1
            if is_last:
                leaf = node.get(key)
                if leaf is None:
                    if not create:
                        # fall back to the wildcard sibling
                        leaf = node.get(WILDCARD)
                        return leaf if isinstance(leaf, list) else None
                    leaf = []
                    node[key] = leaf
                return leaf
            child = node.get(key)
            if child is None:
                if not create:
                    child = node.get(WILDCARD)
                    if child is None:
                        return None
                elif (
                    key != WILDCARD
                    and len(node) >= self.cfg.max_children
                ):
                    child = node.setdefault(WILDCARD, {})
                else:
                    child = node.setdefault(key, {})
            node = child
        return None

    def _similarity(self, template: list[str], tokens: list[str]) -> float:
        if len(template) != len(tokens):
            return 0.0
        matches = sum(
            1
            for a, b in zip(template, tokens)
            if a == b or a == WILDCARD
        )
        return matches / max(len(tokens), 1)

    def _evict_if_needed(self) -> None:
        if len(self._clusters) <= self.cfg.max_clusters:
            return
        victim = min(self._clusters, key=lambda c: c.last_used)
        self._clusters.remove(victim)
        # drop from its leaf
        for leaf in self._iter_leaves(self._root):
            if victim in leaf:
                leaf.remove(victim)
                break

    def _iter_leaves(self, node):
        for v in node.values():
            if isinstance(v, list):
                yield v
            else:
                yield from self._iter_leaves(v)

    # -- public ------------------------------------------------------------

    @staticmethod
    def tokens_of(message: str) -> list[str]:
        """Tokenize + collapse variable-looking/long tokens to ``<*>``
        BEFORE routing (reference `tokenize.go:7-30`): a long base64 blob
        must not inflate the token count and dodge the length bucket."""
        from .masking import is_variable_token

        return [
            WILDCARD if is_variable_token(t) else t for t in message.split()
        ]

    def match(self, message: str) -> tuple[str | None, bool]:
        """Inference mode (reference `miner.go:125-134`): match against the
        trained tree WITHOUT mutating any state; (template, ok)."""
        tokens = self.tokens_of(message)
        if not tokens:
            return None, False
        leaf = self._leaf_for(tokens, create=False)
        best, best_sim = None, 0.0
        if leaf:
            for cluster in leaf:
                sim = self._similarity(cluster.template, tokens)
                if sim > best_sim:
                    best, best_sim = cluster, sim
        min_sim = max(self.cfg.sim_threshold, 1.0 / max(len(tokens), 1))
        if best is not None and best_sim >= min_sim:
            return " ".join(best.template), True
        return None, False

    def preload(self, templates: list[str]) -> None:
        """Seed the tree with already-mined templates (inference serving:
        a trained model is distributed as its template list)."""
        for template in templates:
            tokens = template.split()
            if not tokens:
                continue
            leaf = self._leaf_for(tokens, create=True)
            cluster = _Cluster(template=list(tokens), count=0, example="")
            leaf.append(cluster)
            self._clusters.append(cluster)

    def add(self, message: str, training: bool = True) -> str:
        """Feed one (pre-masked) message; returns its template string."""
        self._clock += 1
        tokens = self.tokens_of(message)
        if not tokens:
            return ""
        leaf = self._leaf_for(tokens, create=training)
        best, best_sim = None, 0.0
        if leaf:
            for cluster in leaf:
                sim = self._similarity(cluster.template, tokens)
                if sim > best_sim:
                    best, best_sim = cluster, sim
        min_sim = max(self.cfg.sim_threshold, 1.0 / max(len(tokens), 1))
        if best is not None and best_sim >= min_sim:
            # generalize in place: divergent positions become wildcards
            best.template = [
                a if (a == b or a == WILDCARD) else WILDCARD
                for a, b in zip(best.template, tokens)
            ]
            best.count += 1
            best.last_used = self._clock
            return " ".join(best.template)
        if not training:
            return " ".join(tokens)
        cluster = _Cluster(
            template=list(tokens),
            count=1,
            example=message[:200],
            last_used=self._clock,
        )
        if leaf is None:
            leaf = self._leaf_for(tokens, create=True)
        leaf.append(cluster)
        self._clusters.append(cluster)
        self._evict_if_needed()
        return " ".join(cluster.template)

    def clusters(self) -> list[tuple[str, int, str]]:
        """(template, count, first example), counts read from Drain state so
        post-hoc generalized templates aggregate correctly."""
        return [
            (" ".join(c.template), c.count, c.example) for c in self._clusters
        ]
