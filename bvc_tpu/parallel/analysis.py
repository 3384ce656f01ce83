"""Communication accounting: what a jitted step actually puts on the ICI.

The reference's communication story is implicit — DDP buckets gradients
and NCCL all-reduces them behind autograd hooks, with no way to see the
traffic short of profiling a live cluster
(``pretraining/generative/pretrain_videomae.py:180-181``).  Here the
SPMD partitioner *writes the collectives into the compiled program*, so
the per-step communication volume of any (mesh, sharding) layout can be
read off the optimized HLO — on any backend, before ever touching a pod.

This module parses a compiled step's HLO text and accounts every
collective: kind, occurrence count, payload bytes, and the replica-group
size it runs over (which identifies the mesh axis — ``data`` groups vs
``model`` groups).  From payload + group size it also estimates per-chip
ICI traffic under the standard ring algorithms (the scaling-book model):

- all-reduce:        2·(g−1)/g · payload
- all-gather:        (g−1)/g · payload          (payload = gathered size)
- reduce-scatter:    (g−1) · shard payload      (HLO output is the shard)
- collective-permute / all-to-all: payload as written

Used by ``tools/analyze_collectives.py`` (real model dims over a virtual
mesh → SCALING.md tables) and by ``tests/test_collectives_analysis.py``
(structural assertions: DP all-reduces exactly the gradient bytes once
per step — including under gradient accumulation, where a per-microbatch
all-reduce inside the scan would be a pod-scale regression).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_COLLECTIVE_KINDS = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

# `f32[16,16]{1,0}` / `bf16[8]` / `f32[]` — dtype then dims (layout ignored)
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\]")

# `replica_groups={{0,1},{2,3}}` (explicit) or `replica_groups=[4,2]<=[8]`
# (iota: 4 groups of 2)
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")
_GROUPS_EXPLICIT_RE = re.compile(r"replica_groups=\{\{([^}]*)\}")


def _shape_bytes(text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _group_size(line: str) -> int:
    m = _GROUPS_IOTA_RE.search(line)
    if m:
        return int(m.group(2))
    m = _GROUPS_EXPLICIT_RE.search(line)
    if m:
        first = [x for x in m.group(1).split(",") if x.strip() != ""]
        return max(len(first), 1)
    return 1


@dataclass
class CollectiveOp:
    """One collective instruction in the optimized HLO."""

    kind: str
    payload_bytes: int  # bytes of the instruction's result shape(s)
    group_size: int     # replica-group size (mesh-axis extent it spans)
    line: str = ""
    computation: str = ""
    in_loop: bool = False  # inside a while body → executes once per iteration

    @property
    def ring_bytes_per_chip(self) -> float:
        """Estimated ICI bytes each chip moves, ring algorithm."""
        g = max(self.group_size, 1)
        if self.kind == "collective-permute":
            # each chip sends/receives the result block once; ppermutes
            # carry source_target_pairs, not replica_groups, so group
            # size stays 1 — do not gate on it
            return float(self.payload_bytes)
        if g == 1:
            return 0.0
        if self.kind == "all-reduce":
            return 2.0 * (g - 1) / g * self.payload_bytes
        if self.kind == "all-gather":
            return (g - 1) / g * self.payload_bytes
        if self.kind == "reduce-scatter":
            # HLO result is the per-chip shard; full tensor = shard * g
            return float(g - 1) * self.payload_bytes
        return float(self.payload_bytes)


# `%name (args...) -> shape {` — args may nest parens (tuple params)
_COMPUTATION_HEADER_RE = re.compile(
    r"^(?:ENTRY\s+)?%?([\w\.\-]+)\s*\(.*\)\s*->.*\{\s*$"
)
_WHILE_BODY_RE = re.compile(r"\bwhile\(.*body=%?([\w\.\-]+)")
_WHILE_COND_RE = re.compile(r"\bwhile\(.*condition=%?([\w\.\-]+)")
# computation references: a collective in a computation CALLED from a
# while body (conditional branch, wrapper, fusion) also runs per
# iteration — track the call graph, not just lexical nesting
_CALL_ATTR_RE = re.compile(
    r"(?:to_apply|calls|body|condition|branch_computations|"
    r"called_computations)=(\{[^}]*\}|%?[\w\.\-]+)"
)


def parse_collectives(hlo_text: str) -> list[CollectiveOp]:
    """Every collective instruction in an optimized-HLO dump.

    Only the RESULT shape (left of the op name) is counted — operand
    shapes repeat inside the parentheses and would double-count.  The
    ``-start`` variants of async collectives are counted; their ``-done``
    halves carry the same shape and are skipped.

    Each op records its enclosing computation; ops inside a computation
    referenced as a ``while`` body or condition (``lax.scan`` /
    ``while_loop``) — or inside any computation transitively CALLED from
    one (conditional branches, wrapper/fusion computations) — are flagged
    ``in_loop``: the instruction appears once in the text but executes
    once per loop iteration.
    """
    lines = hlo_text.splitlines()
    loop_roots: set[str] = set()
    edges: dict[str, set[str]] = {}
    computation = ""
    for raw in lines:
        header = _COMPUTATION_HEADER_RE.match(raw)  # headers are unindented
        if header and not raw.startswith(" "):
            computation = header.group(1)
        m = _WHILE_BODY_RE.search(raw)
        if m:
            loop_roots.add(m.group(1))
        m = _WHILE_COND_RE.search(raw)
        if m:
            loop_roots.add(m.group(1))
        for m in _CALL_ATTR_RE.finditer(raw):
            for name in re.findall(r"%?([\w\.\-]+)", m.group(1)):
                edges.setdefault(computation, set()).add(name)
    # closure: everything reachable from a loop body/condition runs per
    # iteration
    loop_comps: set[str] = set()
    stack = list(loop_roots)
    while stack:
        c = stack.pop()
        if c in loop_comps:
            continue
        loop_comps.add(c)
        stack.extend(edges.get(c, ()))

    ops: list[CollectiveOp] = []
    computation = ""
    for raw in lines:
        line = raw.strip()
        header = _COMPUTATION_HEADER_RE.match(raw)
        if header and not raw.startswith(" "):
            computation = header.group(1)
        for kind in _COLLECTIVE_KINDS:
            # match ` all-reduce(` and ` all-reduce-start(`; skip `-done`
            m = re.search(rf"(?:=|^)\s*(.*?)\s{kind}(-start)?\(", line)
            if m is None or f"{kind}-done" in line:
                continue
            lhs = m.group(1)
            # lhs is `%name = <shape>`-stripped already by the regex group;
            # guard against matches inside metadata strings
            if "metadata=" in lhs or "op_name" in lhs:
                continue
            payload = _shape_bytes(lhs)
            if payload == 0:
                continue
            ops.append(
                CollectiveOp(
                    kind, payload, _group_size(line), line[:400],
                    computation=computation,
                    in_loop=computation in loop_comps,
                )
            )
            break
    return ops


@dataclass
class CommReport:
    """Aggregated communication profile of one compiled step."""

    ops: list[CollectiveOp] = field(default_factory=list)

    @property
    def by_kind(self) -> dict[str, dict[str, float]]:
        out: dict[str, dict[str, float]] = {}
        for op in self.ops:
            d = out.setdefault(
                op.kind, {"count": 0, "payload_bytes": 0, "ring_bytes_per_chip": 0.0}
            )
            d["count"] += 1
            d["payload_bytes"] += op.payload_bytes
            d["ring_bytes_per_chip"] += op.ring_bytes_per_chip
        return out

    @property
    def total_ring_bytes_per_chip(self) -> float:
        return sum(op.ring_bytes_per_chip for op in self.ops)

    def bytes_for(self, kind: str, min_payload: int = 0) -> int:
        return sum(
            op.payload_bytes
            for op in self.ops
            if op.kind == kind and op.payload_bytes >= min_payload
        )

    def count_for(self, kind: str, min_payload: int = 0) -> int:
        return sum(
            1
            for op in self.ops
            if op.kind == kind and op.payload_bytes >= min_payload
        )

    @property
    def loop_ops(self) -> list[CollectiveOp]:
        """Collectives inside while/scan bodies — these execute once per
        loop iteration (e.g. per grad-accum microbatch)."""
        return [op for op in self.ops if op.in_loop]

    def summary(self) -> dict[str, Any]:
        return {
            "by_kind": self.by_kind,
            "total_payload_bytes": sum(op.payload_bytes for op in self.ops),
            "total_ring_bytes_per_chip": self.total_ring_bytes_per_chip,
            "loop_collectives": len(self.loop_ops),
            "loop_payload_bytes": sum(op.payload_bytes for op in self.loop_ops),
        }


def comm_report(compiled: Any) -> CommReport:
    """CommReport for a ``jax.stages.Compiled`` (or raw HLO text)."""
    text = compiled if isinstance(compiled, str) else compiled.as_text()
    return CommReport(parse_collectives(text))


def tree_bytes(tree: Any) -> int:
    """Total byte size of a pytree's array leaves (grad-volume yardstick)."""
    import jax
    import numpy as np

    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        shape = getattr(leaf, "shape", None)
        dtype = getattr(leaf, "dtype", None)
        if shape is None or dtype is None:
            continue
        total += int(np.prod(shape, dtype=np.int64)) * np.dtype(dtype).itemsize
    return total
