"""Collective-traffic accounting from compiled HLO.

The reference proves Herald's communication win by logging PS bytes on the
wire (`PSAgent.h:478-483` startRecord + `examples/ctr/tests/run.sh` A/B).
The XLA equivalent: the per-step all-to-all/all-reduce buffers are static
shapes in the *compiled* program, so the exact bytes a step moves can be
read off the optimized HLO — no sampling, no counters, no host overhead.

`collective_bytes(jitted_fn, *args)` lowers + compiles the function and
returns total result-buffer bytes per collective kind for ONE call. Use it
on single-step functions (a scanned epoch would execute its body K times;
loop trip counts are not multiplied in).

Byte convention: the full per-device result buffer of each collective op.
For all-to-all, (S-1)/S of that actually crosses links; for all-reduce the
wire cost depends on the algorithm. Both A/B sides use the same convention,
so reductions are exact; absolute link-bytes need the (S-1)/S factor.
"""

from __future__ import annotations

import re
from typing import Dict

# dtype byte widths as HLO spells them
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s4": 1, "u4": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_COLLECTIVES = (
    "all-to-all", "all-reduce", "all-gather", "reduce-scatter",
    "collective-permute", "collective-broadcast",
)

# one array shape, e.g. f32[8,64,128] or pred[] or bf16[16]{0}
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def parse_collective_bytes(hlo_text: str) -> Dict[str, int]:
    """Sum result-shape bytes of every collective op definition.

    Handles scalar, array, and tuple results; `all-to-all` on CPU compiles
    to a tuple of per-peer blocks whose total equals the full buffer.
    Counts each op once — `start/done` async pairs (TPU) are collapsed by
    counting only the `-start` half when both forms appear.
    """
    out: Dict[str, int] = {k: 0 for k in _COLLECTIVES}
    out["count"] = {}  # type: ignore[assignment]
    counts: Dict[str, int] = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        # an op definition looks like:  %name = <shape> opcode(...)
        m = re.match(r"%?[\w.\-]+\s*=\s*(.+?)\s+([a-z\-]+)\(", line)
        if not m:
            continue
        result, opcode = m.groups()
        if opcode.endswith("-done"):
            continue  # async pair: bytes counted at the -start half
        if opcode.endswith("-start"):
            opcode = opcode[: -len("-start")]
        if opcode not in _COLLECTIVES:
            continue
        total = sum(_shape_bytes(dt, dims)
                    for dt, dims in _SHAPE_RE.findall(result))
        out[opcode] += total
        counts[opcode] = counts.get(opcode, 0) + 1
    out["count"] = counts  # type: ignore[assignment]
    return out


def compiled_text(jitted_fn, *args, **kwargs) -> str:
    """Optimized (post-SPMD-partitioning) HLO of one call."""
    return jitted_fn.lower(*args, **kwargs).compile().as_text()


def collective_bytes(jitted_fn, *args, **kwargs) -> Dict[str, int]:
    """Per-call collective buffer bytes of a compiled jitted function."""
    return parse_collective_bytes(compiled_text(jitted_fn, *args, **kwargs))


def exchange_a2a_bytes(spec, id_bytes: int = 4, vec_bytes: int = 4,
                       directions: int = 2) -> int:
    """Analytic all-to-all bytes of one `route_ids` + data exchange on an
    ExchangeSpec: the id buffer [S, C] plus `directions` data buffers
    [S, C, W] (1 = gather-only or scatter-only, 2 = both). `vec_bytes` is
    width * dtype-size. Tests pin `collective_bytes` to this model."""
    S, C = spec.num_shards, spec.capacity
    return S * C * id_bytes + directions * S * C * vec_bytes
