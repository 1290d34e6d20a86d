"""ELL (dense-neighbor) edge format: scatter-free aggregation for
bounded-degree graphs.

The CSR Pallas kernels (``ops/pallas/fused_mma.py``) express the in-block
"scatter" as a one-hot MXU contraction whose cost is ``O(E · block_r · C)``
— independent of the actual degree. For graphs with a *small bounded*
in-degree (ZINC molecules: max in-degree ≤ 4,
``/root/reference/graph_regression/mma.py:57-60``; fanout-bounded sampled
subgraphs: in-degree ≤ its hop's fanout) that work is almost entirely
wasted. The ELL view instead assigns every node a fixed budget of ``W``
neighbor *slots*. Because edges are dst-sorted with contiguous per-node
runs (architecture invariant), slot ``(i, d)`` simply reads edge
``row_ptr[i] + d`` — the mapping between real edges and valid slots is a
*bijection*, so **both** directions of the data movement are plain XLA
gathers (never a scatter):

- expand:   ``x_slot[i, d] = x_edge[row_ptr[i] + d]``      (valid slots)
- collapse: ``x_edge[e]   = x_slot[dst_e, e − row_ptr[dst_e]]``

and every segment reduction becomes a masked reduce over the slot axis —
pure VPU work XLA fuses with the surrounding elementwise math. No one-hot
contraction, no doubling scan, no Pallas launch, and the min/max backward
is a three-op mask chain instead of a kernel.

Layout (measured, TPU v5e, ZINC bench shapes): slot arrays are 2-D
``(rows, W·C)`` — slot ``d`` owns lanes ``[d·C, (d+1)·C)`` — NEVER 3-D
``(rows, W, C)``: with W < 8 the (W, C) minor dims tile at (8, 128) and
waste up to 2× of every tensor in sublane padding (W=4 and W=8 measured
identical); the 2-D form reduced the min/max routing pass from 4.2 ms to
2.0 ms and the full fused unit's backward from 8.5 ms to 1.3 ms (vs the
Pallas kernel's 1.9 ms). The ``(rows·W, C)`` ↔ ``(rows, W·C)`` reshape is
free (row-major), so the collapse gather consumes the 2-D form directly;
slot cotangents are collapsed in bf16 (1.5 ms vs 2.4 ms f32 — the gather
is row-issue-bound, narrower rows help).

Degree *buckets* generalize the single width: an :class:`EllSpec` holds
contiguous row ranges with one width each (sampled subgraphs: nodes are
ordered by hop and hop ``k``'s in-degree is bounded by ``fanouts[k]``;
leaves get no slots at all). Slot inflation is ``Σ_b rows_b · W_b / E`` —
~2× for ZINC at W=4, ~1.1× for per-hop-bucketed sampled graphs — versus
the ~8×+ MXU overhead of the one-hot contraction at ``block_r=128``.

Correctness contract: each range's width must be ≥ the max in-degree of
its rows (edges past the budget would silently be dropped — same
contract as ``max_degree_hint``). ``validate_spec`` checks it host-side.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mma_tpu.graph.container import Graph

_NEUTRAL = {"min": jnp.inf, "max": -jnp.inf}


@dataclasses.dataclass(frozen=True)
class EllSpec:
    """Static degree-bucket layout: row range ``[start_b, bounds[b])`` has
    ``widths[b]`` neighbor slots per node; rows ≥ ``bounds[-1]`` have no
    slots (known-leaf / padding rows)."""

    bounds: Tuple[int, ...]
    widths: Tuple[int, ...]

    def __post_init__(self):
        assert len(self.bounds) == len(self.widths) >= 1
        prev = 0
        for b in self.bounds:
            assert b > prev, (self.bounds,)
            prev = b

    @property
    def starts(self) -> Tuple[int, ...]:
        return (0,) + self.bounds[:-1]

    @property
    def rows(self) -> Tuple[int, ...]:
        return tuple(e - s for s, e in zip(self.starts, self.bounds))

    @classmethod
    def from_hint(cls, ell_hint) -> "EllSpec":
        return cls(
            bounds=tuple(b for b, _ in ell_hint),
            widths=tuple(w for _, w in ell_hint),
        )


def single_width_spec(n_rows: int, width: int) -> EllSpec:
    return EllSpec(bounds=(int(n_rows),), widths=(int(width),))


def validate_spec(graph: Graph, spec: EllSpec) -> None:
    """Host-side check that every row's real in-degree fits its bucket
    width (and rows beyond the last bound have no real in-edges)."""
    deg = np.asarray(graph.deg)
    rp = np.asarray(graph.row_ptr)
    run = np.diff(rp) * np.asarray(graph.node_mask)
    for s, e, w in zip(spec.starts, spec.bounds, spec.widths):
        worst = run[s:e].max(initial=0)
        if worst > w:
            raise ValueError(
                f"ELL bucket rows [{s}, {e}) width {w} < max in-degree "
                f"{int(worst)}"
            )
    if spec.bounds[-1] < deg.shape[0]:
        tail = run[spec.bounds[-1]:].max(initial=0)
        if tail > 0:
            raise ValueError(
                f"rows ≥ {spec.bounds[-1]} have in-edges (max run "
                f"{int(tail)}) but no ELL slots"
            )


def max_indegree(graph: Graph) -> int:
    """Host-side max real in-degree (for building single-width specs)."""
    return int(np.asarray(graph.deg).max(initial=0.0))


def _bucket_ids(graph: Graph, spec: EllSpec):
    """Per bucket: (clipped edge ids (R_b, W_b) int32, valid (R_b, W_b)).

    Slot validity comes from the CSR *run length* (``row_ptr`` diff), not
    ``deg``: sampled subgraphs overwrite ``deg`` with full-graph degrees
    (``data/sampling.py`` — the unbiased-mean estimator) while their edge
    runs hold only the sampled edges. Real rows' runs contain only real
    edges (padding edges all sit in the padding node's run, which
    ``node_mask`` excludes)."""
    e = graph.n_edge
    out = []
    for s, b, w in zip(spec.starts, spec.bounds, spec.widths):
        base = graph.row_ptr[s:b]
        run = graph.row_ptr[s + 1 : b + 1] - base
        d_iota = jnp.arange(w, dtype=jnp.int32)[None, :]
        ids = jnp.minimum(base[:, None] + d_iota, e - 1)
        valid = (d_iota < run[:, None]) & graph.node_mask[s:b, None]
        out.append((ids, valid))
    return out


def ell_valid(graph: Graph, spec: EllSpec):
    """Per-bucket (R_b, W_b) bool slot-validity masks."""
    return tuple(v for _, v in _bucket_ids(graph, spec))


def _slot_of_edge(graph: Graph, spec: EllSpec):
    """(slot (E,) int32 into the flat concatenated (Σ R_b·W_b, C) slot
    array, ok (E,) bool) — the inverse of the slot→edge map, for
    collapsing slot-space cotangents back to compact edge order. Edges
    whose dst row has no slot budget (padding edges; over-width edges —
    a contract violation) get ok=False."""
    e = graph.n_edge
    rank = jnp.arange(e, dtype=jnp.int32) - graph.row_ptr[graph.dst]
    slot = jnp.zeros(e, jnp.int32)
    ok = jnp.zeros(e, bool)
    off = 0
    for s, b, w in zip(spec.starts, spec.bounds, spec.widths):
        in_b = (graph.dst >= s) & (graph.dst < b) & (rank < w)
        slot = jnp.where(in_b, off + (graph.dst - s) * w + rank, slot)
        ok = ok | in_b
        off += (b - s) * w
    ok = ok & graph.edge_mask
    return slot, ok


def _collapse(flat: jnp.ndarray, graph: Graph, spec: EllSpec,
              out_dtype) -> jnp.ndarray:
    """(Σ R_b·W_b, C) flat slot values → compact (E, C) edge values
    (padding / over-width edges → 0). Narrow the rows BEFORE the gather
    — it is row-issue-bound, and bf16 rows run ~1.6× faster."""
    slot, ok = _slot_of_edge(graph, spec)
    flat = flat.astype(out_dtype)
    return jnp.where(
        ok[:, None], flat[jnp.clip(slot, 0, flat.shape[0] - 1)], 0
    )


def _pad_gather_table(tab: jnp.ndarray):
    """Pad a gather table's lanes to a 128 multiple and materialize it.

    XLA's row gather runs ~2-5× faster on 128-lane-multiple rows (e.g.
    512-byte bf16-256 / f32-128 rows) than on odd widths — the width-192
    f32 gather measured ~50 GB/s vs ~236 GB/s at width 128 (see
    ``ops/spmm.py`` / the lean kernel notes). The pad must be
    materialized BEFORE the gather (a fused pad+gather lowers to the
    slow narrow-row path). Returns (padded table, original lane count).
    """
    c = tab.shape[1]
    c_pad = -(-c // 128) * 128
    if c_pad == c:
        return tab, c
    tab = jnp.pad(tab, ((0, 0), (0, c_pad - c)))
    return jax.lax.optimization_barrier(tab), c


def ell_expand(edge_data: jnp.ndarray, graph: Graph, spec: EllSpec):
    """Expand compact dst-sorted edge data (E, C) into per-bucket dense
    2-D slot blocks ``(R_b, W_b·C)`` (slot ``d`` owns lanes
    ``[d·C, (d+1)·C)``).

    Invalid slots hold arbitrary (clip-gathered) rows — callers MUST mask
    them (``ell_valid``) before any reduction so their cotangents are
    zero. Under that contract the custom VJP is the exact adjoint: the
    slot↔edge bijection makes the transpose a single gather back to
    compact edge order (padding edges get zero), never an XLA scatter.
    """
    assert edge_data.ndim == 2 and edge_data.shape[0] == graph.n_edge
    c = edge_data.shape[1]

    def _run(d):
        tab, _ = _pad_gather_table(d)
        out = []
        for ids, _v in _bucket_ids(graph, spec):
            got = tab[ids.reshape(-1)][:, :c]  # lane slice fuses downstream
            out.append(got.reshape(ids.shape[0], ids.shape[1] * c))
        return tuple(out)

    @jax.custom_vjp
    def _op(d):
        return _run(d)

    def _fwd(d):
        # graph rides through residuals, not the closure (inside
        # shard_map its leaves are tracers; a closure capture would leak
        # them into the later backward trace).
        return _run(d), graph

    def _bwd(g, cts):
        flat = jnp.concatenate(
            [ct.reshape(-1, c) for ct in cts], axis=0
        )
        return (_collapse(flat, g, spec, edge_data.dtype),)

    _op.defvjp(_fwd, _bwd)
    return _op(edge_data)


def ell_collapse(slot_data: Sequence[jnp.ndarray], graph: Graph,
                 spec: EllSpec, channels: int) -> jnp.ndarray:
    """Inverse of :func:`ell_expand` on values: per-bucket (R_b, W_b·C)
    slot data → compact (E, C) edge data. Not differentiable
    (backward-path machinery)."""
    flat = jnp.concatenate(
        [s.reshape(-1, channels) for s in slot_data], axis=0
    )
    return _collapse(flat, graph, spec, flat.dtype)


def ell_gather_nodes_by_src(x: jnp.ndarray, graph: Graph, spec: EllSpec):
    """Per-slot source-node rows: bucket arrays ``(R_b, W_b·C)`` with
    slot ``d``'s lanes holding ``x[src[row_ptr[i] + d]]``.

    The forward is a gather-of-gather (slot → edge id → src node row)
    that XLA fuses into one gather. The VJP is a src-keyed segment sum
    of the slot cotangents — collapsed to compact edge order (bijective
    gather) and reduced through the sorted CSC Pallas kernel, never an
    XLA scatter. Falls back to ``jax.ops.segment_sum`` when the graph
    carries no CSC view.

    Contract (as :func:`ell_expand`): invalid slots hold arbitrary rows —
    callers must mask them before any reduction.
    """
    assert x.ndim == 2 and x.shape[0] == graph.n_node
    c = x.shape[1]

    def _run(x_):
        tab, _ = _pad_gather_table(x_)
        out = []
        for ids, _v in _bucket_ids(graph, spec):
            got = tab[graph.src[ids.reshape(-1)]][:, :c]
            out.append(got.reshape(ids.shape[0], ids.shape[1] * c))
        return tuple(out)

    @jax.custom_vjp
    def _op(x_):
        return _run(x_)

    def _fwd(x_):
        return _run(x_), graph  # graph via residuals (shard_map safety)

    def _bwd(g, cts):
        flat = jnp.concatenate(
            [ct.reshape(-1, c) for ct in cts], axis=0
        )
        if g.col_ptr is not None and g.src_perm is not None:
            # Collapse straight INTO CSC edge order: compose the
            # slot→edge map with the CSC permutation (one int32 gather)
            # so the wide row data crosses HBM once — row gathers are
            # issue-rate bound (~20-26 ns/row regardless of width), and
            # the separate collapse → permute → reduce chain costs two
            # extra full row passes.
            from mma_tpu.ops.pallas.fused_mma import fused_segment_sum_csc

            slot, ok = _slot_of_edge(g, spec)
            slot_csc = slot[g.src_perm]
            ok_csc = ok[g.src_perm]
            flat = flat.astype(x.dtype)
            ct_csc = jnp.where(
                ok_csc[:, None],
                flat[jnp.clip(slot_csc, 0, flat.shape[0] - 1)],
                0,
            )
            dx = fused_segment_sum_csc(ct_csc, g)
        else:
            ct_e = _collapse(flat, g, spec, x.dtype)
            dx = jax.ops.segment_sum(
                ct_e.astype(jnp.float32), g.src, g.n_node
            )
        return (dx.astype(x.dtype),)

    _op.defvjp(_fwd, _bwd)
    return _op(x)


def ell_expand_exact(edge_data: jnp.ndarray, spec: EllSpec):
    """Degree-EXACT slot expand: per-bucket ``(R_b, W_b·C)`` views of the
    compact edge stream by pure reshape — valid only for
    ``Graph.ell_exact`` layouts, where the flat slot index equals the
    dst-sorted edge index (every bucket row has exactly ``W_b`` edges).
    No gather forward, no gather backward (the VJP of contiguous slices
    is reassembly); contrast :func:`ell_expand`'s bijective gathers.
    """
    c = edge_data.shape[1]
    out, off = [], 0
    for r, w in zip(spec.rows, spec.widths):
        out.append(edge_data[off : off + r * w].reshape(r, w * c))
        off += r * w
    return tuple(out)


def slot_slices(x2: jnp.ndarray, w: int):
    """The W per-slot (rows, C) lane slices of a (rows, W·C) block."""
    c = x2.shape[1] // w
    return [x2[:, d * c : (d + 1) * c] for d in range(w)]


def masked_slot_sum(x2: jnp.ndarray, valid, w: int) -> jnp.ndarray:
    """Masked sum over the slot axis: (R, W·C) → (R, C). Natural VJP
    (broadcast × mask) is exact; no custom rule needed. ``valid=None``
    means every slot is valid (degree-exact layouts) and skips the
    mask selects entirely."""
    acc = None
    for d, xd in enumerate(slot_slices(x2, w)):
        xd = xd.astype(jnp.float32)  # bf16 slot streams accumulate in f32
        term = xd if valid is None else jnp.where(valid[:, d : d + 1], xd, 0.0)
        acc = term if acc is None else acc + term
    return acc


def masked_minmax_firsthit(x2: jnp.ndarray, valid,
                           ops: Tuple[str, ...], w: int):
    """Per-op masked reduce over the slot axis of ``x2`` (R, W·C) with
    the reference's subgradient: each (row, channel, op) cotangent routes
    to the FIRST valid slot whose value equals the optimum —
    torch_scatter's argmin/argmax semantics (matches the Pallas kernels'
    routing; slots are in CSR order = src-ascending, the same tie order
    the reference iterates). Returns one (R, C) array per op; empty rows
    yield the op's neutral (±inf) for the caller's degree select.

    The backward is a W-step unrolled scan of fused (R, C) elementwise
    ops — measured 1.3 ms vs the Pallas min/max backward kernel's 1.9 ms
    on the ZINC bench shapes, with x2 as the only residual.

    ``valid=None`` means every slot is valid (degree-exact layouts):
    the per-slot mask selects drop out of both passes.
    """
    assert all(o in ("min", "max") for o in ops) and len(ops) >= 1
    c = x2.shape[1] // w

    def _run(x_):
        outs = []
        for op in ops:
            red = jnp.minimum if op == "min" else jnp.maximum
            acc = jnp.full((x_.shape[0], c), _NEUTRAL[op], x_.dtype)
            for d in range(w):
                xd = x_[:, d * c : (d + 1) * c]
                if valid is None:
                    acc = red(acc, xd)
                else:
                    acc = jnp.where(valid[:, d : d + 1], red(acc, xd), acc)
            outs.append(acc)
        return tuple(outs)

    @jax.custom_vjp
    def _op(x_):
        return _run(x_)

    def _fwd(x_):
        outs = _run(x_)
        return outs, (x_, outs)

    def _bwd(res, cts):
        x_, outs = res
        taken = [jnp.zeros((x_.shape[0], c), bool) for _ in ops]
        dx_parts = []
        for d in range(w):
            xd = x_[:, d * c : (d + 1) * c]
            dxd = jnp.zeros((x_.shape[0], c), x_.dtype)
            for pi, (out, ct) in enumerate(zip(outs, cts)):
                hit = xd == out
                if valid is not None:
                    hit = hit & valid[:, d : d + 1]
                dxd = dxd + jnp.where(hit & ~taken[pi], ct, 0.0)
                taken[pi] = taken[pi] | hit
            dx_parts.append(dxd)
        return (jnp.concatenate(dx_parts, axis=1),)

    _op.defvjp(_fwd, _bwd)
    return _op(x2)


def pad_rows(x: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Zero-pad a (R, C) per-bucket-concat result back to (n_rows, C)."""
    if x.shape[0] == n_rows:
        return x
    return jnp.pad(x, ((0, n_rows - x.shape[0]), (0, 0)))
