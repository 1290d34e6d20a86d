"""MultiMaskConv — the graph-regression MMA convolution, TPU-shaped.

Re-designs ``graph_regression/mma_conv.py:20-201`` (a PyG
``MessagePassing`` subclass driven by ``torch_scatter``) without any
message-passing machinery: messages are built from per-*node* and
per-*edge-attribute* MXU projections gathered per edge, then reduced with
sorted segment ops.

Message decomposition: the reference's per-edge pre-NN
``Linear([x_i ‖ x_j ‖ e])`` (``mma_conv.py:143-156``) splits as
``x@W_dst`` and ``x@W_src`` computed once per node per tower, plus
``e@W_edge`` per edge — ``O((2N+E)·F²·T)`` instead of ``O(E·3F²·T)``
FLOPs, and no ``(E, T, 3F)`` concat tensor is ever materialized.

Parity knobs (SURVEY §5):

- **N6** — the reference's ``message`` loop overwrites ``hs``, so all K
  scatter-reduces consume the *last* aggregator's pre-NN output
  (``mma_conv.py:150-156``). ``parity=True`` reproduces this;
  ``parity=False`` gives each aggregator its own message.
- **N7** — the pre-NNs live in plain dicts invisible to the optimizer, so
  their parameters stay at random init (``mma_conv.py:84-86``,
  ``mask_aggr.py:44-51``). ``parity=True`` applies ``stop_gradient`` to
  the pre-NN parameters.
- **N8** — only bare ``sum/mean/min/max`` (+ ``var``/``std``) reach the
  scatter; suffixed names raise, as in the reference (``mma_conv.py:165``).
- **N9** — scalers compound (``out`` is reassigned across the scaler loop,
  ``mma_conv.py:181-195``): with ``identity,amplification,linear`` the
  concatenated outputs are ``[m, m·amp, m·amp·lin]``. ``parity=False``
  applies each scaler to the raw aggregate independently.
- **N2** — message dropout (0.5, hardcoded ``mma_conv.py:67``) has no
  ``training=`` flag; active whenever the caller passes ``rng``.
- Empty-segment fill: ``torch_scatter`` yields 0 for isolated nodes for
  every reduce type; reproduced for min/max via a degree-0 select.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mma_tpu.graph.container import Graph
from mma_tpu.nn.layers import Dense, dropout
from mma_tpu.ops.segment import segment_max, segment_min, segment_sum

GR_AGGREGATORS = ("sum", "mean", "min", "max", "var", "std")
GR_SCALERS = ("identity", "amplification", "attenuation", "linear", "inverse_linear")


def compute_avg_deg(deg_hist: jnp.ndarray, *, parity: bool = True) -> Dict[str, float]:
    """Degree statistics feeding the scalers.

    ``parity=True`` replicates the reference's statistics-over-histogram-
    *counts* (``mma_conv.py:73-78``: ``deg.mean()`` etc. where ``deg`` is
    the bincount vector). ``parity=False`` computes the intended
    statistics over the node degree distribution.
    """
    h = jnp.asarray(deg_hist, jnp.float32)
    if parity:
        return {
            "lin": float(h.mean()),
            "log": float(jnp.log(h + 1).mean()),
            "exp": float(jnp.exp(h).mean()),
        }
    degrees = jnp.arange(h.shape[0], dtype=jnp.float32)
    n = jnp.maximum(h.sum(), 1.0)
    return {
        "lin": float((degrees * h).sum() / n),
        "log": float((jnp.log(degrees + 1) * h).sum() / n),
        "exp": float((jnp.exp(degrees) * h).sum() / n),
    }


def _check_aggregator(name: str) -> None:
    if name not in GR_AGGREGATORS:
        raise ValueError(f'Unknown aggregator "{name}".')


@dataclasses.dataclass(frozen=True)
class MultiMaskConv:
    in_channels: int
    out_channels: int
    aggregators: Tuple[str, ...]
    scalers: Tuple[str, ...]
    avg_deg: Tuple[Tuple[str, float], ...]  # hashable dict of degree stats
    edge_dim: Optional[int] = None
    towers: int = 1
    pre_layers: int = 1
    post_layers: int = 1
    divide_input: bool = False
    dropout_rate: float = 0.5  # hardcoded in the reference (mma_conv.py:67)
    parity: bool = True
    # Edge-pipeline compute dtype ("float32" | "bfloat16" | "auto"):
    # message build and segment reduces run in this dtype (halves edge
    # HBM traffic); node-level stages (scalers, post-NNs, lin) stay
    # float32. "auto" resolves per platform at trace time
    # (mma_tpu.autotune: bf16 on TPU, f32 elsewhere).
    compute_dtype: str = "float32"
    # Static upper bound on node in-degree (dataset metadata; ZINC ≤ 4).
    # Caps the fused min/max kernel's scan depth (``fused_segment_minmax``)
    # and sets the ELL slot width (``edge_format``). None = no cap.
    max_degree_hint: Optional[int] = None
    # Edge-layout selection ("auto" | "csr" | "ell"):
    # - "ell": dense-neighbor slots (``mma_tpu.ops.ell``) — every segment
    #   reduce becomes a masked reduce over a (rows, W·C) slot-lane
    #   layout, all scatter-free XLA; requires ``max_degree_hint`` (or a
    #   graph-attached ``ell_hint``). Unlike the CSR kernels it supports
    #   N2 dropout and var/std without demotion.
    # - "csr": the fused Pallas CSR kernels (one-hot MXU contraction) —
    #   measured fastest for the dense flagship shapes (ZINC bench:
    #   train 33.9 ms vs 39.6 ms ELL at W=4).
    # - "auto": ELL when the graph carries a structural bucket layout
    #   (``ell_hint`` — per-hop sampled subgraphs, where the CSR fused
    #   path would demote on mask dropout), else CSR.
    edge_format: str = "auto"

    def __post_init__(self):
        for a in self.aggregators:
            _check_aggregator(a)
        for s in self.scalers:
            if s not in GR_SCALERS:
                raise ValueError(f'Unknown scaler "{s}".')
        if self.edge_format not in ("auto", "csr", "ell"):
            raise ValueError(f'Unknown edge_format "{self.edge_format}".')
        if self.divide_input:
            assert self.in_channels % self.towers == 0
        assert self.out_channels % self.towers == 0

    @property
    def f_in(self) -> int:
        return self.in_channels // self.towers if self.divide_input else self.in_channels

    @property
    def f_out(self) -> int:
        return self.out_channels // self.towers

    @property
    def _msg_in(self) -> int:
        return (3 if self.edge_dim is not None else 2) * self.f_in

    def init(self, key):
        t, f, k = self.towers, self.f_in, len(self.aggregators)
        keys = jax.random.split(key, 6)
        params = {}
        if self.edge_dim is not None:
            params["edge_encoder"] = Dense(self.edge_dim, f).init(keys[0])

        # pre-NNs: (K aggregators) × (T towers) × pre_layers dense layers.
        def init_pre(kk):
            lk = jax.random.split(kk, self.pre_layers)
            layers = [Dense(self._msg_in, f).init(lk[0])]
            for i in range(1, self.pre_layers):
                layers.append(Dense(f, f).init(lk[i]))
            return layers
        params["pre_nns"] = [
            [init_pre(tk) for tk in jax.random.split(ak, t)]
            for ak in jax.random.split(keys[1], k)
        ]

        post_in = (k * len(self.scalers) + 1) * f
        def init_post(kk):
            lk = jax.random.split(kk, self.post_layers)
            layers = [Dense(post_in, self.f_out).init(lk[0])]
            for i in range(1, self.post_layers):
                layers.append(Dense(self.f_out, self.f_out).init(lk[i]))
            return layers
        post_keys = jax.random.split(keys[2], t)
        params["post_nns"] = [init_post(post_keys[ti]) for ti in range(t)]

        params["lin"] = Dense(self.out_channels, self.out_channels).init(keys[3])
        return params

    # ---- messages ------------------------------------------------------

    def _pre_nn_apply(self, layer_params, h):
        """Apply one pre-NN stack to (..., msg_in)."""
        out = h @ layer_params[0]["w"] + layer_params[0]["b"]
        for lp in layer_params[1:]:
            out = jax.nn.relu(out) @ lp["w"] + lp["b"]
        return out

    def _messages_for_aggregator(self, pre_params_k, x_flat, e_feat,
                                 graph: Graph, use_pallas: bool = False):
        """Messages for one aggregator's pre-NNs, flat ``(E, T·F)``.

        ``x_flat``: (N, T·F) per-tower node features (tower-major lane
        blocks). Edge tensors stay flat — a ``(E, T, F)`` layout has
        (T, F) minor dims far below the native (8, 128) tile. The first
        pre-NN layer's weight (msg_in, F) splits into dst/src/edge blocks
        applied per node / per edge-attribute before gathering.

        ``use_pallas``: route the node-projection gathers through
        custom-VJP wrappers whose transposes are sorted Pallas
        segment-sums (CSR for dst, CSC for src) instead of XLA's
        serialized scatter-add.
        """
        f, t = self.f_in, self.towers
        from mma_tpu.autotune import resolve_compute_dtype
        cdt = jnp.dtype(resolve_compute_dtype(self.compute_dtype))
        x_flat = x_flat.astype(cdt)
        if e_feat is not None:
            e_feat = e_feat.astype(cdt)
        # Stack all towers' first-layer weights: (T, msg_in, F).
        w0 = jnp.stack([pre_params_k[ti][0]["w"] for ti in range(t)]).astype(cdt)
        b0 = jnp.concatenate(
            [pre_params_k[ti][0]["b"] for ti in range(t)]
        ).astype(cdt)
        if self.divide_input:
            p_dst = jnp.einsum(
                "ntf,tfg->ntg", x_flat.reshape(-1, t, f), w0[:, :f, :]
            ).reshape(-1, t * f)
            p_src = jnp.einsum(
                "ntf,tfg->ntg", x_flat.reshape(-1, t, f), w0[:, f : 2 * f, :]
            ).reshape(-1, t * f)
        else:
            x1 = x_flat[:, :f]  # towers share features
            p_dst = x1 @ w0[:, :f, :].transpose(1, 0, 2).reshape(f, t * f)
            p_src = x1 @ w0[:, f : 2 * f, :].transpose(1, 0, 2).reshape(f, t * f)
        if use_pallas:
            from mma_tpu.ops.gather import gather_by_dst, gather_by_src

            msg = gather_by_dst(p_dst, graph) + gather_by_src(p_src, graph) + b0
        else:
            msg = p_dst[graph.dst] + p_src[graph.src] + b0
        if self.edge_dim is not None:
            w_e = w0[:, 2 * f :, :].transpose(1, 0, 2).reshape(f, t * f)
            msg = msg + e_feat @ w_e
        if self.pre_layers > 1:
            msg = self._deep_pre(pre_params_k, msg, cdt)
        return msg  # (E, T·F)

    def _message_parts(self, pre_params_k, x_flat, e_feat, graph: Graph):
        """Split message build for the fused min/max edge program:
        returns ``(p_dst, hg)`` with ``msg_e = p_dst[dst_e] + hg_e`` —
        the dst-side projection stays NODE-level (selected in-kernel
        from the block-resident rows; the (E, T·F) message tensor never
        reaches HBM) and ``hg = p_src[src] + b0 (+ e @ W_e)`` is one XLA
        fusion over the edge dim. Requires ``pre_layers == 1`` (deeper
        pre-NNs act on the combined message)."""
        from mma_tpu.ops.gather import gather_by_src

        f, t = self.f_in, self.towers
        from mma_tpu.autotune import resolve_compute_dtype
        cdt = jnp.dtype(resolve_compute_dtype(self.compute_dtype))
        x_flat = x_flat.astype(cdt)
        w0 = jnp.stack([pre_params_k[ti][0]["w"] for ti in range(t)]).astype(cdt)
        b0 = jnp.concatenate(
            [pre_params_k[ti][0]["b"] for ti in range(t)]
        ).astype(cdt)
        if self.divide_input:
            xt = x_flat.reshape(-1, t, f)
            p_dst = jnp.einsum("ntf,tfg->ntg", xt, w0[:, :f, :]).reshape(-1, t * f)
            p_src = jnp.einsum(
                "ntf,tfg->ntg", xt, w0[:, f : 2 * f, :]
            ).reshape(-1, t * f)
        else:
            x1 = x_flat[:, :f]
            p_dst = x1 @ w0[:, :f, :].transpose(1, 0, 2).reshape(f, t * f)
            p_src = x1 @ w0[:, f : 2 * f, :].transpose(1, 0, 2).reshape(f, t * f)
        hg = gather_by_src(p_src, graph) + b0
        if self.edge_dim is not None:
            w_e = w0[:, 2 * f :, :].transpose(1, 0, 2).reshape(f, t * f)
            hg = hg + e_feat.astype(cdt) @ w_e
        return p_dst, hg

    def _deep_pre(self, pre_params_k, msg, cdt):
        # Deeper pre-NNs are per-tower (rare; reference uses 1 layer).
        f, t = self.f_in, self.towers
        parts = []
        for ti in range(t):
            m = msg[:, ti * f : (ti + 1) * f]
            for lp in pre_params_k[ti][1:]:
                m = jax.nn.relu(m) @ lp["w"].astype(cdt) + lp["b"].astype(cdt)
            parts.append(m)
        return jnp.concatenate(parts, axis=1)  # (E, T·F)

    # ---- ELL (dense-neighbor) path -------------------------------------

    def _ell_spec(self, graph: Graph, use_pallas: bool, axis_name):
        """Resolve the ELL slot layout for this (conv, graph) pair, or
        ``None`` to take the CSR paths. Sharded graphs (no chunk_hint)
        and deep pre-NNs are CSR-only."""
        if (axis_name is not None or self.pre_layers != 1
                or self.edge_format == "csr"):
            return None
        # Degree-exact graphs null chunk_hint (they break the CSR
        # kernels' padding-edge invariant) but ARE complete unsharded
        # layouts; anything else without chunk_hint is a sharded slice.
        if graph.chunk_hint is None and not graph.ell_exact:
            return None
        from mma_tpu.ops.ell import EllSpec, single_width_spec

        if not (use_pallas or self.edge_format == "ell"):
            return None  # use_pallas=False keeps the plain-XLA reference path
        if graph.ell_hint is not None:
            # Graph-attached degree buckets (e.g. per-hop sampled layout).
            return EllSpec.from_hint(graph.ell_hint)
        if self.edge_format == "ell" and self.max_degree_hint is not None:
            return single_width_spec(graph.n_node, self.max_degree_hint)
        return None

    def _ell_forward(self, params, pre_nns, x_flat, e_feat, graph: Graph,
                     rng, deg, spec):
        """Forward through the ELL layout: message build + N2 dropout +
        all K reductions as masked reduces over the dense slot axis —
        scatter-free in both directions (``mma_tpu.ops.ell``). Replaces
        the reference's message + ``torch_scatter`` pair
        (``graph_regression/mma_conv.py:138-176``) for bounded-degree
        graphs."""
        from mma_tpu.ops.ell import ell_expand, ell_expand_exact, ell_valid

        # Degree-exact layouts: every slot is structurally valid (bucket
        # padding rows carry synthetic edges), expand is a reshape, and
        # only the node-level output mask is needed at the end.
        exact = graph.ell_exact
        valids = None if exact else ell_valid(graph, spec)
        has_drop = rng is not None and self.dropout_rate > 0.0

        def build(pre_k, r):
            """Per-bucket 2-D slot messages (R_b, W_b·C) in f32."""
            from mma_tpu.ops.pallas.segment_minmax import _dropout_keep

            p_dst, hg = self._message_parts(pre_k, x_flat, e_feat, graph)
            parts = (ell_expand_exact(hg, spec) if exact
                     else ell_expand(hg, graph, spec))
            # N2 dropout by position-keyed hash (same family as the
            # fused kernel's in-kernel mask) — a threefry bernoulli over
            # every slot lane measured 3.1 ms of the 25.5 ms flagship
            # step; the hash is a handful of fused int ops. The pattern
            # is this path's own rng partition, as every path's is.
            seed = (jax.random.randint(r, (), 0, 2**31 - 1, dtype=jnp.int32)
                    if (has_drop and r is not None) else None)
            # Slot arrays stay in the edge-pipeline compute dtype (bf16
            # on TPU "auto" — same precision class as the fused-kernel
            # path); sums accumulate in f32 inside masked_slot_sum.
            sdt = hg.dtype
            xs = []
            for bi, (s, b) in enumerate(zip(spec.starts, spec.bounds)):
                w = spec.widths[bi]
                cb = jnp.tile(p_dst[s:b].astype(sdt), (1, w))
                xb = parts[bi].astype(sdt) + cb
                if seed is not None:
                    rows_iota = jax.lax.broadcasted_iota(
                        jnp.int32, xb.shape, 0) + jnp.int32(s)
                    lane_iota = jax.lax.broadcasted_iota(
                        jnp.int32, xb.shape, 1)
                    xb = xb * _dropout_keep(
                        seed, rows_iota, lane_iota, self.dropout_rate
                    ).astype(sdt)
                xs.append(xb)
            return xs

        def reduce_all(xs, wanted):
            from mma_tpu.ops.ell import (
                masked_minmax_firsthit,
                masked_slot_sum,
                pad_rows,
            )

            need = set()
            for a in wanted:
                need.update(
                    {a} if a in ("min", "max")
                    else {"s1"} if a in ("sum", "mean")
                    else {"s1", "s2"}
                )
            raw = {k: [] for k in need}
            minmax = tuple(a for a in ("min", "max") if a in need)
            for bi, xb in enumerate(xs):
                vb = None if valids is None else valids[bi]
                w = spec.widths[bi]
                if minmax:
                    for a, rr in zip(
                            minmax,
                            masked_minmax_firsthit(xb, vb, minmax, w)):
                        raw[a].append(rr)
                if "s1" in need:
                    raw["s1"].append(masked_slot_sum(xb, vb, w))
                if "s2" in need:
                    raw["s2"].append(masked_slot_sum(xb * xb, vb, w))
            n = graph.n_node
            cat = {
                k: pad_rows(jnp.concatenate(v, axis=0), n)
                for k, v in raw.items()
            }
            outs = []
            if minmax and not exact:
                # Empty-row select keys on ACTUAL slot validity, not
                # graph.deg: in the hopped sampled layout deg holds
                # full-graph true degrees, and duplicate seeds produce
                # edgeless duplicate rows with deg > 0 — keying on deg
                # would pass the min/max ±inf neutral through (ADVICE r4).
                row_has_slot = pad_rows(
                    jnp.concatenate(
                        [vb.any(axis=1, keepdims=True) for vb in valids],
                        axis=0,
                    ).astype(jnp.float32),
                    n,
                ) > 0
            for a in wanted:
                if a in ("min", "max"):
                    r_mm = cat[a].astype(jnp.float32)
                    if exact:
                        # Every bucket row has ≥1 valid slot; rows past
                        # the buckets (degree-0 / padding) were zero-
                        # padded by pad_rows. Bucket-padding rows carry
                        # synthetic-edge garbage — masked below.
                        outs.append(r_mm)
                    else:
                        outs.append(jnp.where(row_has_slot, r_mm, 0.0))
                elif a == "sum":
                    outs.append(cat["s1"])
                elif a == "mean":
                    outs.append(cat["s1"] / deg)
                else:
                    mean = cat["s1"] / deg
                    var = cat["s2"] / deg - mean * mean
                    outs.append(
                        var if a == "var"
                        else jnp.sqrt(jax.nn.relu(var) + 1e-5)
                    )
            if exact:
                # Zero the synthetic bucket-padding rows (their slots
                # hold self-loop padding-edge values) — one node-level
                # select per aggregate; real rows are untouched.
                outs = [
                    jnp.where(graph.node_mask[:, None], o, 0.0)
                    for o in outs
                ]
            return outs

        if self.parity:
            # N6: one shared message tensor feeds every aggregator.
            reds = reduce_all(build(pre_nns[-1], rng), self.aggregators)
        else:
            rngs = (jax.random.split(rng, len(self.aggregators))
                    if rng is not None else None)
            reds = []
            for ki, a in enumerate(self.aggregators):
                xs = build(
                    pre_nns[ki], rngs[ki] if rngs is not None else None
                )
                reds += reduce_all(xs, (a,))
        return self._post(params, x_flat, reds, deg)

    # ---- aggregation ---------------------------------------------------

    def _reduce(self, name, msgs, graph: Graph, deg, use_pallas=False,
                axis_name=None):
        """One scatter-reduce over flat edges → (N, T·F); empties → 0.

        ``axis_name``: inside ``shard_map`` with edges partitioned along
        that mesh axis, local partials combine across devices with the
        reduction's own monoid (psum for sum/mean/var/std, pmax/pmin for
        max/min) before degree normalization — node arrays (``deg``) are
        replicated, so the combined result equals the unsharded one.
        """
        n = graph.n_node
        valid = graph.edge_mask[:, None]

        def ssum(x):
            x = jnp.where(valid, x, 0.0)
            if use_pallas:
                from mma_tpu.ops.pallas.fused_mma import fused_segment_sum

                r = fused_segment_sum(x, graph)
            else:
                r = segment_sum(x, graph.dst, n)
            r = r.astype(jnp.float32)  # bf16 pipeline: accumulate output in f32
            return jax.lax.psum(r, axis_name) if axis_name else r

        if name == "sum":
            return ssum(msgs)
        if name == "mean":
            return ssum(msgs) / deg  # deg pre-clamped ≥1; empty segments → 0
        def cross_shard(r, reducer):
            # pmax/pmin have no transpose rule; all_gather + local reduce
            # is the differentiable formulation (its VJP routes the
            # cotangent back to the arg-max/min shard via psum_scatter).
            if not axis_name:
                return r
            return reducer(jax.lax.all_gather(r, axis_name), axis=0)

        if name in ("max", "min"):
            if use_pallas and axis_name is None:
                from mma_tpu.ops.pallas.segment_minmax import fused_segment_minmax

                r = fused_segment_minmax(
                    msgs, graph, (name,), max_run=self.max_degree_hint
                )
            else:
                neutral = -jnp.inf if name == "max" else jnp.inf
                fn = segment_max if name == "max" else segment_min
                r = fn(jnp.where(valid, msgs, neutral), graph.dst, n)
                r = cross_shard(r, jnp.max if name == "max" else jnp.min)
                r = r.astype(jnp.float32)
            return jnp.where(graph.deg[:, None] > 0, r, 0.0)
        if name in ("var", "std"):
            if use_pallas and axis_name is None:
                from mma_tpu.ops.pallas.fused_mma import fused_segment_sum_sq

                c = msgs.shape[1]
                # "highest" (exact 3-pass split): var = E[x²] − E[x]²
                # cancels catastrophically, amplifying any split error.
                both = fused_segment_sum_sq(
                    jnp.where(valid, msgs, 0.0), graph, precision="highest"
                )
                mean, mean_sq = both[:, :c] / deg, both[:, c:] / deg
            else:
                mean, mean_sq = ssum(msgs) / deg, ssum(msgs * msgs) / deg
            out = mean_sq - mean * mean
            if name == "std":
                out = jnp.sqrt(jax.nn.relu(out) + 1e-5)
            return out
        raise ValueError(f'Unknown aggregator "{name}".')

    def _reduce_all(self, per_agg, graph: Graph, deg, use_pallas, axis_name,
                    shared_messages: bool):
        """All K reduces; when min+max consume the SAME message tensor
        (``shared_messages=True`` — parity mode shares messages across
        aggregators, N6) they run as ONE fused Pallas pass over the edge
        data (``ops=("min","max")``). The flag is explicit (set by
        ``apply`` from the parity mode that built ``per_agg``) rather
        than inferred from array identity, so refactors of the message
        dict can't silently de-pair the kernel launch."""
        paired = {}
        minmax = tuple(a for a in self.aggregators if a in ("min", "max"))
        if (use_pallas and axis_name is None and shared_messages
                and len(minmax) >= 2):
            from mma_tpu.ops.pallas.segment_minmax import (
                fused_segment_minmax,
            )

            msgs = per_agg[minmax[0]]
            fused = fused_segment_minmax(
                msgs, graph, minmax, max_run=self.max_degree_hint
            )
            c = msgs.shape[1]
            for pi, a in enumerate(minmax):
                r = fused[:, pi * c : (pi + 1) * c]
                paired[a] = jnp.where(graph.deg[:, None] > 0, r, 0.0)
        return [
            paired[a] if a in paired else self._reduce(
                a, per_agg[a], graph, deg, use_pallas=use_pallas,
                axis_name=axis_name,
            )
            for a in self.aggregators
        ]

    def _scale(self, agg, deg):
        """Per-scaler copies of ``agg`` (a list, one (N, ·) array per
        scaler, in scaler order); parity compounds (N9)."""
        avg = dict(self.avg_deg)
        outs = []
        cur = agg
        base = agg
        for scaler in self.scalers:
            if scaler == "identity":
                fac = None
            elif scaler == "amplification":
                fac = jnp.log(deg + 1) / avg["log"]
            elif scaler == "attenuation":
                fac = avg["log"] / jnp.log(deg + 1)
            elif scaler == "linear":
                fac = deg / avg["lin"]
            elif scaler == "inverse_linear":
                fac = avg["lin"] / deg
            else:
                raise ValueError(f'Unknown scaler "{scaler}".')
            if self.parity:
                if fac is not None:
                    cur = cur * fac
                outs.append(cur)
            else:
                outs.append(base if fac is None else base * fac)
        return outs

    # ---- forward -------------------------------------------------------

    def apply(
        self,
        params,
        x: jnp.ndarray,
        graph: Graph,
        edge_attr: Optional[jnp.ndarray] = None,
        *,
        rng: Optional[jax.Array] = None,
        use_pallas: bool = False,
        axis_name: Optional[str] = None,
    ) -> jnp.ndarray:
        """x: (N, in_channels) → (N, out_channels).

        ``rng`` enables the always-on message dropout (N2); pass ``None``
        for deterministic output. ``use_pallas`` routes the sum-family
        segment reductions through the fused kernel. ``axis_name``
        combines edge-sharded partial reductions across that mesh axis
        (see ``_reduce``).
        """
        n = x.shape[0]
        t, f = self.towers, self.f_in
        # Flat tower-major layout: (N, T·F) (see _messages_for_aggregator).
        if self.divide_input:
            x_flat = x.reshape(n, t * f)
        else:
            x_flat = jnp.tile(x, (1, t))

        e_feat = None
        if self.edge_dim is not None:
            assert edge_attr is not None
            enc = Dense(self.edge_dim, f)
            e_feat = enc.apply(params["edge_encoder"], edge_attr)  # (E, F)

        pre_nns = params["pre_nns"]
        if self.parity:
            # N7: pre-NNs stay at init — cut them out of the grad graph.
            pre_nns = jax.lax.stop_gradient(pre_nns)

        deg = jnp.maximum(graph.deg, 1.0)[:, None]  # (N, 1) clamp_(1)

        # ELL dense-neighbor fast path: bounded-degree graphs (ZINC,
        # fanout-bounded sampled subgraphs) take the scatter-free slot
        # layout — covers every GR aggregator, both parity modes, and
        # N2 dropout, with no Pallas launch (see ``mma_tpu.ops.ell``).
        ell_spec = self._ell_spec(graph, use_pallas, axis_name)
        if ell_spec is not None:
            return self._ell_forward(
                params, pre_nns, x_flat, e_feat, graph, rng, deg, ell_spec
            )

        # Fused min/max edge-program fast path (the ZINC flagship shape:
        # parity N6 shared messages, aggregators ⊆ {min, max}): message
        # build + N2 dropout + both reduces in ONE Pallas pass — the
        # (E, T·F) message tensor never reaches HBM, and the backward
        # emits dc in-kernel plus one CSC-reduced src payload. The
        # dropout PATTERN differs from the XLA path's jax.random stream
        # (position-keyed hash), as any two rng partitions do.
        if (use_pallas and axis_name is None
                and self.pre_layers == 1 and len(self.aggregators) >= 1
                and all(a in ("min", "max") for a in self.aggregators)
                and graph.chunk_hint is not None):
            from mma_tpu.ops.pallas.segment_minmax import (
                fused_minmax_edge_program,
            )

            def _seed(r):
                if r is None or self.dropout_rate <= 0.0:
                    return None
                return jax.random.randint(r, (1,), 0, 2**31 - 1)

            def _run(pre_k, ops, seed):
                p_dst, hg = self._message_parts(pre_k, x_flat, e_feat, graph)
                fused = fused_minmax_edge_program(
                    p_dst, hg, graph, ops, seed=seed,
                    rate=self.dropout_rate, max_run=self.max_degree_hint,
                )
                cch = hg.shape[1]
                return [
                    jnp.where(graph.deg[:, None] > 0,
                              fused[:, pi * cch : (pi + 1) * cch], 0.0)
                    for pi in range(len(ops))
                ]

            if self.parity:
                # N6: one shared message tensor, both ops in one pass.
                reds = _run(pre_nns[-1], tuple(self.aggregators), _seed(rng))
            else:
                # Fixed mode: per-aggregator messages and dropout rngs —
                # one single-op fused pass per aggregator.
                rngs = (jax.random.split(rng, len(self.aggregators))
                        if rng is not None else None)
                reds = []
                for ki, a in enumerate(self.aggregators):
                    reds += _run(
                        pre_nns[ki], (a,),
                        _seed(rngs[ki] if rngs is not None else None),
                    )
            return self._post(params, x_flat, reds, deg)

        if self.parity:
            # N6: every aggregator consumes the LAST aggregator's messages.
            msgs = self._messages_for_aggregator(
                pre_nns[-1], x_flat, e_feat, graph, use_pallas
            )
            msgs = dropout(rng, msgs, self.dropout_rate)
            per_agg = {a: msgs for a in self.aggregators}
        else:
            per_agg = {}
            rngs = (
                jax.random.split(rng, len(self.aggregators)) if rng is not None else None
            )
            for ki, a in enumerate(self.aggregators):
                m = self._messages_for_aggregator(
                    pre_nns[ki], x_flat, e_feat, graph, use_pallas
                )
                per_agg[a] = dropout(rngs[ki] if rngs is not None else None, m, self.dropout_rate)

        # reds[k]: (N, T·F); scaled[s][k]: (N, T·F).
        reds = self._reduce_all(
            per_agg, graph, deg, use_pallas, axis_name,
            shared_messages=self.parity,
        )
        return self._post(params, x_flat, reds, deg)

    def _post(self, params, x_flat, reds, deg):
        """Scalers + tower reassembly + post-NNs + final lin."""
        t, f = self.towers, self.f_in
        scaled = [self._scale(r, deg) for r in reds]  # [k][s] → transpose below

        if self.post_layers == 1:
            # Fused single-layer post-NN: the per-tower
            # ``concat(pieces) @ W_t`` decomposes as a sum over pieces of
            # block-diagonal matmuls ``piece_p (N, T·F) @ BD_p (T·F, T·f_out)``
            # — no (N, (K·S+1)·F) concat per tower is ever materialized
            # and the (K·S+1)·T small slice/concat/matmul ops collapse
            # to K·S+1 big MXU dots (identical math, summation order
            # within a row regrouped). Measured: the old form cost ~9 ms
            # of the 20 ms ZINC flagship step, fwd+bwd (docs/ZINC_R5.md).
            pieces = [x_flat]
            for si in range(len(self.scalers)):
                for ki in range(len(self.aggregators)):
                    pieces.append(scaled[ki][si])
            out = jnp.concatenate(
                [params["post_nns"][ti][0]["b"] for ti in range(t)]
            )
            from jax.scipy.linalg import block_diag

            for pi, piece in enumerate(pieces):
                bd = block_diag(*[
                    params["post_nns"][ti][0]["w"][pi * f : (pi + 1) * f]
                    for ti in range(t)
                ])  # (T·F, T·f_out)
                out = out + piece.astype(jnp.float32) @ bd
            lin = Dense(self.out_channels, self.out_channels)
            return lin.apply(params["lin"], out)

        # Reassemble the reference's per-tower feature order
        # [x_t ‖ (for s in scalers: for k in aggs: red_skt)] — node-level
        # slicing only (cheap), edge-level tensors never left flat layout.
        tower_outs = []
        for ti in range(t):
            sl = slice(ti * f, (ti + 1) * f)
            pieces = [x_flat[:, sl]]
            for si in range(len(self.scalers)):
                for ki in range(len(self.aggregators)):
                    pieces.append(scaled[ki][si][:, sl])
            tower_in = jnp.concatenate(pieces, axis=1)  # (N, (K·S+1)·F)
            tower_outs.append(
                self._pre_nn_apply(params["post_nns"][ti], tower_in)
            )
        out = jnp.concatenate(tower_outs, axis=1)  # (N, out_channels)
        lin = Dense(self.out_channels, self.out_channels)
        return lin.apply(params["lin"], out)
