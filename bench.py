"""Benchmark harness: edges/s/chip on MMA aggregation layers.

Measures the BASELINE.json north-star metric — edges/s through the
multi-mask aggregation layer — on three workloads:

- ``pubmed``: the real Pubmed graph structure (19.7k nodes / 88.6k edges;
  synthetic features — ``ind.pubmed.allx`` is absent upstream), MMA layer
  with the README.md:58 config (hidden 16, min/min2/min3/min4).
- ``zinc``: a 64-molecule batched graph through MultiMaskConv
  (README.md:79 config: towers 5, min/max, identity/amplification/linear).
- ``synthetic-large``: 131k-node power-law graph, 2.1M edges, hidden 64,
  two aggregators — the throughput-at-scale configuration.

Each workload runs both the XLA segment-sum path and the fused Pallas
path; the faster wins. Prints ONE JSON line:
``{"metric", "value", "unit", "vs_baseline"}`` where value is the
edges/s/chip of the headline (synthetic-large) workload and vs_baseline
is the speedup of the chosen path over the XLA reference path (the
reference itself publishes no numbers — BASELINE.md).
Details go to stderr and BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Virtual CPU devices for the scaling sweep (must precede jax init).
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    """Force completion by FETCHING one scalar, not block_until_ready:
    on the async axon runtime, block_until_ready returned without
    executing some single-fusion programs (a 32 GB stream probe
    "completed" in 0.1 ms; the same program took 82 ms once a value was
    fetched). A one-element device_get is the only wait this runtime is
    known to honor for every program; the chained-dependency structure
    of the timing loops guarantees it transitively waits for every
    iteration."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    try:
        jax.device_get(leaf.reshape(-1)[:1])
    except Exception:
        jax.block_until_ready(out)


def _time_fn(f, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _time_fwd_chained(apply_fn, x, *rest, iters=20, warmup=2):
    """Time a forward whose dispatches are dependency-CHAINED: iteration
    i's input is perturbed by iteration i-1's output (×0, so values are
    unchanged), so the async axon runtime can neither elide nor overlap
    repeated identical dispatches (same rationale as _time_step_fn).
    ``apply_fn(x, *rest) -> array``; ``x`` must be a float array."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, x, *rest):
        out = apply_fn(x + carry * 0, *rest)
        return (carry + jnp.sum(out.astype(jnp.float32)) * 1e-30,)

    return _time_step_fn(
        step, jnp.zeros((), jnp.float32), x, *rest,
        iters=iters, warmup=warmup, n_state=1,
    )


def _time_step_fn(f, *args, iters=10, warmup=2, n_state=2):
    """Time a train step, CHAINING the first ``n_state`` outputs back as
    inputs. Timing loops of *independent* identical dispatches can be
    overlapped (or outright deduplicated) by the async runtime — observed
    on the axon tunnel as a physically impossible 69 µs "train step" —
    and a chained sequence is also the honest pattern: real training
    steps depend on the previous step's params/opt state."""
    import jax

    state = args[:n_state]
    rest = args[n_state:]
    out = None
    for _ in range(warmup):
        out = f(*state, *rest)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*state, *rest)
        state = out[:n_state]
    _sync(out)
    return (time.perf_counter() - t0) / iters


# Measured-roofline accounting (VERDICT r3 #6): every throughput entry
# carries bytes_per_edge (a documented LOWER-BOUND HBM-traffic model of
# the workload — what a perfect implementation must still move) and
# roofline_frac = t_roofline / t_measured, so perf is judged against
# speed-of-light rather than only vs_baseline. v5e HBM ≈ 819 GB/s.
HBM_GBPS = float(os.environ.get("MMA_HBM_GBPS", "819"))


# ---------------------------------------------------------------------------
# Measured primitive rates → composite per-path bounds (VERDICT r4 #2).
#
# The r4 byte-traffic roofline indicted the kernels at 12-20% without
# saying whether bytes were even the binding resource. The corrected
# bound is COMPOSITE and built from rates measured ON THIS CHIP at the
# workloads' own shapes:
#   - stream_gbps: fused elementwise read+write bandwidth (the resource
#     the old roofline assumed, re-measured rather than spec'd),
#   - gather rows/s at each (table_rows, width, dtype) class the bench
#     workloads actually issue (XLA row gathers are NOT bandwidth-bound:
#     they issue rows at a rate set by table size and row width),
#   - mxu_tflops: bf16 matmul peak (the one-hot contraction's resource).
# Each bench entry then gets bound_s = Σ_pass max(resource terms) and
# bound_frac = bound_s / measured_s — a speed-of-light the kernels can
# actually be held to, with the binding resource named per pass.
# ---------------------------------------------------------------------------

_PRIMS = None


def measure_primitives():
    """Measure stream BW, gather issue rates, and MXU peak (cached).

    Each probe repeats its op K times INSIDE one dispatch (sequentially
    chained) so the tunneled runtime's per-dispatch floor (~2-3 ms
    observed) amortizes below a few percent; buffers are generated
    on-device (iota-based) so no probe pays host→device transfer.
    """
    global _PRIMS
    if _PRIMS is not None:
        return _PRIMS
    import jax
    import jax.numpy as jnp

    prims = {}

    # Fused elementwise stream: K sequential read+write passes over a
    # 1 GB f32 buffer inside one dispatch.
    n = 256 * 1024 * 1024
    k_rep = 16
    x = jax.jit(lambda: jnp.arange(n, dtype=jnp.float32) * 1e-9)()
    jax.block_until_ready(x)

    def stream(v):
        # barrier per pass: without it XLA folds the K multiplies into
        # one (measured an impossible 520 TB/s).
        for _ in range(k_rep):
            v = jax.lax.optimization_barrier(v * 1.0000001)
        return v

    dt = _time_fwd_chained(stream, x, iters=4)
    prims["stream_gbps"] = k_rep * 2 * n * 4 / dt / 1e9
    del x

    # Random row gathers at the bench's table classes: K gathers of E
    # rows per dispatch (index sets decorrelated by an offset).
    e_idx = 1 << 21
    g_rep = 8
    gather = {}
    for rows, width, dname in (
        (131072, 128, "bfloat16"),   # synthetic-large lean hg build
        (131072, 256, "float32"),    # f32 wide variant
        (23552, 384, "bfloat16"),    # zinc exact hg / permute class
        (761856, 128, "bfloat16"),   # ogbn sampled class
    ):
        dtype = jnp.bfloat16 if dname == "bfloat16" else jnp.float32
        tab = jax.jit(
            lambda r=rows, w=width, d=dtype: (
                jnp.arange(r * w, dtype=jnp.float32).reshape(r, w) * 1e-9
            ).astype(d)
        )()
        ix = jax.jit(
            lambda r=rows: (
                (jnp.arange(e_idx, dtype=jnp.int32) * 1103515245 + 12345)
                % r
            )
        )()
        jax.block_until_ready((tab, ix))

        def run(t, i=ix, r=rows):
            acc = jnp.zeros((), jnp.float32)
            for kk in range(g_rep):
                got = t[(i + kk * 7919) % r]
                # consume EVERY row (a [0,0] probe would let XLA shrink
                # the gather to one element) and chain the next index
                # set on the result so repeats can't be elided.
                s = jnp.sum(got.astype(jnp.float32))
                acc = acc + s * 1e-9
                i = (i + s.astype(jnp.int32) % 3) % r
            return acc

        dt = _time_fwd_chained(
            lambda t: run(t) + jnp.zeros(1, jnp.float32), tab, iters=4
        )
        gather[f"{rows}x{width}x{dname}"] = {
            "rows_per_s": g_rep * e_idx / dt,
            "ns_per_row": dt / (g_rep * e_idx) * 1e9,
            "gbps": g_rep * e_idx * width
            * (2 if dname == "bfloat16" else 4) / dt / 1e9,
        }
    prims["gather"] = gather

    # MXU peak: chained 4096³ bf16 matmuls, 8 per dispatch.
    a = jax.jit(
        lambda: (jnp.arange(4096 * 4096, dtype=jnp.float32)
                 .reshape(4096, 4096) * 1e-9).astype(jnp.bfloat16)
    )()
    jax.block_until_ready(a)

    def mm(m):
        for _ in range(8):
            m = (m @ m * 1e-4).astype(jnp.bfloat16)
        return m

    dt = _time_fwd_chained(mm, a, iters=4)
    prims["mxu_tflops"] = 8 * 2 * 4096**3 / dt / 1e12
    _PRIMS = prims
    return prims


def _gather_rate(prims, rows, width, dname):
    """rows/s for the closest measured gather class."""
    best, bestd = None, None
    for key, v in prims["gather"].items():
        r, w, dn = key.split("x")
        if dn != dname:
            continue
        d = abs(np.log(int(r) / rows)) + abs(np.log(int(w) / width))
        if bestd is None or d < bestd:
            best, bestd = v, d
    return best["rows_per_s"] if best else 50e6


_GATHER_IDX_CACHE = {}


def measured_gather_rate(idx: np.ndarray, rows: int, width: int,
                         dname: str) -> float:
    """rows/s of an XLA row gather measured with the WORKLOAD'S OWN
    index array (random-index probes under-rate the real gathers 3-5×:
    dst-sorted power-law ``src`` indices repeat hot rows and arrive in
    coherent runs — the first composite bound built from random probes
    read bound_frac up to 5, i.e. a "bound" slower than the measured
    kernel). Chained through the table so repeats can't be elided;
    cached per (shape, dtype, index fingerprint)."""
    import jax
    import jax.numpy as jnp

    idx = np.asarray(idx)
    key = (rows, width, dname, len(idx),
           int(idx[:256].sum()), int(idx[-256:].sum()))
    if key in _GATHER_IDX_CACHE:
        return _GATHER_IDX_CACHE[key]
    dtype = jnp.bfloat16 if dname == "bfloat16" else jnp.float32
    tab = jax.jit(
        lambda r=rows, w=width, d=dtype: (
            jnp.arange(r * w, dtype=jnp.float32).reshape(r, w) * 1e-9
        ).astype(d)
    )()
    ixj = jnp.asarray(idx.astype(np.int32))
    reps = 8

    def run(t):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(reps):
            got = t[ixj]
            s = jnp.sum(got.astype(jnp.float32))
            acc = acc + s * 1e-9
            t = jax.lax.optimization_barrier(t + s.astype(t.dtype) * 1e-30)
        return acc + jnp.zeros(1, jnp.float32)

    dt = _time_fwd_chained(run, tab, iters=4)
    rate = reps * len(idx) / dt
    _GATHER_IDX_CACHE[key] = rate
    return rate


def composite_bound(passes, prims):
    """``bound_s`` for a list of pass dicts, each with any of:
    ``gather_idx=(np_indices, table_rows, width, dtype)`` (rate measured
    with the workload's own index distribution), ``stream_bytes``,
    ``mxu_flops``. Per pass: gather issue is a separate XLA op from the
    fused/kernel work (t_gather + max(stream, mxu)); passes sum."""
    total = 0.0
    parts = []
    for p in passes:
        t_g = 0.0
        if "gather_idx" in p:
            idx, t_rows, width, dname = p["gather_idx"]
            t_g = len(idx) / measured_gather_rate(idx, t_rows, width, dname)
        t_s = p.get("stream_bytes", 0) / (prims["stream_gbps"] * 1e9)
        t_m = p.get("mxu_flops", 0) / (prims["mxu_tflops"] * 1e12)
        t = t_g + max(t_s, t_m)
        binding = ("gather" if t_g >= max(t_s, t_m)
                   else ("stream" if t_s >= t_m else "mxu"))
        parts.append({"name": p.get("name", "?"), "t_s": t,
                      "binding": binding})
        total += t
    return total, parts


def mma_layer_fwd_bound(graph, n_feat, k, dtype_name, prims):
    """Composite bound of one MMA-layer forward (lean path): per edge
    pass, one row gather from the node table (rate measured with THIS
    graph's src indices) + the kernel's stream and one-hot MXU
    contraction; two edge passes (masked aggregate + SpMM) plus the
    node-level projections."""
    d = _dtype_bytes(dtype_name)
    dname = "bfloat16" if d == 2 else "float32"
    e = int(np.asarray(graph.num_edges))
    n = graph.n_node
    src = np.asarray(graph.src)
    c1 = -(-k * n_feat // 128) * 128  # aggregate pass lanes
    c2 = -(-n_feat // 128) * 128     # spmm pass lanes
    passes = [
        {"name": "proj", "mxu_flops": 2 * n * n_feat * 2 * k * n_feat},
        {"name": "aggregate",
         "gather_idx": (src, n, c1, dname),
         "stream_bytes": e * (c1 * d + 4),
         "mxu_flops": 2 * e * 128 * c1},
        {"name": "spmm",
         "gather_idx": (src, n, c2, dname),
         "stream_bytes": e * (c2 * d + 4),
         "mxu_flops": 2 * e * 128 * c2},
    ]
    return composite_bound(passes, prims)


def mma_layer_train_bound(graph, n_feat, k, dtype_name, prims):
    """Composite bound of one MMA-layer training step: the forward's
    passes plus the backward's actual passes — a dst-oriented recompute
    pass (src-indexed gather class), the src-keyed CSC reductions
    (indexed by ``dst_csc``, which is near-sorted and gathers several×
    faster than src order — measured with that array), and the SpMM
    transpose. A flat "3× the forward" multiplier read bound_frac > 1
    (it charges the backward for gathers it does not make)."""
    d = _dtype_bytes(dtype_name)
    dname = "bfloat16" if d == 2 else "float32"
    e = int(np.asarray(graph.num_edges))
    n = graph.n_node
    src = np.asarray(graph.src)
    csc = np.asarray(
        graph.dst_csc if graph.dst_csc is not None else graph.src
    )
    c1 = -(-k * n_feat // 128) * 128
    c2 = -(-n_feat // 128) * 128
    t_f, parts_f = mma_layer_fwd_bound(graph, n_feat, k, dtype_name, prims)
    extra = [
        # The dst-oriented backward pass REUSES the forward's gathered
        # edge residual (no second node-table gather): it streams the
        # residual back in and recomputes the mask chain on the MXU.
        {"name": "bwd-dst-recompute",
         "stream_bytes": e * (2 * c1 * d + 4),
         "mxu_flops": 2 * e * 128 * c1},
        {"name": "bwd-src-csc",
         "gather_idx": (csc, n, c1, dname),
         "stream_bytes": e * (2 * c1 * d),
         "mxu_flops": 2 * e * 128 * c1},
        {"name": "spmm-bwd",
         "gather_idx": (csc, n, c2, dname),
         "stream_bytes": e * (c2 * d + 4),
         "mxu_flops": 2 * e * 128 * c2},
    ]
    t_b, parts_b = composite_bound(extra, prims)
    return t_f + t_b, parts_f + parts_b


def zinc_train_bound(batch, hidden, towers, edge_dim, num_layers,
                     dtype_name, prims, exact=False):
    """Composite bound of one ZincNet training step: forward passes plus
    per conv a first-hit/mask backward stream pass, the src-keyed
    reduction (exact path: edge permute by ``src_perm`` + lane sums —
    the permute rate measured with that index array), and the dW
    matmuls."""
    d = _dtype_bytes(dtype_name)
    dname = "bfloat16" if d == 2 else "float32"
    g = batch.graph
    e = int(np.asarray(g.num_edges))
    n = g.n_node
    e_pad = g.n_edge
    tf = towers * hidden
    c = -(-tf // 128) * 128
    perm = np.asarray(
        g.src_perm if g.src_perm is not None else np.arange(e_pad)
    )
    t_f, parts_f = zinc_fwd_bound(batch, hidden, towers, edge_dim,
                                  num_layers, dtype_name, prims,
                                  exact=exact)
    per_layer = [
        {"name": "bwd-reduce-route", "stream_bytes": e * 3 * c * d},
        {"name": "bwd-src-permute",
         "gather_idx": (perm, e_pad, c, dname),
         "stream_bytes": e * c * d},
        {"name": "bwd-dW",
         "mxu_flops": 2 * (2 * n * hidden * tf + e * edge_dim * tf)},
    ]
    t_b, parts_b = composite_bound(per_layer * num_layers, prims)
    return t_f + t_b, parts_f + parts_b


def zinc_fwd_bound(batch, hidden, towers, edge_dim, num_layers,
                   dtype_name, prims, exact=False):
    """Composite bound of one ZincNet forward. Exact-ELL path: per conv,
    one src gather (E rows, T·F lanes, rate measured with this batch's
    src) + the slot-reduce stream; the fused-kernel path adds the
    one-hot contraction."""
    d = _dtype_bytes(dtype_name)
    dname = "bfloat16" if d == 2 else "float32"
    e = int(np.asarray(batch.graph.num_edges))
    n = batch.graph.n_node
    src = np.asarray(batch.graph.src)
    tf = towers * hidden
    c = -(-tf // 128) * 128
    per_layer = [
        {"name": "proj",
         "mxu_flops": 2 * n * hidden * 2 * tf + 2 * e * edge_dim * tf},
        {"name": "hg-gather+reduce",
         "gather_idx": (src, n, c, dname),
         "stream_bytes": e * (2 * c * d)},
    ]
    if not exact:
        per_layer[1]["mxu_flops"] = 2 * e * 128 * c
    total, parts = composite_bound(per_layer * num_layers, prims)
    return total, parts


def _annotate_bound(entry, bound_s, parts):
    entry["bound_s"] = round(bound_s, 6)
    entry["bound_frac"] = round(bound_s / entry["time_s"], 4)
    entry["bound_binding"] = sorted(
        {p["binding"] for p in parts},
        key=lambda b: -sum(p["t_s"] for p in parts if p["binding"] == b),
    )[0]
    # Itemized residual: each pass's bound time and binding resource
    # (VERDICT r4 #2 — the bound must say WHERE the time floor lives).
    entry["bound_parts"] = [
        {"name": p["name"], "ms": round(p["t_s"] * 1e3, 3),
         "binding": p["binding"]}
        for p in parts
    ]


def _dtype_bytes(name):
    return 2 if name in ("bfloat16", "auto") else 4


def _annotate_roofline(entry, n_edges, bytes_total):
    t_roof = bytes_total / (HBM_GBPS * 1e9)
    entry["bytes_per_edge"] = round(bytes_total / max(n_edges, 1), 1)
    entry["roofline_frac"] = round(t_roof / entry["time_s"], 4)


def _mma_layer_fwd_bytes(graph, n_feat, k, dtype_name):
    """Lower-bound HBM bytes of one MMA-layer forward.

    Two edge passes (masked aggregate + final SpMM), each streaming one
    gathered row per edge at the 128-lane-padded width plus 4 B of edge
    ids, plus the node-level mask projections / aggregate / output
    arrays once. Elementwise fusion is assumed perfect (XLA/Pallas both
    avoid materializing mask/message intermediates on the fast paths).
    """
    d = _dtype_bytes(dtype_name)
    e = int(np.asarray(graph.num_edges))
    n = graph.n_node
    f_pad = -(-n_feat // 128) * 128
    per_edge = 2 * (f_pad * d + 4)
    per_node = (2 * k * n_feat + 2 * k * n_feat + 2 * f_pad) * 4
    return e * per_edge + n * per_node


def _zinc_fwd_bytes(batch, hidden, towers, edge_dim, num_layers, dtype_name):
    """Lower-bound HBM bytes of one ZincNet forward: per conv layer the
    per-edge message stream ``hg`` (T·F lanes) is built (write) and
    reduced (read) once, edge features re-read per layer, plus the
    node-level projections/aggregates in f32."""
    d = _dtype_bytes(dtype_name)
    e = int(np.asarray(batch.graph.num_edges))
    n = batch.graph.n_node
    tf = towers * hidden
    per_edge = 2 * tf * d + edge_dim * d + 4
    per_node = (2 * tf + 2 * 2 * tf) * 4  # p_dst/p_src + two reduce outs
    return num_layers * (e * per_edge + n * per_node)


def powerlaw_graph(n, avg_deg, seed=0):
    """Symmetric power-law-ish graph via preferential random targets."""
    rs = np.random.RandomState(seed)
    m = n * avg_deg // 2
    # Zipf-weighted endpoint sampling → heavy-tailed degree distribution.
    w = 1.0 / np.arange(1, n + 1) ** 0.5
    w /= w.sum()
    a = rs.choice(n, size=m, p=w).astype(np.int32)
    b = rs.randint(0, n, size=m).astype(np.int32)
    keep = a != b
    a, b = a[keep], b[keep]
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    from mma_tpu.graph.build import graph_from_edges

    return graph_from_edges(src, dst, n)


def bench_node_mma(graph, n_feat, aggregators, seed=0):
    """Edges/s of one MMA layer forward (XLA vs Pallas paths)."""
    import jax
    import jax.numpy as jnp

    from mma_tpu.nn.mma_layer import MMALayer

    rs = np.random.RandomState(seed)
    h = jnp.asarray(rs.randn(graph.n_node, n_feat).astype(np.float32))
    params = MMALayer(
        in_features=n_feat, out_features=n_feat, aggregators=aggregators
    ).init(jax.random.PRNGKey(0))
    n_edges = int(np.asarray(graph.num_edges))

    res = {}
    paths = (
        ("xla", False, "float32"),
        ("pallas", True, "float32"),
        ("pallas-bf16", True, "bfloat16"),
        # Zero-config entry: compute_dtype="auto" resolves per platform
        # (mma_tpu.autotune) — must land at-or-above the best manual
        # config above.
        ("auto", True, "auto"),
    )
    for name, use_pallas, dtype in paths:
        layer = MMALayer(
            in_features=n_feat, out_features=n_feat, aggregators=aggregators,
            compute_dtype=dtype,
        )
        try:
            dt = _time_fwd_chained(
                lambda x, p, layer=layer, up=use_pallas: layer.apply(
                    p, x, graph, use_pallas=up
                ),
                h, params,
            )
            res[name] = {"time_s": dt, "edges_per_s": n_edges / dt}
            _annotate_roofline(
                res[name], n_edges,
                _mma_layer_fwd_bytes(graph, n_feat, len(aggregators), dtype),
            )
            if jax.devices()[0].platform == "tpu":
                bs, parts = mma_layer_fwd_bound(
                    graph, n_feat, len(aggregators), dtype,
                    measure_primitives(),
                )
                _annotate_bound(res[name], bs, parts)
        except Exception as e:  # pallas path may be unavailable off-TPU
            log(f"  path {name} failed: {type(e).__name__}: {str(e)[:200]}")
    return res


def bench_node_mma_train(graph, n_feat, aggregators, seed=0):
    """Edges/s of one MMA-layer training step (fwd+bwd+update)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mma_tpu.nn.mma_layer import MMALayer

    rs = np.random.RandomState(seed)
    h = jnp.asarray(rs.randn(graph.n_node, n_feat).astype(np.float32))
    opt = optax.adam(1e-3)
    n_edges = int(np.asarray(graph.num_edges))

    res = {}
    paths = (
        ("xla", False, "float32"),
        ("pallas", True, "float32"),
        ("pallas-bf16", True, "bfloat16"),
        # Zero-config entry: compute_dtype="auto" resolves per platform
        # (mma_tpu.autotune) — must land at-or-above the best manual
        # config above.
        ("auto", True, "auto"),
    )
    for name, use_pallas, dtype in paths:
        layer = MMALayer(
            in_features=n_feat, out_features=n_feat, aggregators=aggregators,
            compute_dtype=dtype,
        )
        params = layer.init(jax.random.PRNGKey(0))
        opt_state = opt.init(params)

        @jax.jit
        def step(p, o, x, up=use_pallas, layer=layer):
            def loss(pp):
                out = layer.apply(pp, x, graph, use_pallas=up)
                return jnp.sum(jnp.where(graph.node_mask[:, None], out, 0.0) ** 2)

            g = jax.grad(loss)(p)
            u, o2 = opt.update(g, o, p)
            return optax.apply_updates(p, u), o2

        try:
            dt = _time_step_fn(step, params, opt_state, h, iters=15)
            res[name] = {"time_s": dt, "edges_per_s": n_edges / dt}
            # fwd + bwd ≈ 3× the forward's edge traffic (backward re-reads
            # the residual stream and writes/reduces a cotangent stream).
            _annotate_roofline(
                res[name], n_edges,
                3 * _mma_layer_fwd_bytes(graph, n_feat, len(aggregators), dtype),
            )
            if jax.devices()[0].platform == "tpu":
                bs, parts = mma_layer_train_bound(
                    graph, n_feat, len(aggregators), dtype,
                    measure_primitives(),
                )
                _annotate_bound(res[name], bs, parts)
        except Exception as e:
            log(f"  train path {name} failed: {type(e).__name__}: {str(e)[:200]}")
    return res


def bench_zinc_conv(batch_size=1024, seed=0):
    """Edges/s through the full ZincNet (4 MultiMaskConv layers, the
    README.md:79 flagship config min,max) on a scale-realistic batch —
    forward and training step, XLA vs fused-Pallas vs bf16 paths.

    edges/s counts every conv layer's edge visit (E·L per forward)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mma_tpu.data import load_zinc
    from mma_tpu.models import ZincNet
    from mma_tpu.nn.mma_conv import compute_avg_deg

    ds = load_zinc("train", subset_size=batch_size)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    # Right-size the padding budgets to the actual batch contents (the
    # deterministic first batch): the old 40·B/104·B worst-case budgets
    # nearly doubled the kernel grids (row blocks scale with n_node_pad,
    # and every block costs a grid step even with no edges).
    n_need = int(ds.num_nodes.sum()) + 1
    e_need = int(sum(len(s_) for s_ in ds.edge_src))
    batch = next(
        ds.batches(
            batch_size,
            n_node=-(-n_need // 1024) * 1024,
            n_edge=-(-e_need // 1024) * 1024,
        )
    )
    # The zero-config production batch (what train_zinc's default
    # batch_layout="auto" emits): the degree-EXACT ELL collate — nodes
    # grouped by exact in-degree, slot index == edge index, aggregation
    # = reshapes + lane reduces (round 5). The "auto" path below runs on
    # it; the fixed paths keep the plain collate for r4 comparability.
    from mma_tpu.data.batching import degree_budgets

    budgets, zero_worst = degree_budgets(
        [int(nn) for nn in ds.num_nodes], ds.edge_src, ds.edge_dst,
        batch_size, margin=0.0, include_zero=True,
    )
    rows = sum(budgets) + zero_worst + 1
    slots = sum(b * (i + 1) for i, b in enumerate(budgets))
    batch_exact = next(
        ds.batches(
            batch_size,
            n_node=max(-(-n_need // 1024) * 1024, -(-rows // 1024) * 1024),
            n_edge=max(-(-e_need // 1024) * 1024, -(-slots // 1024) * 1024),
            ell_degree_budgets=budgets,
        )
    )

    res = {}
    paths = (
        ("xla", False, "float32"),
        ("pallas", True, "float32"),
        ("pallas-bf16", True, "bfloat16"),
        # Zero-config entry: compute_dtype="auto" resolves per platform
        # (mma_tpu.autotune) — must land at-or-above the best manual
        # config above.
        ("auto", True, "auto"),
    )
    # One fused adam over the raveled params (~300 small leaves
    # otherwise become ~300 op chains — measured 0.5 ms of the step).
    opt = optax.flatten(optax.adam(1e-3))
    for name, use_pallas, dtype in paths:
        model = ZincNet(
            aggregators=("min", "max"),
            scalers=("identity", "amplification", "linear"),
            avg_deg=tuple(avg.items()),
            towers=5,
            max_degree_hint=4,  # ZINC max in-degree (mma.py:57-60)
            compute_dtype=dtype,
        )
        params = model.init(jax.random.PRNGKey(0))
        state = model.init_state()
        b_used = batch_exact if name == "auto" else batch
        n_edges = int(np.asarray(b_used.graph.num_edges)) * model.num_layers

        @jax.jit
        def fwd_c(carry, p, s, b, up=use_pallas, model=model):
            # dependency-chain through the float params so repeated
            # dispatches can't be elided/overlapped (see _time_fwd_chained)
            p = jax.tree.map(
                lambda t: t + carry * 0
                if jnp.issubdtype(t.dtype, jnp.floating) else t, p
            )
            pred, _ = model.apply(p, s, b, training=False, use_pallas=up)
            return (carry + jnp.sum(pred) * 1e-30,)

        opt_state = opt.init(params)

        @jax.jit
        def step(p, o, s, b, up=use_pallas, model=model):
            def loss(pp):
                pred, s2 = model.apply(pp, s, b, training=True, use_pallas=up)
                err = jnp.abs(pred - b.target.reshape(-1)) * b.graph_mask
                return err.sum() / jnp.maximum(b.graph_mask.sum(), 1.0), s2

            (l, s2), g = jax.value_and_grad(loss, has_aux=True)(p)
            u, o2 = opt.update(g, o, p)
            return optax.apply_updates(p, u), o2, s2

        try:
            # Median of 3 measurement repeats: the small zinc step is
            # load-sensitive on this shared host (12-15.5M observed for
            # the same binary across runs).
            dt = float(np.median([
                _time_step_fn(
                    fwd_c, jnp.zeros((), jnp.float32), params, state,
                    b_used, iters=15, n_state=1,
                )
                for _ in range(3)
            ]))
            res[name] = {"time_s": dt, "edges_per_s": n_edges / dt}
            zb = _zinc_fwd_bytes(b_used, 75, 5, 50, model.num_layers, dtype)
            _annotate_roofline(res[name], n_edges, zb)
            dt_t = float(np.median([
                _time_step_fn(step, params, opt_state, state, b_used,
                              iters=10)
                for _ in range(3)
            ]))
            res[name]["train"] = {"time_s": dt_t, "edges_per_s": n_edges / dt_t}
            _annotate_roofline(res[name]["train"], n_edges, 3 * zb)
            if jax.devices()[0].platform == "tpu":
                bs, parts = zinc_fwd_bound(
                    b_used, 75, 5, 50, model.num_layers, dtype,
                    measure_primitives(), exact=(name == "auto"),
                )
                _annotate_bound(res[name], bs, parts)
                bst, partst = zinc_train_bound(
                    b_used, 75, 5, 50, model.num_layers, dtype,
                    measure_primitives(), exact=(name == "auto"),
                )
                _annotate_bound(res[name]["train"], bst, partst)
            if name == "auto":
                res[name]["batch_layout"] = "degree_exact"
                res[name]["n_node_pad"] = b_used.graph.n_node
                res[name]["n_edge_pad"] = b_used.graph.n_edge
        except Exception as e:
            log(f"  zinc path {name} failed: {type(e).__name__}: {str(e)[:200]}")
    return res


def bench_scaling(n=65536, avg_deg=16, n_feat=64, aggregators=("mean", "mean2")):
    """Edge-sharded MMA train-step throughput at N = 1, 2, 4, 8 shards —
    the BASELINE "scaling efficiency 1→N" harness.

    Uses every real device available; a single-accelerator environment
    (this one: 1 TPU chip) falls back to the virtual 8-device CPU mesh,
    which validates the sharded program end-to-end and measures the
    collective/overhead *trend* — the table is then a one-liner to rerun
    on a pod (`devices = jax.devices()`). Efficiency = edges/s at N over
    N × edges/s at 1.
    """
    import jax
    import optax

    from mma_tpu.models import NodeClassifier
    from mma_tpu.parallel import (
        make_edge_sharded_train_step,
        make_mesh,
        shard_graph,
    )
    from mma_tpu.train import make_optimizer

    devices = jax.devices()
    platform = devices[0].platform
    if len(devices) < 2:
        devices = jax.devices("cpu")
        platform = "cpu-virtual"
        n = n // 8  # CPU mesh: keep the sweep minutes, not hours

    import jax.numpy as jnp

    graph = powerlaw_graph(n, avg_deg=avg_deg, seed=2)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(graph.n_node, n_feat).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 16, graph.n_node))
    model = NodeClassifier(
        n_feat=n_feat, n_hidden=n_feat, n_class=16, aggregators=aggregators
    )
    params = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3)
    n_edges = int(np.asarray(graph.num_edges))

    rows = {}
    for num in (1, 2, 4, 8):
        if num > len(devices):
            break
        mesh = make_mesh(("edge",), devices=devices[:num])
        g_sh = shard_graph(graph, mesh, "edge")
        step = make_edge_sharded_train_step(
            model, opt, mesh, labels, jnp.arange(min(n, 1024)), "edge"
        )
        rng = jax.random.PRNGKey(1)
        try:
            dt = _time_fn(
                lambda p, o: step(p, o, x, g_sh, rng),
                params, opt.init(params), iters=5, warmup=1,
            )
        except Exception as e:
            log(f"  scaling N={num} failed: {type(e).__name__}: {str(e)[:200]}")
            continue
        rows[num] = {"time_s": dt, "edges_per_s": n_edges / dt}
    if 1 in rows:
        base = rows[1]["edges_per_s"]
        for num, r in rows.items():
            r["efficiency"] = r["edges_per_s"] / (num * base)
    out = {"platform": platform, "n_nodes": n, "n_edges": n_edges, "shards": rows}
    if platform == "cpu-virtual":
        out["note"] = (
            "virtual CPU devices share the host's cores: efficiency here "
            "validates the sharded program + measures collective overhead "
            "only; pod efficiency requires real N-chip hardware"
        )
    return out


def locality_powerlaw_graph(n, avg_deg, seed=0, long_range=0.05):
    """Power-law graph WITH community structure, node labels scrambled:
    ring-local edges (pareto-distributed offsets) plus a few zipf
    long-range edges. Realistic graphs (road/web/social) have this kind
    of locality; the zipf-random generator above has none — no
    partitioner can beat random conductance there, so partition quality
    must be judged here."""
    rs = np.random.RandomState(seed)
    m = n * avg_deg // 2
    a = rs.randint(0, n, m)
    off = np.maximum(1, (rs.pareto(1.5, m) * 3).astype(np.int64))
    b = (a + np.where(rs.rand(m) < 0.5, off, -off)) % n
    ml = int(m * long_range)
    a2 = (rs.rand(ml) ** 2 * n).astype(np.int64)
    b2 = rs.randint(0, n, ml)
    a = np.concatenate([a, a2])
    b = np.concatenate([b, b2])
    keep = a != b
    a, b = a[keep], b[keep]
    perm = rs.permutation(n)
    a, b = perm[a], perm[b]
    src = np.concatenate([a, b]).astype(np.int32)
    dst = np.concatenate([b, a]).astype(np.int32)
    from mma_tpu.graph.build import graph_from_edges

    return graph_from_edges(src, dst, n)


def measure_compute_dma_overlap(copy_mb=110):
    """Measured on-chip overlap factor between an interior-style reduce
    and a large async data movement (VERDICT r4 #6).

    The scaling model's halo-overlap assumption ("XLA schedules the
    all_to_all concurrently with the interior segment-reduce") was
    assumed, never measured. One chip has no ICI, so the stand-in for
    the collective is a ``copy_mb``-sized HBM read+write (an async-DMA
    candidate like a collective buffer move; pessimistic — a real
    all_to_all rides ICI links and contends LESS with HBM than this
    copy does). Returns (overlap_factor ∈ [0,1], detail dict):
    1.0 = fully concurrent, 0.0 = serialized.
    """
    import jax
    import jax.numpy as jnp

    from mma_tpu.ops.pallas.fused_mma import fused_segment_sum_raw

    rs = np.random.RandomState(0)
    n_rows, e = 65536, 1 << 20
    dst = np.sort(rs.randint(0, n_rows, size=e)).astype(np.int32)
    row_ptr = np.searchsorted(dst, np.arange(n_rows + 1)).astype(np.int32)
    data = jnp.asarray(rs.rand(e, 128).astype(np.float32)).astype(
        jnp.bfloat16)
    dstj, rpj = jnp.asarray(dst), jnp.asarray(row_ptr)
    buf = jnp.asarray(
        rs.rand(copy_mb * 1024 * 1024 // 4).astype(np.float32)
    )

    def reduce_only(d):
        return fused_segment_sum_raw(d, dstj, rpj)

    def copy_only(b):
        return b * 1.0000001

    def combined(d, b):
        return fused_segment_sum_raw(d, dstj, rpj), b * 1.0000001

    t_a = _time_fwd_chained(reduce_only, data, iters=10)

    @jax.jit
    def copy_step(carry, b):
        out = copy_only(b + carry * 0)
        return (carry + jnp.sum(out[:8]) * 1e-30,)

    t_b = _time_step_fn(copy_step, jnp.zeros(()), buf, iters=10, n_state=1)

    @jax.jit
    def comb_step(carry, d, b):
        o1, o2 = combined(d + carry.astype(d.dtype) * 0, b + carry * 0)
        return (carry + (jnp.sum(o1[:8]).astype(jnp.float32)
                         + jnp.sum(o2[:8])) * 1e-30,)

    t_ab = _time_step_fn(comb_step, jnp.zeros(()), data, buf,
                         iters=10, n_state=1)
    overlap = (t_a + t_b - t_ab) / min(t_a, t_b)
    overlap = float(np.clip(overlap, 0.0, 1.0))
    return overlap, {
        "t_reduce_s": t_a, "t_copy_s": t_b, "t_combined_s": t_ab,
        "copy_mb": copy_mb,
    }


def node_sharded_scaling_model(
    n=131072, avg_deg=16, n_feat=64, n_class=16, n_agg=2,
    measured_edges_per_s=None, ici_gbps=45.0, shard_counts=(2, 4, 8),
    graph=None, partition_method="contiguous", overlap_factor=None,
):
    """Analytic scaling model for the node-sharded regime — the
    falsifiable backing for the BASELINE "≥80% efficiency at N≥2" claim
    on an environment with one chip (VERDICT r2 #6).

    For each shard count it builds the REAL partition + halo plan
    (``build_node_sharded`` — the exact structure a pod run executes)
    and reports measured structural quantities:

    - interior/boundary edge counts (max over shards — the straggler
      sets step time) and the boundary fraction,
    - halo rows and bytes sent per step per shard (3 exchanges per
      forward: gc1 support F, MMA ``[d‖h]`` (K+1)·F, final projection C;
      the backward transposes double it),

    and model-derived times: ``t_interior = E_int_max / eps`` with
    ``eps`` the measured single-chip train edges/s, ``t_halo =
    bytes_max / ICI bandwidth``. The halo exchange overlaps the interior
    reduce (the regime's design), so
    ``t_step = max(t_interior, t_halo) + t_boundary`` and
    ``efficiency = t_1 / (N · t_step)``. A pod run confirms or refutes
    by measuring t_step directly; ``ici_gbps`` defaults to a v5e 1-D
    ring link (~45 GB/s/direction) and is reported so the model can be
    re-evaluated for other fabrics.
    """
    from mma_tpu.parallel.node_sharded import build_node_sharded_ordered

    if graph is None:
        graph = powerlaw_graph(n, avg_deg=avg_deg, seed=1)
    n = int(np.asarray(graph.node_mask).sum())
    n_edges = int(np.asarray(graph.num_edges))
    eps = measured_edges_per_s or 1.0
    t1 = n_edges / eps

    width_rows = (n_feat + (n_agg + 1) * n_feat + n_class) * 4  # bytes fwd
    width_rows *= 2  # backward transposes reverse every exchange

    # Overlap factor: 1.0 = halo exchange fully concurrent with the
    # interior reduce (the old assumption); measured on-chip via
    # measure_compute_dma_overlap when available (VERDICT r4 #6).
    ov = 1.0 if overlap_factor is None else float(overlap_factor)

    out = {
        "workload": {"n_nodes": n, "n_edges": n_edges, "n_feat": n_feat,
                     "n_agg": n_agg, "n_class": n_class},
        "partition_method": partition_method,
        "measured_single_chip_edges_per_s": eps,
        "ici_gbps_assumed": ici_gbps,
        "overlap_factor": ov,
        "overlap_factor_source": (
            "assumed" if overlap_factor is None else "measured-on-chip"
        ),
        "per_n": {},
    }
    for s in shard_counts:
        sg, _, _ = build_node_sharded_ordered(graph, s, partition_method)
        e_int = (np.asarray(sg.edge_mask).sum(1)
                 - np.asarray(sg.bnd_mask).sum(1))
        e_bnd = np.asarray(sg.bnd_mask).sum(1)
        halo_rows = np.asarray(sg.send_mask).sum((1, 2))  # rows sent by p
        bytes_per_shard = halo_rows * width_rows
        t_int = float(e_int.max()) / eps
        t_bnd = float(e_bnd.max()) / eps
        t_halo = float(bytes_per_shard.max()) / (ici_gbps * 1e9)
        # ov of the shorter leg hides under the longer; the rest serializes.
        t_step = (max(t_int, t_halo)
                  + (1.0 - ov) * min(t_int, t_halo) + t_bnd)
        out["per_n"][s] = {
            "interior_edges_max": int(e_int.max()),
            "interior_edges_mean": float(e_int.mean()),
            "boundary_edges_max": int(e_bnd.max()),
            "boundary_fraction": float(e_bnd.sum() / (e_int.sum() + e_bnd.sum())),
            "halo_rows_sent_max": int(halo_rows.max()),
            "halo_bytes_per_step_max": int(bytes_per_shard.max()),
            "t_interior_s": t_int,
            "t_halo_s": t_halo,
            "t_boundary_s": t_bnd,
            "halo_overlapped": bool(t_halo <= t_int),
            "predicted_efficiency": t1 / (s * t_step),
        }
    return out


def bench_ogbn_sampled(
    n=2_400_000, avg_deg=50, batch_size=1024, fanouts=(10, 10, 5),
    n_batches=10, use_pallas=True, use_ell=False, device_finish=False,
):
    """BASELINE config[4]: ogbn-products-scale synthetic power-law graph
    (2.4M nodes / ~120M directed edges) trained with neighbor sampling —
    DP over all available devices. Reports sampled-edges/s through the
    training step (device) and through the full pipeline.

    Native-speed design (VERDICT r2 #3): padding budgets are *calibrated*
    from real sampled subgraph sizes (not a worst-case 573k-node pad —
    that pad alone made the device step 9.6 s); each subgraph keeps its
    CSR/CSC kernel structure so the fused Pallas kernels run per device
    (``use_pallas``); a producer thread overlaps host sampling + feature
    assembly with the device step (double buffering)."""
    import jax
    import jax.numpy as jnp

    from mma_tpu.data.sampling import NeighborSampler
    from mma_tpu.models import NodeClassifier
    from mma_tpu.parallel import make_mesh
    from mma_tpu.train.optim import make_optimizer
    from mma_tpu.train.sampled import make_sampled_dp_step

    # Fast heavy-tailed edge generation: inverse-CDF zipf(0.5) endpoints.
    rs = np.random.RandomState(3)
    m = n * avg_deg // 2
    t0 = time.perf_counter()
    a = (rs.rand(m) ** 2 * n).astype(np.int64)  # P(i) ∝ i^-0.5
    b = rs.randint(0, n, size=m)
    keep = a != b
    src = np.concatenate([a[keep], b[keep]]).astype(np.int32)
    dst = np.concatenate([b[keep], a[keep]]).astype(np.int32)
    sampler = NeighborSampler.from_host_arrays(src, dst, n, fanouts, seed=4)
    t_build = time.perf_counter() - t0
    log(f"  ogbn: built {len(src):,} directed edges + CSR in {t_build:.1f}s")

    n_feat, n_class = 100, 47  # ogbn-products shapes
    features = rs.randn(65536, n_feat).astype(np.float32)  # hashed feature rows
    labels_tab = rs.randint(0, n_class, 65536)

    # Calibrate PER-HOP padding budgets on real subgraphs (1.5× headroom)
    # via the native sampler's hop counts. ``use_ell=True`` additionally
    # fixes each hop's row range so the graphs carry the static ELL
    # degree-bucket layout and the device step runs the scatter-free
    # dense-neighbor paths (mma_tpu.ops.ell). Measured on this workload
    # the ELL step is SLOWER than the half-fused CSR path (4.4 s vs
    # 1.5 s/batch — the per-hop slot programs don't pay off at 762k-node
    # pads), so the default stays on the CSR path; the flag keeps the
    # alternative one switch away.
    t0 = time.perf_counter()
    hop_max = np.zeros(len(fanouts) + 1, np.int64)
    max_edges = 0
    for _ in range(3):
        seeds_c = rs.randint(0, n, size=batch_size)
        hc, _, src_c, _ = sampler._structure(
            seeds_c,
            sampler._structural_node_bound(batch_size),
            sampler._structural_edge_bound(batch_size),
        )
        hop_max = np.maximum(hop_max, hc)
        max_edges = max(max_edges, len(src_c))
    hop_pads = tuple(
        int(-(-int(c * 1.5) // 256) * 256) if i else batch_size
        for i, c in enumerate(hop_max)
    )
    n_node_pad = -(-(sum(hop_pads) + 1) // 8192) * 8192
    n_edge_pad = -(-int(max_edges * 1.5) // 8192) * 8192
    log(f"  ogbn: calibrated hop pads {list(hop_pads)} "
        f"(nodes {int(hop_max.sum())}->{n_node_pad}), edges "
        f"{max_edges}->{n_edge_pad} in {time.perf_counter()-t0:.1f}s")

    devices = jax.devices()
    n_dev = len(devices)
    if n_dev < 2:
        cpus = jax.devices("cpu")
        if len(cpus) >= 2 and devices[0].platform != "tpu":
            devices, n_dev = cpus, len(cpus)
        else:
            n_dev = 1
    model = NodeClassifier(
        n_feat=n_feat, n_hidden=64, n_class=n_class,
        aggregators=("mean", "mean2"), dropout_rate=0.5,
        compute_dtype="auto",  # bf16 edge pipeline on TPU
    )
    params = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(3e-3)
    opt_state = opt.init(params)

    mesh = make_mesh(("data",), devices=devices[:n_dev])
    step = make_sampled_dp_step(model, opt, mesh, "data", use_pallas=use_pallas,
                                donate_data=True)
    rngs = jax.random.split(jax.random.PRNGKey(7), n_dev)

    seeds_all = rs.randint(0, n, size=(n_batches + 2, n_dev, batch_size))

    # Feature/label tables live ON DEVICE; per batch only the (n_dev,
    # n_node_pad) int32 node-id map crosses the host↔device link (2.6 MB
    # vs 262 MB for assembled f32 features — on the tunneled axon link
    # the assembled-on-host variant spent ~5 s/batch in transfer alone).
    # Real serving hosts feed features the same way: a device-resident
    # embedding/feature cache gathered by ids. The same principle now
    # covers the GRAPH: only (src, dst, ids) cross the link (~10 MB) and
    # the CSR/CSC views, masks and true degrees are derived on device
    # (graph.device_build.finish_graph_on_device + a device-resident
    # degree table) — the full host-built Graph shipped ~30 MB/batch.
    feat_tab = jnp.asarray(features)
    lab_tab = jnp.asarray(labels_tab.astype(np.int32))
    deg_tab = jnp.asarray(sampler.true_deg)
    from mma_tpu.graph.device_build import (
        finish_graph_on_device,
        shape_canonical_chunk_hint,
    )

    canon_hint = shape_canonical_chunk_hint(n_edge_pad, n_node_pad)

    @jax.jit
    def assemble(ids, num_seeds):
        valid = ids >= 0
        safe = jnp.maximum(ids, 0) % feat_tab.shape[0]
        x = jnp.where(valid[..., None], feat_tab[safe], 0.0)
        y = jnp.where(valid, lab_tab[safe], 0)
        sm = (
            jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1)
            < num_seeds[:, None]
        ).astype(jnp.float32)
        return x, y, sm

    def make_inputs_device_finish(bi):
        """Minimal-transfer variant (``device_finish=True``): ship only
        (src, dst, ids) per device and derive CSR/CSC/masks/degrees on
        device. Measured on THIS machine: host 0.74 → 0.25 s/batch but
        device 1.40 → 2.16 s — the device lexsort for the CSC view costs
        more than the ~20 MB of tunnel transfer it saves, so the default
        stays host-built. On real hosts (GB/s links, fast host sorts in
        C++) the right split depends on the actual link; both pipelines
        are tested equivalent."""
        t0 = time.perf_counter()
        arrs = [
            sampler.sample_arrays(
                seeds_all[bi, d], n_node_pad=n_node_pad,
                n_edge_pad=n_edge_pad,
                hop_node_pads=hop_pads if use_ell else None,
            )
            for d in range(n_dev)
        ]
        if use_pallas:
            members = [
                finish_graph_on_device(
                    jnp.asarray(ar.src), jnp.asarray(ar.dst),
                    jnp.asarray(ar.node_ids),
                    jnp.int32(ar.num_edges), deg_tab,
                    jnp.asarray(ar.src_perm),
                    chunk_hint=canon_hint, ell_hint=ar.ell_hint,
                )
                for ar in arrs
            ]
        else:
            import dataclasses as _dc

            members = [
                _dc.replace(
                    finish_graph_on_device(
                        jnp.asarray(ar.src), jnp.asarray(ar.dst),
                        jnp.asarray(ar.node_ids),
                        jnp.int32(ar.num_edges), deg_tab,
                    ),
                    src_perm=None, col_ptr=None, src_csc=None,
                    dst_csc=None,
                )
                for ar in arrs
            ]
        graph = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *members)
        ids = jnp.asarray(np.stack([ar.node_ids for ar in arrs]))
        nseed = jnp.asarray(
            np.array([ar.num_seeds for ar in arrs], np.int32)
        )
        x, y, sm = assemble(ids, nseed)
        n_e = sum(ar.num_edges for ar in arrs)
        return (x, graph, y, sm, n_e, time.perf_counter() - t0)

    def make_inputs(bi):
        """Sample + assemble one step's inputs (host side, thread-safe:
        own RandomState stream via the precomputed seed table)."""
        if device_finish:
            return make_inputs_device_finish(bi)
        t0 = time.perf_counter()
        batches = []
        for d in range(n_dev):
            bt = sampler.sample(
                seeds_all[bi, d], n_node_pad=n_node_pad,
                n_edge_pad=n_edge_pad,
                hop_node_pads=hop_pads if use_ell else None,
            )
            batches.append(bt)
        from mma_tpu.train.sampled import stack_graphs

        graph = stack_graphs([bt.graph for bt in batches],
                             keep_structure=use_pallas)
        ids = jnp.asarray(np.stack([bt.node_ids for bt in batches]))
        nseed = jnp.asarray(
            np.array([bt.num_seeds for bt in batches], np.int32)
        )
        x, y, sm = assemble(ids, nseed)
        n_e = sum(int(np.asarray(bt.graph.num_edges)) for bt in batches)
        return (x, graph, y, sm, n_e, time.perf_counter() - t0)

    # Producer: host sampling/assembly for the next batches overlaps the
    # device step (prefetch depth 2). ONE worker — the native sampler is
    # itself multithreaded across all cores, and a second concurrent
    # sampler was measured to ~2.6× the per-batch host time (r5).
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    window = deque()
    next_bi = 0

    warm = 2  # the 2nd execution consistently pays a ~14-22 s one-off
    # (remote second-stage compile/autotune) — both excluded from stats.

    def refill():
        nonlocal next_bi
        while len(window) < 2 and next_bi < n_batches + warm:
            window.append(pool.submit(make_inputs, next_bi))
            next_bi += 1

    refill()
    t_wall0 = None
    host_times, dev_times, edge_counts, wall_times = [], [], [], []
    loss = None
    bi = 0
    t_prev = None
    while window:
        item = window.popleft().result()
        refill()
        x, graph, y, sm, n_e, dt_s = item
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, x, graph, y, sm, rngs)
        jax.block_until_ready(loss)
        t1 = time.perf_counter()
        if bi < warm:
            t_wall0 = t1  # after warmup/compile
        else:
            host_times.append(dt_s)
            dev_times.append(t1 - t0)
            edge_counts.append(n_e)
            wall_times.append(t1 - t_prev)
        log(f"  ogbn batch {bi}: host {dt_s:.2f}s dev {t1 - t0:.2f}s")
        t_prev = t1
        bi += 1
    pool.shutdown(wait=True)
    t_wall = time.perf_counter() - t_wall0

    # Robust per-batch statistics (VERDICT r4 #3: single best runs are
    # load-sensitive — publish the median with the spread). The pipeline
    # rate stays a whole-run wall-clock number (that IS the pipeline);
    # a median-per-batch pipeline estimate accompanies it.
    t_sample = float(np.sum(host_times))
    t_step = float(np.sum(dev_times))
    edges_dev = int(np.sum(edge_counts))
    med_e = float(np.median(edge_counts))
    if device_finish:
        # src + dst + CSC perm (int32) + node ids.
        structure_bytes = 3 * 4 * n_edge_pad + 4 * n_node_pad
    else:
        # Host-built Graph: 5 int32 edge arrays (src/dst/src_perm/
        # src_csc/dst_csc) + edge_mask + deg/node_mask + 2 ptr arrays.
        structure_bytes = (5 * 4 + 1) * n_edge_pad + (
            4 + 1) * n_node_pad + 2 * 4 * (n_node_pad + 1)

    return {
        "n_nodes": n,
        "n_edges_directed": int(len(src)),
        "devices": n_dev,
        "batch_size": batch_size,
        "n_batches": n_batches,
        "fanouts": list(fanouts),
        "use_pallas": use_pallas,
        "use_ell": use_ell,
        "device_finish": device_finish,
        "n_node_pad": n_node_pad,
        "n_edge_pad": n_edge_pad,
        "structure_mb_per_batch": round(structure_bytes * n_dev / 2**20, 2),
        "final_loss": float(loss),
        "sampled_edges_per_s_device": edges_dev / t_step,
        "sampled_edges_per_s_device_median": med_e / float(np.median(dev_times)),
        "sampled_edges_per_s_pipeline": edges_dev / t_wall,
        "sampled_edges_per_s_pipeline_median": med_e
        / float(np.median(wall_times)),
        "wall_s_median": float(np.median(wall_times)),
        "wall_s_spread": [float(np.min(wall_times)),
                          float(np.max(wall_times))],
        "host_sampling_s_per_batch": t_sample / n_batches,
        "host_s_median": float(np.median(host_times)),
        "host_s_spread": [float(np.min(host_times)), float(np.max(host_times))],
        "device_step_s_per_batch": t_step / n_batches,
        "device_s_median": float(np.median(dev_times)),
        "device_s_spread": [float(np.min(dev_times)), float(np.max(dev_times))],
        "overlap_efficiency": (t_sample + t_step) / t_wall,
        "pipeline_over_device": (edges_dev / t_wall)
        / (edges_dev / t_step) if t_step else None,
    }


def main():
    import jax

    platform = jax.devices()[0].platform
    log(f"bench on {jax.devices()[0]} ({platform})")

    details = {"platform": platform}

    # Pubmed structure (synthetic features OK: structure drives the cost).
    from mma_tpu.data import load_planetoid

    pubmed = load_planetoid("pubmed", synthetic_features=True)
    details["pubmed"] = bench_node_mma(
        pubmed.graph, 16, ("min", "min2", "min3", "min4")
    )
    log("pubmed:", json.dumps(details["pubmed"]))

    details["zinc"] = bench_zinc_conv()
    log("zinc:", json.dumps(details["zinc"]))

    big = powerlaw_graph(131072, avg_deg=16, seed=1)
    details["synthetic-large"] = bench_node_mma(big, 64, ("mean", "mean2"))
    log("synthetic-large:", json.dumps(details["synthetic-large"]))
    details["synthetic-large-train"] = bench_node_mma_train(big, 64, ("mean", "mean2"))
    log("synthetic-large-train:", json.dumps(details["synthetic-large-train"]))

    if platform == "tpu":
        details["primitives"] = measure_primitives()
        log("primitives:", json.dumps(details["primitives"]))

    if os.environ.get("MMA_BENCH_SKIP_SCALING") != "1":
        details["scaling"] = bench_scaling()
        log("scaling:", json.dumps(details["scaling"]))
        tr = details["synthetic-large-train"]
        best_train = max(
            (v["edges_per_s"] for v in tr.values()), default=None
        )
        overlap = None
        if platform == "tpu":
            try:
                overlap, ov_detail = measure_compute_dma_overlap()
                details["scaling"]["overlap_measurement"] = {
                    "factor": overlap, **ov_detail
                }
                log(f"measured compute/DMA overlap factor: {overlap:.3f}")
            except Exception as e:
                log(f"  overlap measurement failed: {e}")
        # Three partition scenarios: the locality-free zipf graph
        # (worst case — any partition ≈ random conductance) and a
        # locality power-law graph under contiguous vs LDG cuts (the
        # partitioner's actual job: recover scrambled community
        # structure — VERDICT r3 #4).
        details["scaling"]["model"] = node_sharded_scaling_model(
            measured_edges_per_s=best_train, overlap_factor=overlap,
        )
        log("scaling model (zipf/contiguous):",
            json.dumps(details["scaling"]["model"]))
        loc_graph = locality_powerlaw_graph(131072, 16, seed=1)
        details["scaling"]["model_locality"] = {
            m: node_sharded_scaling_model(
                measured_edges_per_s=best_train, graph=loc_graph,
                partition_method=m, overlap_factor=overlap,
            )
            for m in ("contiguous", "ldg")
        }
        log("scaling model (locality):",
            json.dumps(details["scaling"]["model_locality"]))
    if os.environ.get("MMA_BENCH_SKIP_OGBN") != "1":
        # Minimal-transfer pipeline (device_finish + host-emitted CSC
        # permutation) is the default; the host-built variant is measured
        # alongside for the r4→r5 comparison gate (device_finish step ≤
        # host-built step).
        try:
            details["ogbn-sampled"] = bench_ogbn_sampled(
                n_batches=10, device_finish=True
            )
            log("ogbn-sampled:", json.dumps(details["ogbn-sampled"]))
        except Exception as e:
            log(f"  ogbn-sampled failed: {type(e).__name__}: {str(e)[:300]}")
        try:
            details["ogbn-sampled-hostbuilt"] = bench_ogbn_sampled(
                n_batches=10, device_finish=False
            )
            log("ogbn-sampled-hostbuilt:",
                json.dumps(details["ogbn-sampled-hostbuilt"]))
        except Exception as e:
            log(f"  ogbn-sampled-hostbuilt failed: "
                f"{type(e).__name__}: {str(e)[:300]}")

    head = details["synthetic-large"]
    best_name = max(head, key=lambda k: head[k]["edges_per_s"])
    value = head[best_name]["edges_per_s"]
    vs_baseline = value / head["xla"]["edges_per_s"]
    details["headline"] = {"workload": "synthetic-large", "path": best_name}

    # Merge over any existing details so a partial run (sections skipped
    # via MMA_BENCH_SKIP_*) doesn't drop the other sections' entries.
    # Each section measured THIS run is stamped with the current git SHA
    # + timestamp under "_provenance", so a merged artifact can't silently
    # mix revisions without saying so.
    try:
        import subprocess

        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        sha = "unknown"
    stamp = {"git_sha": sha, "time": time.strftime("%Y-%m-%dT%H:%M:%S")}
    try:
        with open("BENCH_DETAILS.json") as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    prov = merged.get("_provenance", {})
    for k in details:
        prov[k] = stamp
    merged.update(details)
    merged["_provenance"] = prov
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(merged, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "mma_layer_edges_per_s_per_chip",
                "value": round(value, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
