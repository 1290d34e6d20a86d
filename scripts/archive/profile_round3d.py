"""Round-3d: dissect the lean fwd kernel's time (VPU vs MXU vs stream)
with ablation variants, measure kernel-only (pre-gathered) time, and
the improved spmm. Run on the real TPU."""

import functools
import json
import sys
import time

import numpy as np


def t(f, *args, iters=30, warmup=2):
    import jax

    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, "/root/repo")
    from bench import powerlaw_graph
    from mma_tpu.constants import BLOCK_B, BLOCK_R, BLOCK_SUB
    from mma_tpu.ops.pallas import fused_mma as fm
    from mma_tpu.ops.spmm import binary_spmm

    res = {"device": str(jax.devices()[0])}
    rs = np.random.RandomState(0)
    n_feat, k = 64, 2
    graph = powerlaw_graph(131072, avg_deg=16, seed=1)
    n, e = graph.n_node, graph.n_edge
    n_real = int(np.asarray(graph.num_edges))
    ckf = k * n_feat
    h = jnp.asarray(rs.randn(n, n_feat).astype(np.float32))
    c = jnp.asarray(rs.randn(n, ckf).astype(np.float32))
    w_bot = jnp.asarray(rs.randn(n_feat, ckf).astype(np.float32))

    # Variant kernel: flags cut stages out to attribute time.
    def make_kernel(variant, passes, f):
        def kern(bstep_ref, cstep_ref, starts_ref, ends_ref, ids_ref, hg_ref,
                 c_ref, w_ref, pat_ref, out_ref):
            i = pl.program_id(0)
            r = bstep_ref[i]
            cc = cstep_ref[i]
            start, end = starts_ref[r], ends_ref[r]
            num_chunks = pl.cdiv(end, BLOCK_B) - start // BLOCK_B

            @pl.when(cc == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            @pl.when((start < end) & (cc < num_chunks))
            def _():
                block_r = out_ref.shape[0]
                ckf_ = out_ref.shape[1]
                g = start // BLOCK_B + cc
                row0 = r * block_r
                rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, BLOCK_SUB), 0)
                sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK_SUB), 1)
                c_terms = fm._split_terms(c_ref[:], passes)
                w_terms = fm._split_terms(w_ref[:], passes)
                acc = jnp.zeros_like(out_ref)
                for j in range(BLOCK_B // BLOCK_SUB):
                    gidx = g * BLOCK_B + j * BLOCK_SUB + sub_iota
                    covered = (gidx >= start) & (gidx < end)
                    ids = ids_ref[0, j : j + 1, :]
                    onehot = ((ids - row0) == rr) & covered
                    hg = hg_ref[pl.ds(j * BLOCK_SUB, BLOCK_SUB), :]
                    h_t = hg[:, :ckf_].astype(jnp.float32)
                    if variant == "no_ddot":
                        logits = fm._select_rows_pre(onehot, c_terms)
                    elif variant == "no_select":
                        logits = fm._dot_split_pre(hg[:, :f], w_terms, passes)
                    else:
                        logits = (fm._select_rows_pre(onehot, c_terms)
                                  + fm._dot_split_pre(hg[:, :f], w_terms, passes))
                    if variant == "no_sigmoid":
                        mask = logits
                    elif variant == "sigmoid_only":
                        mask = jax.nn.sigmoid(logits)
                    else:
                        pat = pat_ref[:].astype(jnp.float32)
                        mask = jnp.where(pat > 0, jax.nn.sigmoid(logits), logits)
                    if variant == "no_contract":
                        acc += jnp.zeros_like(out_ref) + jnp.sum(mask * h_t)
                    else:
                        acc = fm._contract(acc, onehot, mask * h_t, passes)
                out_ref[:] += acc
        return kern

    def run_variant(variant, hg_p, dst, passes, f):
        e_pad, f_pad = hg_p.shape
        (nn, num_blocks, num_chunks, total_steps, starts, ends, block_of,
         chunk_of) = fm._grid_and_prefetch(graph.row_ptr, e_pad, BLOCK_R, BLOCK_B)
        chunk_index = fm._chunk_index_fn(num_chunks, BLOCK_B)
        n_sub = BLOCK_B // BLOCK_SUB
        n_rows = int(num_blocks) * BLOCK_R
        c_p = jnp.pad(c.astype(jnp.float32), ((0, n_rows - n), (0, 0)))
        pat2 = jnp.ones((1, ckf), jnp.float32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(total_steps,),
            in_specs=[
                pl.BlockSpec((1, n_sub, BLOCK_SUB),
                             lambda i, b, c_, s, e_: (chunk_index(i, b, c_, s, e_), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_B, f_pad),
                             lambda i, b, c_, s, e_: (chunk_index(i, b, c_, s, e_), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_R, ckf), lambda i, b, c_, s, e_: (b[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_feat, ckf), lambda i, b, c_, s, e_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ckf), lambda i, b, c_, s, e_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK_R, ckf),
                                   lambda i, b, c_, s, e_: (b[i], 0),
                                   memory_space=pltpu.VMEM),
        )
        fn = pl.pallas_call(
            make_kernel(variant, passes, f),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, ckf), jnp.float32),
        )
        g = jax.jit(lambda *a: fn(*a))
        return t(g, block_of, chunk_of, starts, ends,
                 dst.reshape(num_chunks, n_sub, BLOCK_SUB), hg_p, c_p,
                 w_bot.astype(jnp.float32), pat2)

    for dt_name, cast in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        passes = 1 if dt_name == "bf16" else 2
        tab = jnp.tile(h, (1, k)).astype(cast)  # (N, 128)
        hg = tab[graph.src]
        (hg_p,), dst = fm._pad_edges([hg], graph.dst, e, n, BLOCK_B)
        for variant in ("full", "no_sigmoid", "sigmoid_only", "no_ddot",
                        "no_select", "no_contract"):
            key = f"leankern_{dt_name}_{variant}"
            try:
                dt_s = run_variant(variant, hg_p, dst, passes, n_feat)
                res[key + "_ms"] = dt_s * 1e3
            except Exception as ex:
                res[key + "_err"] = f"{type(ex).__name__}: {str(ex)[:160]}"
            print(key, res.get(key + "_ms"), file=sys.stderr, flush=True)

    # improved spmm (node-zeroing, no edge-where)
    x = jnp.asarray(rs.randn(n, 64).astype(np.float32))
    fs = jax.jit(lambda x_: binary_spmm(graph, x_, use_pallas=True))
    res["spmm_nodezero_w64_f32_ms"] = t(fs, x) * 1e3
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
